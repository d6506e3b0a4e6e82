"""Clipping invariants: area partition, line continuity, window containment."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from maplibre_tile_spec_spark.functions import clip as CL


class TestClipRing:
    def test_fully_inside(self):
        ring = np.array([(1, 1), (3, 1), (3, 3), (1, 3)], dtype=float)
        out = CL.clip_ring(ring, 0, 0, 4, 4)
        assert CL.ring_area(out) == CL.ring_area(ring)

    def test_fully_outside(self):
        ring = np.array([(10, 10), (12, 10), (12, 12)], dtype=float)
        assert CL.clip_ring(ring, 0, 0, 4, 4).shape[0] == 0

    def test_straddle(self):
        ring = np.array([(-2, 1), (2, 1), (2, 3), (-2, 3)], dtype=float)
        out = CL.clip_ring(ring, 0, 0, 4, 4)
        assert np.isclose(CL.ring_area(out), 4.0)  # half of 8
        assert (out[:, 0] >= 0).all() and (out[:, 0] <= 4).all()

    @given(
        st.integers(3, 20),
        st.floats(0.5, 30.0),
        st.floats(-10, 10),
        st.floats(-10, 10),
        st.integers(0, 10**6),
    )
    @settings(max_examples=60, deadline=None)
    def test_grid_partition_preserves_area(self, n, r, cx, cy, seed):
        """Clipping a convex polygon against a 2×2 grid of windows must
        partition its area exactly."""
        rng = np.random.RandomState(seed % 2**31)
        th = np.sort(rng.uniform(0, 2 * np.pi, n))
        if np.unique(th).shape[0] < 3:
            return
        # convex: points on a circle
        ring = np.column_stack([cx + r * np.cos(th), cy + r * np.sin(th)])
        total = CL.ring_area(ring)
        grid_area = 0.0
        for gx0, gx1 in ((-50, 0), (0, 50)):
            for gy0, gy1 in ((-50, 0), (0, 50)):
                grid_area += CL.ring_area(CL.clip_ring(ring, gx0, gy0, gx1, gy1))
        assert np.isclose(grid_area, total, rtol=1e-9, atol=1e-9)


class TestClipLine:
    def test_inside(self):
        line = np.array([(1, 1), (2, 2), (3, 1)], dtype=float)
        parts = CL.clip_line(line, 0, 0, 4, 4)
        assert len(parts) == 1 and np.allclose(parts[0], line)

    def test_crossing_out_and_back(self):
        line = np.array([(1, 1), (6, 1), (6, 3), (1, 3)], dtype=float)
        parts = CL.clip_line(line, 0, 0, 4, 4)
        assert len(parts) == 2
        for p in parts:
            assert (p[:, 0] <= 4 + 1e-9).all()

    def test_length_partition_across_grid(self):
        rng = np.random.RandomState(3)
        line = np.cumsum(rng.uniform(-2, 2, (40, 2)), axis=0)

        def length(pts):
            return float(np.sqrt((np.diff(pts, axis=0) ** 2).sum(axis=1)).sum())

        total = length(line)
        grid_len = 0.0
        for gx0, gx1 in ((-100, 0), (0, 100)):
            for gy0, gy1 in ((-100, 0), (0, 100)):
                for part in CL.clip_line(line, gx0, gy0, gx1, gy1):
                    grid_len += length(part)
        assert np.isclose(grid_len, total, rtol=1e-9)
