"""Ear-clipping tessellation: triangle count + area-preservation invariants."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from maplibre_tile_spec_spark.functions import tessellation as TS


def square(cx, cy, r, n=4, phase=0.0):
    th = phase + np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.column_stack([cx + r * np.cos(th), cy + r * np.sin(th)])


class TestTriangulate:
    def test_triangle(self):
        tris = TS.triangulate([np.array([(0, 0), (4, 0), (2, 3)], dtype=float)])
        assert tris.shape == (1, 3)

    def test_convex_count_and_area(self):
        ring = square(0, 0, 10, n=8)
        tris = TS.triangulate([ring])
        assert tris.shape[0] == 6  # n-2
        assert np.isclose(TS.triangle_area_total([ring], tris), TS.polygon_net_area([ring]))

    def test_concave(self):
        ring = np.array([(0, 0), (10, 0), (10, 10), (5, 3), (0, 10)], dtype=float)
        tris = TS.triangulate([ring])
        assert tris.shape[0] == 3
        assert np.isclose(TS.triangle_area_total([ring], tris), TS.polygon_net_area([ring]))

    def test_polygon_with_hole(self):
        outer = square(0, 0, 10, n=8)
        hole = square(0, 0, 3, n=6)[::-1]  # opposite winding
        tris = TS.triangulate([outer, hole])
        # bridged polygon: area must equal outer − hole
        assert np.isclose(
            TS.triangle_area_total([outer, hole], tris),
            TS.polygon_net_area([outer, hole]),
            rtol=1e-9,
        )
        # indices reference the concatenated vertex list
        assert tris.max() < len(outer) + len(hole)
        assert tris.min() >= 0

    def test_clockwise_input(self):
        ring = square(5, 5, 4, n=7)[::-1]
        tris = TS.triangulate([ring])
        assert tris.shape[0] == 5
        assert np.isclose(TS.triangle_area_total([ring], tris), TS.polygon_net_area([ring]))

    @given(
        st.integers(6, 40),
        st.floats(0.5, 50.0),
        st.floats(0, 6.28),
        st.integers(0, 10**6),
    )
    @settings(max_examples=50, deadline=None)
    def test_random_star_polygons(self, n, r, phase, seed):
        rng = np.random.RandomState(seed % 2**31)
        # star-shaped w.r.t. origin requires every angular gap < pi:
        # bounded increments guarantee it (max share 1/(0.5(n-1)+1) of 2*pi)
        inc = rng.uniform(0.5, 1.0, n)
        th = phase + 2 * np.pi * np.cumsum(inc) / inc.sum()
        radii = r * (0.5 + rng.uniform(0, 1, n))
        ring = np.column_stack([radii * np.cos(th), radii * np.sin(th)])
        tris = TS.triangulate([ring])
        assert tris.shape[0] == n - 2
        assert np.isclose(
            TS.triangle_area_total([ring], tris), TS.polygon_net_area([ring]), rtol=1e-6
        )
