"""Polygon tessellation: earcut-backed, byte-parity with the reference.

The reference pretessellates polygons with earcut
(java/.../converter/tessellation/TessellationUtils.java:25-52; the fixture
corpus is generated through its tessellation server running JS earcut
3.0.x) and stores NumTriangles + IndexBuffer streams. ``triangulate``
produces triangle indices into the polygon's vertex list (outer ring
first, then holes, closing vertices dropped) in the identical order —
see functions/earcut.py, verified exact on all 548 tessellated fixture
layers."""

from __future__ import annotations

import numpy as np

from maplibre_tile_spec_spark.functions.earcut import earcut


def _signed_area(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def triangulate(rings: list[np.ndarray]) -> np.ndarray:
    """rings: outer + holes, each (n,2) WITHOUT closing vertex.
    → (t,3) int32 triangle indices into the concatenated ring vertex list,
    in reference (earcut) order."""
    data: list[float] = []
    holes: list[int] = []
    cnt = 0
    for r, ring in enumerate(rings):
        if r > 0:
            holes.append(cnt)
        for vx, vy in ring:
            data.append(float(vx))
            data.append(float(vy))
        cnt += len(ring)
    tri = earcut(data, holes or None, 2)
    return np.array(tri, dtype=np.int32).reshape(-1, 3)


def triangle_area_total(rings: list[np.ndarray], tris: np.ndarray) -> float:
    """Σ|triangle areas| for validation against the polygon's net area."""
    allv = np.vstack(rings)
    a = allv[tris[:, 0]]
    b = allv[tris[:, 1]]
    c = allv[tris[:, 2]]
    return float(
        0.5
        * np.abs(
            (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
        ).sum()
    )


def polygon_net_area(rings: list[np.ndarray]) -> float:
    """|outer| − Σ|holes|."""
    total = abs(_signed_area(rings[0]))
    for h in rings[1:]:
        total -= abs(_signed_area(h))
    return total
