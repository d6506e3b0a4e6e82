"""Polygon tessellation: from-scratch ear clipping with hole bridging.

The reference pretessellates polygons with earcut
(java/.../converter/tessellation/TessellationUtils.java:25-52, earcut4j) and
stores NumTriangles + IndexBuffer streams. mapbox_earcut is not available in
this environment, so this is an independent ear-clipping implementation of
the same *contract*: triangles indexed into the polygon's vertex list
(outer ring first, then holes, closing vertices dropped). Triangle
*ordering* differs from earcut4j, so tiles carrying our tessellation are
format-valid and decodable but not byte-identical to the reference's
polygon fixtures — membership parity is unaffected (triangles are derived
data).

Algorithm: holes are bridged into the outer ring via the max-x hole vertex
(Held's method, as in earcut), then standard O(n²) ear clipping — fine for
tile-local polygons (≤ a few hundred vertices)."""

from __future__ import annotations

import numpy as np


def _signed_area(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def _point_in_tri(p, a, b, c) -> bool:
    d1 = (p[0] - b[0]) * (a[1] - b[1]) - (a[0] - b[0]) * (p[1] - b[1])
    d2 = (p[0] - c[0]) * (b[1] - c[1]) - (b[0] - c[0]) * (p[1] - c[1])
    d3 = (p[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (p[1] - a[1])
    has_neg = (d1 < 0) or (d2 < 0) or (d3 < 0)
    has_pos = (d1 > 0) or (d2 > 0) or (d3 > 0)
    return not (has_neg and has_pos)


def _bridge_holes(outer: np.ndarray, holes: list[np.ndarray]) -> tuple[np.ndarray, list[int]]:
    """Connect each hole to the outer ring via its max-x vertex → one simple
    polygon. Returns (vertices, original-index map)."""
    verts = [tuple(v) for v in outer]
    idx_map = list(range(len(outer)))
    offset = len(outer)
    for hole in sorted(holes, key=lambda h: -h[:, 0].max()):
        hi = int(np.argmax(hole[:, 0]))
        hx, hy = hole[hi]
        # nearest visible outer vertex to the right-most hole vertex
        best, best_d = 0, None
        for j, (vx, vy) in enumerate(verts):
            if vx >= hx:
                d = (vx - hx) ** 2 + (vy - hy) ** 2
                if best_d is None or d < best_d:
                    best, best_d = j, d
        rotated = [tuple(v) for v in np.roll(hole, -hi, axis=0)]
        rot_idx = [offset + ((hi + k) % len(hole)) for k in range(len(hole))]
        bridge = rotated + [rotated[0], verts[best]]
        bridge_idx = rot_idx + [rot_idx[0], idx_map[best]]
        verts = verts[: best + 1] + bridge + verts[best + 1 :]
        idx_map = idx_map[: best + 1] + bridge_idx + idx_map[best + 1 :]
        offset += len(hole)
    return np.array(verts, dtype=float), idx_map


def triangulate(rings: list[np.ndarray]) -> np.ndarray:
    """rings: outer + holes, each (n,2) WITHOUT closing vertex.
    → (t,3) int32 triangle indices into the concatenated ring vertex list."""
    outer = rings[0]
    if _signed_area(outer) > 0:  # tile space is y-down: CW outer expected
        pass
    poly, idx_map = _bridge_holes(outer, rings[1:]) if len(rings) > 1 else (
        outer.astype(float),
        list(range(len(outer))),
    )
    n = poly.shape[0]
    if n < 3:
        return np.empty((0, 3), dtype=np.int32)
    # orient CCW in math coords for a consistent convexity test
    ccw = _signed_area(poly) > 0
    order = list(range(n)) if ccw else list(range(n - 1, -1, -1))
    tris: list[tuple[int, int, int]] = []
    guard = 0
    while len(order) > 3 and guard < 2 * n * n:
        guard += 1
        ear_found = False
        m = len(order)
        for k in range(m):
            i0, i1, i2 = order[(k - 1) % m], order[k], order[(k + 1) % m]
            a, b, c = poly[i0], poly[i1], poly[i2]
            cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            if cross <= 0:
                continue  # reflex
            if any(
                _point_in_tri(poly[j], a, b, c)
                for j in order
                if j not in (i0, i1, i2) and not np.array_equal(poly[j], a) and not np.array_equal(poly[j], b) and not np.array_equal(poly[j], c)
            ):
                continue
            tris.append((idx_map[i0], idx_map[i1], idx_map[i2]))
            order.pop(k)
            ear_found = True
            break
        if not ear_found:  # degenerate remainder: fan it
            for k in range(1, len(order) - 1):
                tris.append((idx_map[order[0]], idx_map[order[k]], idx_map[order[k + 1]]))
            order = order[:3]
            break
    if len(order) == 3:
        tris.append((idx_map[order[0]], idx_map[order[1]], idx_map[order[2]]))
    return np.array(tris, dtype=np.int32).reshape(-1, 3)


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
