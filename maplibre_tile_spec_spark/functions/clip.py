"""Geometry clipping to tile bounds (vector-tiling's cut step).

The reference consumes pre-cut MVT features (its tiles arrive already
clipped); a from-documents tiler has to cut geometries itself when a
feature spans tiles. Implemented from scratch:

* polygons — Sutherland–Hodgman against the axis-aligned tile rectangle
  (correct for arbitrary simple rings clipped by a convex window);
* polylines — parametric Liang–Barsky-style segment clipping, emitting one
  part per continuous run inside the window;
* points — trivial containment.

All functions operate in tile-local extent coordinates inside the Arrow
kernels. A guard buffer (MVT-style) lets renderers stitch tile seams.
"""

from __future__ import annotations

import numpy as np


def clip_ring(ring: np.ndarray, x0: float, y0: float, x1: float, y1: float) -> np.ndarray:
    """Sutherland–Hodgman clip of a ring (n,2, unclosed) to [x0,x1]×[y0,y1].
    Returns the clipped ring (m,2, unclosed); m may be 0."""
    def clip_edge(pts: np.ndarray, inside, intersect) -> np.ndarray:
        if pts.shape[0] == 0:
            return pts
        out = []
        prev = pts[-1]
        prev_in = inside(prev)
        for cur in pts:
            cur_in = inside(cur)
            if cur_in:
                if not prev_in:
                    out.append(intersect(prev, cur))
                out.append(cur)
            elif prev_in:
                out.append(intersect(prev, cur))
            prev, prev_in = cur, cur_in
        return np.array(out) if out else np.empty((0, 2))

    def x_cut(bound: float):
        def f(p, q):
            t = (bound - p[0]) / (q[0] - p[0])
            return np.array([bound, p[1] + t * (q[1] - p[1])])

        return f

    def y_cut(bound: float):
        def f(p, q):
            t = (bound - p[1]) / (q[1] - p[1])
            return np.array([p[0] + t * (q[0] - p[0]), bound])

        return f

    pts = np.asarray(ring, dtype=float)
    pts = clip_edge(pts, lambda p: p[0] >= x0, x_cut(x0))
    pts = clip_edge(pts, lambda p: p[0] <= x1, x_cut(x1))
    pts = clip_edge(pts, lambda p: p[1] >= y0, y_cut(y0))
    pts = clip_edge(pts, lambda p: p[1] <= y1, y_cut(y1))
    # drop consecutive duplicates introduced by corner cuts
    if pts.shape[0] > 1:
        keep = np.ones(pts.shape[0], dtype=bool)
        keep[1:] = (np.abs(np.diff(pts, axis=0)) > 1e-12).any(axis=1)
        pts = pts[keep]
    return pts if pts.shape[0] >= 3 else np.empty((0, 2))


def clip_line(line: np.ndarray, x0: float, y0: float, x1: float, y1: float) -> list[np.ndarray]:
    """Clip a polyline (n,2) to the window → list of continuous sub-lines."""
    pts = np.asarray(line, dtype=float)
    parts: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []

    def inside(p) -> bool:
        return x0 <= p[0] <= x1 and y0 <= p[1] <= y1

    def seg_clip(p, q):
        """Liang–Barsky: returns (t_in, t_out) or None."""
        d = q - p
        t_in, t_out = 0.0, 1.0
        for coord, lo, hi in ((0, x0, x1), (1, y0, y1)):
            if abs(d[coord]) < 1e-300:
                if p[coord] < lo or p[coord] > hi:
                    return None
                continue
            ta = (lo - p[coord]) / d[coord]
            tb = (hi - p[coord]) / d[coord]
            if ta > tb:
                ta, tb = tb, ta
            t_in = max(t_in, ta)
            t_out = min(t_out, tb)
            if t_in > t_out:
                return None
        return t_in, t_out

    for i in range(pts.shape[0] - 1):
        p, q = pts[i], pts[i + 1]
        r = seg_clip(p, q)
        if r is None:
            if cur:
                parts.append(cur)
                cur = []
            continue
        t_in, t_out = r
        a = p + t_in * (q - p)
        b = p + t_out * (q - p)
        if not cur:
            cur = [a]
        elif np.abs(cur[-1] - a).max() > 1e-9:
            parts.append(cur)
            cur = [a]
        cur.append(b)
        if t_out < 1.0:
            parts.append(cur)
            cur = []
    if cur:
        parts.append(cur)
    return [np.array(p) for p in parts if len(p) >= 2]


def ring_area(ring: np.ndarray) -> float:
    if ring.shape[0] < 3:
        return 0.0
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)))
