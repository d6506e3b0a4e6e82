"""Geometry predicates: vectorized ray-cast PIP, haversine, cell covers.

Shapely is unavailable in this environment, so the exact point-in-polygon
refinement is a from-scratch numpy ray-cast (the classic even-odd crossing
rule, half-open on edges so results match the SQL oracle's identical
formula). Everything operates on whole arrays inside Arrow batches.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


# ---------------------------------------------------------------------------
# ray-cast point-in-polygon (numpy, vectorized over points × edges)
# ---------------------------------------------------------------------------


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing test of n points against one ring (m,2).

    Crossing rule: edge (y1,y2) straddles the horizontal ray iff
    (y1 > py) != (y2 > py), and the intersection x lies strictly east of the
    point. Identical expression is used in the DuckDB oracle SQL, so both
    sides agree including boundary conventions.
    """
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    straddle = (y1[None, :] > py[:, None]) != (y2[None, :] > py[:, None])
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1)[None, :] * (py[:, None] - y1[None, :]) / (y2 - y1)[None, :] + x1[None, :]
    cross = straddle & (px[:, None] < xint)
    return (cross.sum(axis=1) % 2).astype(bool)


def points_in_polygon(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd over all rings (outer + holes): inside iff odd total crossings."""
    total = np.zeros(px.shape[0], dtype=np.int64)
    for ring in rings:
        x1, y1 = ring[:-1, 0], ring[:-1, 1]
        x2, y2 = ring[1:, 0], ring[1:, 1]
        straddle = (y1[None, :] > py[:, None]) != (y2[None, :] > py[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1)[None, :] * (py[:, None] - y1[None, :]) / (y2 - y1)[None, :] + x1[None, :]
        total += (straddle & (px[:, None] < xint)).sum(axis=1)
    return (total % 2).astype(bool)


def pip_oracle_sql_condition(lon_expr: str, lat_expr: str) -> str:
    """The SQL twin of points_in_ring's crossing rule, for use in a
    SUM(CASE WHEN ...) % 2 = 1 aggregate over an edges table with columns
    x1,y1,x2,y2."""
    return (
        f"((y1 > {lat_expr}) != (y2 > {lat_expr})) AND "
        f"{lon_expr} < (x2 - x1) * ({lat_expr} - y1) / (y2 - y1) + x1"
    )


# ---------------------------------------------------------------------------
# haversine — Spark expr, numpy, and SQL twin
# ---------------------------------------------------------------------------


def haversine_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance (km) as a pure Catalyst expression."""
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) * F.sin(dlat) + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon) * F.sin(dlon)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def np_haversine_km(lon1, lat1, lon2, lat2) -> np.ndarray:
    dlat = np.radians(lat2 - lat1) / 2
    dlon = np.radians(lon2 - lon1) / 2
    a = np.sin(dlat) ** 2 + np.cos(np.radians(lat1)) * np.cos(np.radians(lat2)) * np.sin(dlon) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def haversine_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """Identical formula in ANSI SQL for the DuckDB oracle."""
    return (
        f"2.0 * {EARTH_RADIUS_KM} * asin(sqrt("
        f"pow(sin(radians({lat2} - {lat1}) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians({lon2} - {lon1}) / 2), 2)))"
    )


# ---------------------------------------------------------------------------
# grid-cell covers (quadkey cells — our H3/S2 stand-in; the h3 library is
# not installed in this environment, so the cell index is the slippy grid,
# which has the same algebra: hierarchical, prefix-nested, ring-expandable)
# ---------------------------------------------------------------------------


def bbox_cover_cells(
    lon_min: float, lat_min: float, lon_max: float, lat_max: float, level: int
) -> list[tuple[int, int]]:
    """All grid cells at ``level`` intersecting the bbox (superset cover)."""
    n = 2**level

    def tx(lon: float) -> int:
        return min(n - 1, max(0, int((lon + 180.0) / 360.0 * n)))

    def ty(lat: float) -> int:
        rad = math.radians(lat)
        merc = math.log(math.tan(rad) + 1.0 / math.cos(rad))
        return min(n - 1, max(0, int((1.0 - merc / math.pi) / 2.0 * n)))

    x0, x1 = tx(lon_min), tx(lon_max)
    y0, y1 = ty(lat_max), ty(lat_min)  # y grows southward
    return [(x, y) for x in range(x0, x1 + 1) for y in range(y0, y1 + 1)]


def compact_cells(cells: list[tuple[int, int, int]], allowed_levels: set[int]) -> list[tuple[int, int, int]]:
    """Quadtree compaction (the H3 ``compact`` analog): replace every
    complete descendant block with its ancestor at the **nearest allowed
    coarser level** — 2×2 siblings when that level is level−1, a full 4×4
    grandchild block when the cover skips a level (the default PIP level
    set 4,6,8,10,12 has no contiguous pair, so merging strictly one level
    up would never fire). A mixed-level cover joins seamlessly against
    point cells computed per allowed level."""
    current = set(cells)
    changed = True
    while changed:
        changed = False
        for level in sorted({l for l, _, _ in current}, reverse=True):
            coarser = [a for a in allowed_levels if a < level]
            if not coarser:
                continue
            shift = level - max(coarser)
            need = (1 << shift) ** 2
            by_anc: dict[tuple[int, int, int], list] = {}
            for cell in current:
                if cell[0] == level:
                    by_anc.setdefault((level - shift, cell[1] >> shift, cell[2] >> shift), []).append(cell)
            for anc, block in by_anc.items():
                if len(block) == need:
                    current.difference_update(block)
                    current.add(anc)
                    changed = True
    return sorted(current)


def adaptive_cover_level(
    lon_min: float, lat_min: float, lon_max: float, lat_max: float, max_cells: int = 64, max_level: int = 14
) -> int:
    """Finest level whose bbox cover stays within ``max_cells`` cells —
    the quadtree analog of an H3 polygon_to_cells compaction."""
    for level in range(max_level, -1, -1):
        n = 2**level
        w = (lon_max - lon_min) / 360.0 * n + 2
        h = (lat_max - lat_min) / 170.0 * n + 2  # conservative in mercator y
        if w * h <= max_cells:
            return level
    return 0
