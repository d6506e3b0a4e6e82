"""Deterministic synthesizers for the engine's input tables.

The BASELINE-mandated input shape (BASELINE.json input_hint) is an Iceberg
table ``documents(doc_id string, spans array<struct<kind,text,media_ref,
offset>>)`` of interleaved text + media + geometry documents. This module
synthesizes that table (plus the PIP/kNN/raster join sides from FIXTURES.md
§3-5) **Spark-natively**: ``spark.range(n)`` → ``mapInPandas`` with every
random draw derived by a counter-based hash (splitmix64) of
``(seed, doc_id, field_tag)`` — so output is bit-identical regardless of
partitioning, cluster size, or execution order, and generation scales
linearly with executors (no driver-side loops, no shuffle).

Geometry mix mirrors the reference's six fixture classes
(/root/reference/test/fixtures/simple/{point,line,polygon,multipoint,
multiline,multipolygon}-boolean.mvt): 50% Point, 20% LineString, 20% Polygon
(0–2 holes), 10% Multi*. 90% of coordinates are uniform in a CONUS bbox and
10% cluster in 3 urban hotspots to drive the skew/salting path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from maplibre_tile_spec_spark.functions import tilemath as TM

U64 = np.uint64

BBOX = (-125.0, 24.0, -66.0, 49.0)  # lon_min, lat_min, lon_max, lat_max
HOTSPOTS = [(-74.006, 40.7128), (-118.2437, 34.0522), (-87.6298, 41.8781)]  # NYC, LA, Chicago
HOTSPOT_SIGMA = 0.15

DOCUMENTS_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)

_WORDS = (
    "survey map tile vector raster layer feature geometry stream delta "
    "zigzag varint dictionary morton hilbert quadkey zoom extent vertex "
    "polygon ring shard batch arrow column encode decode index join"
).split()


# ---------------------------------------------------------------------------
# counter-based hashing (deterministic, partition-independent)
# ---------------------------------------------------------------------------


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x + U64(0x9E3779B97F4A7C15)).astype(U64)
        x = (x ^ (x >> U64(30))) * U64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> U64(27))) * U64(0x94D049BB133111EB)
        return x ^ (x >> U64(31))


def _h(seed: int, ids: np.ndarray, tag: int) -> np.ndarray:
    mask = (1 << 64) - 1
    mix = ((seed * 0x9E3779B97F4A7C15) ^ (tag * 0xD1B54A32D192ED03)) & mask
    return _splitmix64(ids.astype(U64) ^ U64(mix))


def _uniform(seed: int, ids: np.ndarray, tag: int) -> np.ndarray:
    return _h(seed, ids, tag).astype(np.float64) / float(2**64)


def _randint(seed: int, ids: np.ndarray, tag: int, lo: int, hi: int) -> np.ndarray:
    """Uniform integer in [lo, hi)."""
    return (lo + (_h(seed, ids, tag) % U64(hi - lo)).astype(np.int64)).astype(np.int64)


def _centers(seed: int, ids: np.ndarray, tag: int) -> tuple[np.ndarray, np.ndarray]:
    """90% uniform bbox / 10% gaussian around one of 3 hotspots."""
    u_sel = _uniform(seed, ids, tag + 0)
    lon = BBOX[0] + _uniform(seed, ids, tag + 1) * (BBOX[2] - BBOX[0])
    lat = BBOX[1] + _uniform(seed, ids, tag + 2) * (BBOX[3] - BBOX[1])
    hot = _randint(seed, ids, tag + 3, 0, len(HOTSPOTS))
    # Box-Muller from two uniforms
    u1 = np.clip(_uniform(seed, ids, tag + 4), 1e-12, 1.0)
    u2 = _uniform(seed, ids, tag + 5)
    r = np.sqrt(-2.0 * np.log(u1)) * HOTSPOT_SIGMA
    gx = r * np.cos(2 * np.pi * u2)
    gy = r * np.sin(2 * np.pi * u2)
    hlon = np.array([h[0] for h in HOTSPOTS])[hot] + gx
    hlat = np.array([h[1] for h in HOTSPOTS])[hot] + gy
    is_hot = u_sel < 0.10
    return np.where(is_hot, hlon, lon), np.where(is_hot, hlat, lat)


# ---------------------------------------------------------------------------
# WKT generation (vectorized coords; per-feature string join only)
# ---------------------------------------------------------------------------


def _ring_wkt(cx: float, cy: float, nv: int, radius: float, phase: float) -> str:
    theta = phase + np.linspace(0.0, 2 * np.pi, nv, endpoint=False)
    xs = cx + radius * np.cos(theta)
    ys = cy + radius * 0.7 * np.sin(theta)
    pts = [f"{x:.6f} {y:.6f}" for x, y in zip(xs, ys)]
    pts.append(pts[0])  # closed ring
    return "(" + ", ".join(pts) + ")"


def _gen_wkt(seed: int, gid: np.ndarray, lon: np.ndarray, lat: np.ndarray) -> list[str]:
    """One WKT per feature; geometry class from the fixture mix."""
    u = _uniform(seed, gid, 900)
    nv = _randint(seed, gid, 901, 5, 65)
    radius = 0.001 + _uniform(seed, gid, 902) * 0.1
    nholes = _randint(seed, gid, 903, 0, 3)
    nparts = _randint(seed, gid, 904, 2, 4)
    nline = _randint(seed, gid, 905, 2, 9)
    phase = _uniform(seed, gid, 906) * 2 * np.pi
    out: list[str] = []
    for i in range(gid.shape[0]):
        x, y, uu = float(lon[i]), float(lat[i]), float(u[i])
        if uu < 0.50:
            out.append(f"POINT ({x:.6f} {y:.6f})")
        elif uu < 0.70:
            k = int(nline[i])
            dx = (_uniform(seed, gid[i] + np.arange(k, dtype=np.int64), 907) - 0.5) * 0.02
            dy = (_uniform(seed, gid[i] + np.arange(k, dtype=np.int64), 908) - 0.5) * 0.02
            xs = x + np.cumsum(dx)
            ys = y + np.cumsum(dy)
            out.append("LINESTRING (" + ", ".join(f"{a:.6f} {b:.6f}" for a, b in zip(xs, ys)) + ")")
        elif uu < 0.90:
            rings = [_ring_wkt(x, y, int(nv[i]), float(radius[i]), float(phase[i]))]
            for hj in range(int(nholes[i])):
                rings.append(
                    _ring_wkt(x, y, max(4, int(nv[i]) // 3), float(radius[i]) / 3 / (hj + 1), float(phase[i]) + 1.0)
                )
            out.append("POLYGON (" + ", ".join(rings) + ")")
        else:
            m = uu
            if m < 0.93:
                pts = ", ".join(
                    f"{x + 0.01 * j:.6f} {y + 0.005 * j:.6f}" for j in range(int(nparts[i]))
                )
                out.append(f"MULTIPOINT ({pts})")
            elif m < 0.96:
                parts = []
                for j in range(int(nparts[i])):
                    ox = x + 0.02 * j
                    parts.append(f"({ox:.6f} {y:.6f}, {ox + 0.01:.6f} {y + 0.01:.6f})")
                out.append("MULTILINESTRING (" + ", ".join(parts) + ")")
            else:
                polys = []
                for j in range(int(nparts[i])):
                    polys.append("(" + _ring_wkt(x + 0.05 * j, y, max(5, int(nv[i]) // 2), float(radius[i]) / 2, float(phase[i])) + ")")
                out.append("MULTIPOLYGON (" + ", ".join(polys) + ")")
    return out


# ---------------------------------------------------------------------------
# documents table
# ---------------------------------------------------------------------------


def synthesize_documents(spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """The mandated interleaved table. 1–8 spans/doc; ~80% of docs carry ≥1
    geom span; span offsets strictly increasing (0,1,2,…)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.int64)
            n = ids.shape[0]
            n_spans = _randint(seed, ids, 1, 1, 9)
            has_geom = _uniform(seed, ids, 2) < 0.80
            # span kind pattern per (doc, slot): geometry slots, then text/media mix
            max_spans = int(n_spans.max()) if n else 0
            kind_u = np.stack([_uniform(seed, ids, 100 + s) for s in range(max_spans)], axis=1) if n else np.zeros((0, 0))
            # geometry slot index (one geom span for geom docs; a second with p=0.25)
            geo_slot = _randint(seed, ids, 3, 0, 8) % np.maximum(n_spans, 1)
            second_geo = (_uniform(seed, ids, 4) < 0.25) & (n_spans >= 3)
            geo_slot2 = (geo_slot + 1 + _randint(seed, ids, 5, 0, 6)) % np.maximum(n_spans, 1)

            # pre-generate WKT for up to 2 geoms per doc (vectorized centers)
            lon1, lat1 = _centers(seed, ids, 10)
            lon2, lat2 = _centers(seed, ids, 20)
            wkt1 = _gen_wkt(seed, ids * 2, lon1, lat1)
            wkt2 = _gen_wkt(seed, ids * 2 + 1, lon2, lat2)

            word_idx = _h(seed, ids, 6)
            media_id = _h(seed, ids, 7) % U64(10**9)

            doc_ids = [f"doc-{i:012d}" for i in ids]
            spans_col = []
            for r in range(n):
                spans = []
                ns = int(n_spans[r])
                for s in range(ns):
                    if has_geom[r] and s == int(geo_slot[r]):
                        spans.append(("geom", wkt1[r], "", s))
                    elif has_geom[r] and second_geo[r] and s == int(geo_slot2[r]):
                        spans.append(("geom", wkt2[r], "", s))
                    elif kind_u[r, s] < 0.7:
                        w0 = int(word_idx[r] >> U64(s * 4)) & 0xFF
                        text = " ".join(_WORDS[(w0 + j) % len(_WORDS)] for j in range(3 + (w0 + s) % 6))
                        spans.append(("text", text, "", s))
                    else:
                        spans.append(("media", "", f"s3://bucket/obj-{int(media_id[r]) + s}", s))
                spans_col.append(spans)
            yield pd.DataFrame({"doc_id": doc_ids, "spans": spans_col})

    base = spark.range(n_docs)
    if partitions:
        base = base.repartition(partitions)
    return base.mapInPandas(gen, schema=DOCUMENTS_SCHEMA)


# ---------------------------------------------------------------------------
# PIP polygons / kNN queries (FIXTURES.md §3-4)
# ---------------------------------------------------------------------------

POLYGONS_SCHEMA = "poly_id string, geom_wkt string"


def synthesize_polygons(spark: SparkSession, n_polys: int = 200, seed: int = 42) -> DataFrame:
    """PIP right side: mixed sizes, incl. a few giants over the hotspots
    (the deliberate skew case)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.int64)
            lon, lat = _centers(seed + 1, ids, 30)
            size_u = _uniform(seed + 1, ids, 31)
            nv = _randint(seed + 1, ids, 32, 6, 32)
            phase = _uniform(seed + 1, ids, 33) * 2 * np.pi
            rows = []
            for i in range(ids.shape[0]):
                gi = int(ids[i])
                if gi < len(HOTSPOTS):  # giants centered on each hotspot
                    cx, cy = HOTSPOTS[gi]
                    radius = 2.5
                elif size_u[i] < 0.2:
                    cx, cy, radius = float(lon[i]), float(lat[i]), 1.0  # country-ish
                elif size_u[i] < 0.6:
                    cx, cy, radius = float(lon[i]), float(lat[i]), 0.25  # city-ish
                else:
                    cx, cy, radius = float(lon[i]), float(lat[i]), 0.03  # tile-ish
                rings = [_ring_wkt(cx, cy, int(nv[i]), radius, float(phase[i]))]
                if size_u[i] > 0.8:
                    rings.append(_ring_wkt(cx, cy, max(4, int(nv[i]) // 2), radius / 4, float(phase[i]) + 0.5))
                rows.append((f"poly-{gi:06d}", "POLYGON (" + ", ".join(rings) + ")"))
            yield pd.DataFrame(rows, columns=["poly_id", "geom_wkt"])

    return spark.range(n_polys).mapInPandas(gen, schema=POLYGONS_SCHEMA)


def synthesize_knn_queries(spark: SparkSession, n_queries: int = 100, seed: int = 42) -> DataFrame:
    """Query points with k ∈ {1,5,50} — pure Spark expressions, no UDF."""
    ks = F.array(F.lit(1), F.lit(5), F.lit(50))
    df = spark.range(n_queries)
    u1 = F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(1)).cast("double"), F.lit(1e9)) / 1e9
    u2 = F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(2)).cast("double"), F.lit(1e9)) / 1e9
    return df.select(
        F.format_string("q-%06d", F.col("id")).alias("qid"),
        (F.lit(BBOX[0]) + u1 * F.lit(BBOX[2] - BBOX[0])).alias("lon"),
        (F.lit(BBOX[1]) + u2 * F.lit(BBOX[3] - BBOX[1])).alias("lat"),
        F.element_at(ks, (F.col("id") % 3 + 1).cast("int")).alias("k"),
    )


# ---------------------------------------------------------------------------
# raster tile pyramid (FIXTURES.md §5) — pure Spark expressions
# ---------------------------------------------------------------------------


def pyramid_ranges(max_z: int) -> list[tuple[int, int, int, int, int]]:
    """Inclusive tile ranges (z, x0, x1, y0, y1) of the bbox pyramid —
    shared by the synthesizer and by the DuckDB oracle SQL builder."""
    import math

    out = []
    for z in range(max_z + 1):
        n = 2**z
        x0 = int((BBOX[0] + 180.0) / 360.0 * n)
        x1 = int((BBOX[2] + 180.0) / 360.0 * n)

        def lat_y(lat: float) -> int:
            rad = math.radians(lat)
            y = int((1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.pi) / 2.0 * n)
            return max(0, min(y, n - 1))

        out.append((z, x0, x1, lat_y(BBOX[3]), lat_y(BBOX[1])))
    return out


def synthesize_raster_tiles(spark: SparkSession, max_z: int = 8, seed: int = 42) -> DataFrame:
    """Full pyramid z0..max_z restricted to the test bbox, with numeric
    quadkey ranges for the range join and hash-derived band stats."""
    parts = []
    for z, x0, x1, y0, y1 in pyramid_ranges(max_z):
        w = x1 - x0 + 1
        h = y1 - y0 + 1
        grid = (
            spark.range(w * h)
            .select(
                F.lit(z).alias("z"),
                (F.col("id") % w + x0).cast("int").alias("x"),
                (F.col("id") / w).cast("int").alias("y"),
            )
            .withColumn("y", (F.col("y") + y0).cast("int"))
        )
        parts.append(grid)
    tiles = parts[0]
    for p in parts[1:]:
        tiles = tiles.unionByName(p)
    qk_min_by_z = [TM.quadkey_range(F.col("x"), F.col("y"), z) for z in range(max_z + 1)]
    qk_min = F.lit(None).cast("long")
    qk_max = F.lit(None).cast("long")
    qks = F.lit(None).cast("string")
    for z in range(max_z, -1, -1):
        mn, mx = qk_min_by_z[z]
        qk_min = F.when(F.col("z") == z, mn).otherwise(qk_min)
        qk_max = F.when(F.col("z") == z, mx).otherwise(qk_max)
        qks = F.when(F.col("z") == z, TM.quadkey_str(F.col("x"), F.col("y"), z)).otherwise(qks)
    u = F.pmod(F.xxhash64("z", "x", "y", F.lit(seed)).cast("double"), F.lit(1e6)) / 1e6
    return tiles.select(
        "z",
        "x",
        "y",
        qks.alias("quadkey"),
        qk_min.alias("qk_min"),
        qk_max.alias("qk_max"),
        F.struct(
            (u * 10).alias("min"), (u * 10 + 50).alias("max"), (u * 10 + 25).alias("mean")
        ).alias("band_stats"),
    )
