"""documents → feature extraction (the engine's scan-side operator).

Explodes ``geom`` spans out of the interleaved documents table with pure
Catalyst expressions (so span-kind filtering and column pruning push down),
then parses WKT inside one Arrow-batched ``mapInPandas`` — the only Python
step, and it is per-batch, not per-row. Mirrors the reference's
MVT-decode → Feature step (java/.../converter/mvt/MvtUtils.java:19-83) but
distributed: the unit of parallelism is an Arrow batch, not a tile.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from maplibre_tile_spec_spark.functions import wkt as W

FEATURES_SCHEMA = (
    "doc_id string, span_offset int, wkt string, geom_type int, "
    "rep_lon double, rep_lat double, "
    "lon_min double, lat_min double, lon_max double, lat_max double"
)


def extract_geom_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, span_offset, wkt) — declarative explode+filter, no Python."""
    s = F.explode("spans").alias("s")
    return (
        docs.select("doc_id", s)
        .filter(F.col("s.kind") == "geom")
        .select("doc_id", F.col("s.offset").alias("span_offset"), F.col("s.text").alias("wkt"))
    )


def extract_features(docs: DataFrame) -> DataFrame:
    """Parse WKT → typed features with representative point + bbox."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            gts, rlon, rlat, x0s, y0s, x1s, y1s = [], [], [], [], [], [], []
            for wkt in pdf["wkt"]:
                gt, coords, _ = W.parse_wkt(wkt)
                gts.append(gt)
                rlon.append(float(coords[0, 0]))
                rlat.append(float(coords[0, 1]))
                x0s.append(float(coords[:, 0].min()))
                y0s.append(float(coords[:, 1].min()))
                x1s.append(float(coords[:, 0].max()))
                y1s.append(float(coords[:, 1].max()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "span_offset": pdf["span_offset"].astype("int32"),
                    "wkt": pdf["wkt"],
                    "geom_type": pd.Series(gts, dtype="int32"),
                    "rep_lon": rlon,
                    "rep_lat": rlat,
                    "lon_min": x0s,
                    "lat_min": y0s,
                    "lon_max": x1s,
                    "lat_max": y1s,
                }
            )

    return extract_geom_spans(docs).mapInPandas(parse, schema=FEATURES_SCHEMA)
