"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``maplibre_tile_spec_spark`` — see SURVEY.md §2 for
the operator inventory each query exercises.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved documents → geometry features → tile assignment
    → per-tile aggregates, joined with the point-in-polygon result — the
    end-to-end spatial-join + tiling pipeline of BASELINE.json, driven from
    the sf0.001 testdata (points derived from events.parquet) plus the
    deterministic interleaved documents table.
    """
    from pyspark.sql import functions as F

    from maplibre_tile_spec_spark import queries as Q
    from maplibre_tile_spec_spark.functions import tilemath as TM
    from maplibre_tile_spec_spark.operators import features as FE
    from maplibre_tile_spec_spark.operators import spatial as S
    from maplibre_tile_spec_spark.sources import synth

    # interleaved documents (mandated input shape) → geometry features
    docs = synth.synthesize_documents(spark, 2000, seed=42)
    feats = FE.extract_features(docs)
    z = 10
    tiled = feats.select(
        TM.lon_to_tile_x(F.col("rep_lon"), z).alias("x"),
        TM.lat_to_tile_y(F.col("rep_lat"), z).alias("y"),
        "geom_type",
    )
    tile_summary = tiled.groupBy("x", "y").agg(
        F.count("*").alias("n_features"),
        F.countDistinct("geom_type").alias("n_geom_types"),
    )
    # spatial join leg on the testdata-derived points
    pip = Q.q_pip_join(spark, SF0001)
    pip_counts = pip.groupBy("poly_id").agg(F.count("*").alias("n_points_inside"))
    return tile_summary.crossJoin(F.broadcast(pip_counts.agg(F.sum("n_points_inside").alias("pip_total"))))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from maplibre_tile_spec_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from maplibre_tile_spec_spark.queries import ORACLES

    return dict(ORACLES)
