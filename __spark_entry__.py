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
    from maplibre_tile_spec_spark.operators import features as FE
    from maplibre_tile_spec_spark.operators import tiler
    from maplibre_tile_spec_spark.sources import synth

    # interleaved documents (mandated input shape) → geometry features →
    # real MLT tiles via groupBy(x,y).applyInPandas
    docs = synth.synthesize_documents(spark, 2000, seed=42)
    feats = FE.extract_features(docs)
    tiles = tiler.encode_tiles(feats, zoom=8).select(
        "z", "x", "y", "n_features", "n_vertices", "byte_size"
    )
    # spatial join leg on the testdata-derived points
    pip = Q.q_pip_join(spark, SF0001)
    pip_counts = pip.groupBy().agg(F.count("*").alias("pip_total"))
    return tiles.crossJoin(F.broadcast(pip_counts))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from maplibre_tile_spec_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from maplibre_tile_spec_spark.queries import ORACLES

    return dict(ORACLES)
