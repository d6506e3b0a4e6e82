"""Driver-style oracle parity: every registry query vs its DuckDB SQL twin.

Mimics the driver's CORRECTNESS gate — row count, column-name set, and an
order-insensitive exact value comparison — at sf0.001 so mismatches are
caught before the driver runs at sf0.01.
"""

import os

import duckdb
import pandas as pd
import pytest

from maplibre_tile_spec_spark.queries import ORACLES, QUERIES
from maplibre_tile_spec_spark.sources.tables import TABLES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]) or df[c].dtype == object and all(
            isinstance(v, int) for v in df[c].dropna().head(5)
        ):
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError, OverflowError):
                pass
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    got = _normalize(QUERIES[name](spark, sf_dir).toPandas())
    exp = _normalize(duck.execute(ORACLES[name]).df())
    assert list(got.columns) == list(exp.columns), f"{name}: column mismatch"
    assert len(got) == len(exp), f"{name}: row count {len(got)} != {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


def test_registry_is_consistent():
    assert set(ORACLES) <= set(QUERIES)
