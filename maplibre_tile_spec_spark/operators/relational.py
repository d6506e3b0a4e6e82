"""Relational operators Spark lacks natively, composed from DataFrame ops.

* ``as_of_join`` — for each left row, the most recent right row with the
  same key and ts ≤ left ts. Implemented as union + windowed
  last-value-carry-forward: one shuffle on (key, ts), no per-group Python,
  no broadcast requirement — the classic scalable formulation (a lateral
  join would nested-loop; ``merge_asof`` per group would need Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """left ⟕ most-recent right (right_ts ≤ left_ts) per key.

    Returns left's columns plus ``right_cols`` (null when no prior right
    row exists). Deterministic: ties on timestamp resolve to the right row
    (sides ordered right-before-left at equal ts), multiple right rows at
    the same ts resolve to the last by ``right_cols`` order.
    """
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rt = (
        right.select(key, right_ts, *right_cols)
        .withColumn("_side", F.lit(0))
        .withColumn("_ts", F.col(right_ts))
    )
    # align schemas
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    for c in right_cols + [right_ts]:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
    cols = list(dict.fromkeys(left.columns + [right_ts] + right_cols + ["_side", "_ts"]))
    u = lt.select(*cols).unionByName(rt.select(*cols))
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w).alias(f"_r_{c}") for c in right_cols]
    out = u.select(*u.columns, *carried).filter(F.col("_side") == 1)
    return out.select(
        *left.columns, *[F.col(f"_r_{c}").alias(c) for c in right_cols]
    )
