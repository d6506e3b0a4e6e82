"""Per-document span-sequence invariant (BASELINE.json input_hint).

Every engine transformation must preserve, per document, the exact sequence
of (kind, text, media_ref, order). This is the Spark analog of the
reference's round-trip equality oracle (java/mlt-cli/.../Encode.java:1000-1150,
TestUtils.java:97-233): a full-outer join on the key plus assertion columns.

Implemented as a declarative anti-join — array<struct> equality is a native
Catalyst comparison, so the check is a broadcast/sort-merge join with zero
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_spans(df: DataFrame) -> DataFrame:
    """Project (doc_id, spans ordered by offset, kind/text/media_ref only)."""
    ordered = F.array_sort(
        F.transform(
            "spans",
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )
    return df.select(F.col("doc_id"), ordered.alias("_spans_canon"))


def span_sequence_violations(before: DataFrame, after: DataFrame) -> DataFrame:
    """Documents whose span sequence changed (or appeared/disappeared).

    Returns an empty DataFrame iff the invariant holds. Cost: one join on
    doc_id; at scale this is a co-partitioned sort-merge join — no row-level
    Python, the struct-array comparison runs in codegen.
    """
    b = _canonical_spans(before).alias("b")
    a = _canonical_spans(after).alias("a")
    joined = b.join(a, "doc_id", "full_outer")
    bad = joined.filter(
        F.col("b._spans_canon").isNull()
        | F.col("a._spans_canon").isNull()
        | (F.col("b._spans_canon") != F.col("a._spans_canon"))
    )
    return bad.select("doc_id")


def assert_span_sequence_equal(before: DataFrame, after: DataFrame) -> None:
    n = span_sequence_violations(before, after).count()
    if n:
        raise AssertionError(f"span-sequence invariant violated for {n} documents")
