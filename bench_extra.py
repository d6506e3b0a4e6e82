#!/usr/bin/env python
"""Extra benchmarks + plan capture for the optimization round (bench.py is
frozen for measurement; everything exploratory lives here).

Modes:
  --plans [names...]       write .explain("formatted") for each query to
                           plans/r07/<name>_<tag>.txt (--tag before|after)
  --phases dedup_incremental   per-phase wall times for the incremental
                           dedup cell (bootstrap vs batch vs output)
  --noop names             noop-sink best-of-3 timing of named queries
                           (same methodology as bench.py cells)
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def _session():
    from maplibre_tile_spec_spark.session import get_spark

    return get_spark(
        master=f"local[{CPUS}]", shuffle_partitions=CPUS, app_name="bench-extra"
    )


def capture_plans(names: list[str], tag: str, out_dir: str = "plans/r07") -> None:
    from maplibre_tile_spec_spark.queries import QUERIES

    spark = _session()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"plan:{name}")
        df = QUERIES[name](spark, SF_DIR)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(_explain_str(df))
        print(f"wrote {path}")
        spark.catalog.clearCache()
    spark.stop()


def time_noop(names: list[str], reps: int = 3) -> None:
    from maplibre_tile_spec_spark.queries import QUERIES

    spark = _session()
    # warmup: python workers + codegen + page cache
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").count()
    _force(QUERIES["minhash_lsh_pairs"](spark, SF_DIR))
    spark.catalog.clearCache()
    for name in names:
        runs = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t0 = time.perf_counter()
            _force(QUERIES[name](spark, SF_DIR))
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        print(f"{name}: min={min(runs)} runs={runs}")
    spark.stop()


def phases_dedup_incremental() -> None:
    """Wall time of each phase of the dedup_incremental cell, mirroring
    queries.q_dedup_incremental step by step."""
    from pyspark.sql import functions as F

    from maplibre_tile_spec_spark.operators import dedup
    from maplibre_tile_spec_spark.operators import dedup_incremental as DI
    from maplibre_tile_spec_spark.queries import QUERIES
    from maplibre_tile_spec_spark.sources import tables

    spark = _session()
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").count()
    _force(QUERIES["minhash_lsh_pairs"](spark, SF_DIR))
    spark.catalog.clearCache()

    marks: list[tuple[str, float]] = []

    def mark(label):
        marks.append((label, time.perf_counter()))

    mark("start")
    d = tables.load(spark, SF_DIR, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    old_docs = d.filter(F.col("doc_id") % 5 != 0)
    new_docs = d.filter(F.col("doc_id") % 5 == 0)
    store_table = DI.ensure_store_table(spark, SF_DIR.rstrip("/").split("/")[-1])
    mark("setup")
    bands_old = DI.minhash_band_table(old_docs).persist()
    DI.write_band_store(bands_old, store_table)
    mark("write_band_store")
    old_pairs = dedup.pairs_from_bands(bands_old).persist()
    old_pairs.count()
    bands_old.unpersist()
    mark("pairs_from_bands(old)")
    cluster_map = (
        dedup.cluster_assign(old_docs.select("doc_id"), old_pairs)
        .select(F.col("doc_id").alias("id"), "cluster_id")
        .persist()
    )
    cluster_map.count()
    old_pairs.unpersist()
    mark("cluster_assign(old)")
    res = DI.lsh_dedup_incremental(new_docs, spark.table(store_table), cluster_map)
    mark("lsh_dedup_incremental(new)")
    updated = DI.updated_assignment(cluster_map, res)
    out = updated.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"), F.max("id").alias("member_max")
    )
    out = out.persist()
    out.count()
    for df in (cluster_map, res.new_assign, res.remap, res.new_bands):
        df.unpersist()
    mark("updated+agg")
    _force(out)
    mark("noop_force")
    prev = marks[0][1]
    for label, t in marks[1:]:
        print(f"{label}: {t - prev:.3f}s")
        prev = t
    print(f"TOTAL: {marks[-1][1] - marks[0][1]:.3f}s")
    spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", nargs="*", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--noop", nargs="*", default=None)
    ap.add_argument("--phases", default=None)
    args = ap.parse_args()
    if args.plans is not None:
        from maplibre_tile_spec_spark.queries import QUERIES

        names = args.plans or list(QUERIES)
        capture_plans(names, args.tag)
    elif args.noop is not None:
        time_noop(args.noop)
    elif args.phases == "dedup_incremental":
        phases_dedup_incremental()
    else:
        ap.print_help()
