#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

--scaling mode: runs the end-to-end documents pipeline at two parallelism
levels (local[8] vs local[32]) in separate JVMs on identical input and
reports throughput at both plus scaling efficiency (the sandbox proxy for
the north rule's N vs 4N executor criterion).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_DOCS", "100000"))

HEADLINE = [
    "tile_assign",
    "tile_pyramid_rollup",
    "pip_join",
    "knn_join",
    "quadkey_pyramid_join",
    "zigzag_delta_stream",
    "tpch_q1",
    "revenue_by_nation",
    "top_orders_per_customer",
    "dedup_exact",
    "text_stats",
    "cosine_topk",
    "sessionize_events",
]


def _force(df) -> int:
    """Materialize every column (noop sink defeats count-only pruning)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_docs_pipeline(spark, n_docs: int) -> dict:
    """End-to-end interleaved-documents pipeline: synthesize → extract
    features → tile-assign (z12) → per-tile aggregate. Returns throughput."""
    from pyspark.sql import functions as F

    from maplibre_tile_spec_spark.functions import tilemath as TM
    from maplibre_tile_spec_spark.operators import features as FE
    from maplibre_tile_spec_spark.sources import synth

    t0 = time.perf_counter()
    docs = synth.synthesize_documents(spark, n_docs, seed=42, partitions=CPUS * 2)
    feats = FE.extract_features(docs)
    z = 12
    tiles = (
        feats.select(
            TM.lon_to_tile_x(F.col("rep_lon"), z).alias("x"),
            TM.lat_to_tile_y(F.col("rep_lat"), z).alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count("*").alias("n"))
    )
    n_tiles = tiles.count()
    elapsed = time.perf_counter() - t0
    return {
        "elapsed_sec": round(elapsed, 3),
        "n_docs": n_docs,
        "n_tiles": n_tiles,
        "docs_per_sec": round(n_docs / elapsed, 1),
        "tiles_per_sec": round(n_tiles / elapsed, 1),
    }


def run_bench(cpus: int, sf_dir: str, scaling_only: bool = False) -> dict:
    from maplibre_tile_spec_spark.queries import QUERIES
    from maplibre_tile_spec_spark.session import get_spark

    from pyspark.sql import functions as F

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus, app_name=f"bench-{cpus}")
    # warmup: JVM codegen, parquet reader, shuffle, and Python/Arrow workers
    spark.range(100_000).groupBy(F.col("id") % 7).count().collect()
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").count()

    pipeline = run_docs_pipeline(spark, N_DOCS)
    timings: dict[str, float] = {"docs_pipeline": pipeline["elapsed_sec"]}
    if not scaling_only:
        for name in HEADLINE:
            t0 = time.perf_counter()
            _force(QUERIES[name](spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
    spark.stop()
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    return {
        "metric": "e2e_headline_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "cpus": cpus,
        "docs_pipeline": pipeline,
    }


def run_scaling() -> dict:
    """Same job, two parallelism levels, separate JVMs → scaling efficiency."""
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpus", str(cpus), "--scaling-child"],
            capture_output=True,
            text=True,
            check=True,
        )
        line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t8 = results[8]["docs_pipeline"]["docs_per_sec"]
    t32 = results[32]["docs_pipeline"]["docs_per_sec"]
    eff = (t32 / t8) / (32 / 8)
    return {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "throughput_docs_per_sec": {"local[8]": t8, "local[32]": t32},
        "n_docs": N_DOCS,
        "note": "sandbox proxy for N vs 4N executors (north rule >= 0.8)",
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=CPUS)
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-child", action="store_true")
    args = ap.parse_args()
    if args.scaling:
        print(json.dumps(run_scaling()))
    elif args.scaling_child:
        print(json.dumps(run_bench(args.cpus, args.sf_dir, scaling_only=True)))
    else:
        print(json.dumps(run_bench(args.cpus, args.sf_dir)))
