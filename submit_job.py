#!/usr/bin/env python
"""Cluster entry point: ``spark-submit --py-files mlt_spark.zip submit_job.py …``

Runs the end-to-end pipeline (documents → features → MLT tiles → PIP join)
with checkpointed, resumable batches and a lineage manifest, per the north
rule. On a cluster, point ``--input`` at ``iceberg:<table>``; in the
sandbox, at a parquet path (the synthesizer's output).

Example:
    python -c "from maplibre_tile_spec_spark ..."   # synthesize input first
    spark-submit --master local[8] --py-files mlt_spark.zip \\
        submit_job.py --input /tmp/docs --output /tmp/tiles --zoom 8
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path or iceberg:<table>")
    ap.add_argument("--output", required=True)
    ap.add_argument("--zoom", type=int, default=8)
    ap.add_argument(
        "--n-salt",
        default="auto",
        type=lambda s: s if s == "auto" else int(s),
        help="hot-tile fan-out: 'auto' (per-tile counts) or a fixed integer",
    )
    ap.add_argument("--n-batches", type=int, default=8)
    ap.add_argument("--synthesize", type=int, default=0, help="generate N docs into --input first")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("mlt-spark-tiling").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from maplibre_tile_spec_spark.operators import features as FE
    from maplibre_tile_spec_spark.operators import tiler
    from maplibre_tile_spec_spark.plans.checkpoint import CheckpointedRun
    from maplibre_tile_spec_spark.sources.iceberg import load_documents

    if args.synthesize:
        from maplibre_tile_spec_spark.sources.synth import synthesize_documents

        synthesize_documents(spark, args.synthesize, seed=42).write.mode("overwrite").parquet(args.input)

    docs, snapshot_id = load_documents(spark, args.input)
    feats = FE.extract_features(docs)

    run = CheckpointedRun(args.output, n_batches=args.n_batches)
    batch_key = F.pmod(F.xxhash64("doc_id"), F.lit(args.n_batches)).cast("int")
    records = run.run(
        feats,
        lambda batch: tiler.encode_tiles(batch, zoom=args.zoom, n_salt=args.n_salt),
        batch_key,
        snapshot_id,
    )
    total = run.read_output(spark).agg(
        F.count("*").alias("n_tiles"), F.sum("n_features").alias("n_features")
    ).first()
    print(
        json.dumps(
            {
                "snapshot_id": snapshot_id,
                "batches_run": len(records),
                "n_tiles": int(total.n_tiles),
                "n_features": int(total.n_features),
                "manifest": run.manifest_path,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
