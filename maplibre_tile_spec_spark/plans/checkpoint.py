"""Resumable batched execution with per-partition lineage + metrics.

The north rule requires runs that are "resumable from per-partition
checkpoints recording lineage (input snapshot-id, partition range, tile
batch) plus rows/sec metrics". The reference has no such machinery (single
process, one tile at a time); at 10^12 documents a multi-hour job must
survive pre-emption.

Design: the tile-key space is split into ``n_batches`` deterministic hash
buckets. Each batch is one Spark job writing an independent parquet
directory; on success one JSON line is appended to ``manifest.jsonl`` with
the batch id, input snapshot id, partition range, output stats, and
throughput. Resume = skip batches already in the manifest. Writes are
idempotent (mode=overwrite per batch directory), so a batch interrupted
mid-write is simply re-run.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class BatchRecord:
    batch: int
    n_batches: int
    snapshot_id: str
    rows_in: int
    rows_out: int
    elapsed_sec: float
    rows_per_sec: float
    status: str = "committed"


class CheckpointedRun:
    """Drive a DataFrame-producing function over hash-bucketed batches.

    Lineage metrics (rows_in/rows_out) ride ``observe()`` on the single
    write action, so they are free — but Observation metrics accumulate per
    *execution of the observed subtree*. The ``transform`` callable must
    therefore scan its input once within the write (the normal case); a
    transform whose plan references the batch multiple times without caching
    (e.g. an uncached self-join) would multiply the recorded counts. Cache
    the input inside such a transform, or treat rows_in as scans×rows."""

    def __init__(self, output_path: str, n_batches: int = 8):
        self.output_path = output_path
        self.n_batches = n_batches
        self.manifest_path = os.path.join(output_path, "manifest.jsonl")

    # -- manifest ----------------------------------------------------------
    def completed_batches(self) -> set[int]:
        done = set()
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec.get("status") == "committed":
                        done.add(rec["batch"])
        return done

    def _append(self, rec: BatchRecord) -> None:
        os.makedirs(self.output_path, exist_ok=True)
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(rec.__dict__) + "\n")

    # -- execution ----------------------------------------------------------
    def run(
        self,
        source: DataFrame,
        transform,
        batch_key,
        snapshot_id: str,
        fail_after: int | None = None,
    ) -> list[BatchRecord]:
        """Process every not-yet-committed batch.

        source     — input DataFrame
        transform  — fn(batch_df) -> output DataFrame
        batch_key  — Column assigning each input row a bucket in [0, n_batches)
        snapshot_id— lineage tag of the input (e.g. parquet mtime digest /
                     Iceberg snapshot id when available)
        fail_after — testing hook: raise after N batches (simulates pre-emption)
        """
        done = self.completed_batches()
        records = []
        processed = 0
        tagged = source.withColumn("_batch", batch_key)
        for b in range(self.n_batches):
            if b in done:
                continue
            if fail_after is not None and processed >= fail_after:
                raise RuntimeError(f"simulated failure after {processed} batches")
            t0 = time.perf_counter()
            # observe() rides the write job itself: rows_in/rows_out come
            # from the single action, with no re-execution of the source
            # scan or the transform (which could diverge if nondeterministic)
            obs_in, obs_out = Observation(), Observation()
            batch_df = (
                tagged.filter(F.col("_batch") == b)
                .drop("_batch")
                .observe(obs_in, F.count(F.lit(1)).alias("n"))
            )
            out = transform(batch_df).observe(obs_out, F.count(F.lit(1)).alias("n"))
            out_path = os.path.join(self.output_path, f"batch={b}")
            out.write.mode("overwrite").parquet(out_path)
            elapsed = time.perf_counter() - t0
            rows_in = int(obs_in.get["n"])
            rows_out = int(obs_out.get["n"])
            rec = BatchRecord(
                batch=b,
                n_batches=self.n_batches,
                snapshot_id=snapshot_id,
                rows_in=rows_in,
                rows_out=rows_out,
                elapsed_sec=round(elapsed, 3),
                rows_per_sec=round(rows_in / elapsed, 1) if elapsed > 0 else 0.0,
            )
            self._append(rec)
            records.append(rec)
            processed += 1
        return records

    def read_output(self, spark) -> DataFrame:
        return spark.read.parquet(os.path.join(self.output_path, "batch=*"))


def snapshot_id_for_parquet(path: str) -> str:
    """Poor-man's snapshot id for plain parquet inputs: digest of file names,
    sizes, and mtimes (Iceberg snapshot ids replace this when available)."""
    import hashlib

    h = hashlib.md5()
    for root, _dirs, files in sorted(os.walk(path)):
        for fn in sorted(files):
            st = os.stat(os.path.join(root, fn))
            h.update(f"{fn}:{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()[:16]
