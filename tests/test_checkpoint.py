"""Resumable checkpointed runs: failure mid-run + resume = single-shot result."""

import json
import os

import pytest
from pyspark.sql import functions as F

from maplibre_tile_spec_spark.plans.checkpoint import CheckpointedRun, snapshot_id_for_parquet
from maplibre_tile_spec_spark.sources import tables


def _transform(df):
    return df.groupBy("event_type").agg(F.count("*").alias("n"), F.sum("value").alias("v"))


class TestCheckpointedRun:
    def test_failure_then_resume_equals_single_shot(self, spark, sf_dir, tmp_path):
        ev = tables.load(spark, sf_dir, "events")
        key = F.pmod(F.col("event_id"), F.lit(4)).cast("int")
        snap = snapshot_id_for_parquet(os.path.join(sf_dir, "events.parquet"))

        # single-shot reference
        ref_run = CheckpointedRun(str(tmp_path / "ref"), n_batches=4)
        ref_run.run(ev, _transform, key, snap)
        ref = {
            (r.event_type, r.n, round(r.v, 6))
            for r in ref_run.read_output(spark).collect()
        }

        # interrupted run
        run = CheckpointedRun(str(tmp_path / "out"), n_batches=4)
        with pytest.raises(RuntimeError, match="simulated failure"):
            run.run(ev, _transform, key, snap, fail_after=2)
        assert len(run.completed_batches()) == 2

        # resume completes only the remaining batches
        recs = run.run(ev, _transform, key, snap)
        assert len(recs) == 2
        assert run.completed_batches() == {0, 1, 2, 3}
        got = {
            (r.event_type, r.n, round(r.v, 6))
            for r in run.read_output(spark).collect()
        }
        assert got == ref

        # manifest carries lineage + throughput
        with open(run.manifest_path) as f:
            lines = [json.loads(line) for line in f]
        assert all(rec["snapshot_id"] == snap for rec in lines)
        assert all(rec["rows_per_sec"] > 0 for rec in lines)
        assert {rec["batch"] for rec in lines} == {0, 1, 2, 3}

    def test_noop_when_all_committed(self, spark, sf_dir, tmp_path):
        ev = tables.load(spark, sf_dir, "events")
        key = F.pmod(F.col("event_id"), F.lit(2)).cast("int")
        run = CheckpointedRun(str(tmp_path / "o2"), n_batches=2)
        run.run(ev, _transform, key, "snap")
        assert run.run(ev, _transform, key, "snap") == []
