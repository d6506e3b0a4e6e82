"""Structured Streaming variants of the engine's core operators.

The reference is strictly batch (SURVEY.md §2.11: no watermarks or stateful
operators anywhere), but a production ingest of 10^12 documents arrives as
a stream; these wrap the same column expressions used by the batch
operators in ``readStream`` plans:

* ``streaming_tile_counts``  — windowed per-tile feature counts with a
  watermark for late events
* ``streaming_sessionize``   — session_window aggregation per user
* ``streaming_quality``      — stateless per-document quality scoring

All are testable synchronously with the memory sink +
``processAllAvailable`` (no external broker needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from maplibre_tile_spec_spark.functions import tilemath as TM


def streaming_tile_counts(
    events_stream: DataFrame,
    zoom: int = 10,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream of (ts, lon, lat) → watermarked windowed per-tile counts.

    The tile assignment is the identical Catalyst expression as the batch
    path — streaming and batch share one implementation.
    """
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("w"),
            TM.lon_to_tile_x(F.col("lon"), zoom).alias("x"),
            TM.lat_to_tile_y(F.col("lat"), zoom).alias("y"),
        )
        .agg(F.count("*").alias("n_points"))
        .select(F.col("w.start").alias("window_start"), "x", "y", "n_points")
    )


def streaming_sessionize(
    events_stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (native session_window state operator)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def streaming_quality(docs_stream: DataFrame) -> DataFrame:
    """Stateless quality scoring on a document stream — reuses the batch
    operator's expressions verbatim."""
    from maplibre_tile_spec_spark.operators.text import quality_score

    return quality_score(docs_stream)


def streaming_running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-user event counts and value sums maintained across micro-batches —
    the pattern for any accumulator the built-in aggregations can't express
    (e.g. per-key MLT stream encoders over an infinite ingest)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [v]})

    return events_stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, v double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming plan synchronously into an in-memory table; returns
    the started query (caller stops it). For tests and local verification."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    return q


def streaming_encode_tiles(
    features_stream: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    zoom: int = 7,
    salt_target: int = 20_000,
):
    """Streaming MLT tile assembly: a features stream drives the SAME batch
    ``encode_tiles`` kernel through ``foreachBatch`` — each micro-batch
    becomes one idempotent parquet write of fully-encoded tiles (z, x, y,
    n_features, n_vertices, byte_size, tile, batch_id). ``foreachBatch``
    replay is at-least-once, so the sink is made idempotent per batch:
    the write is ``partitionBy("batch_id")`` with dynamic partition
    overwrite, so a replayed batch (failure between parquet commit and
    streaming-checkpoint commit) **overwrites its own partition** instead
    of appending a duplicate — downstream sums see each batch exactly
    once. The per-batch tile tables are unioned downstream by the
    pyramid/merge operators exactly like salted parts. Returns the started
    StreamingQuery."""
    from maplibre_tile_spec_spark.operators import tiler

    def process(batch_df: DataFrame, batch_id: int):
        out = tiler.encode_tiles(batch_df, zoom=zoom, n_salt="auto", salt_target=salt_target)
        (
            out.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(sink_path)
        )

    return (
        features_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def streaming_dedup_incremental(
    docs_stream: DataFrame,
    band_store_table: str,
    state_dir: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    **lsh_kw,
):
    """Streaming ingest dedup: each micro-batch of documents is
    deduplicated against the standing corpus via ``foreachBatch`` over the
    SAME batch :func:`~maplibre_tile_spec_spark.operators.dedup_incremental.
    lsh_dedup_incremental` kernel — the streaming twin of the incremental
    pipeline, completing the 100-TB ingest story (no corpus rescan, ever).

    Standing state:

    * ``band_store_table`` — the bucketed-by-(band, sig) band table; must
      be bootstrapped once with ``write_band_store`` (an empty band frame
      is a valid bootstrap). Each batch appends its delta bands.
    * ``state_dir/map_v{batch_id}`` — versioned cluster-map snapshots
      (``id``, ``cluster_id``); ``state_dir/MANIFEST.json`` records the
      current version and the processed batch ids. The map is assignment-
      sized (two longs per document), never document-sized; a table format
      with row-level MERGE (Iceberg/Delta) would make the update
      delta-sized as well — with plain parquet the snapshot rewrite is the
      honest cost, and it also sidesteps Spark's cannot-overwrite-a-table-
      being-read rule.
    * ``state_dir/assign_{batch_id}`` — each batch's own assignments (the
      per-batch output stream).

    Idempotency under at-least-once ``foreachBatch`` replay: the manifest
    is committed LAST (atomic rename), so a replayed batch whose manifest
    entry exists is skipped outright. A crash between the band-store
    append and the manifest commit can double-append a batch's band rows
    on replay; duplicate band rows are correctness-neutral (the probe join
    de-duplicates candidate pairs) and cost only their storage. The map
    snapshot is keyed by batch id, so its rewrite is naturally idempotent.

    **Single-writer assumption**: MANIFEST.json is read-modify-written
    without locking, so exactly one query may own a ``state_dir`` at a
    time — give each query its own ``state_dir`` (e.g. derive it from the
    checkpoint location). Two concurrent writers (an operator restart
    racing a zombie run) could lose processed-batch entries.

    Returns the started StreamingQuery."""
    import json
    import os

    from maplibre_tile_spec_spark.operators import dedup_incremental as DI

    manifest_path = os.path.join(state_dir, "MANIFEST.json")

    def _read_manifest() -> dict:
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                return json.load(f)
        return {"processed": [], "current_map": None}

    def process(batch_df: DataFrame, batch_id: int):
        man = _read_manifest()
        if batch_id in man["processed"]:
            return  # replayed batch: fully committed already
        spark = batch_df.sparkSession
        if man["current_map"] is None:
            cluster_map = spark.createDataFrame([], "id long, cluster_id long")
        else:
            cluster_map = spark.read.parquet(
                os.path.join(state_dir, man["current_map"])
            )
        # prior batches appended files under the same table: drop the
        # cached file listing before re-reading
        spark.catalog.refreshTable(band_store_table)
        band_store = spark.table(band_store_table)
        res = DI.lsh_dedup_incremental(
            batch_df, band_store, cluster_map, text_col=text_col, id_col=id_col, **lsh_kw
        )
        updated = DI.updated_assignment(cluster_map, res)
        map_name = f"map_v{batch_id}"
        updated.write.mode("overwrite").parquet(os.path.join(state_dir, map_name))
        res.new_assign.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"assign_{batch_id}")
        )
        DI.write_band_store(res.new_bands, band_store_table, mode="append")
        res.new_bands.unpersist()
        res.new_assign.unpersist()
        res.remap.unpersist()
        man["processed"].append(batch_id)
        man["current_map"] = map_name
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, manifest_path)  # commit point

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
