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
