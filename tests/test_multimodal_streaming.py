"""Multimodal column plumbing + structured-streaming operators."""

import os
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from maplibre_tile_spec_spark.operators import multimodal as MM
from maplibre_tile_spec_spark.sources import synth, tables
from maplibre_tile_spec_spark.streaming import stream_ops


@pytest.fixture(scope="module")
def media(spark):
    docs = synth.synthesize_documents(spark, 300, seed=42)
    refs = MM.extract_media_refs(docs).cache()
    return refs, MM.synthesize_media(spark, refs).cache()


class TestMultimodal:
    def test_media_schema_and_determinism(self, spark, media):
        refs, m = media
        assert m.count() == refs.select("media_ref").distinct().count()
        r = m.first()
        assert r.payload[:4] == b"MMX1"
        assert r.kind in ("image", "audio", "video")
        # determinism across partitioning
        m2 = MM.synthesize_media(spark, refs.repartition(5))
        a = {(r.media_ref, bytes(r.payload)) for r in m.collect()}
        b = {(r.media_ref, bytes(r.payload)) for r in m2.collect()}
        assert a == b

    def test_features(self, media):
        _, m = media
        f = MM.media_features(m)
        rows = f.collect()
        assert len(rows) == m.count()
        assert all(r.n_bytes > 15 and 0 <= r.mean_byte <= 255 for r in rows)

    def test_resize_and_frames(self, media):
        _, m = media
        rz = MM.resize_images(m, target=8).collect()
        assert all(len(bytes(r.pixels)) == 64 for r in rz)
        n_images = m.filter(F.col("kind") == "image").count()
        assert len(rz) == n_images
        fr = MM.sample_frames(m, every_n=5)
        vids = {r.media_ref: r.n_frames for r in m.filter(F.col("kind") == "video").collect()}
        per_vid = {r.media_ref: c for r, c in [(r, r["count"]) for r in fr.groupBy("media_ref").count().collect()]}
        for ref, n_frames in vids.items():
            assert per_vid[ref] == (n_frames - 1) // 5 + 1

    def test_real_format_stub_raises(self):
        # MP3/MP4 headers now decode for real — metadata-less blobs are
        # loud ValueErrors (no moov box / no audio frames), not silent gates
        with pytest.raises(ValueError, match="moov"):
            MM._parse_header(bytes(4) + b"ftypisom" + bytes(24))
        with pytest.raises(ValueError):
            MM._parse_header(b"ID3\x03\x00" + bytes(32))


class TestStreaming:
    def test_streaming_tile_counts_matches_batch(self, spark, sf_dir, tmp_path):
        # stream the events parquet through readStream and compare to batch
        # (file stream sources require a directory, so stage the file)
        import shutil

        stage = tmp_path / "events_stream"
        stage.mkdir()
        shutil.copy(os.path.join(sf_dir, "events.parquet"), stage / "events.parquet")
        ev_path = str(stage)
        schema = spark.read.parquet(ev_path).schema
        pts = lambda df: df.select(  # noqa: E731
            F.col("ts").cast("timestamp").alias("ts"),  # NTZ → TZ for watermark
            (F.lit(-125.0) + (F.col("event_id") * 2654435761 % 1000000) / 1000000.0 * 59.0).alias("lon"),
            (F.lit(24.0) + ((F.col("event_id") * 40503 + 7) % 1000000) / 1000000.0 * 25.0).alias("lat"),
        )
        stream = spark.readStream.schema(schema).parquet(ev_path)
        out = stream_ops.streaming_tile_counts(pts(stream), zoom=8, window="1 day")
        # complete mode: append would withhold windows the watermark hasn't
        # closed (the last day of data), which is correct streaming behavior
        # but makes the batch comparison awkward
        q = stream_ops.run_stream_to_memory(out, "tiles_stream", output_mode="complete")
        try:
            got = {
                (r.window_start, r.x, r.y): r.n_points
                for r in spark.sql("SELECT * FROM tiles_stream").collect()
            }
        finally:
            q.stop()
        batch = (
            pts(spark.read.parquet(ev_path))
            .groupBy(
                F.window("ts", "1 day").alias("w"),
                synth.TM.lon_to_tile_x(F.col("lon"), 8).alias("x"),
                synth.TM.lat_to_tile_y(F.col("lat"), 8).alias("y"),
            )
            .agg(F.count("*").alias("n"))
        )
        expected = {(r["w"].start, r.x, r.y): r.n for r in batch.collect()}
        assert got == expected
        assert len(got) > 10

    def test_streaming_sessionize(self, spark, sf_dir, tmp_path):
        import shutil

        stage = tmp_path / "events_stream2"
        stage.mkdir()
        shutil.copy(os.path.join(sf_dir, "events.parquet"), stage / "events.parquet")
        ev_path = str(stage)
        schema = spark.read.parquet(ev_path).schema
        stream = spark.readStream.schema(schema).parquet(ev_path).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        out = stream_ops.streaming_sessionize(stream)
        q = stream_ops.run_stream_to_memory(out, "sess_stream")
        try:
            rows = spark.sql("SELECT * FROM sess_stream").collect()
        finally:
            q.stop()
        assert len(rows) > 0
        assert all(r.session_start <= r.session_end and r.n_events >= 1 for r in rows)

    def test_stateful_running_totals(self, spark, sf_dir, tmp_path):
        import shutil

        stage = tmp_path / "events_stream3"
        stage.mkdir()
        shutil.copy(os.path.join(sf_dir, "events.parquet"), stage / "events.parquet")
        schema = spark.read.parquet(str(stage)).schema
        stream = spark.readStream.schema(schema).parquet(str(stage))
        out = stream_ops.streaming_running_user_totals(stream)
        q = stream_ops.run_stream_to_memory(out, "totals_stream", output_mode="update")
        try:
            got = {
                r.user_id: (r.n_events, round(r.total_value, 6))
                for r in spark.sql("SELECT * FROM totals_stream").collect()
            }
        finally:
            q.stop()
        batch = (
            spark.read.parquet(str(stage))
            .groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        )
        expected = {r.user_id: (r.n, round(r.v, 6)) for r in batch.collect()}
        assert got == expected


class TestRealFormats:
    """Real media payloads decoded with no external library: WAV authored by
    the stdlib `wave` encoder (an independent implementation), plus
    hand-rolled uncompressed BMP and binary PPM."""

    @staticmethod
    def _wav_bytes(n_frames=1600, rate=8000, n_channels=1, width=2):
        import io
        import wave

        bio = io.BytesIO()
        with wave.open(bio, "wb") as w:
            w.setnchannels(n_channels)
            w.setsampwidth(width)
            w.setframerate(rate)
            w.writeframes(bytes(n_frames * n_channels * width))
        return bio.getvalue()

    @staticmethod
    def _bmp_bytes(w=4, h=2):
        import struct

        row = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        pixels = bytes(range(row * h % 256 or 1)) * 0 + bytes(row * h)
        header = b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
        dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
        return header + dib + pixels

    @staticmethod
    def _ppm_bytes(w=3, h=2):
        return b"P6\n# comment\n%d %d\n255\n" % (w, h) + bytes(w * h * 3)

    def test_wav_header_decode(self):
        kind, w, h, n_frames, rate, body = MM._parse_header(self._wav_bytes())
        assert kind == "audio" and n_frames == 1600 and rate == 8000
        assert len(body) == 1600 * 2

    def test_bmp_header_decode(self):
        kind, w, h, n_frames, rate, body = MM._parse_header(self._bmp_bytes())
        assert kind == "image" and (w, h) == (4, 2) and n_frames == 1
        assert len(body) == 12 * 2  # 4px*3B padded to 12 per row

    def test_ppm_header_decode(self):
        kind, w, h, n_frames, rate, body = MM._parse_header(self._ppm_bytes())
        assert kind == "image" and (w, h) == (3, 2)
        assert len(body) == 3 * 2 * 3

    def test_real_wav_through_media_features(self, spark):
        """End-to-end: a real WAV blob through the distributed feature
        kernel — n_frames and sample_rate must come out of the RIFF walk."""
        rows = [
            ("wav-1", "audio", 0, 0, 0, 0, self._wav_bytes(800, 16000)),
            ("bmp-1", "image", 4, 2, 1, 0, self._bmp_bytes()),
        ]
        media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
        got = {r.media_ref: r for r in MM.media_features(media).collect()}
        assert got["wav-1"].n_frames == 800
        assert got["wav-1"].sample_rate == 16000
        assert got["wav-1"].kind == "audio"
        assert got["bmp-1"].kind == "image" and got["bmp-1"].n_frames == 1

    def test_compressed_formats_still_stubbed(self):
        # the remaining honest gate: lossy VP8 (PNG/JPEG/VP8L/MP3/MP4
        # headers all decode for real); malformed blobs raise ValueError
        with pytest.raises(NotImplementedError, match="lossy VP8"):
            MM._parse_header(
                b"RIFF" + struct.pack("<I", 16) + b"WEBP"
                + b"VP8 " + struct.pack("<I", 4) + bytes(4)
            )
        with pytest.raises(ValueError, match="moov"):
            MM._parse_header(bytes(4) + b"ftypisom" + bytes(24))
        with pytest.raises(ValueError):
            MM._parse_header(b"\xff\xd8\x00\x00 truncated jpeg")

    def test_equal_payload_different_body_sizes(self, spark):
        """ADVICE r4 (medium): the uniform fast path must key on DECODED body
        lengths — two equal-size encoded files can decode to different-size
        bodies; stacking them misaligns rows or kills the batch."""
        blob_a = b"P5\n4 4\n255\n" + bytes(range(16))  # 27-byte payload, 16-byte body
        blob_b = b"P5\n15 1\n255\n" + bytes(range(100, 115))  # 27-byte payload, 15-byte body
        assert len(blob_a) == len(blob_b)
        media = spark.createDataFrame(
            [("a", "image", 4, 4, 1, 0, blob_a), ("b", "image", 15, 1, 1, 0, blob_b)],
            MM.MEDIA_SCHEMA,
        ).coalesce(1)  # one Arrow batch → both blobs hit the same code path
        got = {r.media_ref: r for r in MM.media_features(media).collect()}
        assert got["a"].mean_byte == pytest.approx(np.arange(16).mean())
        assert got["b"].mean_byte == pytest.approx(np.arange(100, 115).mean())

    def test_internal_decode_errors_wrapped_in_valueerror(self):
        """ADVICE r4: on the strict path, a truncated blob whose magic matched
        surfaces one stable exception type (ValueError, cause chained), not a
        raw struct.error/IndexError from decoder internals."""
        # SOI + DQT marker with no segment bytes → struct.error internally
        with pytest.raises(ValueError) as ei:
            MM._parse_header(b"\xff\xd8\xff\xdb")
        assert ei.value.__cause__ is not None

    def test_riff_non_wave_falls_through_to_gate(self):
        """ADVICE r3: an AVI (or other non-WAVE/WEBP) RIFF container must
        not die inside the WAV decoder — it falls through to the PIL gate
        and (PIL absent) raises the honest capability error."""
        avi = b"RIFF" + struct.pack("<I", 20) + b"AVI " + bytes(16)
        with pytest.raises((NotImplementedError, ValueError)) as ei:
            MM._parse_header(avi)
        assert "RIFF/WAVE" in str(ei.value) or "image/audio libs" in str(ei.value)

    def test_webp_without_vp8l_fails_loudly(self):
        """A WEBP container with no VP8L chunk (e.g. animation-only) is a
        stable ValueError, not a crash inside the bit reader."""
        webp = b"RIFF" + struct.pack("<I", 20) + b"WEBP" + bytes(16)
        with pytest.raises(ValueError) as ei:
            MM._parse_header(webp)
        assert "VP8L" in str(ei.value)


def _filter_image(pixels: "np.ndarray", filters) -> bytearray:
    """Forward-filter an (h, w, ch) image into PNG raw scanline bytes."""
    h, w, ch = pixels.shape
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y, ft in zip(range(h), filters):
        line = pixels[y].reshape(-1).astype(np.int64)
        if ft == 0:
            enc = line
        elif ft == 1:
            left = np.concatenate([np.zeros(ch, np.int64), line[:-ch]])
            enc = (line - left) & 0xFF
        elif ft == 2:
            enc = (line - prev) & 0xFF
        elif ft == 3:
            enc = line.copy()
            for x in range(w * ch):
                a = line[x - ch] if x >= ch else 0
                enc[x] = (line[x] - ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:
            enc = line.copy()
            for x in range(w * ch):
                a = int(line[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (line[x] - pred) & 0xFF
        raw.append(ft)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line
    return raw


def _png_chunk(ctype, body):
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png_bytes(pixels: "np.ndarray", color_type: int, filters=None) -> bytes:
    """Independent minimal PNG encoder (test-side oracle): pixels is
    (h, w, channels) uint8; per-row filter types applied forward so the
    decoder must invert them."""
    import zlib

    h, w, ch = pixels.shape
    raw = _filter_image(pixels, filters or [0] * h)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _png_bytes_interlaced(pixels: "np.ndarray", color_type: int, filt_cycle=(0, 1, 2, 3, 4)) -> bytes:
    """Adam7-interlaced PNG test encoder: the 7 passes are independently
    filtered sub-images concatenated into one zlib stream (interlace=1)."""
    import zlib

    h, w, ch = pixels.shape
    raw = bytearray()
    fi = 0
    for x0, y0, dx, dy in MM._ADAM7:
        sub = np.ascontiguousarray(pixels[y0::dy, x0::dx])
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        filters = [filt_cycle[(fi + i) % len(filt_cycle)] for i in range(ph)]
        fi += ph
        raw += _filter_image(sub, filters)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


class TestPngDecode:
    """From-scratch PNG decode vs an independent test-side encoder — every
    filter type, gray and RGBA, plus palette expansion."""

    def test_rgb_all_filter_types(self):
        rng = np.random.RandomState(42)
        px = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
        blob = _png_bytes(px, color_type=2, filters=[0, 1, 2, 3, 4])
        kind, w, h, n_frames, rate, body = MM._parse_header(blob)
        assert (kind, w, h, n_frames, rate) == ("image", 7, 5, 1, 0)
        assert body == px.tobytes()

    def test_gray_and_rgba(self):
        rng = np.random.RandomState(7)
        for ch, ct in ((1, 0), (2, 4), (4, 6)):
            px = rng.randint(0, 256, size=(4, 6, ch), dtype=np.uint8)
            blob = _png_bytes(px, color_type=ct, filters=[4, 3, 1, 2])
            kind, w, h, *_rest, body = MM._parse_header(blob)
            assert (kind, w, h) == ("image", 6, 4)
            assert body == px.tobytes()

    def test_palette_expansion(self):
        import zlib

        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 128]], dtype=np.uint8)
        idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
        blob = _png_bytes(idx[..., None], color_type=3)
        # splice a PLTE chunk in before IDAT
        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        ihdr_end = 8 + 12 + 13
        blob = blob[:ihdr_end] + chunk(b"PLTE", pal.tobytes()) + blob[ihdr_end:]
        kind, w, h, *_rest, body = MM._parse_header(blob)
        assert (kind, w, h) == ("image", 3, 2)
        assert body == pal[idx.reshape(-1)].tobytes()

    def test_real_png_through_media_features(self, spark):
        rng = np.random.RandomState(3)
        px = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
        blob = _png_bytes(px, color_type=2, filters=[1, 2, 3, 4, 0, 1, 2, 4])
        media = spark.createDataFrame(
            [("png-1", "image", 8, 8, 1, 0, blob)], MM.MEDIA_SCHEMA
        )
        got = MM.media_features(media).collect()[0]
        assert got.kind == "image" and got.n_frames == 1
        flat = px.reshape(-1).astype(np.float64)
        assert got.mean_byte == pytest.approx(flat.mean())
        assert got.std_byte == pytest.approx(flat.std())

    def test_adam7_interlaced_rgb(self):
        """Adam7 decode (round 5 — the last PNG gate): odd dimensions so
        several passes are partial, every filter type cycled per pass."""
        rng = np.random.RandomState(13)
        px = rng.randint(0, 256, size=(13, 11, 3), dtype=np.uint8)
        blob = _png_bytes_interlaced(px, color_type=2)
        kind, w, h, *_rest, body = MM._parse_header(blob)
        assert (kind, w, h) == ("image", 11, 13)
        assert body == px.tobytes()

    def test_adam7_gray_and_rgba_and_tiny(self):
        rng = np.random.RandomState(14)
        for ch, ct in ((1, 0), (4, 6)):
            px = rng.randint(0, 256, size=(9, 6, ch), dtype=np.uint8)
            blob = _png_bytes_interlaced(px, color_type=ct)
            *_h, body = MM._parse_header(blob)
            assert body == px.tobytes()
        # 3x2: most Adam7 passes are EMPTY (zero bytes contributed)
        px = rng.randint(0, 256, size=(2, 3, 3), dtype=np.uint8)
        blob = _png_bytes_interlaced(px, color_type=2)
        kind, w, h, *_rest, body = MM._parse_header(blob)
        assert (w, h) == (3, 2)
        assert body == px.tobytes()

    def test_adam7_palette(self):
        import zlib

        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 128], [7, 7, 7]], dtype=np.uint8)
        rng = np.random.RandomState(15)
        idx = rng.randint(0, 4, size=(10, 9), dtype=np.uint8)
        blob = _png_bytes_interlaced(idx[..., None], color_type=3)
        ihdr_end = 8 + 12 + 13
        blob = blob[:ihdr_end] + _png_chunk(b"PLTE", pal.tobytes()) + blob[ihdr_end:]
        kind, w, h, *_rest, body = MM._parse_header(blob)
        assert (w, h) == (9, 10)
        assert body == pal[idx.reshape(-1)].tobytes()


class TestStreamingTileEncode:
    def test_streaming_encode_equals_batch(self, spark, tmp_path):
        """The streaming path drives the identical batch kernel per
        micro-batch; tile membership aggregated across batches must equal
        the one-shot batch encode."""
        from maplibre_tile_spec_spark.operators import features as FE, tiler

        docs = synth.synthesize_documents(spark, 200, seed=42)
        feats = FE.extract_features(docs).cache()
        src_dir, sink, ckpt = str(tmp_path / "src"), str(tmp_path / "sink"), str(tmp_path / "ck")
        feats.repartition(3).write.parquet(src_dir)
        stream = spark.readStream.schema(feats.schema).option("maxFilesPerTrigger", 1).parquet(src_dir)
        q = stream_ops.streaming_encode_tiles(stream, sink, ckpt, zoom=6)
        q.awaitTermination(120)
        got = (
            spark.read.parquet(sink)
            .groupBy("z", "x", "y")
            .agg(F.sum("n_features").alias("nf"))
            .collect()
        )
        expected = {
            (r.z, r.x, r.y): r.n_features
            for r in tiler.encode_tiles(feats, zoom=6).collect()
        }
        assert {(r.z, r.x, r.y): r.nf for r in got} == expected
        # every per-batch tile blob decodes cleanly
        import maplibre_tile_spec_spark.functions.mlt_codec as C

        row = spark.read.parquet(sink).first()
        assert C.decode_tile(bytes(row.tile))

    def test_replayed_batch_is_idempotent(self, spark, tmp_path):
        """ADVICE r3: foreachBatch replay is at-least-once; the sink's
        per-batch_id dynamic partition overwrite must make a replayed batch
        a no-op for downstream aggregates, not a duplicate append."""
        from maplibre_tile_spec_spark.operators import features as FE, tiler

        docs = synth.synthesize_documents(spark, 120, seed=7)
        feats = FE.extract_features(docs).cache()
        src_dir, sink, ckpt = str(tmp_path / "src"), str(tmp_path / "sink"), str(tmp_path / "ck")
        feats.repartition(2).write.parquet(src_dir)
        stream = spark.readStream.schema(feats.schema).option("maxFilesPerTrigger", 1).parquet(src_dir)
        q = stream_ops.streaming_encode_tiles(stream, sink, ckpt, zoom=6)
        q.awaitTermination(120)
        before = spark.read.parquet(sink).agg(F.sum("n_features").alias("s")).first().s
        # simulate a replay of batch 0: re-run the identical per-batch write
        out = tiler.encode_tiles(feats, zoom=6, n_salt="auto", salt_target=20_000)
        (
            out.withColumn("batch_id", F.lit(0))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(sink)
        )
        after = spark.read.parquet(sink).agg(F.sum("n_features").alias("s")).first().s
        # batch 0 was one source file of the 2-way repartition; its replay
        # (here: the full feature set as the "replayed" batch-0 payload)
        # replaces the old batch-0 partition instead of appending, so the
        # other batch partition is untouched and nothing double-counts
        batch0_after = (
            spark.read.parquet(sink).filter(F.col("batch_id") == 0).agg(F.sum("n_features").alias("s")).first().s
        )
        assert batch0_after == feats.count()
        others = spark.read.parquet(sink).filter(F.col("batch_id") != 0).agg(F.sum("n_features").alias("s")).first().s
        assert after == batch0_after + others
        assert others < before  # old batch-0 rows are gone, not duplicated


class TestDepth16AndRle8:
    def test_16bit_png(self):
        """16-bit PNG: filters run at byte distance bpp=2·ch; body reduces
        to the high byte of each big-endian sample."""
        rng = np.random.RandomState(21)
        for ch, ct in ((1, 0), (3, 2)):
            px16 = rng.randint(0, 65536, size=(6, 5, ch)).astype(">u2")
            px8 = px16.view(np.uint8).reshape(6, 5, ch * 2)
            raw = _filter_image(px8, [0, 1, 2, 3, 4, 1])
            import zlib
            ihdr = struct.pack(">IIBBBBB", 5, 6, 16, ct, 0, 0, 0)
            blob = (
                b"\x89PNG\r\n\x1a\n"
                + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
                + _png_chunk(b"IEND", b"")
            )
            kind, w, h, *_rest, body = MM._parse_header(blob)
            assert (kind, w, h) == ("image", 5, 6)
            assert body == (px16.astype(np.uint16) >> 8).astype(np.uint8).tobytes()

    def test_16bit_interlaced_png(self):
        import zlib
        rng = np.random.RandomState(22)
        px16 = rng.randint(0, 65536, size=(9, 7, 1)).astype(">u2")
        px8 = px16.view(np.uint8).reshape(9, 7, 2)
        raw = bytearray()
        fi = 0
        for x0, y0, dx, dy in MM._ADAM7:
            sub = np.ascontiguousarray(px8[y0::dy, x0::dx])
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            raw += _filter_image(sub, [(fi + i) % 5 for i in range(ph)])
            fi += ph
        ihdr = struct.pack(">IIBBBBB", 7, 9, 16, 0, 0, 0, 1)
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )
        kind, w, h, *_rest, body = MM._parse_header(blob)
        assert (w, h) == (7, 9)
        assert body == (px16.astype(np.uint16) >> 8).astype(np.uint8).tobytes()

    @staticmethod
    def _rle8_bmp(w, h, idx_rows, rle, n_pal=4):
        """idx_rows: expected (h, w) indices; rle: hand-built RLE8 stream."""
        pal = bytes()
        for i in range(n_pal):
            pal += bytes([i * 3 + 2, i * 3 + 1, i * 3, 0])  # B,G,R,0
        dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(rle), 0, 0, n_pal, 0)
        data_off = 14 + 40 + len(pal)
        header = b"BM" + struct.pack("<IHHI", data_off + len(rle), 0, 0, data_off)
        return header + dib + pal + rle

    def test_rle8_bmp(self):
        """BI_RLE8: runs, absolute literals (odd count → pad byte), EOL,
        delta skip, EOD; bottom-up rows; palette → RGB."""
        w, h = 6, 3
        # bottom row: run of 3×idx1, literals [2,3,0] ; middle: EOL-only
        # (stays 0s after delta); top: run 6×idx3
        rle = bytes(
            [3, 1]  # run of 3×idx1
            + [0, 3, 2, 3, 0, 0]  # absolute: 3 literals [2,3,0] + pad byte
            + [0, 0]  # EOL → row 1
            + [0, 2, 2, 0]  # delta: skip 2 right
            + [4, 2]  # run of 4×idx2 at (2,1)
            + [0, 0]  # EOL → row 2
            + [6, 3]  # top row: run 6×idx3
            + [0, 1]  # EOD
        )
        blob = self._rle8_bmp(w, h, None, rle)
        kind, gw, gh, *_rest, body = MM._parse_header(blob)
        assert (kind, gw, gh) == ("image", 6, 3)
        rgb = np.frombuffer(body, np.uint8).reshape(3, 6, 3)
        pal = np.array([[i * 3, i * 3 + 1, i * 3 + 2] for i in range(4)])
        # decoded bottom-up: row0(bottom)=1,1,1,2,3,0 row1=0,0,2,2,2,2 row2(top)=3×6
        assert np.array_equal(rgb[2], pal[[1, 1, 1, 2, 3, 0]])
        assert np.array_equal(rgb[1], pal[[0, 0, 2, 2, 2, 2]])
        assert np.array_equal(rgb[0], pal[[3] * 6])

    def test_rle4_bmp(self):
        """BI_RLE4: runs alternate the two nibbles; absolute literals are
        nibble-packed with byte-pair padding."""
        w, h = 7, 2
        pal = bytes()
        for i in range(16):
            pal += bytes([i * 3 + 2, i * 3 + 1, i * 3, 0])
        # bottom row: run 4 of 0x12 (1,2,1,2), abs 3 literals [3,4,5]
        # (2 nibble bytes, even => no pad), EOL; top row: run 7 of 0x55, EOD
        rle = bytes([4, 0x12, 0, 3, 0x34, 0x50, 0, 0, 7, 0x55, 0, 1])
        dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 4, 2, len(rle), 0, 0, 16, 0)
        data_off = 14 + 40 + len(pal)
        header = b"BM" + struct.pack("<IHHI", data_off + len(rle), 0, 0, data_off)
        kind, gw, gh, *_rest, body = MM._parse_header(header + dib + pal + rle)
        assert (gw, gh) == (7, 2)
        rgb = np.frombuffer(body, np.uint8).reshape(2, 7, 3)
        p = np.array([[i * 3, i * 3 + 1, i * 3 + 2] for i in range(16)])
        assert np.array_equal(rgb[1], p[[1, 2, 1, 2, 3, 4, 5]])  # bottom
        assert np.array_equal(rgb[0], p[[5] * 7])  # top

    def test_bitfields_bmp_still_gated(self):
        dib = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 16, 3, 16, 0, 0, 0, 0)
        header = b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
        with pytest.raises((NotImplementedError, ValueError)):
            MM._parse_header(header + dib + bytes(16))

    @staticmethod
    def _packed_png(vals: "np.ndarray", depth: int, color_type: int, interlace=0) -> bytes:
        """Test encoder for 1/2/4-bit PNG: vals (h, w) ints < 2^depth."""
        import zlib

        def pack_rows(sub):
            ph, pw = sub.shape
            raw = bytearray()
            for y in range(ph):
                bits = np.zeros(pw * depth, dtype=np.uint8)
                for i in range(depth):
                    bits[i::depth] = (sub[y] >> (depth - 1 - i)) & 1
                raw.append(0)  # filter None
                raw.extend(np.packbits(bits).tobytes())
            return raw

        h, w = vals.shape
        raw = bytearray()
        if interlace:
            for x0, y0, dx, dy in MM._ADAM7:
                sub = vals[y0::dy, x0::dx]
                if sub.size:
                    raw += pack_rows(sub)
        else:
            raw = pack_rows(vals)
        ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
        return (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )

    def test_sub8bit_gray_png(self):
        rng = np.random.RandomState(23)
        for depth in (1, 2, 4):
            vals = rng.randint(0, 2**depth, size=(5, 11), dtype=np.uint8)
            blob = self._packed_png(vals, depth, 0)
            kind, w, h, *_rest, body = MM._parse_header(blob)
            assert (w, h) == (11, 5)
            scale = 255 // (2**depth - 1)
            assert body == (vals * scale).astype(np.uint8).tobytes()

    def test_4bit_palette_png_interlaced(self):
        rng = np.random.RandomState(24)
        pal = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
        idx = rng.randint(0, 16, size=(9, 7), dtype=np.uint8)
        blob = self._packed_png(idx, 4, 3, interlace=1)
        ihdr_end = 8 + 12 + 13
        blob = blob[:ihdr_end] + _png_chunk(b"PLTE", pal.tobytes()) + blob[ihdr_end:]
        kind, w, h, *_rest, body = MM._parse_header(blob)
        assert (w, h) == (7, 9)
        assert body == pal[idx.reshape(-1)].tobytes()


def _mp3_frame(bitrate_kbps=128, rate=44100, mpeg1=True, layer3=True, pad=0):
    """Hand-build one MPEG audio frame (header + zero payload)."""
    if mpeg1:
        table = {128: 9, 192: 11, 64: 5, 320: 14, 32: 1}
        ver_bits, spf = 3, 1152
    else:
        table = {64: 8, 32: 4, 8: 1}
        ver_bits, spf = 2, 576
    sr_map = {44100: 0, 48000: 1, 32000: 2} if mpeg1 else {22050: 0, 24000: 1, 16000: 2}
    b1 = 0xE0 | (ver_bits << 3) | (0b01 << 1) | 1  # layer III, no CRC
    b2 = (table[bitrate_kbps] << 4) | (sr_map[rate] << 2) | (pad << 1)
    frame_len = spf * bitrate_kbps * 1000 // (8 * rate) + pad
    hdr = bytes([0xFF, b1, b2, 0x00])
    return hdr + bytes(frame_len - 4), spf


def _id3v2(n_body=100):
    # syncsafe size over 4 bytes
    return b"ID3\x04\x00\x00" + bytes(
        [(n_body >> 21) & 0x7F, (n_body >> 14) & 0x7F, (n_body >> 7) & 0x7F, n_body & 0x7F]
    ) + bytes(n_body)


class TestMp3HeaderDecode:
    def test_cbr_stream(self):
        f, spf = _mp3_frame(128, 44100)
        kind, _w, _h, n, rate, body = MM._parse_header(f * 7)
        assert (kind, n, rate) == ("audio", 7 * spf, 44100)
        assert body == f * 7

    def test_id3v2_prefix_and_id3v1_trailer(self):
        f, spf = _mp3_frame(192, 48000)
        blob = _id3v2(64) + f * 3 + b"TAG" + bytes(125)
        kind, _w, _h, n, rate, body = MM._parse_header(blob)
        assert (kind, n, rate) == ("audio", 3 * spf, 48000)
        assert body == f * 3

    def test_vbr_mixed_bitrates_and_padding(self):
        fa, spf = _mp3_frame(64, 44100)
        fb, _ = _mp3_frame(320, 44100, pad=1)
        fc, _ = _mp3_frame(192, 44100)
        kind, _w, _h, n, rate, _body = MM._parse_header(fa + fb + fc)
        assert (kind, n, rate) == ("audio", 3 * spf, 44100)

    def test_mpeg2_low_rate(self):
        f, spf = _mp3_frame(64, 22050, mpeg1=False)
        assert spf == 576
        _k, _w, _h, n, rate, _b = MM._parse_header(f * 2)
        assert (n, rate) == (2 * 576, 22050)

    def test_trailing_junk_after_valid_run_is_tolerated(self):
        f, spf = _mp3_frame(32, 32000)
        _k, _w, _h, n, _rate, body = MM._parse_header(f * 2 + b"\x00garbage")
        assert n == 2 * spf and body == f * 2

    def test_bad_sync_and_free_format_raise(self):
        with pytest.raises(ValueError):
            MM._parse_header(b"\xff\x00\x00\x00" + bytes(64))
        # free-format (bitrate index 0) has no computable frame length
        free = bytes([0xFF, 0xFB, 0x00, 0x00]) + bytes(64)
        with pytest.raises(ValueError):
            MM._parse_header(free)
        # reserved version bits
        with pytest.raises(ValueError):
            MM._parse_header(bytes([0xFF, 0xEB, 0x90, 0x00]) + bytes(64))

    def test_jpeg_registry_precedence_unbroken(self):
        # 0xFF 0xD8 must still route to the JPEG decoder, not the MP3 sync
        with pytest.raises(ValueError, match="(?i)jpeg|marker|truncated|huffman|sos|segment"):
            MM._parse_header(b"\xff\xd8\x00\x00 truncated jpeg")

    def test_mp3_through_media_features(self, spark):
        f, spf = _mp3_frame(128, 44100)
        rows = [
            ("mp3-1", "audio", 0, 0, 0, 0, _id3v2(32) + f * 5),
            ("mp3-2", "audio", 0, 0, 0, 0, f * 2),
        ]
        media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
        got = {r.media_ref: r for r in MM.media_features(media).collect()}
        assert got["mp3-1"].kind == "audio"
        assert got["mp3-1"].n_frames == 5 * spf
        assert got["mp3-1"].sample_rate == 44100
        assert got["mp3-2"].n_frames == 2 * spf


def _box(btype: bytes, body: bytes, large: bool = False) -> bytes:
    if large:
        return struct.pack(">I", 1) + btype + struct.pack(">Q", 16 + len(body)) + body
    return struct.pack(">I", 8 + len(body)) + btype + body


def _mp4_track(handler: bytes, *, w=0, h=0, timescale=0, duration=0,
               sample_counts=(), mdhd_v1=False) -> bytes:
    tkhd = _box(
        b"tkhd",
        bytes(4) + bytes(16) + bytes(16) + bytes(36)  # ver/flags, times+id, layer.., matrix
        + struct.pack(">II", w << 16, h << 16),
    )
    if mdhd_v1:
        mdhd = _box(b"mdhd", bytes([1, 0, 0, 0]) + bytes(16)
                    + struct.pack(">IQ", timescale, duration) + bytes(4))
    else:
        mdhd = _box(b"mdhd", bytes(4) + bytes(8)
                    + struct.pack(">II", timescale, duration) + bytes(4))
    hdlr = _box(b"hdlr", bytes(4) + bytes(4) + handler + bytes(12))
    stts = _box(b"stts", bytes(4) + struct.pack(">I", len(sample_counts))
                + b"".join(struct.pack(">II", c, 1) for c in sample_counts))
    stbl = _box(b"stbl", stts)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    return _box(b"trak", tkhd + mdia)


def _mp4(tracks: bytes, mdat: bytes = b"\x01\x02\x03", large_mdat: bool = False) -> bytes:
    ftyp = _box(b"ftyp", b"isom" + bytes(4) + b"isomiso2")
    mvhd = _box(b"mvhd", bytes(4) + bytes(8) + struct.pack(">II", 1000, 5000) + bytes(80))
    moov = _box(b"moov", mvhd + tracks)
    return ftyp + moov + _box(b"mdat", mdat, large=large_mdat)


class TestMp4HeaderDecode:
    def test_video_with_audio(self):
        blob = _mp4(
            _mp4_track(b"vide", w=640, h=360, timescale=30, duration=900,
                       sample_counts=(100, 150))
            + _mp4_track(b"soun", timescale=48000, duration=96000, sample_counts=(96000,))
        )
        kind, w, h, n, rate, body = MM._parse_header(blob)
        assert (kind, w, h, n, rate) == ("video", 640, 360, 250, 48000)
        assert body == b"\x01\x02\x03"

    def test_audio_only_m4a(self):
        blob = _mp4(_mp4_track(b"soun", timescale=44100, duration=441000))
        kind, w, h, n, rate, _ = MM._parse_header(blob)
        assert (kind, n, rate) == ("audio", 441000, 44100)
        # duration/rate is seconds: 10 s
        assert n // rate == 10

    def test_mdhd_version1_and_largesize_mdat(self):
        blob = _mp4(
            _mp4_track(b"soun", timescale=8000, duration=16000, mdhd_v1=True),
            mdat=b"\xaa" * 10,
            large_mdat=True,
        )
        kind, _w, _h, n, rate, body = MM._parse_header(blob)
        assert (kind, n, rate) == ("audio", 16000, 8000)
        assert body == b"\xaa" * 10

    def test_no_tracks_and_overrun_raise(self):
        ftyp = _box(b"ftyp", b"isom" + bytes(8))
        with pytest.raises(ValueError):
            MM._parse_header(ftyp + _box(b"moov", b""))
        bad = ftyp + struct.pack(">I", 10**6) + b"moov" + bytes(8)
        with pytest.raises(ValueError):
            MM._parse_header(bad)

    def test_mp4_through_media_features(self, spark):
        blob = _mp4(
            _mp4_track(b"vide", w=64, h=48, timescale=25, duration=100, sample_counts=(10,))
        )
        media = spark.createDataFrame(
            [("mp4-1", "video", 0, 0, 0, 0, blob)], MM.MEDIA_SCHEMA
        )
        (row,) = MM.media_features(media).collect()
        assert (row.kind, row.n_frames, row.sample_rate) == ("video", 10, 0)
