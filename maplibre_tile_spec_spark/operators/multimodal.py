"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, deterministic binary
synthesis, partitioning, Arrow-batched UDF signatures, batch shapes. The
codec step itself (JPEG decode, resampling, frame extraction) is STUBBED:
the image/audio libraries are not present in this container, so
``decode_image``/``decode_audio`` parse only the deterministic header our
synthesizer writes and raise ``NotImplementedError`` for real formats. Swap
the marked stub for PIL/libav calls in production; nothing else changes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_ref string, kind string, width int, height int, n_frames int, "
    "sample_rate int, payload binary"
)

_MAGIC = b"MMX1"


# ---------------------------------------------------------------------------
# deterministic synthetic media (stands in for real object-store bytes)
# ---------------------------------------------------------------------------


def synthesize_media(spark, refs: DataFrame, seed: int = 42) -> DataFrame:
    """refs (media_ref string) → media table with deterministic binary
    payloads: a 16-byte header (magic, kind, w, h, frames, rate) + a
    hash-derived byte body. Partition-independent."""

    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                # md5, not Python hash(): executor-process-independent
                h = int(hashlib.md5(f"{seed}:{ref}".encode()).hexdigest()[:8], 16)
                rng = np.random.RandomState(h)
                kind = ["image", "audio", "video"][h % 3]
                w, hgt = int(16 + h % 64), int(16 + (h // 7) % 64)
                frames = 1 if kind == "image" else int(2 + h % 30)
                rate = 16000 if kind == "audio" else 0
                body = rng.randint(0, 256, 64, dtype=np.uint8).tobytes()
                payload = _MAGIC + struct.pack("<BHHHI", {"image": 0, "audio": 1, "video": 2}[kind], w, hgt, frames, rate) + body
                rows.append((ref, kind, w, hgt, frames, rate, payload))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "kind", "width", "height", "n_frames", "sample_rate", "payload"],
            )

    return refs.select("media_ref").distinct().mapInPandas(gen, schema=MEDIA_SCHEMA)


def extract_media_refs(docs: DataFrame) -> DataFrame:
    """Interleaved documents → media spans (doc_id, span_offset, media_ref)."""
    s = F.explode("spans").alias("s")
    return (
        docs.select("doc_id", s)
        .filter(F.col("s.kind") == "media")
        .select("doc_id", F.col("s.offset").alias("span_offset"), F.col("s.media_ref").alias("media_ref"))
    )


# ---------------------------------------------------------------------------
# feature extraction kernels (Arrow-batched; decode step stubbed)
# ---------------------------------------------------------------------------


def _parse_header(payload: bytes) -> tuple[str, int, int, int, int, bytes]:
    if payload[:4] != _MAGIC:
        # >>> STUB: real formats (JPEG/PNG/WAV/MP4) need PIL / libav,
        # which are not installed in this container.
        raise NotImplementedError("real media decoding requires image/audio libs")
    kind_b, w, h, frames, rate = struct.unpack("<BHHHI", payload[4:15])
    kind = ["image", "audio", "video"][kind_b]
    return kind, w, h, frames, rate, payload[15:]


def media_features(media: DataFrame) -> DataFrame:
    """Decode headers + compute a deterministic content digest feature per
    blob (the 'embedding' stand-in). One Arrow batch at a time."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                kind, w, h, frames, rate, body = _parse_header(bytes(payload))
                arr = np.frombuffer(body, dtype=np.uint8).astype(np.float64)
                rows.append(
                    (
                        ref,
                        kind,
                        len(payload),
                        float(arr.mean()),
                        float(arr.std()),
                        int(frames),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "kind", "n_bytes", "mean_byte", "std_byte", "n_frames"],
            )

    return media.mapInPandas(
        feats,
        schema="media_ref string, kind string, n_bytes long, mean_byte double, std_byte double, n_frames int",
    )


def resize_images(media: DataFrame, target: int = 8) -> DataFrame:
    """'Resize' kernel: for image blobs, produce a target×target uint8 grid
    by deterministic nearest-neighbor sampling of the body bytes (the real
    implementation swaps the sampler for PIL resize; schema and batch shape
    are identical)."""

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                kind, w, h, *_rest, body = (*_parse_header(bytes(payload)),)
                if kind != "image":
                    continue
                arr = np.frombuffer(body, dtype=np.uint8)
                idx = (np.arange(target * target) * arr.shape[0] // (target * target)) % arr.shape[0]
                rows.append((ref, target, target, arr[idx].tobytes()))
            yield pd.DataFrame(rows, columns=["media_ref", "out_w", "out_h", "pixels"])

    return media.mapInPandas(rz, schema="media_ref string, out_w int, out_h int, pixels binary")


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame sampling for video blobs: one output row per sampled frame
    index (real impl: demux + decode at those timestamps)."""
    # declarative: explode a frame-index sequence, no Python at all
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_ref", F.explode(frames).alias("frame_idx"))
    )
