"""Multimodal (binary) column plumbing (north-star extension).

Images/audio/video are carried as opaque ``binary`` columns plus typed
metadata.  The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` partition-parallel decode — is real and tested; the
actual media decode is STUBBED (`decode_image`) because media libraries
aren't in this container.  Swap `_fake_decode` for a real
PIL/torchcodec call and nothing else changes.

Scale notes: mapInPandas streams Arrow batches per partition — no
driver collect, no per-row Python; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory is
independent of partition size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Output schema of the feature-extraction stage.
MEDIA_FEATURES_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, payload_md5 STRING, width INT, height INT, mode STRING"
)


def decode_image(payload: bytes) -> dict:
    """Real decode goes here (PIL.Image.open etc.).  Not available in
    this container — callers must use ``fake=True`` paths in tests."""
    raise NotImplementedError(
        "media decode libraries are not installed; use extract_media_features(fake=True)"
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for decode: derives pseudo width/height/mode
    from the payload digest, so tests exercise the full plumbing with
    stable outputs."""
    digest = hashlib.md5(payload).digest()
    return {
        "width": 64 + digest[0] % 192,
        "height": 64 + digest[1] % 192,
        "mode": "RGB" if digest[2] % 2 == 0 else "L",
    }


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat the text body as an opaque binary payload (the multimodal
    column pattern: binary blob + metadata columns).  Rows with a NULL
    body are excluded — a media pipeline skips missing blobs rather
    than shipping None into the Arrow decode path (np/pandas would
    throw there, killing the whole batch for one bad row)."""
    return df.where(F.col(text_col).isNotNull()).withColumn(
        "payload", F.encode(F.col(text_col), "UTF-8")
    )


def extract_media_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Partition-parallel feature extraction over a binary column via
    mapInPandas (Arrow batches of {doc_id, payload})."""

    decode = _fake_decode if fake else decode_image

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            meta = [decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "payload_md5": payloads.map(lambda p: hashlib.md5(p).hexdigest()),
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "mode": [m["mode"] for m in meta],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(extract, MEDIA_FEATURES_SCHEMA)


# Frame sampling output: one row per sampled frame (the 1→N shape).
FRAME_SCHEMA = "doc_id BIGINT, frame_idx INT, frame BINARY, frame_bytes BIGINT"

# Resize output: binary in → binary out with new metadata.
RESIZED_SCHEMA = "doc_id BIGINT, resized BINARY, width INT, height INT"


def sample_frames(df: DataFrame, frame_size: int = 1024, every_n: int = 1) -> DataFrame:
    """Frame sampling over a binary video-like column: each payload
    yields one output row per ``every_n``-th fixed-size frame — the
    one-to-many mapInPandas shape (explode done Python-side, Arrow
    batches both directions).  The 'codec' is a STUB: frames are
    contiguous ``frame_size``-byte slices; a real implementation swaps
    the slicer for a container demuxer and nothing else changes."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for k, start in enumerate(range(0, n, frame_size)):
                    if k % every_n:
                        continue
                    ids.append(did)
                    idxs.append(k)
                    frames.append(payload[start : start + frame_size])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype=object),
                    "frame_bytes": pd.Series([len(f) for f in frames], dtype="int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(sample, FRAME_SCHEMA)


def resize_media(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Binary-to-binary transform plumbing (resize/transcode shape).
    The decode+resample is STUBBED deterministically (digest-expanded
    bytes of exactly width·height); swap the stub for PIL/ffmpeg and
    the Spark plumbing — schema, batching, memory profile — is
    unchanged."""
    target = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                digest = hashlib.sha256(payload).digest()
                reps = target // len(digest) + 1
                out.append((digest * reps)[:target])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized": pd.Series(out, dtype=object),
                    "width": pd.Series([width] * len(out), dtype="int32"),
                    "height": pd.Series([height] * len(out), dtype="int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(resize, RESIZED_SCHEMA)
