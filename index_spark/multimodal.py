"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The engine-side contract (real, tested): typed metadata next to an opaque
``binary`` payload, Arrow-batched ``mapInPandas`` transforms with explicit
output schemas, and partition-size control so a batch of decoded frames
fits executor memory.

The decode step itself is STUBBED: the image/audio codec libraries are not
in this container. ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic pseudo-decode (bytes → shape +
checksum + fixed-seed "pixels" summary) exercises the full Spark plumbing:
schema, batching, partitioning, and UDF signatures are production-shaped.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "width int, height int, n_frames int, sample_rate int"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, checksum string, "
    "feat array<float>"
)


def documents_as_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Adapter for the driver fixtures: treat each document's bytes as an
    opaque media payload with plausible metadata. Lets every multimodal code
    path run against real partitioned data without codec libraries."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (F.when(F.col(id_col) % 3 == 0, "image").when(F.col(id_col) % 3 == 1, "audio").otherwise("video")).alias("media_type"),
        payload.alias("payload"),
        (F.octet_length(payload) % 1920).cast("int").alias("width"),
        (F.octet_length(payload) % 1080).cast("int").alias("height"),
        (F.col(id_col) % 240).cast("int").alias("n_frames"),
        F.lit(16000).alias("sample_rate"),
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real decode requires PIL/ffmpeg (not in this container).

    ``fake=True`` → deterministic pseudo-pixels, shaped (8, 8, 3): the 16
    md5 digest bytes of the payload tiled 12× (192 bytes = 8*8*3). Stable
    across runs/processes AND exactly replayable in SQL — any engine with
    md5() can recompute every derived feature (the gcd(3,16)=1 stride
    means each channel sees all 16 digest bytes exactly 4 times, so
    per-channel mean = sum(digest)/16, min/max = min/max(digest))."""
    if not fake:
        raise NotImplementedError(
            "image decode needs a codec library (PIL/opencv); not in this container"
        )
    digest = hashlib.md5(payload).digest()
    return np.frombuffer(digest * 12, dtype=np.uint8).reshape(8, 8, 3).copy()


def extract_features(df: DataFrame, batch_hint_rows: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over media payloads.

    Production shape: iterate Arrow batches, decode each payload, emit a
    fixed-length float feature vector + integrity checksum. The decode is
    the deterministic fake (see :func:`decode_image`); everything around it
    — schema, batch iteration, column pruning — is the real pipeline.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sums, nbytes = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                px = decode_image(b, fake=True).astype(np.float32)
                # 12-dim pooled feature: per-channel mean/std/min/max
                f = np.concatenate(
                    [px.mean(axis=(0, 1)), px.std(axis=(0, 1)), px.min(axis=(0, 1)), px.max(axis=(0, 1))]
                )
                feats.append(f.tolist())
                sums.append(hashlib.md5(b).hexdigest())
                nbytes.append(len(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": nbytes,
                    "checksum": sums,
                    "feat": feats,
                }
            )

    return df.select("doc_id", "media_type", "payload").mapInPandas(op, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 24) -> DataFrame:
    """Frame-sampling plan for video payloads: one output row per kept frame
    index — pure column ops (sequence + explode); the per-frame decode would
    slot into ``extract_features`` downstream."""
    return (
        # n_frames <= 0 must emit ZERO rows: greatest(n_frames-1, 0) would
        # turn an empty video into sequence(0,0) = [0] — a phantom frame 0
        # a downstream decoder would fail (or fabricate data) on
        df.filter((F.col("media_type") == "video") & (F.col("n_frames") > 0))
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))),
        )
        .select("doc_id", "frame_idx", "payload")
    )
