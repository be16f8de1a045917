"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, partition sizing, Arrow batch
shape, UDF signatures — is real and tested. ``decode_image`` is
dependency-guarded: with PIL installed it really decodes (grayscale-resize
feature), without it the ``deterministic_fake=True`` path produces a seeded
feature vector derived from the payload sha256 (replayable in SQL — the
contract oracle checks it) and the non-fake path raises NotImplementedError
so failures are honest ``decode_ok=False`` rows.

At 100 TB: binary payloads dominate row size, so
``spark.sql.files.maxPartitionBytes`` (not row counts) governs scan
parallelism, and feature extraction runs in ``mapInPandas`` with small Arrow
batches (``maxRecordsPerBatch`` ↓) to bound worker memory; the metadata
struct column lets filters prune before any byte of payload is decoded
(column pruning: scanning metadata never reads the binary column).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]), True),
])

FEATURE_DIM = 64

_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
    T.StructField("decode_ok", T.BooleanType(), False),
])


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: feature i is the i-th hex
    nibble of sha256(payload), mapped to nib/16 − 0.5 — a dyadic rational,
    exactly representable in float32 AND float64, so any engine (e.g. a
    DuckDB oracle doing strpos-nibble arithmetic on sha256 hex) replays the
    values bit-for-bit. Stable across runs/executors."""
    h = hashlib.sha256(payload).hexdigest()  # 64 nibbles == FEATURE_DIM
    reps = -(-dim // len(h))
    return np.array([int(c, 16) / 16.0 - 0.5 for c in (h * reps)[:dim]],
                    dtype=np.float32)


def _pil_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real decoder (used only when PIL is importable): decode → grayscale
    → resize to √dim×√dim → [−0.5, 0.5] floats. Deterministic for a given
    payload; per-executor import cost is paid once per python worker."""
    from io import BytesIO

    from PIL import Image

    side = max(int(dim ** 0.5), 1)
    img = Image.open(BytesIO(payload)).convert("L").resize(
        (side, side), resample=Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0 - 0.5
    flat = arr.reshape(-1)
    if flat.size < dim:
        flat = np.pad(flat, (0, dim - flat.size))
    return flat[:dim]


def decode_image(payload: bytes, deterministic_fake: bool = False) -> np.ndarray:
    """Image → feature vector. Dependency-guarded: uses PIL when installed
    (decode → grayscale-resize → normalized floats); without PIL, either the
    deterministic fake (CI/oracle path — sha256-nibble features replayable
    in SQL) or NotImplementedError so callers see an honest decode_ok=False
    rather than silent garbage."""
    if payload is None:
        raise ValueError("NULL payload")
    if deterministic_fake:
        return _fake_feature(payload)
    try:
        return _pil_feature(payload)
    except ImportError:
        raise NotImplementedError(
            "image decoding requires PIL/libjpeg — not installed; "
            "pass deterministic_fake=True to exercise the pipeline shape")


def extract_features(media: DataFrame, batch_rows: int = 64,
                     deterministic_fake: bool = True) -> DataFrame:
    """media(MEDIA_SCHEMA) → (media_id, feature array<float>, decode_ok).

    mapInPandas with an explicit small batch bound: payloads are big, so the
    per-batch row count — not Spark's default 10k — governs worker memory."""
    from .. import ensure_udf_serializable

    ensure_udf_serializable()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for s in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[s:s + batch_rows]
                feats, oks = [], []
                for payload in chunk["payload"]:
                    if payload is None:
                        feats.append(None)
                        oks.append(False)
                        continue
                    try:
                        feats.append(decode_image(bytes(payload),
                                                  deterministic_fake).tolist())
                        oks.append(True)
                    except NotImplementedError:
                        feats.append(None)
                        oks.append(False)
                yield pd.DataFrame({"media_id": chunk["media_id"].values,
                                    "feature": feats, "decode_ok": oks})

    return media.select("media_id", "payload").mapInPandas(
        fn, schema=_FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms) from
    the metadata duration — pure relational fan-out (sequence+explode), no
    payload touched. The decode of each planned frame is the stubbed UDF."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("meta.duration_ms"),
                                                F.lit(0)),
                           F.lit(every_ms))).alias("frame_ts_ms"),
        )
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must never read the payload column
    (column pruning; verify via .explain ReadSchema)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.coalesce(F.col("meta.width"), F.lit(0))).alias("avg_width"),
        F.sum(F.coalesce(F.col("meta.duration_ms"), F.lit(0))).alias("total_ms"),
    )
