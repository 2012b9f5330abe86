"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct —
the Spark-side contract (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec work is STUBBED
because no image/audio libraries exist in this container. The stub is
clearly marked: `stub_features` derives a deterministic fake feature
vector from the payload (md5-hex chain — reproducible by an ANSI-SQL
oracle), and `decode_image_real` raises NotImplementedError at the
real-decoder swap site.

At 100 TB the rules encoded here: never shuffle payload bytes you can
drop first (select metadata-only before wide ops); size Arrow batches
by BYTES not rows for multi-MB payloads (maxRecordsPerBatch alone is
insufficient — `rebatch_by_bytes` does the split inside mapInPandas);
feature extraction emits fixed-size vectors so downstream is columnar.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string,"
    " width int, height int, duration_ms int"
)
FEATURE_DIM = 32  # = 2 x md5 digest length; stub_features' output size


def make_media_table(spark, n: int, *, partitions: int = 4) -> DataFrame:
    """Deterministic synthetic media rows (payload = seeded bytes)."""
    base = spark.range(0, n, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                # payload bytes = unhex(repeat(md5('media'||i), 4+i%7)) —
                # chosen so an ANSI-SQL oracle can reproduce the payload
                # (and thus the stub features) from generate_series alone
                payload = bytes.fromhex(
                    hashlib.md5(f"media{i}".encode()).hexdigest() * (4 + i % 7)
                )
                rows.append((
                    i, kind, payload,
                    {"image": "image/png", "audio": "audio/wav",
                     "video": "video/mp4"}[kind],
                    64 + i % 512 if kind != "audio" else 0,
                    64 + (i * 3) % 512 if kind != "audio" else 0,
                    (i * 37) % 60000 if kind != "image" else 0,
                ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "payload", "mime", "width", "height",
                "duration_ms",
            ])

    return base.mapInPandas(gen, MEDIA_SCHEMA)


def rebatch_by_bytes(batches: Iterator[pd.DataFrame], payload_col: str,
                     max_bytes: int = 64 << 20) -> Iterator[pd.DataFrame]:
    """Split incoming Arrow batches so each holds <= max_bytes of
    payload — row-count caps don't protect against multi-MB blobs."""
    for pdf in batches:
        sizes = pdf[payload_col].map(len).to_numpy()
        cum = np.cumsum(sizes)
        start = 0
        base = 0
        for i in range(len(pdf)):
            if cum[i] - base > max_bytes and i > start:
                yield pdf.iloc[start:i]
                start = i
                base = cum[i - 1]
        if start < len(pdf):
            yield pdf.iloc[start:]


def decode_image_real(payload: bytes) -> np.ndarray:  # pragma: no cover
    """Swap site for a real decoder (PIL/opencv not in this container).
    A real deployment decodes pixels here and feeds a model; in this
    environment the deterministic `stub_features` below carries the
    pipeline instead."""
    raise NotImplementedError(
        "image decoding requires an image library; deterministic stub "
        "stub_features carries the pipeline in this environment"
    )


def stub_features(payload: bytes) -> np.ndarray:
    """Deterministic fake feature extraction, chosen SQL-reproducible:
    the 32 feature bytes are md5(hex(payload)) || md5(md5(hex(payload))
    || 'x') — both engines (Spark kernel here, DuckDB oracle) derive
    identical values from the payload alone. A real model replaces this
    function; the Arrow batching / schema contract is unchanged."""
    ph = payload.hex()
    h1 = hashlib.md5(ph.encode()).hexdigest()
    h2 = hashlib.md5((h1 + "x").encode()).hexdigest()
    return np.frombuffer(bytes.fromhex(h1 + h2), dtype=np.uint8)


def extract_features(df: DataFrame, *, payload_col: str = "payload",
                     id_col: str = "media_id") -> DataFrame:
    """binary payload -> fixed-size float feature vector (Arrow-batched;
    byte-bounded rebatching; stubbed decode). feat_norm is computed from
    the exact integer sum of squared feature bytes (order-independent),
    so it is bit-reproducible by a SQL oracle."""
    narrow = df.select(id_col, payload_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in rebatch_by_bytes(batches, payload_col):
            ids, feats, norms = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                bs = stub_features(bytes(payload))
                vec = (bs.astype(np.float64) / 255.0).astype("float32")
                ids.append(int(mid))
                feats.append(vec)
                norms.append(
                    math.sqrt(int((bs.astype(np.int64) ** 2).sum())) / 255.0
                )
            yield pd.DataFrame({"media_id": pd.Series(ids, dtype="int64"),
                                "features": feats,
                                "feat_norm": pd.Series(norms, dtype="float64")})

    return narrow.mapInPandas(
        gen, "media_id long, features array<float>, feat_norm double"
    )


def resize_plan(df: DataFrame, *, max_dim: int = 256) -> DataFrame:
    """Image-resize PLAN: target dimensions for fitting each image
    inside a max_dim box preserving aspect ratio — pure metadata math,
    all built-ins (the pixel resample itself is the stubbed decoder's
    job; a real decoder consumes (new_w, new_h) per row). Images
    already inside the box keep their dimensions (scale capped at 1)."""
    imgs = df.filter(F.col("kind") == "image")
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_dim))
        / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return imgs.select(
        "media_id",
        "width",
        "height",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1))
        .cast("int").alias("new_w"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1))
        .cast("int").alias("new_h"),
    )


def frame_sample_plan(df: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: explode per-video timestamps to one
    row per sampled frame (pure built-ins — sequence/explode); the
    frame decode itself is the stubbed kernel above."""
    vids = df.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
