"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference pipes non-HTML content types through external converters
(`HttpMime.h:17-39` CT_*, antiword/pstotext binaries; SURVEY.md S5) -- the
same shape a training-data pipeline needs for media: an opaque payload
column, a type tag, and per-type decode/feature/transform stages.

Spark-side plumbing here is REAL and tested: schemas, partitioning, Arrow
batch flow, UDF signatures. The codec step is a clearly-marked STUB --
real image/audio libraries are not in this container -- with two modes:
 * decode_fn=None  -> deterministic fake decoder (md5-derived features),
   so every downstream stage is testable and oracle-checkable;
 * a real decode_fn (e.g. PIL/librosa-backed) can be injected without
   touching any Spark code.

Operators:
 * attach_fake_media    -- deterministic synthetic media column for tests
 * media_features       -- decode + per-item feature extraction (mapInPandas)
 * resize_images        -- image transform stage (stubbed codec)
 * sample_frames        -- video frame sampling -> exploded frame rows
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ("image", "audio", "video")

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def _fake_decode(payload: bytes, media_type: str) -> dict:
    """Deterministic STUB decoder (no media libs in this container).

    Derives plausible metadata + an 8-dim feature vector purely from the
    payload bytes (md5), so results are reproducible and SQL-oracle-able.
    Replace with a real codec by passing decode_fn to media_features.
    """
    # hash the payload's lowercase-hex STRING (not raw bytes): identical in
    # Python / Spark / DuckDB (DuckDB's md5 only takes VARCHAR), so the
    # whole stub is SQL-oracle-checkable
    content_hash = hashlib.md5(payload.hex().encode()).hexdigest()
    h = bytes.fromhex(content_hash)
    vals = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    feature = (vals[:8] / 255.0).round(4)
    out = {
        "content_hash": content_hash,
        "width": None,
        "height": None,
        "duration_ms": None,
        "feature": feature,
    }
    if media_type == "image":
        out["width"] = 16 + int(h[0]) % 240
        out["height"] = 16 + int(h[1]) % 240
    elif media_type in ("audio", "video"):
        out["duration_ms"] = 100 + (int(h[2]) << 8 | int(h[3]))
    return out


def attach_fake_media(docs: DataFrame, payload_bytes: int = 64) -> DataFrame:
    """Deterministic synthetic media column for tests/benchmarks: payload =
    repeated md5 of the doc text, media_type cycles by doc_id. JVM-side
    (no UDF) so the fixture itself is cheap at any scale."""
    reps = (payload_bytes // 16) + 1
    payload = F.substring(
        F.concat(*[F.unhex(F.md5(F.concat(F.col("text"), F.lit(str(i)))))
                   for i in range(reps)]),
        1, payload_bytes,
    )
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    return docs.select(
        "doc_id", mt.alias("media_type"), payload.alias("media")
    )


def media_features(media_df: DataFrame, decode_fn=None) -> DataFrame:
    """(doc_id, media_type, media binary) -> decoded metadata + features.

    Arrow-batched mapInPandas; the per-item codec call is the only
    non-vectorized step (real decoders are per-item anyway). decode_fn
    defaults to the deterministic stub."""
    decode = decode_fn or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            recs = []
            for row in b.itertuples(index=False):
                payload = bytes(row.media)
                d = decode(payload, str(row.media_type))
                recs.append(
                    {
                        "doc_id": int(row.doc_id),
                        "media_type": str(row.media_type),
                        "n_bytes": len(payload),
                        "content_hash": d["content_hash"],
                        "width": d["width"],
                        "height": d["height"],
                        "duration_ms": d["duration_ms"],
                        "feature": np.asarray(d["feature"], dtype=np.float32),
                    }
                )
            yield pd.DataFrame(recs)

    return media_df.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_images(
    media_df: DataFrame, max_side: int = 224, resize_fn=None
) -> DataFrame:
    """Image transform stage. The real resample belongs in resize_fn
    (payload, max_side) -> payload; without media libs the stub truncates
    the payload deterministically (plumbing-only)."""

    def stub(payload: bytes, _max_side: int) -> bytes:
        return payload[: max(16, len(payload) // 2)]

    fn = resize_fn or stub

    @F.pandas_udf(T.BinaryType())
    def _resize(col: pd.Series) -> pd.Series:
        return col.map(lambda p: fn(bytes(p), max_side))

    return (
        media_df.filter(F.col("media_type") == "image")
        .withColumn("media", _resize(F.col("media")))
    )


def sample_frames(
    media_df: DataFrame, every_n: int = 4, n_frames: int = 3, extract_fn=None
) -> DataFrame:
    """Video frame sampling -> one row per sampled frame.

    extract_fn(payload, frame_idx) -> frame bytes; the stub slices the
    payload deterministically. Output explodes per frame, so downstream
    image stages run unchanged on frames."""

    def stub(payload: bytes, idx: int) -> bytes:
        start = (idx * every_n) % max(1, len(payload) - 8)
        return payload[start: start + 8]

    fn = extract_fn or stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            recs = []
            for row in b.itertuples(index=False):
                payload = bytes(row.media)
                for i in range(n_frames):
                    recs.append(
                        {
                            "doc_id": int(row.doc_id),
                            "frame_idx": i,
                            "frame": fn(payload, i),
                        }
                    )
            yield pd.DataFrame(recs)

    return (
        media_df.filter(F.col("media_type") == "video")
        .mapInPandas(run, schema=FRAMES_SCHEMA)
    )
