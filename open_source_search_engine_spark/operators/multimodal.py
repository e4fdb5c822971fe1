"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference pipes non-HTML content types through external converters
(`HttpMime.h:17-39` CT_*, antiword/pstotext binaries; SURVEY.md S5) -- the
same shape a training-data pipeline needs for media: an opaque payload
column, a type tag, and per-type decode/decode/transform stages.

The Spark-side plumbing (schemas, partitioning, Arrow batch flow, UDF
signatures) is shared by TWO codec paths:

 * a REAL pure-Python codec (`functions/codecs.py`): spec-conformant
   BMP / WAV(PCM16) / AVI(DIB) parse+write -- `real_decode`,
   `attach_real_media`, real `resize_images` / `sample_frames` backends.
   Decoded metadata (width/height/duration/frames/encoded size) is
   predicted by doc_id arithmetic in the driver's SQL oracle, so
   decode(encode(params)) == params is hash-match-gated end to end.
 * a deterministic STUB (`_fake_decode`, md5-derived features) kept for
   codec-independent plumbing tests and as the shape a PIL/librosa-backed
   decode_fn would take for formats these parsers don't cover.

Operators:
 * attach_fake_media    -- deterministic synthetic media column (stub path)
 * attach_real_media    -- deterministic REAL BMP/WAV/AVI payloads
 * media_features       -- decode + per-item feature extraction (mapInPandas)
 * resize_images        -- image transform stage (real nearest-neighbor BMP
                           backend by default)
 * sample_frames        -- video frame sampling -> exploded frame rows
                           (real AVI-frame -> BMP backend available)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import codecs

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
        T.StructField("n_frames", T.IntegerType(), True),
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
        "n_frames": None,
        "feature": feature,
    }
    if media_type == "image":
        out["width"] = 16 + int(h[0]) % 240
        out["height"] = 16 + int(h[1]) % 240
    elif media_type in ("audio", "video"):
        out["duration_ms"] = 100 + (int(h[2]) << 8 | int(h[3]))
    return out


def _image_feature(px: np.ndarray) -> np.ndarray:
    """8-dim image descriptor: mean R/G/B, luma std, 4-bin luma histogram.
    Accepts one frame (h, w, 3) or a frame stack (n, h, w, 3)."""
    arr = px.astype(np.float32)
    if arr.ndim == 3:
        arr = arr[None]
    mean_rgb = arr.mean(axis=(0, 1, 2)) / 255.0
    luma = arr @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    std = luma.std() / 255.0
    hist = np.histogram(luma, bins=4, range=(0.0, 256.0))[0] / luma.size
    return np.concatenate([mean_rgb, [std], hist]).astype(np.float32).round(4)


def _audio_feature(samples: np.ndarray) -> np.ndarray:
    """8-dim audio descriptor: RMS, zero-crossing rate, 6 spectral-band
    energy fractions (numpy rfft)."""
    x = samples.astype(np.float32) / 32768.0
    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
    zcr = (
        float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        if len(x) > 1
        else 0.0
    )
    if len(x):
        spec = np.abs(np.fft.rfft(x)) ** 2
        bands = np.array([b.sum() for b in np.array_split(spec, 6)], np.float32)
        bands = bands / max(float(bands.sum()), 1e-9)
    else:
        # rfft raises on size 0; an empty-but-valid data chunk descriptor
        # is all-zero like the rms/zcr guards above
        bands = np.zeros(6, np.float32)
    return np.concatenate([[rms, zcr], bands]).astype(np.float32).round(4)


def real_decode(payload: bytes, media_type: str) -> dict:
    """REAL codec step: sniff + parse BMP/WAV/AVI (`functions/codecs.py`)
    and extract an 8-dim per-type feature. Same contract as `_fake_decode`,
    so it drops into every existing Spark stage via decode_fn."""
    kind = codecs.sniff_media(payload)
    content_hash = hashlib.md5(payload.hex().encode()).hexdigest()
    out = {
        "content_hash": content_hash,
        "width": None,
        "height": None,
        "duration_ms": None,
        "n_frames": None,
    }
    if kind == "bmp":
        w, h, px = codecs.decode_bmp(payload)
        out.update(width=w, height=h, feature=_image_feature(px))
    elif kind == "wav":
        sr, samples = codecs.decode_wav(payload)
        out.update(
            duration_ms=len(samples) * 1000 // sr,
            feature=_audio_feature(samples),
        )
    elif kind == "avi":
        fps, frames = codecs.decode_avi(payload)
        if not frames or fps <= 0:
            # fail per-item with the codec's clean error, not an
            # IndexError/ZeroDivisionError that kills the whole Arrow batch
            raise ValueError(
                f"degenerate AVI for {media_type}: "
                f"{len(frames)} frames at fps={fps}"
            )
        out.update(
            width=frames[0].shape[1],
            height=frames[0].shape[0],
            duration_ms=len(frames) * 1000 // fps,
            n_frames=len(frames),
            feature=_image_feature(np.stack(frames)),
        )
    else:
        raise ValueError(f"unrecognized payload for {media_type}")
    return out


# deterministic real-media parameters, all doc_id arithmetic so the driver's
# SQL oracle can predict decoded metadata AND exact encoded sizes
_AUDIO_SR = 8000
_VIDEO_FPS = 10


def _media_params(doc_id: int) -> dict:
    kind = MEDIA_TYPES[doc_id % 3]
    if kind == "image":
        return {
            "kind": kind,
            "w": 16 + doc_id % 40,
            "h": 12 + (doc_id // 3) % 28,
        }
    if kind == "audio":
        return {"kind": kind, "n": 500 + doc_id % 1500}
    return {
        "kind": kind,
        "w": 16 + doc_id % 16,
        "h": 8 + doc_id % 8,
        "nf": 2 + doc_id % 3,
    }


def _gradient(h: int, w: int, seed: int) -> np.ndarray:
    """(h, w, 3) deterministic gradient image."""
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (x * 3 + y * 7 + seed) % 256,
            (x * 5 + y * 2 + seed * 3) % 256,
            (x + y * 11 + seed * 7) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)


def synth_payload(doc_id: int) -> tuple[str, bytes]:
    """Deterministic REAL media payload for one doc: (media_type, bytes)."""
    p = _media_params(doc_id)
    if p["kind"] == "image":
        return "image", codecs.encode_bmp(_gradient(p["h"], p["w"], doc_id))
    if p["kind"] == "audio":
        freq = 110 + doc_id % 880
        t = np.arange(p["n"], dtype=np.float64) / _AUDIO_SR
        samples = np.round(10000 * np.sin(2 * np.pi * freq * t)).astype(
            np.int16
        )
        return "audio", codecs.encode_wav(samples, _AUDIO_SR)
    frames = [
        _gradient(p["h"], p["w"], doc_id + k * 17) for k in range(p["nf"])
    ]
    return "video", codecs.encode_avi(frames, _VIDEO_FPS)


def attach_real_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL BMP/WAV/AVI media column keyed by doc_id.

    mapInPandas (payload bytes are necessarily built Python-side); the
    generator is pure doc_id arithmetic, so the oracle predicts every
    decoded field without seeing the bytes."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("media", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            recs = []
            for doc_id in b["doc_id"]:
                mt, payload = synth_payload(int(doc_id))
                recs.append(
                    {"doc_id": int(doc_id), "media_type": mt, "media": payload}
                )
            yield pd.DataFrame(recs)

    return docs.select("doc_id").mapInPandas(run, schema=out_schema)


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
                        "n_frames": d.get("n_frames"),
                        "feature": np.asarray(d["feature"], dtype=np.float32),
                    }
                )
            yield pd.DataFrame(recs)

    return media_df.mapInPandas(run, schema=FEATURES_SCHEMA)


def bmp_resize(payload: bytes, max_side: int) -> bytes:
    """REAL resize backend: decode BMP, nearest-neighbor resample so the
    longer side == max_side (aspect preserved, only-downscale), re-encode."""
    w, h, px = codecs.decode_bmp(payload)
    scale = max_side / max(w, h)
    if scale >= 1.0:
        return payload
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    ys = (np.arange(nh) * (h / nh)).astype(np.int64)
    xs = (np.arange(nw) * (w / nw)).astype(np.int64)
    return codecs.encode_bmp(px[ys][:, xs])


def avi_frame_bmp(payload: bytes, frame_idx: int) -> bytes:
    """REAL frame-extract backend: decode AVI, re-encode frame_idx (clamped)
    as a standalone BMP, so downstream image stages run unchanged."""
    _fps, frames = codecs.decode_avi(payload)
    return codecs.encode_bmp(frames[min(frame_idx, len(frames) - 1)])


def resize_images(
    media_df: DataFrame, max_side: int = 224, resize_fn=None
) -> DataFrame:
    """Image transform stage; resize_fn: (payload, max_side) -> payload.
    Defaults to the real BMP nearest-neighbor backend (`bmp_resize`); inject
    e.g. a PIL-backed fn for formats the pure-Python codec doesn't cover."""
    fn = resize_fn or bmp_resize

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

    extract_fn(payload, source_frame_idx) -> frame bytes; defaults to the
    real AVI backend (`avi_frame_bmp`: decode container, re-encode the
    sampled frame as BMP; clamps to the last frame). Output explodes per
    frame, so downstream image stages run unchanged on frames. every_n
    maps sample i -> source frame i * every_n -- the stride is applied at
    the CALL SITE so a custom extract_fn honors it too (it used to live
    inside the default lambda only, silently ignoring every_n for
    user-supplied backends)."""

    fn = extract_fn or avi_frame_bmp

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
                            "frame": fn(payload, i * every_n),
                        }
                    )
            yield pd.DataFrame(recs)

    return (
        media_df.filter(F.col("media_type") == "video")
        .mapInPandas(run, schema=FRAMES_SCHEMA)
    )
