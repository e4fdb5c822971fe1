"""Gates for the REAL pure-Python media codecs (functions/codecs.py) and
the real-codec multimodal pipeline (operators/multimodal.py):

 * bit-exact encode->decode round trips for BMP / WAV / AVI, including
   stride padding, chunk-walk decode order, and top-down BMPs;
 * the Spark pipeline over real payloads: decoded metadata equals the
   generator's doc_id formulas (the same contract the driver's SQL oracle
   hash-checks at sf0.01);
 * real resize (nearest-neighbor, aspect-preserving, no-upscale) and real
   AVI frame sampling producing standalone decodable BMPs.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.functions import codecs
from open_source_search_engine_spark.operators.multimodal import (
    _gradient,
    _media_params,
    attach_real_media,
    bmp_resize,
    media_features,
    real_decode,
    resize_images,
    sample_frames,
    synth_payload,
)


# ---------------------------- pure codecs ----------------------------------

@pytest.mark.parametrize("h,w", [(1, 1), (12, 17), (28, 55), (7, 64)])
def test_bmp_roundtrip_and_size(h, w):
    px = _gradient(h, w, seed=h * 100 + w)
    payload = codecs.encode_bmp(px)
    assert len(payload) == codecs.bmp_size(w, h)
    w2, h2, px2 = codecs.decode_bmp(payload)
    assert (w2, h2) == (w, h)
    assert (px2 == px).all()


def test_bmp_top_down_decode():
    # a conformant top-down writer (negative biHeight) must decode to the
    # same pixels as our bottom-up encoder
    px = _gradient(5, 9, seed=3)
    up = bytearray(codecs.encode_bmp(px))
    # flip to top-down: negate height, reverse the row order in place
    stride = ((9 * 3 + 3) // 4) * 4
    struct.pack_into("<i", up, 22, -5)
    rows = np.frombuffer(bytes(up[54:]), np.uint8).reshape(5, stride)
    up[54:] = rows[::-1].tobytes()
    w2, h2, px2 = codecs.decode_bmp(bytes(up))
    assert (w2, h2) == (9, 5)
    assert (px2 == px).all()


def test_bmp_rejects_non_bmp_and_unsupported():
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"JUNKJUNKJUNKJUNK" * 8)
    bad = bytearray(codecs.encode_bmp(_gradient(2, 2, 0)))
    struct.pack_into("<H", bad, 28, 8)  # bpp=8
    with pytest.raises(ValueError):
        codecs.decode_bmp(bytes(bad))


def test_wav_roundtrip_and_chunk_walk():
    s = np.round(12345 * np.sin(np.arange(777) / 9.0)).astype(np.int16)
    payload = codecs.encode_wav(s, 8000)
    assert len(payload) == codecs.wav_size(777)
    sr, s2 = codecs.decode_wav(payload)
    assert sr == 8000 and (s2 == s).all()

    # decoder must walk chunks, not assume the canonical 44-byte layout:
    # inject an odd-sized LIST chunk (pad byte) before fmt/data
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    rebuilt = (
        payload[:12]
        + extra
        + payload[12:]
    )
    rebuilt = (
        b"RIFF" + struct.pack("<I", len(rebuilt) - 8) + rebuilt[8:]
    )
    sr, s2 = codecs.decode_wav(rebuilt)
    assert sr == 8000 and (s2 == s).all()


@pytest.mark.parametrize("n_frames,h,w", [(1, 8, 16), (4, 9, 18), (3, 15, 31)])
def test_avi_roundtrip_and_size(n_frames, h, w):
    frames = [_gradient(h, w, seed=k * 17 + 1) for k in range(n_frames)]
    payload = codecs.encode_avi(frames, fps=10)
    assert len(payload) == codecs.avi_size(w, h, n_frames)
    fps, frames2 = codecs.decode_avi(payload)
    assert fps == 10 and len(frames2) == n_frames
    for a, b in zip(frames, frames2):
        assert (a == b).all()


def test_sniff_media():
    assert codecs.sniff_media(codecs.encode_bmp(_gradient(2, 2, 0))) == "bmp"
    assert (
        codecs.sniff_media(codecs.encode_wav(np.zeros(4, np.int16), 8000))
        == "wav"
    )
    assert (
        codecs.sniff_media(codecs.encode_avi([_gradient(2, 2, 0)])) == "avi"
    )
    assert codecs.sniff_media(b"\x89PNG\r\n") is None


# ---------------------------- real pipeline --------------------------------

def test_real_decode_matches_generator_params():
    for d in range(60):
        mt, payload = synth_payload(d)
        out = real_decode(payload, mt)
        p = _media_params(d)
        if mt == "image":
            assert (out["width"], out["height"]) == (p["w"], p["h"])
            assert len(payload) == codecs.bmp_size(p["w"], p["h"])
        elif mt == "audio":
            assert out["duration_ms"] == p["n"] * 1000 // 8000
            assert len(payload) == codecs.wav_size(p["n"])
        else:
            assert out["n_frames"] == p["nf"]
            assert (out["width"], out["height"]) == (p["w"], p["h"])
            assert out["duration_ms"] == p["nf"] * 100
            assert len(payload) == codecs.avi_size(p["w"], p["h"], p["nf"])
        assert len(out["feature"]) == 8
        assert all(np.isfinite(np.asarray(out["feature"], dtype=np.float64)))


def test_media_features_real_codec_spark(spark):
    docs = spark.range(0, 90).select(F.col("id").alias("doc_id"))
    media = attach_real_media(docs)
    feats = media_features(media, decode_fn=real_decode)
    rows = {r["doc_id"]: r for r in feats.collect()}
    assert len(rows) == 90
    for d, r in rows.items():
        p = _media_params(d)
        if p["kind"] == "image":
            assert (r["width"], r["height"]) == (p["w"], p["h"])
            assert r["n_bytes"] == codecs.bmp_size(p["w"], p["h"])
        elif p["kind"] == "audio":
            assert r["duration_ms"] == p["n"] * 1000 // 8000
        else:
            assert r["n_frames"] == p["nf"]
        # feature must equal a driver-side recompute of the same payload
        _, payload = synth_payload(d)
        expect = real_decode(payload, p["kind"])["feature"]
        assert np.allclose(np.asarray(r["feature"]), expect, atol=1e-6)


def test_resize_images_real_backend(spark):
    # image doc_ids with width > 24 get downscaled; aspect preserved
    docs = spark.range(0, 45).select(F.col("id").alias("doc_id"))
    media = attach_real_media(docs)
    resized = resize_images(media, max_side=24)
    for r in resized.collect():
        w, h, px = codecs.decode_bmp(bytes(r["media"]))
        p = _media_params(r["doc_id"])
        if max(p["w"], p["h"]) <= 24:  # no-upscale passthrough
            assert (w, h) == (p["w"], p["h"])
        else:
            assert max(w, h) == 24
            scale = 24 / max(p["w"], p["h"])
            assert (w, h) == (
                max(1, int(p["w"] * scale)),
                max(1, int(p["h"] * scale)),
            )
        # nearest-neighbor: every resized pixel exists at the sampled
        # source coordinate of the original gradient
        src = _gradient(p["h"], p["w"], r["doc_id"])
        ys = (np.arange(h) * (p["h"] / h)).astype(np.int64)
        xs = (np.arange(w) * (p["w"] / w)).astype(np.int64)
        assert (px == src[ys][:, xs]).all()


def test_sample_frames_real_backend(spark):
    docs = spark.range(0, 45).select(F.col("id").alias("doc_id"))
    media = attach_real_media(docs)
    frames = sample_frames(media, every_n=1, n_frames=2)
    got = frames.collect()
    n_vid = sum(1 for d in range(45) if d % 3 == 2)
    assert len(got) == n_vid * 2
    for r in got:
        w, h, px = codecs.decode_bmp(bytes(r["frame"]))
        p = _media_params(r["doc_id"])
        assert (w, h) == (p["w"], p["h"])
        # frame content matches the generator's per-frame seed (clamped)
        k = min(r["frame_idx"], p["nf"] - 1)
        assert (px == _gradient(p["h"], p["w"], r["doc_id"] + k * 17)).all()


def test_bmp_resize_is_deterministic_and_idempotent_at_target():
    big = _gradient(40, 60, 5)
    payload = codecs.encode_bmp(big)
    once = bmp_resize(payload, 30)
    assert bmp_resize(payload, 30) == once
    assert bmp_resize(once, 30) == once  # already at target -> passthrough
