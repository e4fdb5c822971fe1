"""Gates for the multimodal plumbing (deterministic stub codec) and the
Structured Streaming ingestion path (micro-batches -> incremental index,
resumable via checkpoint)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.catalog import Catalog
from open_source_search_engine_spark.operators.index_build import (
    build_index,
    transcripts_to_docs,
)
from open_source_search_engine_spark.operators.multimodal import (
    attach_fake_media,
    media_features,
    resize_images,
    sample_frames,
)
from open_source_search_engine_spark.operators.query import SearchEngine
from open_source_search_engine_spark.sources.transcripts import (
    SCHEMA as TRANSCRIPT_SCHEMA,
    synth_transcripts,
)
from open_source_search_engine_spark.streaming.ingest import (
    ingest_batch,
    start_transcript_stream,
)

N_TURNS = 300


@pytest.fixture(scope="module")
def docs(spark):
    return transcripts_to_docs(synth_transcripts(spark, N_TURNS))


# ---------------------------- multimodal ----------------------------------

def test_media_features_deterministic(spark, docs):
    media = attach_fake_media(docs.filter(F.col("text") != ""))
    feats = media_features(media)
    rows = {r["doc_id"]: r for r in feats.collect()}
    rows2 = {r["doc_id"]: r for r in media_features(media).collect()}
    assert rows.keys() == rows2.keys() and len(rows) > 0
    some = next(iter(rows.values()))
    assert len(some["feature"]) == 8
    for d, r in rows.items():
        assert r["n_bytes"] == 64
        assert rows2[d]["content_hash"] == r["content_hash"]
        assert list(rows2[d]["feature"]) == list(r["feature"])
        if r["media_type"] == "image":
            assert r["width"] and r["height"] and r["duration_ms"] is None
        else:
            assert r["duration_ms"] and r["width"] is None


def test_resize_and_frames_plumbing(spark, docs):
    # fake (md5) payloads exercise the injectable-codec plumbing with
    # explicit stub fns; the real-codec defaults are gated in
    # tests/test_multimodal_codecs.py
    media = attach_fake_media(docs.filter(F.col("text") != ""))
    n_img = media.filter(F.col("media_type") == "image").count()
    resized = resize_images(
        media, resize_fn=lambda p, _s: p[: max(16, len(p) // 2)]
    )
    assert resized.count() == n_img
    assert resized.select(F.max(F.length("media"))).collect()[0][0] <= 64
    n_vid = media.filter(F.col("media_type") == "video").count()
    frames = sample_frames(
        media, n_frames=3, extract_fn=lambda p, i: p[i * 4 : i * 4 + 8]
    )
    assert frames.count() == n_vid * 3
    assert frames.select(F.countDistinct("frame_idx")).collect()[0][0] == 3


# ---------------------------- streaming -----------------------------------

def test_ingest_batch_updates_index(spark, tmp_path_factory, docs):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("stream-wh")))
    build_index(spark, cat, docs)
    new_turns = spark.createDataFrame(
        [("conv-live-1", 0, "user", "streamingterm_zz arrives live", None)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.lit("2026-02-01 00:00:00").cast("timestamp"))
    res = ingest_batch(spark, cat, new_turns)
    assert res["upserted"] == 1
    eng = SearchEngine(spark, cat)
    hits = eng.search_terms(["streamingterm_zz"], "AND", 5).collect()
    assert len(hits) == 1


def test_file_stream_ingestion_and_resume(spark, tmp_path_factory):
    base_dir = tmp_path_factory.mktemp("stream-src")
    wh = str(tmp_path_factory.mktemp("stream-wh2"))
    ckpt = str(tmp_path_factory.mktemp("stream-ckpt"))
    cat = Catalog(spark, wh)
    initial = transcripts_to_docs(synth_transcripts(spark, N_TURNS))
    build_index(spark, cat, initial)
    n0 = cat.read_table("documents").count()

    def drop_file(name, rows):
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, tool string",
        ).withColumn("ts", F.lit("2026-02-01 00:00:00").cast("timestamp"))
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(str(base_dir), name)
        )

    drop_file("batch1", [("conv-s1", 0, "user", "livebatch_one term", None)])
    q = start_transcript_stream(
        spark, cat, str(base_dir) + "/*", ckpt, TRANSCRIPT_SCHEMA
    )
    q.awaitTermination(120)
    assert cat.read_table("documents").count() == n0 + 1

    # second file; restart the stream from the same checkpoint -- batch1
    # must NOT be re-absorbed (resume semantics)
    drop_file("batch2", [("conv-s2", 0, "user", "livebatch_two term", None)])
    q2 = start_transcript_stream(
        spark, cat, str(base_dir) + "/*", ckpt, TRANSCRIPT_SCHEMA
    )
    q2.awaitTermination(120)
    assert cat.read_table("documents").count() == n0 + 2
    eng = SearchEngine(spark, cat)
    assert eng.search_terms(["livebatch_one"], "AND", 5).count() == 1
    assert eng.search_terms(["livebatch_two"], "AND", 5).count() == 1
