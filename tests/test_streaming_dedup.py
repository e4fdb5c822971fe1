"""Streaming exact-dedup screen gates: cross-micro-batch suppression with
deterministic keep-first, agreement with the batch exact_dedup grouping,
and state carrying across separately-written source batches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from open_source_search_engine_spark.streaming.dedup import (
    streaming_dedup_screen,
)

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _mk_turns(spark, rows):
    return spark.createDataFrame(
        [(c, i, "user", t, None, ts) for c, i, t, ts in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


B1 = [
    ("c1", 0, "hello world", "2026-01-01 10:00:00"),
    ("c1", 1, "unique one", "2026-01-01 10:01:00"),
    ("c2", 0, "hello world", "2026-01-01 10:02:00"),  # dup within batch 1
    ("c9", 5, "hello world", "2026-01-01 10:03:00"),  # dup within batch 1
]
B2 = [
    ("c3", 0, "hello world", "2026-01-01 11:00:00"),  # dup across batches
    ("c3", 1, "unique two", "2026-01-01 11:01:00"),
    ("c0", 9, "unique one", "2026-01-01 11:02:00"),  # dup across batches
]


def _run(spark, src, ckpt, out):
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src + "/*")
    q = (
        streaming_dedup_screen(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_keep_first_within_and_across_batches(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("sd-src"))
    ckpt = str(tmp_path_factory.mktemp("sd-ckpt"))
    out = str(tmp_path_factory.mktemp("sd-out"))
    _mk_turns(spark, B1).coalesce(1).write.parquet(os.path.join(src, "b1"))
    _run(spark, src, ckpt, out)
    _mk_turns(spark, B2).coalesce(1).write.parquet(os.path.join(src, "b2"))
    _run(spark, src, ckpt, out)

    got = {
        (r["conv_id"], r["turn_idx"], r["text"]): r["n_dupes_so_far"]
        for r in spark.read.parquet(out).collect()
    }
    # batch 1: "hello world" kept once at the lowest (conv_id, turn_idx),
    # with both batch-1 duplicates counted; batch-2 re-posts are suppressed
    assert got == {
        ("c1", 0, "hello world"): 2,
        ("c1", 1, "unique one"): 0,
        ("c3", 1, "unique two"): 0,
    }


def test_grouping_agrees_with_batch_exact_dedup(spark, tmp_path_factory):
    from open_source_search_engine_spark.operators.dedup import exact_dedup

    src = str(tmp_path_factory.mktemp("sd2-src"))
    ckpt = str(tmp_path_factory.mktemp("sd2-ckpt"))
    out = str(tmp_path_factory.mktemp("sd2-out"))
    all_turns = _mk_turns(spark, B1 + B2)
    all_turns.coalesce(1).write.parquet(os.path.join(src, "b1"))
    _run(spark, src, ckpt, out)

    # one surviving row per batch-dedup content-hash group, and the
    # suppressed counts account for every duplicate row
    batch = exact_dedup(
        all_turns.withColumn(
            "doc_id", F.monotonically_increasing_id()
        )
    ).collect()
    survivors = spark.read.parquet(out).collect()
    assert len(survivors) == len(batch)
    n_rows = len(B1 + B2)
    assert n_rows - len(survivors) == sum(
        r["n_dupes_so_far"] for r in survivors
    )


def test_null_text_tool_turns_pass_through(spark, tmp_path_factory):
    # md5(NULL) is NULL: without the passthrough every NULL-text tool turn
    # after the first would be silently dropped as a "duplicate"
    src = str(tmp_path_factory.mktemp("sd3-src"))
    ckpt = str(tmp_path_factory.mktemp("sd3-ckpt"))
    out = str(tmp_path_factory.mktemp("sd3-out"))
    rows = spark.createDataFrame(
        [
            ("c1", 0, "tool", None, "search", "2026-01-01 10:00:00"),
            ("c2", 0, "tool", None, "browse", "2026-01-01 10:01:00"),
            ("c3", 0, "user", "real text", None, "2026-01-01 10:02:00"),
            ("c4", 0, "user", "real text", None, "2026-01-01 10:03:00"),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows.coalesce(1).write.parquet(os.path.join(src, "b1"))
    _run(spark, src, ckpt, out)
    got = sorted(
        (r["conv_id"], r["text"], r["tool"])
        for r in spark.read.parquet(out).collect()
    )
    # both NULL-text tool turns survive; the text dup is still screened
    assert got == [
        ("c1", None, "search"),
        ("c2", None, "browse"),
        ("c3", "real text", None),
    ]
