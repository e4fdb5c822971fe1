"""Stateful streaming gate: applyInPandasWithState sessionization over a
file-source stream emits exactly the CLOSED sessions of the batch
gaps-and-islands operator, and state carries across micro-batches."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.events import sessionize
from open_source_search_engine_spark.streaming.sessionize import (
    streaming_sessionize,
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def _mk_events(spark, rows):
    return (
        spark.createDataFrame(
            [(i, ts, u, "e", v) for i, (u, ts, v) in enumerate(rows)],
            "event_id long, ts string, user_id long, event_type string, value double",
        )
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


ROWS = [
    # user 1: two closed sessions + one open tail
    (1, "2026-01-01 10:00:00", 1.0),
    (1, "2026-01-01 10:10:00", 2.0),
    (1, "2026-01-01 12:00:00", 3.0),  # >30min gap -> closes session 1
    (1, "2026-01-01 12:05:00", 4.0),
    (1, "2026-01-01 15:00:00", 5.0),  # closes session 2; stays open
    # user 2: one closed + open tail
    (2, "2026-01-01 09:00:00", 10.0),
    (2, "2026-01-01 11:00:00", 20.0),
]


def test_streaming_matches_batch_closed_sessions(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("sess-src"))
    ckpt = str(tmp_path_factory.mktemp("sess-ckpt"))
    ev = _mk_events(spark, ROWS)
    ev.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))

    out = str(tmp_path_factory.mktemp("sess-out"))

    def run_stream():
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src + "/*")
        q = (
            streaming_sessionize(stream, gap_minutes=30)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_stream()
    got = {
        (r["user_id"], r["session_start_us"], r["session_end_us"],
         r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }

    batch = sessionize(ev, gap_minutes=30)
    # closed sessions = all but each user's LAST session
    last = batch.groupBy("user_id").agg(
        F.max("session_idx").alias("last_idx")
    )
    closed_batch = batch.join(last, "user_id").filter(
        F.col("session_idx") < F.col("last_idx")
    )
    want = {
        (
            r["user_id"],
            int(r["session_start"].timestamp() * 1_000_000),
            int(r["session_end"].timestamp() * 1_000_000),
            r["n_events"],
            float(r["sum_value"]),
        )
        for r in closed_batch.collect()
    }
    assert got == want and len(got) == 3

    # second batch: a late event for user 2 closes their open session
    more = _mk_events(spark, [(2, "2026-01-01 13:00:00", 30.0)])
    more.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b2"))
    run_stream()  # resumes from the SAME checkpoint: state carried over
    rows2 = spark.read.parquet(out).collect()
    assert len(rows2) == len(got) + 1
    assert any(
        r["user_id"] == 2 and r["n_events"] == 1 and r["sum_value"] == 20.0
        for r in rows2
    )
