"""Streaming exact-dedup screen: cross-micro-batch seen-content suppression.

The batch dedup suite (operators/dedup.py) screens a materialized corpus;
an ingest pipeline wants the same screen ON THE STREAM, so a re-posted or
mirrored document never reaches the index build at all (the reference
dedups at spider time by content hash -- `gbcontenthash:` termId dedup,
`XmlDoc_Indexing.cpp:156` hashNoSplit -- which is exactly an ingest-time
screen, not a serve-time one).

Why not ``stream.dropDuplicates(["content_hash"])``: that keeps an
ARBITRARY row per hash (whichever executor saw one first), emits no
telemetry, and its state never records how much was suppressed. This
operator is the custom-stateful spelling (applyInPandasWithState, the
same pattern as streaming/sessionize.py): state per content hash holds a
seen flag + suppressed-count, the kept row is DETERMINISTIC (first batch
to arrive wins; within a batch the lowest (conv_id, turn_idx) wins), and
each emitted row carries ``n_dupes_so_far``. Scope of that counter: the
kept row is emitted exactly once (append mode), so the value it carries
is the suppressed count AT EMISSION TIME -- i.e. the duplicates within
the first batch that contained the text. Later-batch suppressions keep
accumulating in state (and keep suppressing) but are not re-emitted;
a pipeline that needs cross-batch pressure telemetry should aggregate
the suppressed inputs upstream instead.

Rows with NULL text (tool-call turns -- the input_hint schema allows
them, that is what the ``tool`` column is for) are NOT content and pass
through unscreened: md5(NULL) is NULL, so grouping them would collapse
every NULL-text turn in the stream into one state group and silently
drop all but the first.

Scale notes (100 TB): state is one tiny row per DISTINCT content hash --
bounded by unique content, not traffic; the hash group key shuffles only
the micro-batch (state store lookups are local per partition). For
unbounded-vocabulary streams pass ``state_ttl_minutes`` to evict idle
hashes (a re-post after the TTL is then kept again -- the standard
recall/state trade)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("n_dupes_so_far", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("seen", T.IntegerType()),
        T.StructField("n_dupes", T.LongType()),
    ]
)

_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _dedup_fn(state_ttl_minutes: int | None):
    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle-hash eviction: forget the content hash (a later re-post
            # is kept again); nothing is emitted
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        seen, n_dupes = state.get if state.exists else (0, 0)
        out = None
        if not seen:
            out = rows.iloc[:1].copy()
            n_dupes += len(rows) - 1
        else:
            n_dupes += len(rows)
        state.update((1, n_dupes))
        if state_ttl_minutes is not None:
            state.setTimeoutDuration(state_ttl_minutes * 60 * 1000)
        if out is not None:
            out["n_dupes_so_far"] = n_dupes
            yield out[_COLS + ["n_dupes_so_far"]]

    return fn


def streaming_dedup_screen(
    turns: DataFrame, state_ttl_minutes: int | None = None
) -> DataFrame:
    """Drop stream rows whose exact text content was already emitted.

    ``turns``: a STREAMING DataFrame with the input_hint transcript schema
    (conv_id, turn_idx, role, text, tool, ts). Returns the surviving rows
    plus ``n_dupes_so_far`` (suppressed count for that content hash, at
    emission time this is the within-first-batch duplicate count).

    Keep-first determinism: the first micro-batch containing a given text
    wins; within that batch the lowest (conv_id, turn_idx) row is kept.
    md5 matches the batch path's exact_dedup, so a batch backfill and the
    stream screen agree on group identity.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    screened = (
        turns.filter(F.col("text").isNotNull())
        .withColumn("content_hash", F.md5(F.col("text")))
        .groupBy("content_hash")
        .applyInPandasWithState(
            _dedup_fn(state_ttl_minutes),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
    # NULL-text rows are not content: pass through (see module docstring)
    passthrough = turns.filter(F.col("text").isNull()).withColumn(
        "n_dupes_so_far", F.lit(0).cast("long")
    )
    return screened.unionByName(passthrough.select(*_COLS, "n_dupes_so_far"))
