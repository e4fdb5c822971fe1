"""Event-stream operators: time rollups, sessionization, as-of joins.

The reference has no general analytics operators (SURVEY.md §2.3: "no
theta/range/as-of joins exist") -- these are the standard event-table
operations a transcript/agent-log pipeline needs, expressed in the shapes
Spark executes well:

* rollup     -- tumbling-window aggregation (groupBy time bucket; Catalyst
                partial aggregation; at scale the bucket is the partition
                column of the rollup table)
* sessionize -- gaps-and-islands via window lag/cumsum (one shuffle per
                user; no self-join)
* as_of_join -- "latest right row at-or-before each left row" via the
                union + last_value(ignoreNulls) window trick: ONE shuffle on
                (key, ts), no range join, no skew amplification -- the
                idiomatic distributed as-of join (a sort-merge interval
                join would shuffle both sides too but then pay a per-row
                range probe)

All three are SQL-expressible and oracle-gated in the driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rollup_events(
    events: DataFrame,
    bucket: str = "1 day",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window rollup: (bucket_start, key, n, sum, avg)."""
    w = F.window(F.col(ts_col), bucket)
    return (
        events.groupBy(w.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("sum_value"),
            F.avg(value_col).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            key_col,
            "n",
            "sum_value",
            "avg_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the gap to
    the user's previous event exceeds ``gap_minutes``. Output one row per
    session: (user_id, session_idx, session_start, session_end, n_events,
    sum_value).

    ``id_col`` is the deterministic tie-break among same-timestamp events;
    when the frame has no such column, ordering falls back to ts alone
    (session BOUNDARIES are unaffected -- a zero gap never starts a
    session -- only which tied row counts as "first" is arbitrary)."""
    order = [ts_col] + ([id_col] if id_col and id_col in events.columns else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = us - F.lag(us).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sessed = events.withColumn(
        "session_idx", F.sum(new_sess).over(w).cast("long")
    )
    return sessed.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("sum_value"),
    )


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    right_order_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the LATEST right row with the same key and
    right_ts <= left_ts (NULLs when none). Union trick: tag both sides,
    sort by (key, ts, side) with right rows first on ties, carry right
    payloads forward with last_value(ignoreNulls) -- one shuffle total.

    ``right_order_col``: deterministic tie-break among multiple RIGHT rows at
    the same (key, ts) -- the row with the greatest value wins (e.g. an
    event id). Without it such ties resolve arbitrarily by partition order.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (key_col, right_ts)
    ]
    l = left.withColumn("_side", F.lit(1)).withColumn(
        "_ats", F.col(left_ts)
    )
    # the whole right payload travels as ONE struct: carrying each column
    # independently with last(ignorenulls) would mix values from DIFFERENT
    # right rows whenever a payload column is NULL (the joined row would
    # never have existed in right); the struct is non-null for every right
    # row, so last(ignorenulls) attaches the latest right ROW atomically
    pay = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        F.col(key_col),
        F.col(right_ts).alias("_ats"),
        pay.alias("_rpay"),
        *([F.col(right_order_col).alias("_rord")] if right_order_col else []),
    ).withColumn("_side", F.lit(0))
    merged = l.unionByName(r, allowMissingColumns=True)
    if right_order_col:
        # right rows ordered among themselves by _rord asc, so last_value
        # picks the greatest -- a total, deterministic order
        order = [F.col("_ats"), F.col("_side"), F.col("_rord").asc_nulls_last()]
    else:
        order = [F.col("_ats"), F.col("_side")]
    # right rows sort BEFORE left rows at equal timestamps => "<=" semantics
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = merged.withColumn(
        "_rpay", F.last(F.col("_rpay"), ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_side") == 1)
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_rpay.{c}"))
    out = out.withColumn(f"{right_ts}{suffix}", F.col("_rpay.__rts"))
    drop = ["_side", "_ats", "_rpay"] + (["_rord"] if right_order_col else [])
    return out.drop(*drop)


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
    min_count: int = 1,
) -> DataFrame:
    """First-order transition table over per-user event streams — the
    Markov funnel an agent-log pipeline reads tool/action flows from
    (which step follows which, and with what probability). The reference
    has no sequence analytics at all (SURVEY.md §2.3); this is the
    event-table sibling of sessionize, sharing its exact shuffle shape.

    Per user, events order by (ts, order_col) — the tiebreaker makes the
    lag deterministic under equal timestamps — and each adjacent pair
    (prev_type -> next_type) counts once. Output per observed pair:
    (prev_type, next_type, n, p) with p = n / total transitions leaving
    prev_type (rows ordered n DESC, prev_type ASC, next_type ASC;
    ``min_count`` prunes rare pairs AFTER the conditional totals are
    taken, so p still sums to 1 per prev_type across the unpruned set).

    Scale shape: ONE shuffle on user_col for the lag window (identical
    to sessionize), then a map-side-combined pair count; the per-prev
    totals ride a window over the (tiny) pair table, not the events.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    pairs = (
        events.select(
            F.lag(type_col).over(w).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = Window.partitionBy("prev_type")
    return (
        pairs.withColumn("p", F.col("n") / F.sum("n").over(tot))
        .filter(F.col("n") >= int(min_count))
        .orderBy(F.desc("n"), F.asc("prev_type"), F.asc("next_type"))
    )
