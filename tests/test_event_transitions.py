"""Event transition table (event_transitions) gates: brute-force recompute
over a planted multi-user stream (cross-user pairs must NOT count, equal
timestamps break by order_col), conditional p sums to 1 per prev_type
before pruning, and min_count prunes pairs without re-normalizing."""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.operators.events import (
    event_transitions,
)

ROWS = [
    # user 1: a -> b -> a -> c
    (1, 1, "a", "2024-01-01 00:00:01"),
    (2, 1, "b", "2024-01-01 00:00:02"),
    (3, 1, "a", "2024-01-01 00:00:03"),
    (4, 1, "c", "2024-01-01 00:00:04"),
    # user 2: b -> a -> b  (user boundary must cut the c->b pair)
    (5, 2, "b", "2024-01-01 00:00:01"),
    (6, 2, "a", "2024-01-01 00:00:02"),
    (7, 2, "b", "2024-01-01 00:00:03"),
    # user 3: equal timestamps -> event_id order decides: a -> b -> c
    (8, 3, "a", "2024-01-01 00:00:05"),
    (9, 3, "b", "2024-01-01 00:00:05"),
    (10, 3, "c", "2024-01-01 00:00:05"),
]
# expected pairs: u1 (a,b),(b,a),(a,c); u2 (b,a),(a,b); u3 (a,b),(b,c)
EXPECTED = {
    ("a", "b"): 3,
    ("b", "a"): 2,
    ("a", "c"): 1,
    ("b", "c"): 1,
}


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(
        ROWS, "event_id long, user_id long, event_type string, ts string"
    ).selectExpr(
        "event_id", "user_id", "event_type", "CAST(ts AS TIMESTAMP) AS ts"
    )


def test_transitions_vs_bruteforce(ev):
    got = {
        (r["prev_type"], r["next_type"]): (r["n"], r["p"])
        for r in event_transitions(ev).collect()
    }
    assert {k: v[0] for k, v in got.items()} == EXPECTED
    # conditional p per prev_type: a -> {b: 3/4, c: 1/4}; b -> {a: 2/3, c: 1/3}
    assert got[("a", "b")][1] == pytest.approx(0.75)
    assert got[("a", "c")][1] == pytest.approx(0.25)
    assert got[("b", "a")][1] == pytest.approx(2 / 3)
    assert got[("b", "c")][1] == pytest.approx(1 / 3)


def test_min_count_prunes_without_renormalizing(ev):
    got = {
        (r["prev_type"], r["next_type"]): r["p"]
        for r in event_transitions(ev, min_count=2).collect()
    }
    assert set(got) == {("a", "b"), ("b", "a")}
    # p still reflects the FULL conditional distribution
    assert got[("a", "b")] == pytest.approx(0.75)
    assert got[("b", "a")] == pytest.approx(2 / 3)


def test_ordering_is_deterministic(ev):
    rows = event_transitions(ev).collect()
    key = [(-r["n"], r["prev_type"], r["next_type"]) for r in rows]
    assert key == sorted(key)


def test_props_extract_schema_on_read(spark):
    """q_props_extract's JSON path: planted rows, brute-force comparison,
    malformed / missing-key props fall out as NULL (never error)."""
    from open_source_search_engine_spark.entry import q_props_extract
    import os

    rows = [
        (1, "a", 10.0, '{"k": 60}'),
        (2, "a", 20.0, '{"k": 40}'),      # filtered: k < 50
        (3, "b", 30.0, '{"k": 70}'),
        (4, "b", 50.0, '{"j": 1}'),        # missing key -> NULL -> filtered
        (5, "b", 70.0, "not json"),        # malformed -> NULL -> filtered
        (6, "b", 40.0, '{"k": 90}'),
    ]
    d = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, props string"
    )
    import tempfile

    sf = tempfile.mkdtemp(prefix="props-sf-")
    d.write.parquet(os.path.join(sf, "events.parquet"))
    got = {r["event_type"]: r for r in q_props_extract(spark, sf).collect()}
    assert got["a"]["n"] == 1 and got["a"]["avg_k"] == 60.0
    assert got["b"]["n"] == 2
    assert got["b"]["avg_value"] == 35.0 and got["b"]["avg_k"] == 80.0
