"""Corpus drift monitor (vocab_drift) gates: full brute-force recompute of
the add-one-smoothed log probability ratios over a planted pair of slices,
planted-mover surfacing (a term that explodes in B must lead), the
min_count hapax damp, and one-sided terms living on the union-vocabulary
smoothing floor instead of dividing by zero."""

from __future__ import annotations

import math
import re

import pytest

from open_source_search_engine_spark.operators.text_analysis import (
    vocab_drift,
)

A = [
    (1, "alpha alpha alpha bravo charlie common common"),
    (2, "alpha bravo common common delta"),
]
B = [
    (10, "zulu zulu zulu zulu bravo common common"),
    (11, "zulu zulu charlie common common delta"),
]


def _counts(rows):
    out: dict[str, int] = {}
    for _, t in rows:
        for w in re.split(r"[^a-z0-9_]+", t.lower()):
            if w:
                out[w] = out.get(w, 0) + 1
    return out


def _expected(min_count, top_k):
    ca, cb = _counts(A), _counts(B)
    vocab = set(ca) | set(cb)
    na, nb, v = sum(ca.values()), sum(cb.values()), len(vocab)
    rows = []
    for t in vocab:
        a, b = ca.get(t, 0), cb.get(t, 0)
        if a + b < min_count:
            continue
        lr = math.log(((b + 1) / (nb + v)) / ((a + 1) / (na + v)))
        rows.append((t, a, b, lr))
    rows.sort(key=lambda r: (-abs(r[3]), r[0]))
    return rows[:top_k]


@pytest.fixture(scope="module")
def frames(spark):
    return (
        spark.createDataFrame(A, "doc_id long, text string"),
        spark.createDataFrame(B, "doc_id long, text string"),
    )


def test_drift_vs_bruteforce(frames):
    da, db = frames
    got = vocab_drift(da, db, min_count=2, top_k=50).collect()
    want = _expected(2, 50)
    assert [(r["term"], r["c_a"], r["c_b"]) for r in got] == [
        (t, a, b) for t, a, b, _ in want
    ]
    for r, (_, _, _, lr) in zip(got, want):
        assert r["log_ratio"] == pytest.approx(lr, rel=1e-12)


def test_planted_mover_leads_and_hapax_damped(frames):
    da, db = frames
    got = vocab_drift(da, db, min_count=2, top_k=3).collect()
    # zulu: 0 -> 6 occurrences, the biggest mover either direction
    assert got[0]["term"] == "zulu" and got[0]["c_a"] == 0
    # delta (1+1 occurrences) vanishes at min_count=3
    terms3 = {
        r["term"] for r in vocab_drift(da, db, min_count=3, top_k=50).collect()
    }
    assert "delta" not in terms3
    # the flat term never outranks the planted movers
    assert "common" not in {r["term"] for r in got}
