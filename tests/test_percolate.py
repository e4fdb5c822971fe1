"""Percolation (reverse search) gates: AND/OR stored-query semantics
recomputed brute-force in Python over the same corpus; duplicate rule terms
ignored (IGNORE_REPEAT contract); absent-vocabulary AND rules never fire;
and the same plan runs unchanged under Structured Streaming (stateless
projection + broadcast join), matching the batch result batch-for-batch."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.percolate import percolate

DOCS = [
    (1, "alpha bravo charlie"),
    (2, "alpha alpha delta"),
    (3, "bravo echo"),
    (4, "Foxtrot, ALPHA! bravo?"),  # normalization: case + punctuation
    (5, "golf hotel"),
    (6, ""),
]
RULES = [
    (10, ["alpha", "bravo"], "AND"),
    (11, ["alpha", "bravo"], "OR"),
    (12, ["delta", "delta", "alpha"], "AND"),  # dup term ignored -> 2 terms
    (13, ["zzznever"], "OR"),
    (14, ["alpha", "zzznever"], "AND"),
]


def _toks(t):
    return {w for w in re.split(r"[^a-z0-9_]+", (t or "").lower()) if w}


def _expected():
    out = set()
    for d, text in DOCS:
        ts = _toks(text)
        for q, terms, mode in RULES:
            tset = set(terms)
            hit = len(tset & ts)
            if (mode == "AND" and hit == len(tset)) or (
                mode == "OR" and hit >= 1
            ):
                out.add((d, q, hit, len(tset)))
    return out


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rules = spark.createDataFrame(
        RULES, "query_id long, terms array<string>, mode string"
    )
    return docs, rules


def test_percolate_vs_bruteforce(frames):
    docs, rules = frames
    got = {
        (r["doc_id"], r["query_id"], r["n_hit"], r["n_terms"])
        for r in percolate(docs, rules).collect()
    }
    want = _expected()
    assert got == want
    # spot semantics: AND(alpha,bravo) fires on 1 and 4 only; the
    # absent-vocab AND (14) never fires even though alpha is everywhere
    fired = {(d, q) for d, q, _, _ in got}
    assert {(1, 10), (4, 10)} == {p for p in fired if p[1] == 10}
    assert not any(q in (13, 14) for _, q in fired)


def test_percolate_plan_is_pure_projection(frames):
    docs, rules = frames
    p = (
        percolate(docs, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # rules compile into the projection: no shuffle, no join, no Python
    assert "Exchange" not in p
    assert "Join" not in p and "CartesianProduct" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_percolate_guards(frames, spark):
    docs, _ = frames
    bad = spark.createDataFrame(
        [(1, ["x"], "NOT")], "query_id long, terms array<string>, mode string"
    )
    with pytest.raises(ValueError):
        percolate(docs, bad)
    empty = spark.createDataFrame(
        [], "query_id long, terms array<string>, mode string"
    )
    out = percolate(docs, empty)
    assert out.columns == ["doc_id", "query_id", "n_hit", "n_terms"]
    assert out.count() == 0


def test_percolate_streaming_matches_batch(spark, tmp_path):
    docs, rules = (
        spark.createDataFrame(DOCS, "doc_id long, text string"),
        spark.createDataFrame(
            RULES, "query_id long, terms array<string>, mode string"
        ),
    )
    src, out, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    docs.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        percolate(stream, rules)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["query_id"], r["n_hit"], r["n_terms"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == _expected()


def test_percolate_exclude_terms(frames, spark):
    docs, _ = frames
    rules = spark.createDataFrame(
        [
            (20, ["alpha"], "OR", ["bravo"]),   # alpha docs WITHOUT bravo
            (21, ["alpha"], "OR", []),          # empty exclude = no-op
            (22, ["alpha"], "OR", None),        # NULL exclude = no-op
        ],
        "query_id long, terms array<string>, mode string, "
        "exclude array<string>",
    )
    got: dict[int, set[int]] = {20: set(), 21: set(), 22: set()}
    for r in percolate(docs, rules).collect():
        got[r["query_id"]].add(r["doc_id"])
    alpha_docs = {d for d, t in DOCS if "alpha" in _toks(t)}
    bravo_docs = {d for d, t in DOCS if "bravo" in _toks(t)}
    assert got[20] == alpha_docs - bravo_docs
    assert got[21] == alpha_docs and got[22] == alpha_docs
    # a rules frame WITHOUT the exclude column still works (back-compat)
    legacy = spark.createDataFrame(
        [(30, ["alpha"], "OR")],
        "query_id long, terms array<string>, mode string",
    )
    assert {
        r["doc_id"] for r in percolate(docs, legacy).collect()
    } == alpha_docs
