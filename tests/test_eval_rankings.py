"""eval_rankings (trec_eval graded metrics): hand-computed tiny example with
every boundary — graded gains, rel=0 rows, queries with no results, results
with no qrels, and the cutoff."""

from __future__ import annotations

import math

import pytest

from open_source_search_engine_spark.operators.evaluation import eval_rankings


@pytest.fixture(scope="module")
def graded(spark):
    results = spark.createDataFrame(
        [
            ("q1", 20, 1),   # docB first
            ("q1", 99, 2),   # irrelevant
            ("q1", 10, 3),   # docA third
            ("q1", 30, 11),  # docC but PAST the k=10 cutoff
            ("q3", 10, 1),   # q3 has no qrels -> dropped
        ],
        "query_id STRING, doc_id LONG, rank LONG",
    )
    qrels = spark.createDataFrame(
        [
            ("q1", 10, 3.0),
            ("q1", 20, 2.0),
            ("q1", 30, 1.0),
            ("q1", 40, 0.0),  # rel=0: judged NOT relevant
            ("q2", 10, 2.0),  # q2: qrels but no results -> zeros
        ],
        "query_id STRING, doc_id LONG, rel DOUBLE",
    )
    rows = eval_rankings(results, qrels, k=10).collect()
    return {r["query_id"]: r for r in rows}


def test_hand_computed_q1(graded):
    r = graded["q1"]
    assert r["n_rel"] == 3 and r["n_hit"] == 2
    assert r["recall"] == pytest.approx(2 / 3)
    assert r["mrr"] == pytest.approx(1.0)  # first hit at rank 1
    dcg = (2**2 - 1) / math.log2(2) + (2**3 - 1) / math.log2(4)
    idcg = (
        (2**3 - 1) / math.log2(2)
        + (2**2 - 1) / math.log2(3)
        + (2**1 - 1) / math.log2(4)
    )
    assert r["dcg"] == pytest.approx(dcg)
    assert r["idcg"] == pytest.approx(idcg)
    assert r["ndcg"] == pytest.approx(dcg / idcg)


def test_query_with_no_results_scores_zero(graded):
    r = graded["q2"]
    assert r["n_hit"] == 0 and r["recall"] == 0.0
    assert r["mrr"] == 0.0 and r["dcg"] == 0.0 and r["ndcg"] == 0.0
    assert r["idcg"] > 0


def test_query_without_qrels_dropped(graded):
    assert "q3" not in graded


def test_perfect_ranking_is_ndcg_one(spark):
    qrels = spark.createDataFrame(
        [("q", 1, 3.0), ("q", 2, 2.0), ("q", 3, 1.0)],
        "query_id STRING, doc_id LONG, rel DOUBLE",
    )
    results = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "query_id STRING, doc_id LONG, rank LONG",
    )
    r = eval_rankings(results, qrels, k=10).collect()[0]
    assert r["ndcg"] == pytest.approx(1.0)
    assert r["recall"] == pytest.approx(1.0)
    assert r["mrr"] == pytest.approx(1.0)


def test_cutoff_truncates_ideal_too(spark):
    # 3 relevant docs, k=2: ideal DCG uses only the best 2 grades
    qrels = spark.createDataFrame(
        [("q", 1, 3.0), ("q", 2, 2.0), ("q", 3, 1.0)],
        "query_id STRING, doc_id LONG, rel DOUBLE",
    )
    results = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2)],
        "query_id STRING, doc_id LONG, rank LONG",
    )
    r = eval_rankings(results, qrels, k=2).collect()[0]
    assert r["ndcg"] == pytest.approx(1.0)  # best possible 2-prefix
    assert r["recall"] == pytest.approx(2 / 3)
