"""requireAllTerms=false serving (search_relaxed, Msg3a.cpp:124-126 rat):
full-coverage docs are PREFERRED, partial matchers fill the page. Gates:
tier ordering (every full doc above every partial doc), within-tier score
ordering, agreement with AND (full tier == AND result set) and OR (page ==
top of the tiered OR ranking), absent-term phase contract, and one-job
plan shape (TakeOrderedAndProject, no window)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.catalog import Catalog
from open_source_search_engine_spark.operators.index_build import (
    IndexConfig,
    build_index,
)
from open_source_search_engine_spark.operators.query import SearchEngine

ROWS = [
    (1, "alpha bravo charlie delta"),
    (2, "alpha bravo echo"),
    (3, "alpha foxtrot golf"),
    (4, "bravo hotel india"),
    (5, "alpha alpha alpha bravo"),  # strong full match
    (6, "juliet kilo lima"),
    (7, "alpha alpha alpha alpha alpha alpha"),  # strong PARTIAL match
]
Q = ["alpha", "bravo"]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("rat-wh")))
    build_index(
        spark,
        cat,
        spark.createDataFrame(ROWS, "doc_id long, text string"),
        IndexConfig(),
    )
    return SearchEngine(spark, cat)


def test_tiering_and_agreement_with_and_or(eng):
    page = eng.search_relaxed(Q, k=10).collect()
    phases = [r["phase"] for r in page]
    # tiers are contiguous: no partial ever above a full
    assert phases == sorted(phases, key=lambda p: p != "full")
    full = [r["doc_id"] for r in page if r["phase"] == "full"]
    and_hits = {
        r["doc_id"]: r["score"]
        for r in eng.search_terms(Q, "AND", 10).collect()
    }
    assert set(full) == set(and_hits)
    # scores are the plain OR scores, tiers ordered score desc inside
    or_hits = {
        r["doc_id"]: r["score"]
        for r in eng.search_terms(Q, "OR", 10).collect()
    }
    for r in page:
        assert r["score"] == or_hits[r["doc_id"]]
    for tier in ("full", "partial"):
        scores = [r["score"] for r in page if r["phase"] == tier]
        assert scores == sorted(scores, reverse=True)
    # the alpha-only docs (3, 7) make the page but only in the partial tier
    by_id = {r["doc_id"]: r["phase"] for r in page}
    assert by_id.get(3) == "partial" and by_id.get(7) == "partial"


def test_absent_term_phase_contract(eng):
    # an absent term can match nothing: full tier = docs matching every
    # PRESENT term (same contract as plan_terms)
    page = eng.search_relaxed(["alpha", "bravo", "zzznever"], k=10).collect()
    full = {r["doc_id"] for r in page if r["phase"] == "full"}
    and_hits = {r["doc_id"] for r in eng.search_terms(Q, "AND", 10).collect()}
    assert full == and_hits


def test_relaxed_plan_is_single_topk(eng):
    p = (
        eng.search_relaxed(Q, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in p
    assert "Window" not in p
