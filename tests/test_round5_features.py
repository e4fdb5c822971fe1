"""Round-5 serving/lifecycle features.

* search_with_suggestion — did-you-mean IN the result flow
  (`Speller.cpp:69` unified dict consulted from the SERP path): fallback
  fires only below min_results, auto-requery serves the corrected terms,
  healthy queries ship untouched with a NULL suggestion.
"""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.catalog import Catalog
from open_source_search_engine_spark.operators.index_build import (
    IndexConfig,
    build_index,
    transcripts_to_docs,
)
from open_source_search_engine_spark.operators.query import SearchEngine
from open_source_search_engine_spark.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("r5-wh"))
    catalog = Catalog(spark, wh)
    build_index(
        spark,
        catalog,
        transcripts_to_docs(synth_transcripts(spark, 600)),
        IndexConfig(),
    )
    return SearchEngine(spark, catalog)


def test_fallback_fires_and_requeries(eng):
    out = eng.search_with_suggestion("sprak index", k=5).collect()
    assert out, "corrected query should match docs"
    sq = {r["suggested_query"] for r in out}
    assert sq == {"spark index"}
    corrected = eng.search_terms(["spark", "index"], mode="AND", k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in out] == [
        (r["doc_id"], r["score"]) for r in corrected
    ]


def test_healthy_query_served_as_is(eng):
    out = eng.search_with_suggestion("spark index", k=5).collect()
    assert out
    assert all(r["suggested_query"] is None for r in out)
    base = eng.search("spark index", k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in out] == [
        (r["doc_id"], r["score"]) for r in base
    ]


def test_hopeless_term_no_recommendation(eng):
    # nothing within 2 edits -> no correction, empty result, NULL suggestion
    out = eng.search_with_suggestion("xqzvwjkpt index", k=5).collect()
    assert out == []


def test_no_auto_requery_attaches_suggestion_only(eng):
    out = eng.search_with_suggestion(
        "sprak index", k=5, auto_requery=False
    ).collect()
    assert out == []  # original thin result kept (empty), suggestion branch
