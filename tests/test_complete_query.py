"""complete_query (context-aware type-ahead): brute-force recomputation of
the completion ranking over a planted corpus whose point is that GLOBAL
frequency and IN-CONTEXT frequency disagree — the completion ranking must
follow the context."""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.catalog import Catalog
from open_source_search_engine_spark.operators.index_build import (
    IndexConfig,
    build_index,
)
from open_source_search_engine_spark.operators.query import SearchEngine

# 'python' co-occurs with 'merge' in 3 docs; 'pyramid' is globally MORE
# frequent (5 docs) but co-occurs with 'merge' in only 1; 'pyrite' never
# co-occurs with 'merge'; 'pylon' exists only outside 'merge' docs.
DOCS = [
    (1, "merge python lists quickly"),
    (2, "merge python dicts and python sets"),
    (3, "python merge intervals problem"),
    (4, "merge pyramid shapes"),
    (5, "pyramid scheme warning"),
    (6, "pyramid of giza"),
    (7, "pyramid solitaire rules"),
    (8, "ancient pyramid discovered"),
    (9, "pyrite is fools gold"),
    (10, "pyrite crystal habit"),
    (11, "pylon placement on the course"),
    (12, "merge sort beats bubble sort"),
]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("complete-wh"))
    cat = Catalog(spark, wh)
    docs = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    build_index(spark, cat, docs, IndexConfig())
    return SearchEngine(spark, cat)


def test_context_beats_global_frequency(eng):
    rows = eng.complete_query("merge py", k=10).collect()
    got = [(r["completion"], r["n_docs"], r["df"]) for r in rows]
    # python: 3 merge-docs (1,2,3); pyramid: 1 (doc 4); pyrite/pylon: 0
    # co-occurrences -> dropped entirely
    assert got == [("python", 3, 3), ("pyramid", 1, 5)]


def test_no_context_ranks_by_df(eng):
    rows = eng.complete_query("py", k=10).collect()
    got = [(r["completion"], r["n_docs"], r["df"]) for r in rows]
    assert got == [
        ("pyramid", 5, 5),
        ("python", 3, 3),
        ("pyrite", 2, 2),
        ("pylon", 1, 1),
    ]


def test_absent_context_word_is_empty(eng):
    assert eng.complete_query("zzzmissing py", k=10).count() == 0


def test_unmatched_prefix_is_empty(eng):
    assert eng.complete_query("merge qqq", k=10).count() == 0


def test_typed_word_not_suggested_as_completion(eng):
    # completing 'me' under context 'merge' must not offer 'merge' back
    rows = eng.complete_query("merge me", k=10).collect()
    assert "merge" not in [r["completion"] for r in rows]


def test_max_candidates_caps_dictionary_expansion(eng):
    # with max_candidates=1 only the highest-df prefix term (pyramid)
    # enters co-occurrence counting
    rows = eng.complete_query("merge py", k=10, max_candidates=1).collect()
    assert [(r["completion"], r["n_docs"]) for r in rows] == [("pyramid", 1)]


def test_k_limits_page(eng):
    assert eng.complete_query("py", k=2).count() == 2
