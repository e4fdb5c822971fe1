"""Cursor-based deep paging (search_after) gates: chained cursor pages
tile the full ranking exactly (no skip, no repeat, any depth), page 1 with
no cursor equals search_terms, a mid-tie cursor resumes inside the tie run
by doc_id, and the plan stays the single TakeOrderedAndProject a page-1
query costs (the whole point: O(k) at any depth)."""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.catalog import Catalog
from open_source_search_engine_spark.operators.index_build import (
    IndexConfig,
    build_index,
    transcripts_to_docs,
)
from open_source_search_engine_spark.operators.query import SearchEngine
from open_source_search_engine_spark.sources.transcripts import (
    synth_transcripts,
)

Q = ["spark", "index"]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("after-wh")))
    build_index(
        spark,
        cat,
        transcripts_to_docs(synth_transcripts(spark, 800)),
        IndexConfig(tokenizer_mode="ascii"),
    )
    return SearchEngine(spark, cat, tokenizer_mode="ascii")


def test_cursor_pages_tile_the_full_ranking(eng):
    full = eng.search_terms(Q, "OR", 10_000).collect()
    assert len(full) > 30, "need depth to page through"
    paged, cur = [], None
    while True:
        page = eng.search_after(Q, "OR", k=7, after=cur).collect()
        if not page:
            break
        paged.extend(page)
        cur = (page[-1]["score"], page[-1]["doc_id"])
    assert [(r["doc_id"], r["score"]) for r in paged] == [
        (r["doc_id"], r["score"]) for r in full
    ], "chained pages must reproduce the global ranking bit-for-bit"


def test_page1_equals_search_terms(eng):
    a = eng.search_after(Q, "AND", k=10).collect()
    b = eng.search_terms(Q, "AND", 10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_cursor_resumes_inside_tie_run(eng):
    # ties (equal scores) are broken doc_id ASC; cursor placed ON a tie
    # member must resume at the NEXT doc_id of the same score
    full = eng.search_terms(Q, "OR", 10_000).collect()
    tie_idx = next(
        (
            i
            for i in range(len(full) - 1)
            if full[i]["score"] == full[i + 1]["score"]
        ),
        None,
    )
    if tie_idx is None:
        pytest.skip("corpus produced no score tie at this size")
    cur = (full[tie_idx]["score"], full[tie_idx]["doc_id"])
    nxt = eng.search_after(Q, "OR", k=1, after=cur).collect()
    assert nxt[0]["doc_id"] == full[tie_idx + 1]["doc_id"]
    assert nxt[0]["score"] == full[tie_idx + 1]["score"]


def test_deep_page_plan_is_single_topk(eng):
    p = (
        eng.search_after(Q, "OR", k=10, after=(0.5, 123))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in p
    assert "Window" not in p


def test_wand_cursor_pages_tile_exact_ranking(eng):
    # WAND + cursor on BOTH wand paths must reproduce the exact-path
    # global ranking bit-for-bit when chained
    from open_source_search_engine_spark.operators.wand import wand_search

    full = eng.search_terms(Q, "AND", 10_000).collect()
    assert len(full) > 15
    for cutoff in (100_000, 0):  # fast path, then forced two-phase theta
        paged, cur = [], None
        while True:
            page = wand_search(
                eng, Q, "AND", k=6, after=cur, small_df_cutoff=cutoff
            ).collect()
            if not page:
                break
            paged.extend(page)
            cur = (page[-1]["score"], page[-1]["doc_id"])
        assert [(r["doc_id"], r["score"]) for r in paged] == [
            (r["doc_id"], r["score"]) for r in full
        ], f"cutoff={cutoff}"


def test_wand_after_none_is_plain_wand(eng):
    from open_source_search_engine_spark.operators.wand import wand_search

    a = wand_search(eng, Q, "AND", k=10).collect()
    b = wand_search(eng, Q, "AND", k=10, after=None).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
