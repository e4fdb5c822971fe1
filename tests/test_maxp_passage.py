"""Passage retrieval with MaxP aggregation (Dai & Callan 2019): documents
are split into fixed-token windows (chunk_docs), each window indexed as its
own document with the parent kept as a doc-store column, and parents are
ranked by their BEST passage via search_grouped(agg='max').

Gates: (1) chunk-level AND is strictly tighter than doc-level AND — a doc
whose query terms never share one window must NOT appear on the MaxP page
even though a doc-level AND would hit it; (2) the MaxP group_score and
best-chunk pair equal a brute-force max over the chunk engine's own
per-chunk scores, so the rollup adds no scoring of its own."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.catalog import Catalog
from open_source_search_engine_spark.operators.curation import chunk_docs
from open_source_search_engine_spark.operators.index_build import (
    IndexConfig,
    build_index,
)
from open_source_search_engine_spark.operators.query import SearchEngine

MAX_TOKENS, OVERLAP = 32, 8  # stride 24, mirrors entry's passage_for


def _mk_docs(spark):
    filler = " ".join(f"w{i}" for i in range(40))
    rows = [
        # both terms inside one 32-token window -> MaxP hit
        (1, "alpha bravo " + filler),
        # alpha at token 1, bravo at token ~62: windows are [1..32],
        # [25..56], [49..80] -- no window holds both -> MaxP miss,
        # though a DOC-level AND hits this doc
        (2, "alpha " + filler + " charlie delta echo " + filler[:180] + " bravo"),
        # df variety / non-matching background
        (3, "alpha only here " + filler),
        (4, "bravo only here " + filler),
        (5, filler),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    docs = _mk_docs(spark)
    chunks = chunk_docs(docs, max_tokens=MAX_TOKENS, overlap=OVERLAP)
    pdocs = chunks.select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).cast("long").alias(
            "doc_id"
        ),
        F.col("doc_id").alias("parent_id"),
        F.col("chunk_text").alias("text"),
    )
    wh = str(tmp_path_factory.mktemp("maxp-wh"))
    cat = Catalog(spark, wh)
    build_index(spark, cat, pdocs, IndexConfig())
    return SearchEngine(spark, cat), docs


def test_chunk_and_tighter_than_doc_and(engines, spark, tmp_path_factory):
    chunk_eng, docs = engines
    page = chunk_eng.search_grouped(
        ["alpha", "bravo"], "parent_id", k=10, mode="AND", agg="max"
    ).collect()
    parents = {r["group"] for r in page}
    assert 1 in parents, "co-windowed doc must rank"
    assert 2 not in parents, "terms >32 tokens apart share no window"
    # sanity: a DOC-level engine's AND does hit doc 2
    wh = str(tmp_path_factory.mktemp("maxp-doc-wh"))
    dcat = Catalog(spark, wh)
    build_index(spark, dcat, docs, IndexConfig())
    doc_hits = {
        r["doc_id"]
        for r in SearchEngine(spark, dcat)
        .search_terms(["alpha", "bravo"], mode="AND", k=10)
        .collect()
    }
    assert 2 in doc_hits, "doc-level AND sees the far-apart pair"


def test_maxp_rollup_equals_bruteforce_chunk_max(engines):
    chunk_eng, _ = engines
    page = chunk_eng.search_grouped(
        ["alpha", "bravo"], "parent_id", k=10, mode="AND", agg="max"
    ).collect()
    # brute force: every matching CHUNK, grouped by parent in Python
    chunk_rows = chunk_eng.search_terms(
        ["alpha", "bravo"], mode="AND", k=10_000
    ).collect()
    best: dict[int, tuple[float, int]] = {}
    n_match: dict[int, int] = {}
    for r in chunk_rows:
        parent = r["doc_id"] // 1000
        n_match[parent] = n_match.get(parent, 0) + 1
        cand = (r["score"], -r["doc_id"])  # tie-break: doc_id ASC
        if parent not in best or cand > best[parent]:
            best[parent] = cand
    assert {r["group"] for r in page} == set(best)
    for r in page:
        score, neg_cid = best[r["group"]]
        assert r["group_score"] == pytest.approx(score, rel=1e-9)
        assert r["best_doc_id"] == -neg_cid
        assert r["n_matching"] == n_match[r["group"]]
