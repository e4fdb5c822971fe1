"""Serve-time result-page cache gates (search_cached): bit-identity with
the uncached path, LocalTableScan plan on a hit (no postings scan), key
completeness (mode/k/exclusions), and the LRU bound."""

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
    cat = Catalog(spark, str(tmp_path_factory.mktemp("serp-wh")))
    build_index(
        spark, cat, transcripts_to_docs(synth_transcripts(spark, 500)),
        IndexConfig(),
    )
    return SearchEngine(spark, cat)


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9), r["matched"]) for r in df.collect()]


def test_hit_is_bit_identical_and_local(eng):
    want = _rows(eng.search_terms(["spark", "index"], "AND", 5))
    first = eng.search_cached(["spark", "index"], "AND", 5)
    assert _rows(first) == want
    hit = eng.search_cached(["spark", "index"], "AND", 5)
    assert _rows(hit) == want
    plan = hit._jdf.queryExecution().executedPlan().toString()
    # the hit never touches the index: no parquet scan, no shuffle
    assert "LocalTableScan" in plan or "ExistingRDD" in plan
    assert "parquet" not in plan and "Exchange" not in plan


def test_cache_key_covers_mode_k_and_exclusions(eng):
    a = _rows(eng.search_cached(["spark", "index"], "AND", 5))
    o = _rows(eng.search_cached(["spark", "index"], "OR", 5))
    k3 = _rows(eng.search_cached(["spark", "index"], "AND", 3))
    ex = _rows(
        eng.search_cached(["spark", "index"], "AND", 5, exclude_terms=["merge"])
    )
    assert a == _rows(eng.search_terms(["spark", "index"], "AND", 5))
    assert o == _rows(eng.search_terms(["spark", "index"], "OR", 5))
    assert k3 == a[:3]
    assert ex == _rows(
        eng.search_terms(["spark", "index"], "AND", 5, exclude_terms=["merge"])
    )
    assert ex != a  # 'merge' co-occurs with spark/index in this corpus


def test_lru_is_bounded(eng):
    eng._serp_cache.clear()
    eng._serp_cache_max = 4
    try:
        vocab = ["spark", "index", "query", "merge", "shard", "score"]
        for t in vocab:
            eng.search_cached([t, "the"], "AND", 2)
        assert len(eng._serp_cache) == 4
        # the oldest entries were evicted, the newest retained
        kept = {k[0][0] for k in eng._serp_cache}
        assert kept == set(vocab[-4:])
    finally:
        eng._serp_cache_max = 256
        eng._serp_cache.clear()
