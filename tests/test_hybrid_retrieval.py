"""Hybrid lexical→dense serving gates: hybrid_rerank (BM25 over-fetch →
cosine re-rank) and rrf_fuse (reciprocal-rank fusion, Cormack et al. 2009).

The reference's serving path is lexical-only; these extend the same
over-fetch + re-rank skeleton (`PosdbTable.cpp` top-k then rescore) to a
dense signal, the standard two-stage retrieval shape for training-data /
RAG pipelines. Gates:

* alpha=1.0 reduces to normalized BM25 — rank order and tie-break are
  identical to search_terms restricted to the candidate page;
* alpha=0.0 reduces to cosine over the page — checked against a numpy
  recomputation of every candidate's cosine;
* mixed alpha recomputes exactly: hybrid == a·bm25/max(page) + (1−a)·cos;
* candidates without an embedding row drop out (inner-join contract);
* rrf_fuse matches a hand-computed example (scores to 1e-12, n_lists);
* single-list fusion preserves that list's order (rank-monotone);
* empty input raises;
* plan gates — the page side broadcasts (BroadcastHashJoin, no
  CartesianProduct) so the corpus-sized embedding table never shuffles.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.catalog import Catalog
from open_source_search_engine_spark.operators import similarity
from open_source_search_engine_spark.operators.index_build import (
    IndexConfig,
    build_index,
    transcripts_to_docs,
)
from open_source_search_engine_spark.operators.query import SearchEngine
from open_source_search_engine_spark.sources.transcripts import synth_transcripts

TERMS = ["spark", "index"]
DIM = 16


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("hybrid-wh"))
    catalog = Catalog(spark, wh)
    build_index(
        spark,
        catalog,
        transcripts_to_docs(synth_transcripts(spark, 400)),
        IndexConfig(),
    )
    return SearchEngine(spark, catalog)


@pytest.fixture(scope="module")
def emb(spark, eng):
    # deterministic synthetic embedding per doc in the corpus, seeded by
    # doc_id so the fixture is stable across runs/processes
    ids = sorted(
        r["doc_id"]
        for r in eng.catalog.read_table("documents")
        .select("doc_id")
        .distinct()
        .collect()
    )
    rows = [
        (
            int(i),
            [
                float(x)
                for x in np.random.default_rng(int(i) % (2**32)).standard_normal(DIM)
            ],
        )
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def qvec():
    return [float(x) for x in np.random.default_rng(7).standard_normal(DIM)]


def _emb_map(emb):
    return {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }


def _cos(v, q):
    qn = np.asarray(q, dtype=np.float64)
    return float(np.dot(v, qn) / (np.linalg.norm(v) * np.linalg.norm(qn)))


def test_alpha_one_is_normalized_bm25(eng, emb, qvec):
    page = [
        (r["doc_id"], r["score"])
        for r in eng.search_terms(TERMS, "AND", 20).collect()
    ]
    mx = max(s for _, s in page)
    out = similarity.hybrid_rerank(
        eng, emb, TERMS, qvec, mode="AND", m=20, k=10, alpha=1.0
    ).collect()
    assert [r["doc_id"] for r in out] == [d for d, _ in page[:10]]
    for r, (_, s) in zip(out, page):
        assert r["hybrid"] == pytest.approx(s / mx, abs=1e-12)


def test_alpha_zero_is_cosine_over_page(eng, emb, qvec):
    page_ids = [
        r["doc_id"] for r in eng.search_terms(TERMS, "AND", 20).collect()
    ]
    vecs = _emb_map(emb)
    expect = sorted(
        ((d, _cos(vecs[d], qvec)) for d in page_ids),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    out = similarity.hybrid_rerank(
        eng, emb, TERMS, qvec, mode="AND", m=20, k=5, alpha=0.0
    ).collect()
    assert [r["doc_id"] for r in out] == [d for d, _ in expect]
    for r, (_, c) in zip(out, expect):
        assert r["hybrid"] == pytest.approx(c, abs=1e-9)
        assert r["cosine"] == pytest.approx(c, abs=1e-9)


def test_mixed_alpha_recomputes_exactly(eng, emb, qvec):
    page = [
        (r["doc_id"], r["score"])
        for r in eng.search_terms(TERMS, "AND", 20).collect()
    ]
    mx = max(s for _, s in page)
    vecs = _emb_map(emb)
    a = 0.3
    expect = sorted(
        (
            (d, a * s / mx + (1 - a) * _cos(vecs[d], qvec))
            for d, s in page
        ),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    out = similarity.hybrid_rerank(
        eng, emb, TERMS, qvec, mode="AND", m=20, k=10, alpha=a
    ).collect()
    assert [r["doc_id"] for r in out] == [d for d, _ in expect]
    for r, (_, h) in zip(out, expect):
        assert r["hybrid"] == pytest.approx(h, abs=1e-9)


def test_missing_embedding_rows_drop_out(eng, emb, qvec):
    page_ids = [
        r["doc_id"] for r in eng.search_terms(TERMS, "AND", 20).collect()
    ]
    holey = emb.filter(~F.col("vec_id").isin(page_ids[:3]))
    out = similarity.hybrid_rerank(
        eng, holey, TERMS, qvec, mode="AND", m=20, k=20, alpha=0.5
    ).collect()
    got = {r["doc_id"] for r in out}
    assert not (got & set(page_ids[:3]))
    assert got == set(page_ids[3:])


def test_hybrid_plan_broadcasts_page(eng, emb, qvec):
    out = similarity.hybrid_rerank(
        eng, emb, TERMS, qvec, mode="AND", m=20, k=10, alpha=0.5
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_rrf_hand_example(spark):
    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(2, 1), (3, 2), (4, 3)], "doc_id long, rank long"
    )
    out = similarity.rrf_fuse([a, b], k=10, c=60).collect()
    got = [(r["doc_id"], r["rrf"], r["n_lists"]) for r in out]
    exp = {
        1: 1 / 61,
        2: 1 / 62 + 1 / 61,
        3: 1 / 63 + 1 / 62,
        4: 1 / 63,
    }
    order = sorted(exp, key=lambda d: (-exp[d], d))
    assert [g[0] for g in got] == order
    for doc, rrf, n in got:
        assert rrf == pytest.approx(exp[doc], abs=1e-12)
        assert n == (2 if doc in (2, 3) else 1)


def test_rrf_single_list_preserves_order(spark):
    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3), (40, 4)], "doc_id long, rank long"
    )
    out = similarity.rrf_fuse([a], k=3, c=60).collect()
    assert [r["doc_id"] for r in out] == [10, 20, 30]
    assert all(r["n_lists"] == 1 for r in out)


def test_rrf_empty_raises():
    with pytest.raises(ValueError):
        similarity.rrf_fuse([])
