"""mmr_rerank (Carbonell & Goldstein 1998): brute-force greedy recomputation
over a planted corpus where relevance order and diverse order DISAGREE — two
near-identical-embedding docs top the BM25 page, and MMR must demote the
second copy below a less-relevant-but-novel doc."""

from __future__ import annotations

import math

import numpy as np
import pytest

from open_source_search_engine_spark.catalog import Catalog
from open_source_search_engine_spark.operators.index_build import (
    IndexConfig,
    build_index,
)
from open_source_search_engine_spark.operators.query import SearchEngine
from open_source_search_engine_spark.operators.similarity import mmr_rerank

# BM25 relevance order for "merge vector": docs 1,2 (tf-heavy) > 3 > 4.
DOCS = [
    (1, "merge vector merge vector merge"),
    (2, "vector merge vector merge zzz"),
    (3, "merge vector once here"),
    (4, "a merge vector mention in passing text"),
    (5, "no match words at all"),
]
# docs 1 and 2 share (almost) one embedding direction; 3 and 4 are novel
EMB = {
    1: [1.0, 0.0, 0.0, 0.0],
    2: [0.999, 0.04, 0.0, 0.0],
    3: [0.0, 1.0, 0.0, 0.0],
    4: [0.0, 0.0, 1.0, 0.0],
    5: [0.0, 0.0, 0.0, 1.0],
}


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("mmr-wh"))
    cat = Catalog(spark, wh)
    docs = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    build_index(spark, cat, docs, IndexConfig())
    eng = SearchEngine(spark, cat)
    emb = spark.createDataFrame(
        [(d, [float(x) for x in v]) for d, v in EMB.items()],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    return eng, emb


def _brute(eng, lam, k, m=10, drop_emb=()):
    page = eng.search_terms(["merge", "vector"], "AND", m).collect()
    page = [r for r in page if r["doc_id"] not in drop_emb]
    mx = max(r["score"] for r in page)
    cand = {
        r["doc_id"]: (
            r["score"] / mx,
            np.asarray(EMB[r["doc_id"]], dtype=np.float32).astype(
                np.float64
            ),
        )
        for r in page
    }
    def cos(a, b):
        return float(
            np.dot(a, b) / (math.sqrt(np.dot(a, a)) * math.sqrt(np.dot(b, b)))
        )
    picked, out = [], []
    while cand and len(out) < k:
        best = None
        for did in sorted(cand):
            rel, v = cand[did]
            pen = max((cos(v, EMB_V) for EMB_V in picked), default=0.0)
            mmr = round(lam * rel - (1 - lam) * pen, 9)
            if best is None or mmr > best[1]:
                best = (did, mmr)
        did, mmr = best
        picked.append(cand[did][1])
        out.append((len(out) + 1, did, mmr))
        del cand[did]
    return out


def test_matches_bruteforce_greedy(setup):
    eng, emb = setup
    for lam in (0.3, 0.7):
        rows = mmr_rerank(
            eng, emb, ["merge", "vector"], m=10, k=4, lam=lam
        ).collect()
        got = [(r["rank"], r["doc_id"], round(r["mmr"], 9)) for r in rows]
        assert got == _brute(eng, lam, 4), f"lam={lam}"


def test_diversification_demotes_near_duplicate(setup):
    eng, emb = setup
    rows = mmr_rerank(
        eng, emb, ["merge", "vector"], m=10, k=4, lam=0.5
    ).collect()
    order = [r["doc_id"] for r in rows]
    # relevance alone would put 2 second; its embedding is ~identical to
    # 1's, so MMR must slot novel docs 3 and 4 ahead of it
    assert order[0] == 1
    assert order.index(2) > order.index(3)
    assert order.index(2) > order.index(4)


def test_lam_one_is_pure_relevance(setup):
    eng, emb = setup
    rows = mmr_rerank(
        eng, emb, ["merge", "vector"], m=10, k=4, lam=1.0
    ).collect()
    rel_order = [
        r["doc_id"]
        for r in eng.search_terms(["merge", "vector"], "AND", 4).collect()
    ]
    assert [r["doc_id"] for r in rows] == rel_order


def test_candidates_without_embeddings_drop(setup):
    eng, emb = setup
    emb2 = emb.filter("vec_id <> 2")
    rows = mmr_rerank(
        eng, emb2, ["merge", "vector"], m=10, k=4, lam=0.7
    ).collect()
    ids = [r["doc_id"] for r in rows]
    assert 2 not in ids and len(ids) == 3
    assert [
        (r["rank"], r["doc_id"], round(r["mmr"], 9)) for r in rows
    ] == _brute(eng, 0.7, 4, drop_emb=(2,))


def test_page_smaller_than_k(setup):
    eng, emb = setup
    rows = mmr_rerank(
        eng, emb, ["merge", "vector"], m=10, k=50, lam=0.7
    ).collect()
    assert len(rows) == 4  # only 4 docs match the AND query
    assert [r["rank"] for r in rows] == [1, 2, 3, 4]
