"""LTR feature export (ltr_features): per-candidate ranking features from
the same single postings scan the query path does. Gates: (1) bm25/matched
are IDENTICAL (bit-equal) to search_terms over the same query — the export
adds columns, never new scoring; (2) every feature recomputed brute-force
in Python over the raw corpus matches; (3) absent vocabulary -> empty
frame with a stable schema."""

from __future__ import annotations

import math
import re

import pytest

from open_source_search_engine_spark.catalog import Catalog
from open_source_search_engine_spark.operators.index_build import (
    IndexConfig,
    build_index,
)
from open_source_search_engine_spark.operators.query import SearchEngine

ROWS = [
    (1, "alpha bravo alpha charlie delta"),
    (2, "alpha alpha alpha bravo bravo echo foxtrot golf"),
    (3, "bravo hotel india juliet"),
    (4, "alpha kilo lima"),
    (5, "mike november oscar papa quebec romeo"),
]
Q = ["alpha", "bravo"]


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9_]+", t.lower()) if w]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("ltr-wh"))
    cat = Catalog(spark, wh)
    build_index(
        spark,
        cat,
        spark.createDataFrame(ROWS, "doc_id long, text string"),
        IndexConfig(),
    )
    return SearchEngine(spark, cat)


def test_ltr_bm25_identical_to_search(eng):
    feats = {r["doc_id"]: r for r in eng.ltr_features(Q, k=50).collect()}
    hits = eng.search_terms(Q, mode="OR", k=50).collect()
    assert set(feats) == {r["doc_id"] for r in hits}
    for r in hits:
        assert feats[r["doc_id"]]["bm25"] == r["score"], "bit-equal fold"
        assert feats[r["doc_id"]]["matched"] == r["matched"]


def test_ltr_features_vs_bruteforce(eng):
    docs = {d: _toks(t) for d, t in ROWS}
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    df = {
        t: sum(1 for v in docs.values() if t in v) for t in Q
    }
    idf = {t: math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0) for t in Q}
    got = {r["doc_id"]: r for r in eng.ltr_features(Q, k=50).collect()}
    for d, toks in docs.items():
        tfs = {t: toks.count(t) for t in Q if t in toks}
        if not tfs:
            assert d not in got
            continue
        r = got[d]
        assert r["matched"] == len(tfs)
        assert r["coverage"] == pytest.approx(len(tfs) / len(Q))
        assert r["tf_sum"] == sum(tfs.values())
        assert r["tf_min"] == min(tfs.values())
        assert r["tf_max"] == max(tfs.values())
        assert r["idf_sum"] == pytest.approx(
            sum(idf[t] for t in tfs), rel=1e-9
        )
        assert r["dl"] == len(toks)
        assert r["dl_norm"] == pytest.approx(len(toks) / avgdl, rel=1e-9)


def test_ltr_ordering_and_empty(eng):
    page = eng.ltr_features(Q, k=2).collect()
    assert len(page) == 2
    assert page[0]["bm25"] >= page[1]["bm25"]
    out = eng.ltr_features(["nosuchterm"])
    assert out.columns == [
        "doc_id", "bm25", "matched", "coverage", "tf_sum", "tf_min",
        "tf_max", "idf_sum", "dl", "dl_norm",
    ]
    assert out.count() == 0
