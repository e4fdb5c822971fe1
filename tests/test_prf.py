"""Rocchio pseudo-relevance feedback (search_prf): base page -> expansion
terms mined from the top results -> weighted OR requery. Gates: (1) recall —
a doc holding ONLY the expansion vocabulary (no original query term) enters
the PRF page while plain AND can never see it; (2) the weighted rollup is
exactly sum(w_t * per-term BM25) with w=1.0 for originals and w=beta for
expansions, recomputed from the engine's own single-term score_terms —
so the PRF path adds weighting + union, never new scoring math."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.catalog import Catalog
from open_source_search_engine_spark.operators.index_build import (
    IndexConfig,
    build_index,
)
from open_source_search_engine_spark.operators.query import SearchEngine

BETA = 0.4


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    common = "the and was with from this that"
    rows = [
        # feedback docs: both query terms, 'zulu' rides along every time
        *[
            (i, f"alpha bravo zulu topic{i} " + common)
            for i in range(1, 7)
        ],
        # the PRF target: expansion vocabulary only — AND can't reach it
        (7, "zulu appears alone here " + common),
        # background noise for df variety
        (8, "alpha solo " + common),
        (9, "bravo solo " + common),
        (10, "unrelated noise words " + common),
        (11, "more unrelated filler " + common),
    ]
    wh = str(tmp_path_factory.mktemp("prf-wh"))
    cat = Catalog(spark, wh)
    build_index(
        spark,
        cat,
        spark.createDataFrame(rows, "doc_id long, text string"),
        IndexConfig(),
    )
    return SearchEngine(spark, cat)


def test_prf_recalls_expansion_only_doc(eng):
    base = {r["doc_id"] for r in eng.search_terms(["alpha", "bravo"], "AND", 50).collect()}
    assert 7 not in base, "AND cannot see the zulu-only doc"
    prf = {r["doc_id"] for r in eng.search_prf(["alpha", "bravo"], k=50).collect()}
    assert 7 in prf, "expansion term must pull in the zulu-only doc"
    assert base <= prf, "weighted OR keeps every original AND hit"


def test_prf_rollup_is_weighted_per_term_sum(eng):
    exp = [
        r["term"]
        for r in eng.related_terms(
            ["alpha", "bravo"], k_docs=10, top_terms=5, min_df=2
        ).collect()
    ]
    assert "zulu" in exp, "planted co-occurring term must be mined"
    weights = {"alpha": 1.0, "bravo": 1.0}
    weights.update({t: BETA for t in exp})
    # per-term truth from the engine's own single-term scorer
    per_doc: dict[int, tuple[float, int]] = {}
    for t, w in sorted(weights.items()):
        for r in eng.score_terms([t], "OR").collect():
            s, m = per_doc.get(r["doc_id"], (0.0, 0))
            per_doc[r["doc_id"]] = (s + w * r["score"], m + 1)
    want = sorted(
        per_doc.items(), key=lambda kv: (-kv[1][0], kv[0])
    )[:10]
    got = eng.search_prf(
        ["alpha", "bravo"], k=10, n_expand=5, beta=BETA
    ).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, (s, m)) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-9)
        assert r["matched"] == m


def test_prf_guards(eng):
    with pytest.raises(ValueError):
        eng.search_prf(["alpha"], beta=-0.1)
    # absent vocabulary -> empty frame, stable schema
    out = eng.search_prf(["nosuchterm"], k=5)
    assert out.columns == ["doc_id", "score", "matched"]
    assert out.count() == 0
