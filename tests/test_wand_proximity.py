"""Proximity rescoring on the WAND scale path (r4 VERDICT task 1).

Gates:
* wand_proximity == search_proximity (rank AND score) on 2-, 3- and 4-term
  queries — the over-fetch + bounded-bonus guarantee really is exact;
* the guarantee loop is exercised (tiny overfetch forces the candidate set
  below the match count, so the exactness check / growth path must fire);
* prox_weight=0 is rank-identical to wand_search (the verdict's
  rank-identity-at-w=0 gate).
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
from open_source_search_engine_spark.operators.wand import (
    wand_proximity,
    wand_search,
)
from open_source_search_engine_spark.sources.transcripts import synth_transcripts

N_TURNS = 1200

PROX_TIERS = [
    (["spark", "index"], 10),
    (["spark", "index", "query"], 10),
    (["spark", "index", "query", "merge"], 15),
    (["the", "to"], 10),  # stopword pair: large match set, heavy positions
    (["rareterm_xyzzy", "spark"], 5),
    (["zz_not_in_corpus", "spark"], 5),  # AND with a missing term -> empty
]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wandprox-wh"))
    catalog = Catalog(spark, wh)
    build_index(
        spark,
        catalog,
        transcripts_to_docs(synth_transcripts(spark, N_TURNS)),
        IndexConfig(target_reduce_docs=64),
    )
    return SearchEngine(spark, catalog)


def _rows(df):
    return [
        (int(r["doc_id"]), float(r["score"]), int(r["matched"]))
        for r in df.collect()
    ]


@pytest.mark.parametrize("terms,k", PROX_TIERS)
def test_wand_proximity_matches_exact(eng, terms, k):
    exact = _rows(eng.search_proximity(terms, k=k, prox_weight=1.0))
    scale = _rows(wand_proximity(eng, terms, k=k, prox_weight=1.0))
    assert [s[0] for s in scale] == [e[0] for e in exact]
    for (sd, ss, sm), (ed, es, em) in zip(scale, exact):
        assert ss == pytest.approx(es, rel=1e-12, abs=1e-12), (sd, ss, es)
        assert sm == em


def test_overfetch_growth_path_is_exact(eng):
    # overfetch=1, k=3 on a stopword pair: the first candidate fetch is far
    # below the match count, so the ceiling check must either certify or
    # grow m — both paths must land on the exact answer.
    exact = _rows(eng.search_proximity(["the", "to"], k=3, prox_weight=5.0))
    scale = _rows(
        wand_proximity(
            eng, ["the", "to"], k=3, prox_weight=5.0, overfetch=1
        )
    )
    assert scale == pytest.approx(exact)
    assert [s[0] for s in scale] == [e[0] for e in exact]


def test_max_candidates_fallback_is_exact(eng):
    # max_candidates == k+1 forces the exact-path takeover branch
    exact = _rows(eng.search_proximity(["the", "to"], k=5, prox_weight=5.0))
    scale = _rows(
        wand_proximity(
            eng,
            ["the", "to"],
            k=5,
            prox_weight=5.0,
            overfetch=1,
            max_candidates=6,
        )
    )
    assert [s[0] for s in scale] == [e[0] for e in exact]


def test_escalation_schedule_is_exact(eng):
    # Force the IN-LOOP escalation path (r5: tail-slope extrapolated
    # schedule): max_candidates far below the stopword pair's match count
    # disables the pre-loop exhaustive bump, and overfetch=1 starts m at
    # k+1, so the certificate must fail at least once. Whichever branch
    # the extrapolation picks (jump m, or exact-now), the result must be
    # the exact answer.
    exact = _rows(eng.search_proximity(["the", "to"], k=3, prox_weight=5.0))
    for max_candidates in (8, 64, 256):
        scale = _rows(
            wand_proximity(
                eng,
                ["the", "to"],
                k=3,
                prox_weight=5.0,
                overfetch=1,
                max_candidates=max_candidates,
            )
        )
        assert [s[0] for s in scale] == [e[0] for e in exact], max_candidates
        assert scale == pytest.approx(exact)


def test_w0_rank_identity_with_wand(eng):
    for terms, k in [(["spark", "index"], 10), (["the", "to"], 15)]:
        base = _rows(wand_search(eng, terms, "AND", k))
        prox0 = _rows(wand_proximity(eng, terms, k=k, prox_weight=0.0))
        assert prox0 == base
