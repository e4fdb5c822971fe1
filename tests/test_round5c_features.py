"""Session-7 (round-5 close) features: suffix wildcard via the reversed
dictionary, deterministic HLL distinct-term sketches, packed binary-
quantization ANN rescore, snapshot-pinned (time-travel) serving, and
field-weighted BM25F."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

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
    wh = str(tmp_path_factory.mktemp("r5c-wh"))
    catalog = Catalog(spark, wh)
    build_index(
        spark,
        catalog,
        transcripts_to_docs(synth_transcripts(spark, 600)),
        IndexConfig(),
    )
    return SearchEngine(spark, catalog)


def _toks(text: str) -> list[str]:
    return [w for w in re.split(r"[^a-z0-9_]+", (text or "").lower()) if w]


# ------------------------------------------------------------- suffix ----
def test_suffix_expansion_matches_manual_groups(eng):
    # manual expansion: top-3 dictionary terms ENDING in 'e' by
    # (df desc, term asc) must reproduce search_suffix exactly
    stats = sorted(
        (
            (r["term"], r["df"])
            for r in eng._term_stats.select("term", "df").collect()
            if r["term"].endswith("e") and " " not in r["term"]
        ),
        key=lambda x: (-x[1], x[0]),
    )
    assert len(stats) > 3, "need the bound to bind"
    members = [(t, 1.0) for t, _ in stats[:3]]
    manual = (
        eng._vote_group_scores({"*e": members, "index": [("index", 1.0)]}, "AND")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .collect()
    )
    got = eng.search_suffix(["*e", "index"], "AND", 10, max_expansions=3).collect()
    assert [(r["doc_id"], round(r["score"], 6)) for r in got] == [
        (r["doc_id"], round(r["score"], 6)) for r in manual
    ]
    assert all(r["matched"] == 2 for r in got)


def test_suffix_mirrors_prefix_on_reversed_pattern(eng):
    # '*e' through the reversed dictionary and a literal term must agree
    # with the identical member set scored via search_prefix semantics:
    # both are the same vote-group machinery, so a suffix whose matches
    # coincide with a prefix's matches yields the same page. Use a
    # pattern that matches exactly one term to force the equivalence.
    one = [
        r["term"]
        for r in eng._term_stats.select("term").collect()
        if r["term"].endswith("dex") and " " not in r["term"]
    ]
    assert one == ["index"], one
    via_suffix = eng.search_suffix(["*dex"], "AND", 10).collect()
    direct = (
        eng.search_terms(["index"], "AND", 10).collect()
    )
    assert [(r["doc_id"], round(r["score"], 6)) for r in via_suffix] == [
        (r["doc_id"], round(r["score"], 6)) for r in direct
    ]


def test_suffix_unmatched_under_and_is_empty(eng):
    assert eng.search_suffix(["*zzzzq", "index"], "AND", 10).collect() == []
    # under OR the dead group drops out and the live one still serves
    assert eng.search_suffix(["*zzzzq", "index"], "OR", 10).collect() != []


def test_reversed_dict_covers_dictionary_exactly_once(eng):
    rd = eng._reversed_dict().collect()
    uni = [
        (r["term"], r["df"])
        for r in eng._term_stats.select("term", "df").collect()
        if " " not in r["term"]
    ]
    assert sorted((r["term"], r["df"]) for r in rd) == sorted(uni)
    for r in rd:
        assert r["rterm"] == r["term"][::-1]
