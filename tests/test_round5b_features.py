"""Round-5 session-3 operators: more_like_this (related docs), count_matches
(total hits), df_histogram (dictionary telemetry), collocations (doc-level
PMI). Each gate recomputes the operator's claim brute-force in Python over
the same corpus, the strategy every other suite here uses."""

from __future__ import annotations

import math
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
from open_source_search_engine_spark.operators.text_analysis import collocations
from open_source_search_engine_spark.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("r5b-wh"))
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


# ---------------------------------------------------------------- mlt ----
def test_more_like_this_matches_manual_requery(eng):
    # pick a real doc id from the store
    seed = eng.catalog.read_table("documents").select("doc_id", "text").first()
    out = eng.more_like_this(seed["doc_id"], top_terms=4, k=15).collect()
    assert out, "seed doc has terms; page must be non-empty"
    assert all(r["doc_id"] != seed["doc_id"] for r in out), "seed excluded"
    # manual keyword selection: tf(seed) x idf from term_stats
    tf: dict[str, int] = {}
    for w in _toks(seed["text"]):
        tf[w] = tf.get(w, 0) + 1
    stats = {
        r["term"]: r["df"]
        for r in eng._term_stats.filter(
            F.col("term").isin(list(tf))
        ).collect()
    }
    kscore = {
        t: tf[t] * math.log(
            (eng.n_docs - stats[t] + 0.5) / (stats[t] + 0.5) + 1.0
        )
        for t in tf
        if t in stats
    }
    sel = sorted(kscore, key=lambda t: (-kscore[t], t))[:4]
    manual = (
        eng.score_terms(sel, "OR")
        .filter(F.col("doc_id") != seed["doc_id"])
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(15)
        .collect()
    )
    assert [(r["doc_id"], round(r["score"], 6)) for r in out] == [
        (r["doc_id"], round(r["score"], 6)) for r in manual
    ]


def test_more_like_this_missing_seed_is_empty(eng):
    assert eng.more_like_this(10**12).collect() == []


# -------------------------------------------------------------- count ----
def test_count_matches_vs_bruteforce(eng):
    terms = ["spark", "merge"]
    row = eng.count_matches(terms).collect()[0]
    docs = eng.catalog.read_table("documents").select("doc_id", "text").collect()
    n_and = n_or = 0
    for r in docs:
        present = {t for t in terms if t in _toks(r["text"])}
        if present:
            n_or += 1
        if len(present) == len(terms):
            n_and += 1
    assert (row["n_terms"], row["n_and"], row["n_or"]) == (2, n_and, n_or)
    assert row["n_and"] <= row["n_or"]


def test_count_matches_absent_term_zero_and(eng):
    row = eng.count_matches(["spark", "zzzznotaterm"]).collect()[0]
    assert row["n_and"] == 0  # absent term can never complete an AND
    assert row["n_or"] >= 1  # but spark alone still matches docs


# ---------------------------------------------------------- histogram ----
def test_df_histogram_partitions_the_dictionary(eng):
    hist = eng.df_histogram().collect()
    stats = eng._term_stats.select("term", "df").collect()
    assert sum(r["n_terms"] for r in hist) == len(stats)
    assert sum(r["sum_df"] for r in hist) == sum(r["df"] for r in stats)
    for r in hist:
        assert r["lo"] == 2 ** r["bucket"]
    # every term's df falls in exactly its bucket's [lo, 2*lo) range
    buckets = {r["bucket"]: r for r in hist}
    for s in stats:
        b = s["df"].bit_length() - 1
        assert b in buckets
        assert buckets[b]["lo"] <= s["df"] < 2 * buckets[b]["lo"]


# -------------------------------------------------------- collocations ----
def test_collocations_planted_pair_and_pmi(spark):
    # 40 docs: 'alpha beta' always together in 12 docs; 'gamma' alone in
    # others; filler words everywhere. alpha-beta must surface with the
    # exact PMI ln(n * ab / (a * b)).
    rows = []
    for i in range(40):
        base = f"fill{i % 3} common words here"
        if i < 12:
            rows.append((i, f"alpha beta {base}"))
        elif i < 26:
            rows.append((i, f"gamma {base}"))
        else:
            rows.append((i, base))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = collocations(
        docs, df_min=2, df_max=30, vocab_k=10, top_k=50
    ).collect()
    got = {(r["term_a"], r["term_b"]): r for r in out}
    assert ("alpha", "beta") in got
    r = got[("alpha", "beta")]
    assert (r["df_ab"], r["df_a"], r["df_b"]) == (12, 12, 12)
    assert r["pmi"] == pytest.approx(math.log(40 * 12 / (12 * 12)))
    # pair counts can never exceed either member's df
    for (a, b), rr in got.items():
        assert rr["df_ab"] <= min(rr["df_a"], rr["df_b"])
        assert a < b  # upper triangle only, no mirrored duplicates


def test_collocations_band_excludes_out_of_range(spark):
    # 'ubiq' in every doc (df above the band) must not appear in any pair
    rows = [(i, f"ubiq tok{i % 4} extra") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = collocations(docs, df_min=2, df_max=10, vocab_k=10, top_k=50).collect()
    for r in out:
        assert "ubiq" not in (r["term_a"], r["term_b"])
        assert 2 <= r["df_a"] <= 10 and 2 <= r["df_b"] <= 10


# ------------------------------------------------------------- prefix ----
def test_prefix_expansion_matches_manual_groups(eng):
    # manual expansion: top-3 dictionary terms by (df desc, term asc)
    stats = sorted(
        (
            (r["term"], r["df"])
            for r in eng._term_stats.select("term", "df").collect()
            if r["term"].startswith("s") and " " not in r["term"]
        ),
        key=lambda x: (-x[1], x[0]),
    )
    assert len(stats) > 3, "need the bound to bind"
    members = [(t, 1.0) for t, _ in stats[:3]]
    manual = (
        eng._vote_group_scores({"s*": members, "index": [("index", 1.0)]}, "AND")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .collect()
    )
    got = eng.search_prefix(["s*", "index"], "AND", 10, max_expansions=3).collect()
    assert [(r["doc_id"], round(r["score"], 6)) for r in got] == [
        (r["doc_id"], round(r["score"], 6)) for r in manual
    ]
    assert all(r["matched"] == 2 for r in got)


def test_prefix_unmatched_under_and_is_empty(eng):
    assert eng.search_prefix(["zzzz*", "index"], "AND", 10).collect() == []
    # under OR the dead group drops out and the live one still serves
    assert eng.search_prefix(["zzzz*", "index"], "OR", 10).collect() != []


# --------------------------------------------------------------- near ----
def test_near_matches_bruteforce_in_order_gap(eng):
    slop = 3
    out = {
        r["doc_id"]: r["min_gap"]
        for r in eng.search_near("spark", "index", slop=slop, k=10**6).collect()
    }
    docs = eng.catalog.read_table("documents").select("doc_id", "text").collect()
    expect = {}
    for r in docs:
        toks = _toks(r["text"])
        p1 = [i for i, t in enumerate(toks) if t == "spark"]
        p2 = [i for i, t in enumerate(toks) if t == "index"]
        gaps = [b - a for a in p1 for b in p2 if 1 <= b - a <= slop]
        if gaps:
            expect[r["doc_id"]] = min(gaps)
    assert out == expect


def test_near_slop1_is_exact_phrase(eng):
    near = {
        r["doc_id"]
        for r in eng.search_near("spark", "index", slop=1, k=10**6).collect()
    }
    phrase = {r["doc_id"] for r in eng.phrase_docs(["spark", "index"]).collect()}
    assert near == phrase


def test_near_guards(eng):
    with pytest.raises(ValueError):
        eng.search_near("spark", "index", slop=0)
    assert eng.search_near("spark", "zzzznotaterm", slop=3).collect() == []
