"""Speller gates (Speller.cpp analog): did-you-mean suggestion, phrase
popularity lookup, and two-way run-on splitting over a hand-built corpus
with known document frequencies."""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.operators import speller


@pytest.fixture(scope="module")
def vocab(spark):
    # hand-built vocabulary with known df: "merge" popular, "marge" rare,
    # plus the split halves "hash"/"table"/"stream"/"window"
    rows = [
        ("merge", 40), ("marge", 2), ("spark", 30), ("table", 25),
        ("hash", 20), ("stream", 15), ("window", 10), ("join", 35),
        ("a", 50), ("ajoin", 1),
    ]
    return spark.createDataFrame(rows, "term string, df long").persist()


def test_suggest_prefers_lower_distance_then_popularity(spark, vocab):
    out = {
        r["qterm"]: (r["suggestion"], r["dist"], r["df"])
        for r in speller.suggest(spark, vocab, ["mrege", "tabel"]).collect()
    }
    # "mrege" is 2 edits from both "merge" (df 40) and "marge" (df 2):
    # popularity breaks the tie
    assert out["mrege"] == ("merge", 2, 40)
    assert out["tabel"] == ("table", 2, 25)


def test_suggest_known_term_suggests_itself_at_dist_zero(spark, vocab):
    [r] = speller.suggest(spark, vocab, ["join"]).collect()
    assert (r["suggestion"], r["dist"]) == ("join", 0)


def test_suggest_no_candidate_within_max_dist_yields_no_row(spark, vocab):
    assert speller.suggest(spark, vocab, ["zzqqxxvv"]).count() == 0


def test_suggest_per_term_returns_ranked_candidates(spark, vocab):
    rows = speller.suggest(spark, vocab, ["mrege"], per_term=2).collect()
    assert [(r["suggestion"], r["df"]) for r in rows] == [
        ("merge", 40), ("marge", 2)
    ]


def test_phrase_popularity_zero_for_oov(spark, vocab):
    out = {
        r["qterm"]: r["popularity"]
        for r in speller.phrase_popularity(
            spark, vocab, ["merge", "nosuchword"]
        ).collect()
    }
    assert out == {"merge": 40, "nosuchword": 0}


def test_split_runon_picks_strongest_weak_half(spark, vocab):
    out = {
        r["qterm"]: (r["left_part"], r["right_part"], r["split_pos"])
        for r in speller.split_runon(
            spark, vocab, ["hashtable", "streamwindow"]
        ).collect()
    }
    assert out["hashtable"] == ("hash", "table", 4)
    assert out["streamwindow"] == ("stream", "window", 6)


def test_split_runon_skips_known_terms(spark, vocab):
    # "ajoin" IS in the vocabulary: with skip_known it must not be split
    # even though ("a", "join") is a valid dictionary split
    assert speller.split_runon(spark, vocab, ["ajoin"]).count() == 0
    [r] = speller.split_runon(
        spark, vocab, ["ajoin"], skip_known=False
    ).collect()
    assert (r["left_part"], r["right_part"]) == ("a", "join")


def test_split_runon_tie_breaks_on_earliest_split(spark):
    # both splits have the same weaker-half df -> earliest split wins
    vocab = spark.createDataFrame(
        [("ab", 5), ("cd", 5), ("abc", 5), ("d", 5)],
        "term string, df long",
    )
    [r] = speller.split_runon(spark, vocab, ["abcd"]).collect()
    assert (r["left_part"], r["right_part"], r["split_pos"]) == ("ab", "cd", 2)


def test_vocab_from_term_stats_drops_bigrams_and_low_df(spark):
    ts = spark.createDataFrame(
        [("merge", 10, 12), ("merge sort", 3, 3), ("hapax", 1, 1)],
        "term string, df long, cf long",
    )
    got = {
        r["term"] for r in speller.vocab_from_term_stats(ts, min_df=2).collect()
    }
    assert got == {"merge"}


def test_suggest_plan_broadcasts_query_side(spark, vocab):
    plan = speller.suggest(spark, vocab, ["mrege"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
