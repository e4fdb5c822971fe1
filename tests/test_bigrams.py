"""Bigram-term gates (SURVEY.md X3): bigram postings carry first-word
positions; phrase retrieval over bigram termlists is identical to positional
intersection of unigram lists; BM25 rankings are unaffected by the extra
terms (df of unigrams unchanged)."""

from __future__ import annotations

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

N_TURNS = 800


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    docs = transcripts_to_docs(synth_transcripts(spark, N_TURNS))
    big = Catalog(spark, str(tmp_path_factory.mktemp("bi-wh")))
    build_index(
        spark, big, docs, IndexConfig(tokenizer_mode="ascii", bigrams=True)
    )
    plain = Catalog(spark, str(tmp_path_factory.mktemp("uni-wh")))
    build_index(spark, plain, docs, IndexConfig(tokenizer_mode="ascii"))
    return (
        SearchEngine(spark, big, tokenizer_mode="ascii"),
        SearchEngine(spark, plain, tokenizer_mode="ascii"),
    )


def test_bigram_terms_in_stats(engines):
    big, _ = engines
    ts = big.catalog.read_table("term_stats")
    n_bi = ts.filter(F.col("term").contains(" ")).count()
    assert n_bi > 0
    # planted turn "to be or not to be" -> bigram "to be" with tf 2
    row = ts.filter(F.col("term") == "to be").collect()
    assert row and row[0]["cf"] >= 2


PHRASES = [
    ["to", "be"],
    ["to", "be", "or", "not"],
    ["repeat", "repeat"],
    ["rareterm_xyzzy", "appears"],
    ["zz_nope", "zz_nada"],
]


@pytest.mark.parametrize("phrase", PHRASES)
def test_bigram_phrase_equals_positional(spark, engines, phrase):
    big, plain = engines
    via_bigram = [
        (int(r["doc_id"]), float(r["score"]))
        for r in big.search_phrase(phrase, 20, use_bigrams=True).collect()
    ]
    via_positional = [
        (int(r["doc_id"]), float(r["score"]))
        for r in big.search_phrase(phrase, 20, use_bigrams=False).collect()
    ]
    on_plain_index = [
        (int(r["doc_id"]), float(r["score"]))
        for r in plain.search_phrase(phrase, 20).collect()
    ]
    assert via_bigram == via_positional == on_plain_index


def test_bigram_postings_termlist_equals_positional(spark, engines):
    """SearchEngine.bigram_postings: the indexed-bigram-termlist path and
    the unigram positional-adjacency fallback produce identical
    (doc_id, tf, dl) rows -- so search_expanded's bigram boost is
    index-layout independent."""
    big, plain = engines
    for a, b in [("to", "be"), ("repeat", "repeat"), ("zz_no", "zz_nada")]:
        x = sorted(
            (int(r["doc_id"]), int(r["tf"]), int(r["dl"]))
            for r in big.bigram_postings(a, b).collect()
        )
        y = sorted(
            (int(r["doc_id"]), int(r["tf"]), int(r["dl"]))
            for r in plain.bigram_postings(a, b).collect()
        )
        assert x == y, (a, b)
    assert sorted(
        int(r["tf"]) for r in big.bigram_postings("to", "be").collect()
    )  # non-empty for the planted phrase


def test_unigram_rankings_unaffected(spark, engines):
    big, plain = engines
    a = [
        (int(r["doc_id"]), float(r["score"]))
        for r in big.search_terms(["spark", "index"], "AND", 10).collect()
    ]
    b = [
        (int(r["doc_id"]), float(r["score"]))
        for r in plain.search_terms(["spark", "index"], "AND", 10).collect()
    ]
    assert a == b


@pytest.mark.parametrize("mode", ["ascii", "unicode"])
def test_bigram_index_incremental_updates(spark, tmp_path_factory, mode):
    """Incremental updates on a bigrams=True index (SURVEY.md §2.9 + X3):
    after upsert + delete, term_stats (including bigram terms) and
    phrase/BM25 results are identical to a fresh bigram build of the
    edited corpus, both before and after compaction."""
    from open_source_search_engine_spark.operators.updates import (
        apply_updates,
        compact_updates,
    )

    cfg = IndexConfig(tokenizer_mode=mode, bigrams=True)
    base = transcripts_to_docs(synth_transcripts(spark, 400))
    live = Catalog(spark, str(tmp_path_factory.mktemp(f"biup-{mode}")))
    build_index(spark, live, base, cfg)

    changed = base.filter(F.col("turn_idx") == 1).withColumn(
        "text", F.concat(F.lit("brandnew bigramword pair here "), F.col("text"))
    )
    deletes = base.filter(F.col("turn_idx") == 4).select("doc_id")
    apply_updates(
        spark, live, upserts=changed, delete_ids=deletes, config=cfg
    )
    edited = (
        base.filter(~F.col("turn_idx").isin(1, 4)).unionByName(changed)
    )
    cold = Catalog(spark, str(tmp_path_factory.mktemp(f"biup-cold-{mode}")))
    build_index(spark, cold, edited, cfg)

    def check():
        e_live = SearchEngine(spark, live, tokenizer_mode=mode)
        e_cold = SearchEngine(spark, cold, tokenizer_mode=mode)
        # stats identity incl. the NEW bigram terms from the upsert
        a = {
            r["term"]: (r["term_id"], r["df"], r["cf"])
            for r in live.read_table("term_stats").collect()
        }
        b = {
            r["term"]: (r["term_id"], r["df"], r["cf"])
            for r in cold.read_table("term_stats").collect()
        }
        assert a == b
        assert "brandnew bigramword" in a  # new bigram term, correct id
        for phrase in [["brandnew", "bigramword"], ["to", "be"]]:
            x = [
                (int(r["doc_id"]), float(r["score"]))
                for r in e_live.search_phrase(phrase, 20).collect()
            ]
            y = [
                (int(r["doc_id"]), float(r["score"]))
                for r in e_cold.search_phrase(phrase, 20).collect()
            ]
            assert x == y
        x = [
            (int(r["doc_id"]), float(r["score"]))
            for r in e_live.search_terms(["spark", "index"], "AND", 10).collect()
        ]
        y = [
            (int(r["doc_id"]), float(r["score"]))
            for r in e_cold.search_terms(["spark", "index"], "AND", 10).collect()
        ]
        assert x == y

    check()  # tombstone-filtered read path
    compact_updates(spark, live)
    check()  # after physical annihilation


def test_unicode_mode_bigrams_with_non_ascii(spark, tmp_path_factory):
    """X3 in unicode tokenizer mode: non-ASCII docs take the regex path and
    still emit bigram terms with ids identical to the byte path's, so
    phrase-over-bigrams == positional intersection on a mixed corpus."""
    rows = [
        (0, "the quick merge sort runs fast"),
        (1, "café crème is café crème here"),
        (2, "merge sort and café crème together"),
        (3, "nothing relevant in this row"),
        (4, "sort merge is not merge sort"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cat = Catalog(spark, str(tmp_path_factory.mktemp("unibi-wh")))
    build_index(
        spark, cat, docs, IndexConfig(tokenizer_mode="unicode", bigrams=True)
    )
    eng = SearchEngine(spark, cat, tokenizer_mode="unicode")
    ts = eng.catalog.read_table("term_stats")
    row = ts.filter(F.col("term") == "café crème").collect()
    assert row and int(row[0]["df"]) == 2 and int(row[0]["cf"]) == 3
    for phrase, expect in [
        (["café", "crème"], {1, 2}),
        (["merge", "sort"], {0, 2, 4}),
    ]:
        via_bigram = {
            int(r["doc_id"])
            for r in eng.search_phrase(phrase, 10, use_bigrams=True).collect()
        }
        via_positional = {
            int(r["doc_id"])
            for r in eng.search_phrase(phrase, 10, use_bigrams=False).collect()
        }
        assert via_bigram == via_positional == expect
