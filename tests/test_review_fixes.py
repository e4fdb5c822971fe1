"""Regression gates for the round-4 review findings (two passes).

Pass 1 (query/build path): CJK expansion must not depend on regex object
identity across the pickle boundary, UOR vote groups must honor
query-side stopword dropping, morphology must not derive false friends
("news" -> "new"), the synonym loader must keep legacy space-separated
lines that contain a comma parsing as before, and the phrase-member hits
cache must stay bounded.

Pass 2 (curation/analysis/streaming): shingling must not crash on docs
shorter than n tokens, pack_shards must not overflow on 63-bit hash
doc_ids, ivf must honor id_col, lang_id/gopher flags must not go NULL on
NULL text, spam_rank must not max out on tiny docs, and streaming ingest
must not let a stale redelivery overwrite a newer stored turn."""

from __future__ import annotations

import re

import pandas as pd
import pytest

from open_source_search_engine_spark.functions.synonyms import (
    load_synonyms,
    morph_forms,
)
from open_source_search_engine_spark.operators.index_build import (
    IndexConfig,
    _tokenize_batch,
    build_index,
)
from open_source_search_engine_spark.operators.query import SearchEngine


def _engine(spark, catalog, rows, mode="ascii", **cfg):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(spark, catalog, docs, IndexConfig(tokenizer_mode=mode, **cfg))
    return SearchEngine(spark, catalog, tokenizer_mode=mode)


class TestCjkPatternIdentity:
    def test_expansion_survives_fresh_compiled_pattern(self):
        # the executor receives the pattern via pickle; after re's pattern
        # cache churns, the unpickled object is EQUAL to the module-level
        # _UNICODE_RE but not identical -- expansion must still fire
        re.purge()
        fresh = re.compile(r"\w+", re.UNICODE)
        from open_source_search_engine_spark.functions.tokenizer import (
            _UNICODE_RE,
        )

        assert fresh is not _UNICODE_RE  # precondition: distinct objects
        b = pd.DataFrame({"doc_id": [1], "text": ["世界和平"]})
        out = _tokenize_batch(b, fresh)
        # with expansion: 3 overlapping char bigrams -> dl 3; without, the
        # whole run is one giant token -> dl 1
        assert out is not None
        assert int(out["dl"][0]) == 3


class TestUorStopwordDrop:
    def test_uor_member_stopword_does_not_score(self, spark, catalog):
        eng = _engine(
            spark,
            catalog,
            [
                (1, "spark merge the x"),
                (2, "spark the x"),
                (3, "spark merge x"),
            ],
        )
        got = {
            r.doc_id: r
            for r in eng.search_query(
                "spark (merge UOR the)", k=10, drop_stopwords=True
            ).collect()
        }
        # eligibility: the 'the' clause collapses to [spark] -> all 3 docs
        assert set(got) == {1, 2, 3}
        # doc 2 has no surviving UOR member: matched counts ONLY the spark
        # group, and its score is exactly the spark-only score
        assert got[2].matched == 1
        spark_only = {
            r.doc_id: r.score
            for r in eng.search_terms(["spark"], "AND", 10).collect()
        }
        assert got[2].score == pytest.approx(spark_only[2])
        # docs with merge count both groups
        assert got[1].matched == 2
        assert got[3].matched == 2


class TestMorphologyFalseFriends:
    def test_lexicalized_words_derive_nothing(self):
        assert morph_forms("news") == []
        assert morph_forms("series") == []
        assert morph_forms("always") == []

    def test_regular_inflections_still_derive(self):
        assert "table" in morph_forms("tables")
        assert "index" in morph_forms("indexes")
        assert "merge" in morph_forms("merging")


class TestLoaderBackwardCompat:
    def test_legacy_space_line_with_comma(self, tmp_path):
        # previously-valid format: whitespace group that happens to contain
        # a comma -- the first field's extra words must become alternatives,
        # not a multi-word base no query term can look up
        p = tmp_path / "syn.txt"
        p.write_text("speedy shuffle, fast\n")
        assert load_synonyms(str(p)) == {"speedy": ["shuffle", "fast"]}

    def test_multiword_alternatives_unchanged(self, tmp_path):
        p = tmp_path / "syn.txt"
        p.write_text("html, hypertext markup language\n")
        assert load_synonyms(str(p)) == {"html": ["hypertext markup language"]}


class TestPhraseHitsCacheBounded:
    def test_cache_reuse_and_eviction(self, spark, catalog):
        eng = _engine(
            spark,
            catalog,
            [
                (1, "alpha beta gamma tail"),
                (2, "delta epsilon zeta tail"),
                (3, "padding doc tail words"),
            ],
        )
        eng._phrase_hits_cache_max = 1
        syn = {"one": ["alpha beta gamma"], "two": ["delta epsilon zeta"]}
        r1 = eng.search_synonyms(["one"], syn, "OR", 10).collect()
        assert [r.doc_id for r in r1] == [1]
        assert len(eng._phrase_hits_cache) == 1
        # second call with the same phrase reuses the entry (no growth)
        eng.search_synonyms(["one"], syn, "OR", 10).collect()
        assert list(eng._phrase_hits_cache) == ["alpha beta gamma"]
        # a different phrase evicts the old entry at max size 1
        r2 = eng.search_synonyms(["two"], syn, "OR", 10).collect()
        assert [r.doc_id for r in r2] == [2]
        assert list(eng._phrase_hits_cache) == ["delta epsilon zeta"]
        # evicted frame still answers correctly (recompute, not stale ref)
        r1b = eng.search_synonyms(["one"], syn, "OR", 10).collect()
        assert [(r.doc_id, r.score) for r in r1b] == [
            (r.doc_id, r.score) for r in r1
        ]


class TestShortDocShingles:
    def test_short_docs_yield_empty_not_crash(self, spark):
        from open_source_search_engine_spark.operators.dedup import (
            doc_shingles,
            ngram_jaccard_pairs,
        )

        docs = spark.createDataFrame(
            [(1, "one two"), (2, "a"), (3, "x y z w"), (4, "")],
            "doc_id long, text string",
        )
        got = doc_shingles(docs, n=3).collect()
        # only doc 3 has >= 3 tokens: shingles "x y z" and "y z w"
        assert sorted((r.doc_id, r.shingle) for r in got) == [
            (3, "x y z"),
            (3, "y z w"),
        ]
        # the pair generator inherits the guard (used to abort the job)
        assert ngram_jaccard_pairs(docs, n=3).collect() == []

    def test_diversity_rank_single_token_doc(self, spark):
        from open_source_search_engine_spark.operators.text_analysis import (
            diversity_rank,
        )

        docs = spark.createDataFrame(
            [(1, "solo"), (2, "rep rep other rep")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in diversity_rank(docs).collect()}
        assert 1 not in rows  # no repeated term, and no crash
        assert rows[2].n_repeated == 1


class TestPackShardsOverflow:
    def test_63bit_doc_ids(self, spark):
        from open_source_search_engine_spark.operators.curation import (
            pack_shards,
        )

        big = [(2**62 + i * 7, f"tok{i} alpha beta gamma") for i in range(40)]
        docs = spark.createDataFrame(big, "doc_id long, text string")
        rows = sorted(
            pack_shards(docs, budget_tokens=40, n_buckets=8).collect(),
            key=lambda r: r.doc_id,
        )
        assert len(rows) == 40
        # shard_id must be non-decreasing in doc_id order (the
        # byte-identical-shards contract): the old (doc_id-lo)*n_buckets
        # bucket expression overflowed long here and aborted under ANSI
        shard_seq = [r.shard_id for r in rows]
        assert shard_seq == sorted(shard_seq)
        # exact prefix-sum semantics: shard of doc i = floor(excl_sum/40)
        excl = 0
        for r in rows:
            assert r.shard_id == excl // 40
            excl += r.n_tokens


class TestIvfIdCol:
    def test_ivf_topk_honors_id_col(self, spark):
        import numpy as np

        from open_source_search_engine_spark.operators.similarity import (
            ivf_topk,
        )

        rng = np.random.default_rng(7)
        rows = [
            (int(i), [float(x) for x in rng.normal(size=8)])
            for i in range(30)
        ]
        emb = spark.createDataFrame(
            rows, "doc_id long, embedding array<double>"
        )
        q = [float(x) for x in rng.normal(size=8)]
        got = ivf_topk(
            emb, q, k=5, n_centroids=4, n_probe=4, id_col="doc_id"
        ).collect()
        assert len(got) == 5  # used to throw UNRESOLVED_COLUMN vec_id


class TestNullTextAnalysis:
    def test_lang_id_null_text_is_und(self, spark):
        from open_source_search_engine_spark.operators.text_analysis import (
            lang_id,
        )

        docs = spark.createDataFrame(
            [(1, None), (2, "the cat and the dog have been there")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in lang_id(docs).collect()}
        assert rows[1].lang_pred == "und" and rows[1].lang_score == 0
        assert rows[2].lang_pred == "en"

    def test_gopher_flags_null_text_fails_gates(self, spark):
        from open_source_search_engine_spark.operators.text_analysis import (
            gopher_quality_flags,
        )

        docs = spark.createDataFrame(
            [(1, None)], "doc_id long, text string"
        )
        r = gopher_quality_flags(docs).collect()[0]
        assert r.quality_pass == 0  # used to be NULL (three-valued)
        assert r.flag_n_tokens == 1 and r.flag_common_words == 1
        assert r.flag_bullets == 0 and r.flag_ellipsis == 0

    def test_spam_rank_tiny_docs_not_maximal(self, spark):
        from open_source_search_engine_spark.operators.text_analysis import (
            word_spam_rank,
        )

        docs = spark.createDataFrame(
            [
                (1, "hello"),
                (2, "two words"),
                (3, "spam spam spam spam spam spam spam spam"),
            ],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in word_spam_rank(docs).collect()}
        assert rows[1].spam_rank == 0  # used to be 10
        assert rows[2].spam_rank == 0
        assert rows[3].spam_rank == 10  # genuine stamping still maxes


class TestStaleRedelivery:
    def test_older_ts_does_not_overwrite(self, spark, catalog):
        import pyspark.sql.functions as SF

        from open_source_search_engine_spark.operators.index_build import (
            build_index,
            transcripts_to_docs,
        )
        from open_source_search_engine_spark.streaming.ingest import (
            ingest_batch,
        )

        def turns(text, ts):
            return spark.createDataFrame(
                [("conv-a", 0, "user", text, None)],
                "conv_id string, turn_idx int, role string, text string,"
                " tool string",
            ).withColumn("ts", SF.lit(ts).cast("timestamp"))

        build_index(
            spark, catalog, transcripts_to_docs(turns("original words", "2026-01-01 00:00:00"))
        )
        # batch 1: the EDIT (newer ts) replaces the original
        ingest_batch(spark, catalog, turns("edited words", "2026-01-02 00:00:00"))
        # batch 2: an at-least-once source re-delivers the ORIGINAL (older
        # ts) -- it must NOT overwrite the edit
        ingest_batch(spark, catalog, turns("original words", "2026-01-01 00:00:00"))
        stored = catalog.read_table("documents").collect()
        assert len(stored) == 1 and stored[0].text == "edited words"
