"""Regression gates for the round-4 review findings: CJK expansion must
not depend on regex object identity across the pickle boundary, UOR vote
groups must honor query-side stopword dropping, morphology must not
derive false friends ("news" -> "new"), the synonym loader must keep
legacy space-separated lines that contain a comma parsing as before, and
the phrase-member hits cache must stay bounded."""

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
