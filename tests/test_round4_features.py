"""Round-4 feature gates: multi-word synonym expansion through the phrase
path, rule-based morphology, serve-time result dedup with refill, the UOR
opcode, and CJK character-bigram tokenization.

Reference behaviors pinned here:
* `Synonyms.cpp:59` + `test/system/test_search_terms.py:8` -- `html`
  matches documents containing ONLY "Hypertext Markup Language".
* `Synonyms.cpp` wordform machinery -- regular plural/inflection forms.
* `Msg40.cpp:1173-1300` -- result-page dedup + over-fetch refill.
* `Query.h:146-152` OP_UOR -- weighted-or rank blend.
* `Words.cpp:216` -- script-aware segmentation (CJK char bigrams).
"""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.functions.query_parser import (
    parse_query,
    to_dnf,
    uor_groups,
)
from open_source_search_engine_spark.functions.synonyms import (
    DEFAULT_SYNONYMS,
    morph_forms,
    word_forms,
)
from open_source_search_engine_spark.functions.tokenizer import (
    expand_cjk_token,
    tokenize,
)
from open_source_search_engine_spark.operators.index_build import (
    IndexConfig,
    build_index,
)
from open_source_search_engine_spark.operators.query import SearchEngine


def _engine(spark, catalog, rows, mode="ascii", **cfg):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(spark, catalog, docs, IndexConfig(tokenizer_mode=mode, **cfg))
    return SearchEngine(spark, catalog, tokenizer_mode=mode)


# ---------------------------------------------------------------------------
# multi-word synonym expansion (phrase vote-group members)
# ---------------------------------------------------------------------------
class TestMultiwordSynonym:
    def test_html_matches_spelled_out_phrase_only(self, spark, catalog):
        # the reference golden: the doc contains ONLY the expansion
        eng = _engine(
            spark,
            catalog,
            [
                (1, "the hypertext markup language standard is old"),
                (2, "html in one doc"),
                (3, "hypertext without the rest, markup language split"),
            ],
        )
        got = eng.search_synonyms(["html"], None, "AND", 10).collect()
        ids = [r.doc_id for r in got]
        assert 1 in ids  # matched through the 3-word phrase at 0.9
        assert 2 in ids  # matched through the literal term at 1.0
        assert 3 not in ids  # words present but NOT adjacent -> no phrase

    def test_phrase_weight_applied(self, spark, catalog):
        eng = _engine(
            spark,
            catalog,
            [
                (1, "structured query language here"),
                (2, "padding doc for idf query structured"),
            ],
        )
        got = {
            r.doc_id: r.score
            for r in eng.search_synonyms(["sql"], None, "OR", 10).collect()
        }
        assert set(got) == {1}
        # phrase contribution carries the 0.9 member weight: recompute
        full = {
            r.doc_id: r.score
            for r in eng.search_synonyms(
                ["sql"], None, "OR", 10, syn_weight=1.0
            ).collect()
        }
        assert got[1] == pytest.approx(0.9 * full[1])

    def test_absent_phrase_drops_from_group(self, spark, catalog):
        eng = _engine(spark, catalog, [(1, "nothing relevant here")])
        got = eng.search_synonyms(["html"], None, "AND", 10).collect()
        assert got == []

    def test_loader_comma_syntax_keeps_multiword_targets(self, tmp_path):
        from open_source_search_engine_spark.functions.synonyms import (
            load_synonyms,
        )

        p = tmp_path / "syn.txt"
        p.write_text(
            "html, hypertext markup language  # abbrev\n"
            "fast quick rapid\n"
            "sql, structured query language, sequel\n"
        )
        t = load_synonyms(str(p))
        assert t["html"] == ["hypertext markup language"]
        assert t["fast"] == ["quick", "rapid"]
        assert t["sql"] == ["structured query language", "sequel"]

    def test_three_word_phrase_postings_repeated_words(self, spark, catalog):
        eng = _engine(
            spark,
            catalog,
            [
                (1, "stop the stop the stop"),
                (2, "the stop the"),
                (3, "stop stop the"),
            ],
        )
        rows = {
            r.doc_id: r.tf
            for r in eng.phrase_postings(["stop", "the", "stop"]).collect()
        }
        # doc1: "stop the stop" at ordinals 0 and 2 -> tf 2
        assert rows == {1: 2}


# ---------------------------------------------------------------------------
# rule-based morphology
# ---------------------------------------------------------------------------
class TestMorphology:
    def test_rules(self):
        assert "query" in morph_forms("queries")
        assert "index" in morph_forms("indexes")
        assert "join" in morph_forms("joins")
        assert "batch" in morph_forms("batches")
        assert "sort" in morph_forms("sorted")
        assert "merge" in morph_forms("merged")
        assert "merge" in morph_forms("merging")
        assert "run" in morph_forms("running")
        assert "plan" in morph_forms("planned")
        # no false stems from short / excluded shapes
        assert morph_forms("is") == []
        assert morph_forms("class") == []
        assert morph_forms("status") == []

    def test_hardcoded_plural_table_deleted(self):
        # r3 VERDICT task 5: the ~20-word plural list is gone; only
        # irregulars the rules cannot derive may remain
        for plural in ("rows", "tables", "queries", "indexes", "joins"):
            assert plural not in DEFAULT_SYNONYMS

    def test_word_forms_includes_morph_candidates(self):
        forms = dict(word_forms("indexes", "ascii"))
        assert forms["indexes"] == 1.0
        assert forms["index"] == 0.9
        off = dict(word_forms("indexes", "ascii", morphology=False))
        assert "index" not in off

    def test_plural_query_matches_base_form_docs(self, spark, catalog):
        eng = _engine(
            spark,
            catalog,
            [
                (1, "an index on one table"),
                (2, "no relevant words at all"),
                (3, "indexes mentioned literally"),
            ],
        )
        got = {
            r.doc_id: r
            for r in eng.search_expanded(
                ["indexes"], "AND", 10, use_bigrams=False
            ).collect()
        }
        assert set(got) == {1, 3}
        # literal term scores at 1.0 weight, derived base form at 0.9;
        # invalid candidate 'indexe' silently dropped at plan time


# ---------------------------------------------------------------------------
# serve-time result dedup + over-fetch refill
# ---------------------------------------------------------------------------
class TestSearchDeduped:
    def _corpus(self):
        rows = [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),  # exact duplicate of 1
            (3, "alpha beta gamma delta"),  # exact duplicate of 1
            (4, "alpha beta other words"),
            (5, "alpha beta more words"),
            (6, "alpha beta again padding"),
            (7, "alpha beta lowest xyz"),
        ]
        return rows

    def test_duplicates_collapse_and_refill(self, spark, catalog):
        eng = _engine(spark, catalog, self._corpus())
        plain = eng.search_terms(["alpha", "beta"], "AND", 4).collect()
        plain_ids = [r.doc_id for r in plain]
        assert plain_ids[:3] == [1, 2, 3]  # identical docs tie, doc_id asc
        got = eng.search_deduped(
            ["alpha", "beta"], "AND", k=4, overfetch=2, sim_ham=0
        ).collect()
        ids = [r.doc_id for r in got]
        assert 1 in ids and 2 not in ids and 3 not in ids
        assert len(ids) == 4  # refilled to k from the over-fetched tail

    def test_greedy_matches_bruteforce(self, spark, catalog):
        import hashlib

        import numpy as np

        eng = _engine(spark, catalog, self._corpus())
        c = 7
        page = eng.search_terms(["alpha", "beta"], "AND", c).collect()
        texts = {
            r.doc_id: r.text
            for r in spark.createDataFrame(
                self._corpus(), "doc_id long, text string"
            ).collect()
        }

        def simhash(text: str) -> int:
            from collections import Counter

            toks = [t for t in text.lower().split() if t]
            acc = np.zeros(64, np.int64)
            for t, tf in Counter(toks).items():
                h = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
                bits = (
                    np.uint64(h) >> np.arange(64, dtype=np.uint64)
                ) & np.uint64(1)
                acc += tf * (2 * bits.astype(np.int64) - 1)
            v = int(
                (
                    (acc > 0).astype(np.uint64)
                    << np.arange(64, dtype=np.uint64)
                ).sum()
            )
            return v - (1 << 64) if v >= (1 << 63) else v

        for ham in (0, 3, 63):
            kept, kept_hashes = [], []
            for r in page:
                h = simhash(texts[r.doc_id]) & 0xFFFFFFFFFFFFFFFF
                if all(
                    bin(h ^ (kh & 0xFFFFFFFFFFFFFFFF)).count("1") > ham
                    for kh in kept_hashes
                ):
                    kept.append(r.doc_id)
                    kept_hashes.append(h)
                if len(kept) == 4:
                    break
            got = [
                r.doc_id
                for r in eng.search_deduped(
                    ["alpha", "beta"], "AND", k=4, overfetch=2, sim_ham=ham
                ).collect()
            ]
            assert got == kept, f"ham={ham}"


# ---------------------------------------------------------------------------
# UOR opcode
# ---------------------------------------------------------------------------
class TestUor:
    def test_parse_and_dnf(self):
        ast = parse_query("a UOR b")
        assert ast[0] == "uor"
        clauses = to_dnf(ast)
        assert len(clauses) == 2  # eligibility identical to OR
        assert uor_groups(ast) == [["a", "b"]]
        mixed = parse_query("x (a UOR b UOR c)")
        assert uor_groups(mixed) == [["a", "b", "c"]]
        assert uor_groups(parse_query("a OR b")) == []

    def test_uor_matched_counts_groups(self, spark, catalog):
        eng = _engine(
            spark,
            catalog,
            [
                (1, "spark join merge"),
                (2, "spark join sort"),
                (3, "spark join merge sort"),
                (4, "spark join neither"),
                (5, "merge sort no anchor"),
            ],
        )
        got = {
            r.doc_id: r
            for r in eng.search_query(
                "spark join (merge UOR sort)", k=10
            ).collect()
        }
        assert set(got) == {1, 2, 3}  # 4 fails eligibility, 5 lacks anchors
        # the UOR pair is ONE vote group: matched = 3 for every hit,
        # even when both members are present (doc 3)
        assert {r.matched for r in got.values()} == {3}
        # plain OR counts each term: doc 3 matches 4
        plain = {
            r.doc_id: r
            for r in eng.search_query(
                "spark join (merge OR sort)", k=10
            ).collect()
        }
        assert plain[3].matched == 4
        # scores identical between UOR and OR (weights are all 1.0)
        for d in (1, 2, 3):
            assert got[d].score == pytest.approx(plain[d].score)


# ---------------------------------------------------------------------------
# CJK character bigrams
# ---------------------------------------------------------------------------
class TestCjk:
    def test_expand_cjk_token(self):
        assert expand_cjk_token("世界和平") == ["世界", "界和", "和平"]
        assert expand_cjk_token("一") == ["一"]
        assert expand_cjk_token("ab世界cd") == ["ab", "世界", "cd"]
        assert expand_cjk_token("plain") == ["plain"]

    def test_tokenize_modes(self):
        assert tokenize("hello 世界和平 world", "unicode") == [
            "hello", "世界", "界和", "和平", "world",
        ]
        # ascii mode never emits CJK (bytes outside [a-z0-9_])
        assert tokenize("hello 世界和平 world", "ascii") == ["hello", "world"]
        # katakana and hangul runs also expand
        assert tokenize("データ", "unicode") == ["デー", "ータ"]
        assert tokenize("한국어", "unicode") == ["한국", "국어"]

    def test_cjk_index_and_query_symmetry(self, spark, catalog):
        eng = _engine(
            spark,
            catalog,
            [
                (1, "分散検索エンジンの構築"),
                (2, "検索 クエリ の 例"),
                (3, "nothing cjk here"),
                (4, "mixed 検索 and english"),
            ],
            mode="unicode",
        )
        # the query goes through the SAME tokenizer -> bigrams of 検索
        got = eng.search("検索", "AND", 10).collect()
        ids = sorted(r.doc_id for r in got)
        assert ids == [1, 2, 4]
        # positions support phrases across the bigram stream
        hits = sorted(
            r.doc_id for r in eng.phrase_docs(tokenize("検索エンジン", "unicode")).collect()
        )
        assert hits == [1]

    def test_cjk_dl_counts_bigrams(self, spark, catalog):
        eng = _engine(
            spark, catalog, [(1, "世界和平")], mode="unicode"
        )
        row = eng.catalog.read_table("corpus_stats").collect()[0]
        assert float(row["avgdl"]) == 3.0  # 4 chars -> 3 bigrams
