"""Query-string grammar gates: the parser produces the documented DNF
(`Query.cpp:1229` setQWords analog) and search_query over a real index is
consistent with the primitive paths it composes."""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.catalog import Catalog
from open_source_search_engine_spark.functions.query_parser import (
    QueryParseError,
    parse_query,
    to_dnf,
)
from open_source_search_engine_spark.operators.index_build import (
    IndexConfig,
    build_index,
    transcripts_to_docs,
)
from open_source_search_engine_spark.operators.query import SearchEngine
from open_source_search_engine_spark.sources.transcripts import synth_transcripts


# ---------------------------------------------------------------- parser --

def test_plain_terms_implicit_and():
    assert to_dnf(parse_query("merge sort")) == [
        [(False, ("term", "merge")), (False, ("term", "sort"))]
    ]


def test_signs_quotes_fields():
    dnf = to_dnf(parse_query('"merge sort" -vector +the role:assistant'))
    assert dnf == [
        [
            (False, ("phrase", "merge sort")),
            (True, ("term", "vector")),
            (False, ("force", ("term", "the"))),
            (False, ("field", "role", "assistant")),
        ]
    ]


def test_stopword_dropping_rules():
    from open_source_search_engine_spark.functions.query_parser import (
        drop_stopword_terms,
    )

    stops = {"the", "a", "of"}
    # plain stopword drops; '+' survives; phrase survives; all-stop keeps
    assert drop_stopword_terms(
        to_dnf(parse_query("the merge")), stops
    ) == to_dnf(parse_query("merge"))
    assert drop_stopword_terms(
        to_dnf(parse_query("+the merge")), stops
    ) == to_dnf(parse_query("+the merge"))
    assert drop_stopword_terms(
        to_dnf(parse_query('"the merge"')), stops
    ) == to_dnf(parse_query('"the merge"'))
    assert drop_stopword_terms(
        to_dnf(parse_query("the a")), stops
    ) == to_dnf(parse_query("the a"))


def test_or_and_parens_distribute():
    dnf = to_dnf(parse_query("(a OR b) c"))
    assert dnf == [
        [(False, ("term", "a")), (False, ("term", "c"))],
        [(False, ("term", "b")), (False, ("term", "c"))],
    ]


def test_pipe_is_or_and_nested_negation():
    # -(a | b) => -a AND -b (De Morgan at the leaves); needs a positive atom
    dnf = to_dnf(parse_query("base -(a | b)"))
    assert dnf == [
        [
            (False, ("term", "base")),
            (True, ("term", "a")),
            (True, ("term", "b")),
        ]
    ]


def test_not_keyword_equals_minus_sign():
    assert to_dnf(parse_query("base NOT vector")) == to_dnf(
        parse_query("base -vector")
    )
    # NOT over a paren group distributes like -(...)
    assert to_dnf(parse_query("base NOT (a | b)")) == to_dnf(
        parse_query("base -(a | b)")
    )


def test_errors():
    for bad in ['"unterminated', "(unbalanced", "-onlynegative", ""]:
        with pytest.raises(QueryParseError):
            to_dnf(parse_query(bad))


# ---------------------------------------------------------------- engine --

@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("grammar-wh")))
    build_index(
        spark,
        cat,
        transcripts_to_docs(synth_transcripts(spark, 800)),
        IndexConfig(tokenizer_mode="ascii"),
    )
    return SearchEngine(spark, cat, tokenizer_mode="ascii")


def _rows(df):
    return [(int(r["doc_id"]), round(float(r["score"]), 9)) for r in df.collect()]


def test_grammar_plain_and_equals_search_terms(eng):
    a = _rows(eng.search_query("spark index", k=10))
    b = _rows(eng.search_terms(["spark", "index"], "AND", 10))
    assert a == b


def test_grammar_or_equals_search_terms_or(eng):
    a = _rows(eng.search_query("spark OR index", k=15))
    b = _rows(eng.search_terms(["spark", "index"], "OR", 15))
    assert a == b


def test_grammar_phrase_equals_search_phrase(eng):
    a = [d for d, _ in _rows(eng.search_query('"merge sort"', k=10))]
    b = [
        int(r["doc_id"])
        for r in eng.search_phrase(["merge", "sort"], 10).collect()
    ]
    assert a == b


def test_grammar_exclusion_and_field(eng):
    res = eng.search_query('spark -index role:user', k=20)
    docs = eng.catalog.read_table("documents")
    got = {int(r["doc_id"]) for r in res.collect()}
    assert got  # non-empty on the synthetic corpus
    # every hit: has spark, lacks index, role == user
    spark_ids = {int(r["doc_id"]) for r in eng.term_docs("spark").collect()}
    index_ids = {int(r["doc_id"]) for r in eng.term_docs("index").collect()}
    user_ids = {
        int(r["doc_id"])
        for r in docs.filter(docs.role == "user").select("doc_id").collect()
    }
    assert got <= (spark_ids - index_ids) & user_ids


def test_grammar_unknown_field_raises(eng):
    with pytest.raises(ValueError, match="unknown field"):
        eng.search_query("spark nosuchfield:x").collect()


def test_grammar_docid_restriction(eng):
    # F4 gbdocid: analog -- doc_id is an ordinary queryable column
    some = eng.term_docs("spark").limit(1).collect()[0]["doc_id"]
    res = eng.search_query(f"spark doc_id:{some}", k=10).collect()
    assert [int(r["doc_id"]) for r in res] == [int(some)]


def test_grammar_drop_stopwords_end_to_end(eng):
    # 'the merge' with dropping == plain 'merge'; '+the merge' keeps the
    # conjunction with the stopword (reference IGNORE_DEFAULT + QW_SIGN_PLUS)
    a = _rows(eng.search_query("the merge", k=10, drop_stopwords=True))
    b = _rows(eng.search_terms(["merge"], "AND", 10))
    assert a == b
    c = _rows(eng.search_query("+the merge", k=10, drop_stopwords=True))
    d = _rows(eng.search_terms(["merge", "the"], "AND", 10))
    assert c == d


# ------------------------------------------------------------- proximity --

def test_proximity_weight_zero_is_rank_identical(eng):
    a = _rows(eng.search_proximity(["spark", "index"], k=10, prox_weight=0.0))
    b = _rows(eng.search_terms(["spark", "index"], "AND", 10))
    assert a == b


def test_proximity_boost_bounded_and_additive(eng):
    base = {
        d: s
        for d, s in _rows(eng.search_terms(["spark", "index"], "AND", 100_000))
    }
    boosted = _rows(eng.search_proximity(["spark", "index"], k=50, prox_weight=1.0))
    for d, s in boosted:
        # bonus is 1/(mindist+1) in (0, 1]; both terms present under AND
        assert base[d] < s <= base[d] + 1.0 + 1e-12


def test_proximity_multiterm_matches_bruteforce(spark, tmp_path_factory):
    """3-term proximity: the one-pass kernel's pair bonuses equal the
    brute-force all-pairs min-distance computed in Python over the raw
    texts (multi-pair coverage; the 2-term gates can't see pair-order or
    pair-accumulation bugs)."""
    import itertools

    from open_source_search_engine_spark.functions.tokenizer import tokenize

    texts = [
        "alpha x x beta x x x gamma",          # pairwise dists 3, 4, 7
        "alpha beta gamma",                     # adjacent everything
        "gamma x alpha x x beta alpha",         # repeated term, min over occ
        "alpha x beta",                         # gamma missing
        "x x x alpha x gamma x beta x alpha",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    cat = Catalog(spark, str(tmp_path_factory.mktemp("prox3-wh")))
    build_index(spark, cat, docs, IndexConfig(tokenizer_mode="ascii"))
    e = SearchEngine(spark, cat, tokenizer_mode="ascii")
    got = {
        int(r["doc_id"]): float(r["score"])
        for r in e.search_proximity(
            ["alpha", "beta", "gamma"], k=10, prox_weight=1.0, mode="AND"
        ).collect()
    }
    base = {
        int(r["doc_id"]): float(r["score"])
        for r in e.search_terms(["alpha", "beta", "gamma"], "AND", 10).collect()
    }
    assert set(got) == set(base)  # AND semantics unchanged
    for doc_id, text in enumerate(texts):
        if doc_id not in got:
            continue
        pos: dict[str, list[int]] = {}
        for p, tok in enumerate(tokenize(text, "ascii")):
            pos.setdefault(tok, []).append(p)
        expect = 0.0
        for a, b in itertools.combinations(sorted(["alpha", "beta", "gamma"]), 2):
            d = min(
                abs(pa - pb) for pa in pos[a] for pb in pos[b]
            )
            expect += 1.0 / (d + 1.0)
        assert got[doc_id] == pytest.approx(base[doc_id] + expect, rel=1e-12)


# ------------------------------------------------- expansion (setQTerms) --

def test_word_forms_and_number_forms_units():
    from open_source_search_engine_spark.functions.synonyms import (
        NUMBER_FORMS,
        fold_accents,
        strip_possessive,
        word_forms,
    )

    assert strip_possessive("bob's") == "bob"
    assert strip_possessive("boys'") == "boys"
    assert strip_possessive("don't") == "dont"
    assert fold_accents("café") == "cafe"
    assert word_forms("bob's", "ascii") == [("bob", 0.9)]
    assert word_forms("merge", "ascii") == [("merge", 1.0)]
    assert word_forms("café", "unicode") == [("café", 1.0), ("cafe", 0.9)]
    assert NUMBER_FORMS["one"] == "1" and NUMBER_FORMS["1"] == "one"


def test_expanded_number_form_matches_digit_docs(eng):
    # reference golden (test/system/test_search_terms.py:4-18): 'one'
    # expands with '1'; the corpus contains '1' (planted "1,000 items...")
    # but never the word 'one'
    got = _rows(eng.search_expanded(["one"], "AND", 10))
    assert got  # matched via the number form only
    base = _rows(eng.search_terms(["1"], "AND", 10))
    assert [d for d, _ in got] == [d for d, _ in base]
    for (d, s), (_d2, s2) in zip(got, base):
        # _rows rounds to 9 dp; compare at that precision
        assert s == pytest.approx(0.9 * s2, abs=2e-9)


def test_expanded_possessive_matches_base_docs(eng):
    # planted "bob's cd-rom and alice's x-ray": query word "bob's" matches
    # via the possessive-stripped base 'bob' at 0.9 (X4)
    got = _rows(eng.search_expanded(["bob's"], "AND", 10, use_bigrams=False))
    base = _rows(eng.search_terms(["bob"], "AND", 10))
    assert got and [d for d, _ in got] == [d for d, _ in base]
    for (d, s), (_d2, s2) in zip(got, base):
        assert s == pytest.approx(0.9 * s2, abs=2e-9)


def test_expanded_bigram_weight_zero_is_rank_identical(eng):
    a = _rows(eng.search_expanded(["to", "be"], "AND", 10, bigram_weight=0.0))
    b = _rows(eng.search_terms(["to", "be"], "AND", 10))
    assert a == b


def test_expanded_bigram_boost_lifts_adjacent_docs(eng):
    base = {d: s for d, s in _rows(eng.search_terms(["to", "be"], "AND", 10_000))}
    boosted = dict(_rows(eng.search_expanded(["to", "be"], "AND", 10_000)))
    assert set(boosted) == set(base)  # AND semantics unchanged
    adjacent = {
        int(r["doc_id"]) for r in eng.bigram_postings("to", "be").collect()
    }
    assert adjacent  # planted "to be or not to be"
    for d in base:
        if d in adjacent:
            assert boosted[d] > base[d]
        else:
            assert boosted[d] == base[d]


def test_synonym_table_loader_roundtrip(eng, tmp_path):
    from open_source_search_engine_spark.functions.synonyms import (
        load_synonyms,
    )

    p = tmp_path / "mysynonyms.txt"
    # whitespace lines = single-word alternatives; comma lines preserve
    # multi-word alternatives (phrase-path targets, r4)
    p.write_text(
        "# user synonym table\n"
        "speedy shuffle fast\n"
        "merge combine\n"
        "\n"
    )
    table = load_synonyms(str(p))
    assert table == {"speedy": ["shuffle", "fast"], "merge": ["combine"]}
    df_table = load_synonyms(
        eng.spark.createDataFrame(
            [("speedy", ["shuffle", "fast"]), ("merge", ["combine"])],
            "term string, alts array<string>",
        )
    )
    assert df_table == table
    # expansion round-trip: 'speedy' (absent) matches via 'shuffle'
    res = eng.search_synonyms(["speedy"], table, "AND", 5).collect()
    assert res
    alt_ids = {int(r["doc_id"]) for r in eng.term_docs("shuffle").collect()}
    assert {int(r["doc_id"]) for r in res} <= alt_ids


# -------------------------------------------------------------- synonyms --

def test_synonym_expansion_matches_docs_without_base_term(eng):
    # the reference contract (test/system/test_search_terms.py:8): a query
    # term matches docs containing ONLY its expansion
    res = eng.search_synonyms(
        ["speedy"], {"speedy": ["shuffle"]}, "AND", 10
    ).collect()
    assert res  # 'speedy' is absent from the corpus; 'shuffle' is not
    alt_ids = {int(r["doc_id"]) for r in eng.term_docs("shuffle").collect()}
    assert {int(r["doc_id"]) for r in res} <= alt_ids


def test_synonym_weight_scales_scores(eng):
    syn = eng.search_synonyms(["speedy"], {"speedy": ["shuffle"]}, "AND", 5).collect()
    base = eng.search_terms(["shuffle"], "AND", 5).collect()
    assert [r["doc_id"] for r in syn] == [r["doc_id"] for r in base]
    for s, b in zip(syn, base):
        assert s["score"] == pytest.approx(0.9 * b["score"], rel=1e-12)


def test_synonym_group_is_one_vote(eng):
    # doc containing either member counts the group ONCE (J2 union);
    # AND over {speedy->shuffle} and {merge} needs shuffle AND merge
    res = eng.search_synonyms(
        ["speedy", "merge"], {"speedy": ["shuffle"]}, "AND", 20
    ).collect()
    alt_ids = {int(r["doc_id"]) for r in eng.term_docs("shuffle").collect()}
    merge_ids = {int(r["doc_id"]) for r in eng.term_docs("merge").collect()}
    got = {int(r["doc_id"]) for r in res}
    assert got <= (alt_ids & merge_ids)
    assert all(int(r["matched"]) == 2 for r in res)


# ---- facets / query-time sort (gbfacetstr:/gbsortby:/gbmin:/gbmax:) ------

def test_facets_counts_cover_all_matching_docs(eng):
    from pyspark.sql import functions as F

    rows = eng.search_facets("spark OR index", facet_fields=["role"]).collect()
    got = {r["facet_value"]: r["n_docs"] for r in rows}
    el, _ = eng.query_eligibility("spark OR index")
    docs = eng.catalog.read_table("documents").join(el, "doc_id", "left_semi")
    manual = {
        r["role"]: r["cnt"]
        for r in docs.groupBy("role").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got == manual
    # facets aggregate the WHOLE eligible set, not a top-k page
    assert sum(got.values()) == el.count()


def test_facets_range_buckets_and_topn(eng):
    rows = eng.search_facets(
        "spark", facet_ranges={"turn_idx": 5}, top_n=3
    ).collect()
    assert rows and all(r["facet_field"] == "turn_idx:5" for r in rows)
    assert all(int(r["facet_value"]) % 5 == 0 for r in rows)
    assert len(rows) <= 3
    counts = [r["n_docs"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_sortby_range_and_order(eng):
    rows = eng.search_sorted(
        "spark", "turn_idx", ascending=True, k=5,
        min_filters={"turn_idx": 2}, max_filters={"turn_idx": 50},
    ).collect()
    vals = [r["turn_idx"] for r in rows]
    assert vals == sorted(vals)
    assert all(2 <= v <= 50 for v in vals)
    # every returned doc really matches the query
    el, _ = eng.query_eligibility("spark")
    eligible = {r["doc_id"] for r in el.collect()}
    assert all(r["doc_id"] in eligible for r in rows)


def test_sortby_unknown_field_raises(eng):
    with pytest.raises(ValueError):
        eng.search_sorted("spark", "no_such_column")


def test_facets_unknown_field_raises(eng):
    with pytest.raises(ValueError):
        eng.search_facets("spark", facet_fields=["no_such_col"])


def test_sortby_unanswerable_keeps_schema(eng):
    df = eng.search_sorted("zzzmissingterm", "role", k=5)
    assert df.count() == 0
    assert dict(df.dtypes)["role"] == "string"


def test_dangling_operator_raises_parse_error():
    import pytest

    from open_source_search_engine_spark.functions.query_parser import (
        QueryParseError,
        parse_query,
    )

    # a dangling NOT (operator with no operand) must raise the documented
    # QueryParseError, never a raw TypeError from subscripting None
    for q in ("foo NOT", "NOT", "a AND NOT"):
        with pytest.raises(QueryParseError):
            parse_query(q)
    # a bare trailing +/- lexes as a word token, not a sign: no crash
    assert parse_query("bar +") is not None
    assert parse_query("baz -") is not None


def test_uor_under_not_produces_no_vote_group():
    from open_source_search_engine_spark.functions.query_parser import (
        parse_query,
        uor_groups,
    )

    # a UOR under NOT: its atoms are negated, so no positive vote group
    assert uor_groups(parse_query("(a b) OR (x NOT (a UOR b))")) == []
    # double negation restores polarity
    assert uor_groups(
        parse_query("x NOT (NOT (a UOR b))")
    ) == [["a", "b"]]
    # and an un-negated sibling group still comes through
    assert uor_groups(
        parse_query("(c UOR d) OR (x NOT (a UOR b))")
    ) == [["c", "d"]]
