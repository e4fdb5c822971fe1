"""Typo-tolerant search (search_fuzzy) gates: the edit-distance expansion
recomputed brute-force from the corpus vocabulary (python Levenshtein +
the same distance/df/term ordering and cap), the weighted vote-group
rollup recomputed from the engine's own single-term scorer, the exact
term leading its group at weight 1.0, and the absent-neighborhood AND
contract."""

from __future__ import annotations

import re

import pytest

from open_source_search_engine_spark.catalog import Catalog
from open_source_search_engine_spark.operators.index_build import (
    IndexConfig,
    build_index,
)
from open_source_search_engine_spark.operators.query import SearchEngine

ROWS = [
    (1, "spark cluster merge fast"),
    (2, "spark spark shuffle merge"),
    (3, "sparks fly merge here"),
    (4, "spork utensil merge drawer"),
    (5, "cluster shuffle nothing"),
    (6, "spark merge merge merge"),
    (7, "marge likes merge too"),
]
FW = 0.7


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _vocab():
    df: dict[str, int] = {}
    for _, t in ROWS:
        for w in set(re.split(r"[^a-z0-9_]+", t.lower())) - {""}:
            df[w] = df.get(w, 0) + 1
    return df


def _expand(q: str, max_edit: int, cap: int):
    df = _vocab()
    cands = [
        (w, _lev(w, q), n) for w, n in df.items() if _lev(w, q) <= max_edit
    ]
    cands.sort(key=lambda x: (x[1], -x[2], x[0]))
    return [(w, 1.0 if d == 0 else FW) for w, d, _ in cands[:cap]]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("fuzzy-wh")))
    build_index(
        spark,
        cat,
        spark.createDataFrame(ROWS, "doc_id long, text string"),
        IndexConfig(),
    )
    return SearchEngine(spark, cat)


def test_fuzzy_matches_weighted_group_bruteforce(eng):
    # 'murge' (absent) has TWO distance-1 neighbors: merge and marge
    members = _expand("murge", 1, 8)
    assert {m for m, _ in members} == {"merge", "marge"}
    assert all(w == FW for _, w in members), "no distance-0 member"
    per_doc: dict[int, float] = {}
    for m, w in members:
        for r in eng.score_terms([m], "OR").collect():
            per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0.0) + w * r["score"]
    got = eng.search_fuzzy(["murge"], "OR", k=10).collect()
    assert {r["doc_id"] for r in got} == set(per_doc)
    for r in got:
        assert r["score"] == pytest.approx(per_doc[r["doc_id"]], rel=1e-9)


def test_fuzzy_exact_term_leads_at_full_weight(eng):
    # querying an EXISTING term: distance-0 member ranks first in the
    # expansion and carries weight 1.0, so every plain-search hit keeps
    # at least its exact-path score
    exact = {r["doc_id"]: r["score"] for r in eng.search_terms(["spark"], "OR", 10).collect()}
    fuzzy = {r["doc_id"]: r["score"] for r in eng.search_fuzzy(["spark"], "OR", k=10).collect()}
    assert set(exact) <= set(fuzzy)
    for d, s in exact.items():
        assert fuzzy[d] >= s - 1e-12


def test_fuzzy_cap_binds(eng):
    # max_expansions=1 on 'sparc' keeps only the (distance, df, term)
    # leader: spark (df 3 beats sparks/spork at 1)
    got = {r["doc_id"] for r in eng.search_fuzzy(["sparc"], "OR", k=10, max_expansions=1).collect()}
    want = {r["doc_id"] for r in eng.search_terms(["spark"], "OR", 10).collect()}
    assert got == want


def test_fuzzy_absent_neighborhood_and_contract(eng):
    out = eng.search_fuzzy(["zzzzzzzz", "merge"], "AND", k=10)
    assert out.count() == 0
