"""doc_perplexity (CCNet-style self-trained bigram LM, Wenzek et al. 2020):
brute-force recomputation of the whole model in Python over the same corpus,
plus the semantic claims the operator exists for — corpus-improbable text
scores above fluent in-domain text."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from open_source_search_engine_spark.operators.text_analysis import doc_perplexity


def _toks(text: str) -> list[str]:
    return [w for w in re.split(r"[^a-z0-9_]+", (text or "").lower()) if w]


def _golden(texts: dict[int, str]) -> dict[int, tuple[int, float, float]]:
    uni: Counter = Counter()
    bgc: Counter = Counter()
    for t in texts.values():
        ws = _toks(t)
        uni.update(ws)
        bgc.update(zip(ws, ws[1:]))
    vn = len(uni)
    out = {}
    for did, t in texts.items():
        ws = _toks(t)
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue
        ls = [
            math.log((bgc[p] + 1.0) / (uni[p[0]] + vn)) for p in pairs
        ]
        nll = -sum(ls) / len(ls)
        out[did] = (len(pairs), round(nll, 4), round(math.exp(nll), 4))
    return out


CORPUS = {
    # fluent, repetitive in-domain prose: every bigram recurs
    1: "the quick brown fox jumps over the lazy dog",
    2: "the quick brown fox jumps over the lazy dog again and again",
    3: "the quick brown fox naps while the lazy dog jumps",
    4: "a lazy dog and a quick fox share the brown field",
    # corpus-improbable: same vocabulary, shuffled order (every bigram
    # is unseen elsewhere) -> must rank at the top
    5: "dog the over quick lazy brown jumps fox the",
    # degenerate rows the operator must not trip on
    6: "singleton",
    7: "",
    8: None,
}


@pytest.fixture(scope="module")
def scored(spark):
    docs = spark.createDataFrame(
        [(k, v) for k, v in CORPUS.items()], "doc_id INT, text STRING"
    )
    rows = doc_perplexity(docs).collect()
    return {r["doc_id"]: r for r in rows}


def test_matches_bruteforce_model(scored):
    gold = _golden(CORPUS)
    assert set(scored) == set(gold)
    for did, (nb, nll, ppl) in gold.items():
        r = scored[did]
        assert r["n_bigrams"] == nb
        assert r["nll"] == pytest.approx(nll, abs=1e-4)
        assert r["ppl"] == pytest.approx(ppl, abs=1e-3)


def test_shuffled_text_is_most_surprising(scored):
    # doc 5 reuses the corpus vocabulary but every bigram is novel, so its
    # surprisal must exceed every fluent doc's
    worst = max(scored, key=lambda d: scored[d]["nll"])
    assert worst == 5
    assert scored[5]["nll"] > max(
        scored[d]["nll"] for d in (1, 2, 3, 4)
    )


def test_repetition_lowers_surprisal(scored):
    # doc 2 repeats doc 1's bigrams plus "again and again" n-grams seen
    # nowhere else... doc 1's bigrams all occur >= 2x so doc 1 <= doc 5
    assert scored[1]["nll"] < scored[5]["nll"]


def test_short_docs_excluded(scored):
    # < 2 tokens -> no bigrams -> no row (matches the oracle's inner join)
    assert 6 not in scored
    assert 7 not in scored
    assert 8 not in scored


def test_no_python_udf_in_plan(spark):
    docs = spark.createDataFrame(
        [(k, v) for k, v in CORPUS.items()], "doc_id INT, text STRING"
    )
    plan = doc_perplexity(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
