"""Gates for substring_pairs (exact-substring duplication detector).

The exactness gate compares the distributed gaps-and-islands plan against a
per-pair longest-common-token-substring DP run driver-side on the same
deterministic corpus.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.dedup import (
    substring_pairs,
    tokens_col,
)

VOCAB = [f"w{i}" for i in range(60)]


def _mk_corpus():
    rng = random.Random(7)
    passage = [VOCAB[rng.randrange(60)] for _ in range(30)]  # 30-token run
    short = [VOCAB[rng.randrange(60)] for _ in range(9)]  # sub-threshold run
    boiler = ["the", "terms", "of", "service", "apply", "to", "all", "users"]
    docs = []

    def doc(i, toks):
        docs.append((i, " ".join(toks)))

    def rand(k):
        return [VOCAB[rng.randrange(60)] for _ in range(k)]

    doc(0, rand(40) + passage + rand(25))  # shares passage with 1
    doc(1, passage + rand(50))
    doc(2, rand(30) + short + rand(30))  # shares only 9 tokens with 3
    doc(3, rand(20) + short + rand(45))
    doc(4, rand(70))  # shares nothing
    # every doc ends with the boilerplate sentence
    docs = [(i, t + " " + " ".join(boiler)) for i, t in docs]
    return docs


def _lcs_tokens(a: list[str], b: list[str]) -> int:
    """Longest common contiguous run, O(|a|*|b|) DP (oracle for the gate)."""
    best = 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            if x == y:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


def test_exact_vs_bruteforce_dp(spark):
    docs = spark.createDataFrame(_mk_corpus(), ["doc_id", "text"])
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["longest_run"]
        for r in substring_pairs(
            docs, n=4, min_run=4, max_gram_df=None
        ).collect()
    }
    toks = {
        r["doc_id"]: list(r["t"])
        for r in docs.select(
            "doc_id", tokens_col(F.col("text")).alias("t")
        ).collect()
    }
    ids = sorted(toks)
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            want = _lcs_tokens(toks[i], toks[j])
            if want >= 4:
                assert got[(i, j)] == want, (i, j, got.get((i, j)), want)
            else:
                assert (i, j) not in got


def test_min_run_threshold_filters(spark):
    docs = spark.createDataFrame(_mk_corpus(), ["doc_id", "text"])
    out = {
        (r["doc_id_a"], r["doc_id_b"]): r["longest_run"]
        for r in substring_pairs(
            docs, n=4, min_run=16, max_gram_df=None
        ).collect()
    }
    # the 30-token planted passage passes; the 9-token one does not
    assert out[(0, 1)] >= 30
    assert (2, 3) not in out


def test_gram_df_cap_suppresses_boilerplate_only_overlap(spark):
    # with the cap at 1 every cross-doc gram is "hot": all five docs share
    # the 8-token boilerplate tail, but boilerplate-only overlap must not
    # surface as a dup pair
    docs = spark.createDataFrame(_mk_corpus(), ["doc_id", "text"])
    out = substring_pairs(docs, n=4, min_run=4, max_gram_df=1).collect()
    assert out == []
    # at a permissive cap the real pairs come back
    out2 = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in substring_pairs(docs, n=4, min_run=16, max_gram_df=10).collect()
    }
    assert (0, 1) in out2


def test_short_docs_do_not_crash(spark):
    docs = spark.createDataFrame(
        [(0, "only three tokens"), (1, "only three tokens"), (2, "")],
        ["doc_id", "text"],
    )
    # every doc is shorter than n -> zero grams -> empty result, no error
    assert substring_pairs(docs, n=8, min_run=8).collect() == []


def test_plan_no_cartesian_and_broadcast_hot_set(spark):
    # the pair join must be a hash equi-join on gram (never a cartesian)
    # and the hot-gram exclusion a broadcast anti-join (the hot set is tiny
    # by construction: sum(df) <= total grams / cap of them)
    from open_source_search_engine_spark.operators.dedup import substring_pairs

    docs = spark.createDataFrame(_mk_corpus(), ["doc_id", "text"])
    out = substring_pairs(docs, n=4, min_run=8, max_gram_df=10)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p and "LeftAnti" in p


def test_occurrence_cap_bounds_intra_doc_repetition(spark):
    # df-only capping is evaded by INTRA-doc repetition (df=2 but the gram
    # join is quadratic in occurrences); the occurrence cap drops such
    # grams entirely -- degenerate repetition is boilerplate, and the join
    # stays bounded
    rep = " ".join(["spamtok"] * 2000)
    docs = spark.createDataFrame(
        [(0, rep), (1, rep)], ["doc_id", "text"]
    )
    out = substring_pairs(docs, n=4, min_run=4, max_gram_df=20).collect()
    assert out == []  # the only shared gram exceeds max_gram_occ
    # a normal planted run in the same corpus is still found
    run = " ".join(f"u{i}" for i in range(30))
    docs2 = spark.createDataFrame(
        [(0, rep + " " + run), (1, run + " " + rep)], ["doc_id", "text"]
    )
    got = substring_pairs(docs2, n=4, min_run=20, max_gram_df=20).collect()
    assert [(r["doc_id_a"], r["doc_id_b"]) for r in got] == [(0, 1)]
    assert got[0]["longest_run"] >= 30


def test_eager_uncapped_is_materialized(spark):
    # eager=True must checkpoint even with max_gram_df=None (uncapped):
    # the contract is "materialize NOW, the input may be mutated after",
    # and the old guard (eager AND cached) silently returned a lazy frame
    docs = spark.createDataFrame(_mk_corpus(), ["doc_id", "text"])
    out = substring_pairs(docs, min_run=10, max_gram_df=None, eager=True)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan, "eager uncapped result must not be lazy"
    lazy = substring_pairs(docs, min_run=10, max_gram_df=None, eager=False)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, lazy.collect())
    )
