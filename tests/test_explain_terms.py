"""Query-plan introspection (explain_terms) gates: dictionary rows match
the engine's own plan_terms, the route decision flips exactly at the
sum(df) cutoff and agrees with search_auto's rule, absent terms carry the
df=0/idf-NULL/present=false contract, and a fully-cached call runs ZERO
Spark jobs (the free-SERP-telemetry claim)."""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.catalog import Catalog
from open_source_search_engine_spark.operators.index_build import (
    IndexConfig,
    build_index,
)
from open_source_search_engine_spark.operators.query import SearchEngine

ROWS = [
    (1, "alpha bravo charlie"),
    (2, "alpha bravo"),
    (3, "alpha delta"),
    (4, "echo foxtrot"),
]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("explain-wh")))
    build_index(
        spark,
        cat,
        spark.createDataFrame(ROWS, "doc_id long, text string"),
        IndexConfig(),
    )
    return SearchEngine(spark, cat)


def test_rows_match_plan_and_absent_contract(eng):
    got = {
        r["term"]: r
        for r in eng.explain_terms(["alpha", "bravo", "zzznope"]).collect()
    }
    plan = eng.plan_terms(["alpha", "bravo"])
    for _, p in plan.iterrows():
        r = got[p["term"]]
        assert r["present"] is True
        assert r["df"] == int(p["df"])
        assert r["idf"] == pytest.approx(float(p["idf"]), rel=1e-12)
    absent = got["zzznope"]
    assert absent["present"] is False
    assert absent["df"] == 0 and absent["idf"] is None
    assert all(r["sum_df"] == 3 + 2 for r in got.values())


def test_route_flips_at_cutoff_and_matches_search_auto(eng):
    # sum_df(alpha, bravo) = 5: cutoff 5 -> exact, cutoff 4 -> wand
    exact = eng.explain_terms(["alpha", "bravo"], wand_df_cutoff=5).collect()
    wand = eng.explain_terms(["alpha", "bravo"], wand_df_cutoff=4).collect()
    assert {r["route"] for r in exact} == {"exact"}
    assert {r["route"] for r in wand} == {"wand"}
    # both routes give identical pages (search_auto's stated contract)
    a = eng.search_auto(["alpha", "bravo"], "AND", 10, wand_df_cutoff=5).collect()
    b = eng.search_auto(["alpha", "bravo"], "AND", 10, wand_df_cutoff=4).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_cached_explain_runs_zero_jobs(eng):
    eng.explain_terms(["alpha", "bravo"]).collect()  # warm the plan cache
    sc = eng.spark.sparkContext
    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    eng.explain_terms(["alpha", "bravo"])  # build only, no collect
    after = tracker.getJobIdsForGroup(None)
    assert before == after, "plan-cached explain must not launch a job"
