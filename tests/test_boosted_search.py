"""search_boosted — doc-level score multipliers from document attributes.

The reference applies these at the same pipeline point: after per-term
scores are summed per doc and before top-k selection
(`PosdbTable.cpp:4095-4122` siteRank + same/unknown-language boosts;
hashgroup/field weights `Parms.cpp:3644-3790`; page temperature is the
recency analog). Gates:

* no-op identity — no boosts / all-1.0 weights are BIT-identical to
  search_terms (multiplication by exactly 1.0 is exact in IEEE754);
* field weights rescale and re-rank exactly (checked against a manual
  recomputation from the unboosted candidate set);
* recency halflife — same-text docs order newest-first, and one halflife
  of age exactly halves the score; future-dated rows clamp at 1.0;
* unknown boost column raises ValueError;
* plan gate — the doc-store scan reads ONLY doc_id + the boost columns
  (column pruning), and the multiplier stays JVM-side (no Python eval).
"""

from __future__ import annotations

import datetime as dt

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

NOW = dt.datetime(2026, 6, 1, tzinfo=dt.timezone.utc).timestamp()


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("boost-wh"))
    catalog = Catalog(spark, wh)
    build_index(
        spark,
        catalog,
        transcripts_to_docs(synth_transcripts(spark, 600)),
        IndexConfig(),
    )
    return SearchEngine(spark, catalog)


def _pairs(df):
    return [(r["doc_id"], r["score"], r["matched"]) for r in df.collect()]


def test_no_boost_identity(eng):
    base = eng.search_terms(["spark", "index"], "AND", 10)
    assert _pairs(eng.search_boosted(["spark", "index"], "AND", 10)) == _pairs(
        base
    )


def test_all_ones_identity(eng):
    base = eng.search_terms(["spark", "index"], "AND", 10)
    boosted = eng.search_boosted(
        ["spark", "index"], "AND", 10,
        field_weights={"role": ({}, 1.0)},
    )
    assert _pairs(boosted) == _pairs(base)


def test_field_weights_rescale_exactly(eng):
    weights = {"user": 2.0, "assistant": 0.5}
    default = 1.0
    # expected: unboosted candidate set x role multiplier, re-ranked
    cand = eng.score_terms(["spark", "index"], "AND")
    docs = eng.catalog.read_table("documents").select("doc_id", "role")
    rows = cand.join(docs, "doc_id").collect()
    expect = sorted(
        (
            (r["doc_id"], r["score"] * weights.get(r["role"], default))
            for r in rows
        ),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    got = eng.search_boosted(
        ["spark", "index"], "AND", 10,
        field_weights={"role": (weights, default)},
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (d, pytest.approx(s, abs=0, rel=0)) for d, s in expect
    ]
    # the boost must actually change the ordering vs the plain search for
    # this corpus, otherwise the gate proves nothing
    plain = [r["doc_id"] for r in eng.search_terms(["spark", "index"], "AND", 10).collect()]
    assert [r["doc_id"] for r in got] != plain


def test_recency_halflife_exact(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("boost-ts-wh"))
    catalog = Catalog(spark, wh)
    base = dt.datetime(2026, 5, 31, tzinfo=dt.timezone.utc)
    rows = [
        # identical text, ages 0 / 7 / 14 days at NOW=2026-06-01: with a
        # 7-day halflife the scores must be s, s/2, s/4
        ("c1", 0, "user", "alpha beta", None, base - dt.timedelta(days=13)),
        ("c1", 1, "user", "alpha beta", None, base - dt.timedelta(days=6)),
        ("c1", 2, "user", "alpha beta", None, base + dt.timedelta(days=1)),
        # future-dated row: age clamps to 0 -> multiplier exactly 1.0
        ("c1", 3, "user", "alpha beta", None, base + dt.timedelta(days=30)),
        ("c1", 4, "user", "gamma filler", None, base),
    ]
    docs = transcripts_to_docs(
        spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        )
    )
    build_index(spark, catalog, docs, IndexConfig())
    eng = SearchEngine(spark, catalog)
    got = eng.search_boosted(
        ["alpha"], "AND", 10, recency=("ts", NOW, 7.0)
    ).collect()
    assert len(got) == 4
    by_age = sorted(got, key=lambda r: -r["score"])
    s0 = by_age[0]["score"]
    scores = [r["score"] for r in by_age]
    assert scores[1] == pytest.approx(s0)  # future row clamps to 1.0
    assert scores[2] == pytest.approx(s0 / 2.0)
    assert scores[3] == pytest.approx(s0 / 4.0)


def test_unknown_column_raises(eng):
    with pytest.raises(ValueError, match="unknown boost column"):
        eng.search_boosted(
            ["spark"], "AND", 5, field_weights={"nope": ({}, 1.0)}
        )


def test_plan_pruned_and_jvm_side(eng):
    plan = eng.search_boosted(
        ["spark", "index"], "AND", 10,
        field_weights={"role": ({"user": 2.0}, 1.0)},
        recency=("ts", NOW, 7.0),
    )._jdf.queryExecution().executedPlan().toString()
    # doc-store scan is column-pruned to doc_id + boost columns: the text
    # column must not appear in any scan the boost join introduced
    scan_lines = [
        ln for ln in plan.splitlines() if "Scan parquet" in ln and "role" in ln
    ]
    assert scan_lines, "expected a pruned documents scan with role/ts"
    assert all("text" not in ln for ln in scan_lines)
    # the multiplier is a JVM projection: no Python evaluation in the plan
    # beyond the postings decode (which reports as ArrowEvalPython /
    # MapInPandas for the decode stage only)
    assert "BatchEvalPython" not in plan
