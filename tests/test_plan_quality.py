"""Physical-plan gates: the properties the 100TB design depends on must be
visible in .explain() -- filter pushdown to the parquet scan, column pruning
(never read binary position payloads the query doesn't need), broadcast for
the tiny side, and TakeOrderedAndProject for top-k (partial per-partition
top-k + tiny final merge, the TopTree/Msg3a shape)."""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.catalog import Catalog
from open_source_search_engine_spark.operators.index_build import (
    build_index,
    transcripts_to_docs,
)
from open_source_search_engine_spark.operators.query import SearchEngine
from open_source_search_engine_spark.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("plan-wh")))
    build_index(spark, cat, transcripts_to_docs(synth_transcripts(spark, 400)))
    return SearchEngine(spark, cat)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_term_filter_pushed_to_scan(eng):
    plan = eng.plan_terms(["spark", "index"])
    dec = eng.decoded_postings([int(t) for t in plan["term_id"]])
    p = _physical(dec)
    assert "PushedFilters: [In(term_id" in p


def test_column_pruning_skips_positions(eng):
    plan = eng.plan_terms(["spark"])
    dec = eng.decoded_postings([int(t) for t in plan["term_id"]])
    p = _physical(dec)
    # the ReadSchema of the postings scan must not include the positions
    # payload (only the phrase path pays for it)
    scan = [ln for ln in p.splitlines() if "postings" in ln and "ReadSchema" in ln]
    assert scan and all("positions" not in ln.split("ReadSchema")[1] for ln in scan)
    with_pos = eng.decoded_postings(
        [int(t) for t in plan["term_id"]], include_positions=True
    )
    p2 = _physical(with_pos)
    scan2 = [ln for ln in p2.splitlines() if "postings" in ln and "ReadSchema" in ln]
    assert scan2 and any("positions" in ln.split("ReadSchema")[1] for ln in scan2)


def test_topk_is_take_ordered(eng):
    df = eng.search_terms(["spark", "index"], "AND", 10)
    p = _physical(df)
    assert "TakeOrderedAndProject" in p


def test_filter_docs_restricts_before_ranking(spark, eng):
    docs = eng.catalog.read_table("documents").select("doc_id").limit(50)
    df = eng.search_terms(["spark"], "AND", 5, filter_docs=docs)
    p = _physical(df)
    # the semi join must appear BELOW the top-k operator in the plan
    assert "TakeOrderedAndProject" in p and "LeftSemi" in p
    assert p.index("TakeOrderedAndProject") < p.index("LeftSemi")
