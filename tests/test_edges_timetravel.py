"""Edge corpora (empty, single-doc, all-empty-text) and catalog time travel
(snapshot-isolated reads across overwrites)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.catalog import Catalog
from open_source_search_engine_spark.operators.index_build import (
    IndexConfig,
    build_index,
)
from open_source_search_engine_spark.operators.query import SearchEngine


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_empty_corpus(spark, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("empty-wh")))
    res = build_index(spark, cat, _docs(spark, []))
    assert res.n_docs == 0 and res.n_blocks == 0
    eng = SearchEngine(spark, cat)
    assert eng.search_terms(["anything"], "AND", 5).count() == 0


def test_single_doc(spark, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("one-wh")))
    res = build_index(spark, cat, _docs(spark, [(7, "hello tiny world")]))
    assert res.n_docs == 1 and res.n_terms == 3
    eng = SearchEngine(spark, cat)
    hits = eng.search_terms(["hello", "world"], "AND", 5).collect()
    assert [r["doc_id"] for r in hits] == [7]


def test_all_empty_texts(spark, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("blank-wh")))
    res = build_index(
        spark, cat, _docs(spark, [(1, ""), (2, None), (3, "   ")])
    )
    assert res.n_docs == 3 and res.n_terms == 0
    eng = SearchEngine(spark, cat)
    assert eng.search_terms(["x"], "OR", 5).count() == 0


def test_snapshot_time_travel(spark, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("tt-wh")))
    cat.write_table(_docs(spark, [(1, "v1")]), "t")
    first = cat.snapshot_id("t")
    cat.write_table(_docs(spark, [(1, "v2"), (2, "new")]), "t")
    assert cat.read_table("t").count() == 2
    old = cat.read_snapshot("t", first)
    assert old.count() == 1
    assert old.collect()[0]["text"] == "v1"
    snaps = cat.snapshots("t")
    assert len(snaps) == 2
    assert snaps[0]["snapshot_id"] == first
    with pytest.raises(FileNotFoundError):
        cat.read_snapshot("t", "nope")
