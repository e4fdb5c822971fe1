"""Iceberg-mode catalog gates (north rule: posting lists "stored as Iceberg
tables").

This container ships NO iceberg-spark-runtime jar, so these tests are
marker-gated: they run whenever a jar is discoverable (ICEBERG_JAR env var
or the session.iceberg_jar() search paths) and the SparkSession was built
with the osse catalog registered. In jar-less environments the catalog
falls back to the parquet-snapshot warehouse with the same commit semantics
(catalog.py docstring), which every other suite covers.

To exercise for real: drop an iceberg-spark-runtime jar matching the Spark
version into /opt/spark/jars (or set ICEBERG_JAR), then
``python -m pytest tests/test_catalog_iceberg.py``.

Vendoring attempts (the jar cannot be fetched from inside the sandbox):
  r3: pip/maven fetch -> no route.  r4: curl repo1.maven.org -> blocked.
  r5 (2026-08-19): DNS itself fails (``getent hosts repo1.maven.org`` ->
  not found), no ~/.ivy2 / ~/.m2 cache, and a full-disk ``find`` shows no
  iceberg jar anywhere in the image. Third consecutive environment block.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.catalog import Catalog
from open_source_search_engine_spark.operators.index_build import (
    IndexConfig,
    build_index,
    transcripts_to_docs,
)
from open_source_search_engine_spark.operators.query import SearchEngine
from open_source_search_engine_spark.operators.updates import (
    apply_updates,
    compact_updates,
)
from open_source_search_engine_spark.session import iceberg_jar
from open_source_search_engine_spark.sources.transcripts import synth_transcripts

pytestmark = pytest.mark.skipif(
    iceberg_jar() is None,
    reason=(
        "no iceberg-spark-runtime jar in this environment -- the catalog "
        "runs in parquet-snapshot mode (same commit semantics), covered by "
        "every other suite"
    ),
)


@pytest.fixture(scope="module")
def icat(spark, tmp_path_factory):
    cat = Catalog(spark, str(tmp_path_factory.mktemp("iceberg-wh")))
    if not cat.use_iceberg:
        pytest.skip("SparkSession lacks the osse iceberg catalog config")
    return cat


def test_iceberg_build_query_update_compact(spark, icat):
    """The full lifecycle against real Iceberg commits: build -> query ->
    upsert+delete -> query sees updates -> compact -> identical results."""
    docs = transcripts_to_docs(synth_transcripts(spark, 400))
    build_index(spark, icat, docs, IndexConfig(tokenizer_mode="ascii"))
    eng = SearchEngine(spark, icat, tokenizer_mode="ascii")
    before = [
        (int(r["doc_id"]), float(r["score"]))
        for r in eng.search_terms(["spark", "index"], "AND", 10).collect()
    ]
    assert before

    first = docs.limit(1).collect()[0]
    upsert = spark.createDataFrame(
        [(first["doc_id"], "freshterm_ice spark index body")],
        "doc_id long, text string",
    )
    apply_updates(
        spark, icat, upserts=upsert, config=IndexConfig(tokenizer_mode="ascii")
    )
    eng2 = SearchEngine(spark, icat, tokenizer_mode="ascii")
    hit = eng2.search_terms(["freshterm_ice"], "AND", 5).collect()
    assert [int(r["doc_id"]) for r in hit] == [int(first["doc_id"])]

    compact_updates(spark, icat)
    eng3 = SearchEngine(spark, icat, tokenizer_mode="ascii")
    assert [
        int(r["doc_id"])
        for r in eng3.search_terms(["freshterm_ice"], "AND", 5).collect()
    ] == [int(first["doc_id"])]


def test_iceberg_snapshot_time_travel(spark, icat):
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    icat.write_table(df1, "tt_probe")
    snap1 = icat.snapshot_id("tt_probe")
    icat.write_table(
        spark.createDataFrame([(2, "b")], "id long, v string"), "tt_probe"
    )
    old = icat.read_snapshot("tt_probe", snap1)
    assert [int(r["id"]) for r in old.collect()] == [1]
    assert [int(r["id"]) for r in icat.read_table("tt_probe").collect()] == [2]
