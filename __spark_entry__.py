"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -- flagship BM25 conjunctive top-k over sf0.001.
queries()      -- operator inventory (SURVEY.md §2) as (spark, sf_dir) -> DF.
oracle_sql()   -- DuckDB-runnable ANSI SQL equivalents (same column names,
                  numerics cast to BIGINT/DOUBLE, scores rounded to 4dp on
                  both sides). The only key without an oracle is ivf_ann
                  (iterative distributed k-means is not SQL-expressible);
                  it is checked rows-only by the driver and exactness-gated
                  in pytest (probe-all == brute force).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from open_source_search_engine_spark.entry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: build the inverted index over sf0.001 documents and
    answer a conjunctive BM25 top-10 (rank, doc_id, score, matched)."""
    return QUERIES["bm25_and"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
