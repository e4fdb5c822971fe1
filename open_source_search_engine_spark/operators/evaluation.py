"""Retrieval-evaluation harness: graded ranking metrics over (system
results, qrels) pairs.

The reference tunes its ranking by hand against eyeballed result pages
(`html/developer.html` describes the scoring knobs; there is no eval
harness in the repo) — a Spark-native stack should instead measure every
serving path (exact, WAND, ANN, hybrid, MMR) against reference rankings
with the standard graded metrics. This module is that harness: one
map-side-combined aggregation per (query, metric) sweep, no windows over
unbounded frames, no Python.

Metrics per query at cutoff k (all the trec_eval definitions):

* recall@k   = |retrieved ∩ relevant| / |relevant|        (rel > 0)
* mrr@k      = 1 / rank of the first relevant hit (0 if none)
* dcg@k      = Σ_hits (2^rel − 1) / log2(rank + 1)
* ndcg@k     = dcg@k / idcg@k (ideal = qrels sorted rel DESC, doc ASC)

Scale shape: results are pages (O(k) rows per query) and qrels are
human/golden labels (small by construction), so every join here is
page-sized × label-sized on (query_id, doc_id) — broadcast the qrels
side when it fits, which at 100 TB it does (labels are never corpus-
sized). The only aggregations are per-query map-side-combined sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def eval_rankings(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Grade ``results`` (query_id, doc_id, rank — rank 1-based, unique
    per query) against ``qrels`` (query_id, doc_id, rel — graded, rel > 0
    means relevant). Returns one row per query_id present in ``qrels``:
    (query_id, n_rel, n_hit, recall, mrr, dcg, idcg, ndcg), metrics at
    cutoff ``k``, unrounded (callers round). Queries with results but no
    qrels row are dropped (nothing to grade against); queries with qrels
    but no results score 0.
    """
    r = results.filter(F.col("rank") <= int(k)).select(
        "query_id", "doc_id", "rank"
    )
    q = qrels.select("query_id", "doc_id", F.col("rel").cast("double"))
    rel_q = q.filter(F.col("rel") > 0)

    # hits: retrieved rows that are relevant, with their grade
    hits = r.join(F.broadcast(rel_q), ["query_id", "doc_id"])
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1.0) / (
        F.log2(F.col("rank") + F.lit(1.0))
    )
    per_hit = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.sum(gain).alias("dcg"),
        (1.0 / F.min("rank")).alias("mrr"),
    )

    # ideal DCG from the qrels alone: top-k grades per query
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    ideal = (
        rel_q.withColumn("irank", F.row_number().over(w))
        .filter(F.col("irank") <= int(k))
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(F.col("irank") + F.lit(1.0))
            ).alias("idcg"),
        )
    )
    n_rel = rel_q.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    out = (
        n_rel.join(ideal, "query_id")
        .join(per_hit, "query_id", "left_outer")
        .select(
            "query_id",
            F.col("n_rel").cast("long").alias("n_rel"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            (
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_rel")
            ).alias("recall"),
            F.coalesce(F.col("mrr"), F.lit(0.0)).alias("mrr"),
            F.coalesce(F.col("dcg"), F.lit(0.0)).alias("dcg"),
            F.col("idcg"),
            (
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")
            ).alias("ndcg"),
        )
    )
    return out
