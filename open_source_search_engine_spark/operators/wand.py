"""Block-max WAND query path (the max-score pruning rebuild).

Reference: per-doc max-score prefilter vs the current kth TopTree score
(`PosdbTable.cpp:3910-3947` prefilters, `:4351-4516` getMaxPossibleScore) --
skip a doc when the sum of its terms' score upper bounds cannot beat the
current threshold. The batch/distributed re-expression is *block*-max WAND
over the posting-block skip metadata (`block_max_tf`, `block_min_dl` written
at build time, codec.py doc):

Every posting block covers an explicit hash-PREFIX range of the doc space:
``block_id`` = top ``salt_bits`` bits of the 63-bit doc hash, with
``salt_bits`` df-adaptive per term (index_build._partial_encoder). Prefix
ranges nest, so grouping all query terms' blocks at g = the COARSEST
granularity among them (group = block_id >> (salt_bits - g)) puts every
doc's blocks -- one per term -- into the same group. Groups score
independently and prune independently:

* AND: a group missing any query term cannot contain a conjunctive match --
  dropped by a count filter before any decode (the analog of rarest-first
  candidate intersection, `PosdbTable.cpp:1935` findCandidateDocIds).
* Upper bound: ub(term, block) = idf * tf_norm(block_max_tf, block_min_dl)
  (monotone in tf, anti-monotone in dl => valid bound for every doc in the
  block); ub_sum(group) = sum of present terms' ub.

Two-phase threshold (batch engines have no running kth-score heap across
partitions):

  Phase A: score the G groups with the highest ub_sum exactly; the kth best
           score found becomes the threshold theta.
  Phase B: score every remaining group with ub_sum >= theta - eps; groups
           below the threshold are skipped WITHOUT decoding (the whole point).
  Final:   union + ORDER BY score DESC, doc_id ASC LIMIT k
           (TakeOrderedAndProject = per-partition TopTree + Msg3a merge,
           `TopTree.cpp:185`, `Msg3a.cpp:807-811`).

Selection uses bounds; scoring uses the canonical float64 formula in the
exact same operation order as the exact path (query.py `_contributions` /
`_aggregate_scores`), so results are rank-identical -- gated by tests that
diff the two paths on every query tier.

Everything is distributed: group metadata is a slim aggregate (no binary
columns); only surviving groups' binaries flow into the Arrow scorer UDF.
At 10^12 turns a stopword term has ~N/128 blocks -- nothing here collects
more than G block_ids or k result rows to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import codec

SCORED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("matched", T.IntegerType(), False),
    ]
)

EPS = 1e-9


def _ub_col(k1: float, b: float, avgdl: float):
    """JVM-side block upper bound -- same operation order as the contrib
    expression in query.py so bound >= score holds bit-safely (modulo EPS)."""
    return F.col("idf") * (
        F.col("block_max_tf").cast("double")
        * F.lit(k1 + 1.0)
        / (
            F.col("block_max_tf").cast("double")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("block_min_dl").cast("double") / F.lit(avgdl)
            )
        )
    )


def _make_scorer(
    mode: str,
    k1: float,
    b: float,
    avgdl: float,
    tombs: dict[int, int] | None = None,
    n_query_terms: int | None = None,
):
    """applyInPandas scorer for one block group: decode sub-lists, build the
    doc universe (intersection for AND, union for OR), accumulate per-term
    contributions in term-string-ascending order (same float64 add sequence
    as the exact path's array_sort fold)."""

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # decode, merging same-term sub-lists (a segmented/incremental build
        # can leave several rows per (term, block); doc sets are disjoint, so
        # a sorted merge is exact -- the posdbMerge_r analog, RdbList.cpp:2159)
        by_term: dict[str, list] = {}
        for row in pdf.itertuples(index=False):
            ids = codec.decode_doc_ids(bytes(row.doc_ids))
            tfs = codec.decode_counts(bytes(row.tfs))
            dls = codec.decode_counts(bytes(row.dls))
            if tombs:
                seg = int(row.seg_seq)
                keep = np.array(
                    [not (d in tombs and seg <= tombs[d]) for d in ids.tolist()],
                    dtype=bool,
                )
                if not keep.all():
                    ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
                if ids.size == 0:
                    continue
            by_term.setdefault(str(row.term), [float(row.idf), [], [], []])
            ent = by_term[str(row.term)]
            ent[1].append(ids)
            ent[2].append(tfs)
            ent[3].append(dls)
        subs = []
        for term in sorted(by_term):
            idf_v, idl, tfl, dll = by_term[term]
            ids = np.concatenate(idl)
            tfs = np.concatenate(tfl)
            dls = np.concatenate(dll)
            if len(idl) > 1:
                order = np.argsort(ids, kind="mergesort")
                ids, tfs, dls = ids[order], tfs[order], dls[order]
            subs.append((term, idf_v, ids, tfs, dls))
        empty = pd.DataFrame(
            {"doc_id": np.empty(0, np.int64),
             "score": np.empty(0, np.float64),
             "matched": np.empty(0, np.int32)}
        )
        if not subs:
            return empty
        if mode == "AND":
            # a term annihilated by tombstones inside this group kills the
            # conjunction even if the group-level presence check passed
            if n_query_terms is not None and len(subs) < n_query_terms:
                return empty
            universe = subs[0][2]
            for s in subs[1:]:
                universe = np.intersect1d(universe, s[2], assume_unique=True)
        else:
            universe = np.unique(np.concatenate([s[2] for s in subs]))
        if universe.size == 0:
            return pd.DataFrame(
                {"doc_id": np.empty(0, np.int64),
                 "score": np.empty(0, np.float64),
                 "matched": np.empty(0, np.int32)}
            )
        acc = np.zeros(universe.size, dtype=np.float64)
        matched = np.zeros(universe.size, dtype=np.int32)
        for term, idf_v, ids, tfs, dls in subs:
            # contribution in the exact path's operation order:
            # idf * (tf*(k1+1) / (tf + k1*((1-b) + b*dl/avgdl)))
            tf = tfs.astype(np.float64)
            dl = dls.astype(np.float64)
            contrib = idf_v * (
                tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
            )
            # mask to docs actually in the universe (for AND, the sub-list
            # can contain docs outside the intersection)
            idx = np.searchsorted(universe, ids)
            idx_c = np.minimum(idx, universe.size - 1)
            present = universe[idx_c] == ids
            sel = idx_c[present]
            acc[sel] += contrib[present]
            matched[sel] += 1
        if mode == "AND":
            keep = np.full(universe.size, True)
        else:
            keep = matched > 0
        return pd.DataFrame(
            {"doc_id": universe[keep], "score": acc[keep], "matched": matched[keep]}
        )

    return score_group


def wand_search(
    engine,
    query_terms: list[str],
    mode: str = "AND",
    k: int = 10,
    exclude_terms: list[str] | None = None,
    phase_a_groups: int = 8,
) -> DataFrame:
    """Block-max WAND BM25 top-k. Same result contract as
    SearchEngine.search_terms: (doc_id, score, matched) ordered
    score desc / doc_id asc, limited to k."""
    spark = engine.spark
    plan = engine.plan_terms(query_terms)
    n_q = len(set(query_terms))
    if plan.empty or (mode == "AND" and len(plan) < n_q):
        return spark.createDataFrame([], "doc_id long, score double, matched int")
    k1, b, avgdl = engine.params.k1, engine.params.b, engine.avgdl

    meta = spark.createDataFrame(plan[["term_id", "term", "idf"]])
    term_ids = [int(t) for t in plan["term_id"]]
    tombs: dict[int, int] | None = None
    if engine._tombstones is not None:
        tombs = {
            int(r["doc_id"]): int(r["upto_seq"])
            for r in engine._tombstones.collect()
        }
    q_blocks = (
        engine._postings.filter(F.col("term_id").isin(term_ids))
        .select(
            "term_id", "block_id", "salt_bits", "block_max_tf", "block_min_dl",
            "seg_seq", "doc_ids", "tfs", "dls",
        )
        .join(F.broadcast(meta), "term_id")
        .withColumn("ub", _ub_col(k1, b, avgdl))
        .select(
            "block_id", "salt_bits", "term", "idf", "ub", "seg_seq",
            "doc_ids", "tfs", "dls",
        )
    )
    q_blocks = q_blocks.persist()
    try:
        # blocks are df-adaptive hash-prefix ranges at varying granularity;
        # group at g = the COARSEST granularity among the scanned blocks so
        # every block maps wholly into one group (prefix nesting) and all of
        # a doc's blocks land in the same group
        g_row = q_blocks.agg(F.min("salt_bits").alias("g")).collect()[0]
        if g_row["g"] is None:
            return spark.createDataFrame(
                [], "doc_id long, score double, matched int"
            )
        g = int(g_row["g"])
        q_blocks = q_blocks.withColumn(
            "group_id", F.expr(f"shiftright(block_id, salt_bits - {g})")
        )
        gmeta = q_blocks.groupBy("group_id").agg(
            F.sum("ub").alias("ub_sum"),
            F.countDistinct("term").alias("n_present"),
        )
        if mode == "AND":
            gmeta = gmeta.filter(F.col("n_present") == len(plan))
        gmeta = gmeta.persist()

        scorer = _make_scorer(mode, k1, b, avgdl, tombs, len(plan))
        group_cols = ["term", "idf", "seg_seq", "doc_ids", "tfs", "dls"]

        def score_groups(sel: DataFrame) -> DataFrame:
            return (
                q_blocks.join(sel.select("group_id"), "group_id", "left_semi")
                .repartition("group_id")
                .groupBy("group_id")
                .applyInPandas(
                    lambda pdf: scorer(pdf[group_cols]), schema=SCORED_SCHEMA
                )
            )

        # Phase A: exact-score the top-ub groups to establish theta.
        g_a = gmeta.orderBy(F.desc("ub_sum"), F.asc("group_id")).limit(
            phase_a_groups
        )
        a_ids = [r["group_id"] for r in g_a.select("group_id").collect()]
        if not a_ids:
            return spark.createDataFrame(
                [], "doc_id long, score double, matched int"
            )
        scored_a = score_groups(
            spark.createDataFrame([(i,) for i in a_ids], "group_id long")
        )
        scored_a = _apply_exclusions(engine, scored_a, exclude_terms)
        scored_a = scored_a.persist()
        top_a = (
            scored_a.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
        )
        theta = top_a[k - 1]["score"] if len(top_a) == k else float("-inf")

        # Phase B: only groups whose upper bound can still beat theta.
        g_b = gmeta.filter(~F.col("group_id").isin(a_ids)).filter(
            F.col("ub_sum") >= F.lit(theta - EPS)
        )
        scored_b = _apply_exclusions(
            engine, score_groups(g_b), exclude_terms
        )
        out = (
            scored_a.unionByName(scored_b)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
        # materialize before unpersisting the lineage inputs
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema) if rows else (
            spark.createDataFrame([], "doc_id long, score double, matched int")
        )
    finally:
        q_blocks.unpersist()


def _apply_exclusions(
    engine, scored: DataFrame, exclude_terms: list[str] | None
) -> DataFrame:
    if not exclude_terms:
        return scored
    ex_plan = engine.plan_terms(exclude_terms)
    if ex_plan.empty:
        return scored
    ex_docs = (
        engine.decoded_postings([int(t) for t in ex_plan["term_id"]])
        .select("doc_id")
        .distinct()
    )
    return scored.join(ex_docs, "doc_id", "left_anti")


def pruning_stats(engine, query_terms: list[str], mode: str = "AND") -> dict:
    """Observability: how many block groups exist vs how many survive the
    AND-presence filter (the decode-avoidance win). Driver-side tiny agg."""
    plan = engine.plan_terms(query_terms)
    if plan.empty:
        return {"groups_total": 0, "groups_surviving": 0}
    term_ids = [int(t) for t in plan["term_id"]]
    blocks = engine._postings.filter(F.col("term_id").isin(term_ids)).select(
        "term_id", "block_id", "salt_bits"
    )
    g_row = blocks.agg(F.min("salt_bits").alias("g")).collect()[0]
    if g_row["g"] is None:
        return {"groups_total": 0, "groups_surviving": 0}
    coarse = int(g_row["g"])
    g = (
        blocks.withColumn(
            "group_id", F.expr(f"shiftright(block_id, salt_bits - {coarse})")
        )
        .groupBy("group_id")
        .agg(F.countDistinct("term_id").alias("n_present"))
    )
    total = g.count()
    surviving = (
        g.filter(F.col("n_present") == len(plan)).count()
        if mode == "AND"
        else total
    )
    return {"groups_total": total, "groups_surviving": surviving}
