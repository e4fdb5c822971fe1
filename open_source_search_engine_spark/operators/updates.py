"""Incremental document updates & deletes (the negative-key rebuild).

Reference: a delete is a posting key with the delbit cleared; positive and
negative keys annihilate in the memtable and at merge (`Rdb.h:73-85`,
`Posdb.h:224-226` makeDeleteDocKey, `RdbList.cpp:2159`
posdbMerge_r(removeNegKeys); SURVEY.md O6, §2.9). A re-added doc first
deletes its old keys then adds new ones; queries see tree+files merged at
read (`Msg5.cpp:139`), so updates are visible BEFORE compaction.

Spark-first re-expression -- sequence-versioned segments + ranged tombstones:

* every posting segment carries a ``seg_seq`` (0 = initial build; each
  apply_updates appends a segment with the next sequence).
* a tombstone is ``(doc_id, upto_seq)``: ignore this doc's postings from any
  segment with seg_seq <= upto_seq. Upsert => tombstone at the current max
  sequence + new postings in the next; delete => tombstone only. This is
  EXACTLY the negative-key contract: the pair (tombstone, new postings)
  annihilates the old version at read time, row-locally (no cross-row state
  needed during decode -- each posting row knows its seg_seq).
* term_stats / corpus_stats are maintained by DELTA: old text tokenized with
  negative counts, new text with positive counts, merge-summed -- exact
  without a full recount (the annihilation idea applied to statistics).
* ``compact_updates`` = RdbMerge: drops tombstoned (doc, seq<=upto) postings
  physically, merges each (term_id, block_id) back to one row at seg_seq 0,
  clears tombstones.

Identity gate (tests): after updates (both before AND after compaction),
query results are rank-identical to a fresh build of the edited corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import pandas as pd

from ..catalog import Catalog
from .index_build import (
    IndexConfig,
    build_postings,
    doc_length_col,
    py_any_term_id,
    tokenize_docs,
)


def _py_term_id_udf():
    # built lazily: pandas_udf type resolution needs an active SparkSession.
    # py_any_term_id handles unigram AND bigram ("t1 t2") term strings, so
    # a NEW bigram term first seen in a delta gets the same id a rebuild
    # would assign (the member-id mix, index_build._bigram_ids)
    @F.pandas_udf("long")
    def udf(terms: pd.Series) -> pd.Series:
        return terms.map(py_any_term_id).astype("int64")

    return udf

TOMBSTONES_SCHEMA = "doc_id long, upto_seq long"


def tombstones(spark: SparkSession, catalog: Catalog) -> DataFrame:
    if catalog.table_exists("tombstones"):
        return catalog.read_table("tombstones")
    return spark.createDataFrame([], TOMBSTONES_SCHEMA)


def max_seg_seq(catalog: Catalog) -> int:
    if catalog.table_exists("index_meta"):
        return int(catalog.read_table("index_meta").collect()[0]["max_seg"])
    return 0


def reset_update_state(spark: SparkSession, catalog: Catalog) -> None:
    """Clear tombstones and reset the segment sequence to 0.

    Called by compaction (every prior version is physically gone) AND by
    the full-build paths: doc_ids are deterministic, so a fresh rebuild
    into a previously-updated catalog would otherwise inherit stale
    tombstones whose (doc_id, upto_seq>=0) annihilate the rebuilt seg-0
    postings -- the doc exists in the new index but is unsearchable."""
    catalog.write_table(
        spark.createDataFrame([], TOMBSTONES_SCHEMA), "tombstones"
    )
    catalog.write_table(
        spark.createDataFrame([(0,)], "max_seg long"), "index_meta"
    )


def apply_updates(
    spark: SparkSession,
    catalog: Catalog,
    upserts: DataFrame | None = None,
    delete_ids: DataFrame | None = None,
    config: IndexConfig | None = None,
) -> dict:
    """Apply upserts (rows with doc_id + text; new or replacing) and deletes
    (doc_id column) to a built index. Visible to queries immediately --
    compaction is optional housekeeping.

    ``config`` must match the BUILD config (tokenizer_mode, bigrams): with
    bigrams=True the stats deltas and the delta segment both emit the
    2-word phrase terms, so bigram-enabled indexes update exactly like
    unigram ones (gated: update-then-query rank identity on bigrams=True,
    tests/test_bigrams.py)."""
    config = config or IndexConfig()
    docs = catalog.read_table("documents")
    corpus = catalog.read_table("corpus_stats").collect()[0]
    block_bits = int(corpus["block_bits"])
    cur_seq = max_seg_seq(catalog)
    new_seq = cur_seq + 1

    if upserts is None:
        upserts = spark.createDataFrame([], docs.schema)
    delete_ids = (
        delete_ids if delete_ids is not None else spark.createDataFrame([], "doc_id long")
    )
    up_ids = upserts.select("doc_id").distinct()
    del_ids = delete_ids.select("doc_id").distinct()
    gone_ids = up_ids.unionByName(del_ids).distinct()

    old_docs = docs.join(gone_ids, "doc_id", "left_semi")
    n_old = old_docs.count()
    upserts = upserts.withColumn(
        "dl", doc_length_col(config.tokenizer_mode)(F.col("text"))
    )
    n_new = upserts.count()

    # ---- stats deltas: negative keys for old text, positive for new ------
    neg = tokenize_docs(old_docs, config.tokenizer_mode, config.bigrams).select(
        "term", F.lit(-1).alias("ddf"), (-F.col("tf")).cast("long").alias("dcf")
    )
    pos = tokenize_docs(upserts, config.tokenizer_mode, config.bigrams).select(
        "term", F.lit(1).alias("ddf"), F.col("tf").cast("long").alias("dcf")
    )
    delta = (
        neg.unionByName(pos)
        .groupBy("term")
        .agg(F.sum("ddf").alias("ddf"), F.sum("dcf").alias("dcf"))
    )
    if config.skip_terms:
        # X7 build parity: skip words have no termlists and no term_stats
        # rows in the built index, so their deltas must not create them.
        # Exact-match filter only -- bigram terms ("t1 t2") containing a
        # skip word survive, same as build_index's term_id filter
        delta = delta.filter(~F.col("term").isin(list(config.skip_terms)))
    # eager materialization BEFORE the documents overwrite below: the
    # negative leg tokenizes the OLD doc versions, and in a
    # snapshot-resolved catalog (Iceberg) a lazy read evaluated after the
    # overwrite commit would tokenize the NEW text instead -- the delta
    # would net to 0 and df/cf drift permanently. (Parquet-snapshot mode
    # pins the file list at read_table time, which masked this.)
    delta = delta.localCheckpoint(eager=True)
    ts = catalog.read_table("term_stats")
    new_ts = (
        ts.join(delta, "term", "full_outer")
        .select(
            F.coalesce("term_id", _py_term_id_udf()(F.col("term"))).alias(
                "term_id"
            ),
            "term",
            (F.coalesce("df", F.lit(0)) + F.coalesce("ddf", F.lit(0)))
            .cast("long")
            .alias("df"),
            (F.coalesce("cf", F.lit(0)) + F.coalesce("dcf", F.lit(0)))
            .cast("long")
            .alias("cf"),
            # carried forward (grouping-granularity hint only; new terms'
            # delta segments are tiny -> salt_bits 0 is the right default).
            # A delta segment's blocks are built at salt_bits 0, so min
            # drops to 0 for the terms THIS delta touches -- and only
            # those: zeroing every row (the old behavior) collapsed
            # wand.pick_granularity's floor for all queries after one tiny
            # upsert, until compaction recomputed it
            F.coalesce("max_salt_bits", F.lit(0)).cast("int").alias(
                "max_salt_bits"
            ),
            F.when(F.col("ddf").isNotNull(), F.lit(0))
            .otherwise(F.coalesce("min_salt_bits", F.lit(0)))
            .cast("int")
            .alias("min_salt_bits"),
        )
        .filter(F.col("df") > 0)
    )

    # ---- documents table: drop old versions, add new ---------------------
    # align upserts to the documents schema: columns the upsert source does
    # not carry (e.g. enrichment columns on the doc store) become NULL
    up_cols = set(upserts.columns)
    aligned = upserts.select(
        *[
            F.col(c)
            if c in up_cols
            else F.lit(None).cast(docs.schema[c].dataType).alias(c)
            for c in docs.columns
        ]
    )
    new_docs = docs.join(gone_ids, "doc_id", "left_anti").unionByName(aligned)
    catalog.write_table(new_docs, "documents")
    catalog.write_table(new_ts, "term_stats")

    # ---- tombstones: annihilate every prior version ----------------------
    new_tombs = gone_ids.withColumn("upto_seq", F.lit(cur_seq).cast("long"))
    catalog.write_table(
        tombstones(spark, catalog)
        .unionByName(new_tombs)
        .groupBy("doc_id")
        .agg(F.max("upto_seq").alias("upto_seq")),
        "tombstones",
    )

    # ---- delta posting segment at the new sequence -----------------------
    fresh = catalog.read_table("documents").join(up_ids, "doc_id", "left_semi")
    delta_postings = build_postings(
        fresh,
        config.target_reduce_docs,
        config.tokenizer_mode,
        config.store_positions,
        config.bigrams,
    ).withColumn("seg_seq", F.lit(new_seq).cast("long"))
    if config.skip_terms:
        # same unigram-id filter as build_index: a delta segment must not
        # reintroduce termlists the build skipped (X7)
        from .index_build import py_term_id

        skip_ids = [py_term_id(t) for t in config.skip_terms]
        delta_postings = delta_postings.filter(~F.col("term_id").isin(skip_ids))
    catalog.append_table(delta_postings, "postings")
    catalog.write_table(
        spark.createDataFrame([(new_seq,)], "max_seg long"), "index_meta"
    )

    # ---- corpus stats -----------------------------------------------------
    stats = (
        catalog.read_table("documents")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s"))
        .collect()[0]
    )
    n_blocks = catalog.read_table("postings").count()
    n_terms = catalog.read_table("term_stats").count()
    n_docs = int(stats["n"])
    avgdl = (int(stats["s"] or 0) / n_docs) if n_docs else 0.0
    catalog.write_table(
        spark.createDataFrame(
            [(n_docs, avgdl, block_bits, n_terms, n_blocks,
              bool(config.store_positions))],
            "n_docs long, avgdl double, block_bits int, n_terms long,"
            " n_blocks long, store_positions boolean",
        ),
        "corpus_stats",
    )
    # ---- automatic compaction (Rdb.h:279 minToMerge) ----------------------
    auto_compacted = False
    if config.min_to_merge:
        auto_compacted = maybe_compact(spark, catalog, config.min_to_merge)
    return {
        "upserted": n_new,
        "replaced_or_deleted": n_old,
        "seg_seq": new_seq,
        "auto_compacted": auto_compacted,
    }


def live_segments(catalog: Catalog) -> int:
    """Live posting segment count: the initial build (seg 0) plus one per
    applied delta — the analog of the reference's per-Rdb file count
    (`Rdb.h:270` getNumFiles feeding the merge policy)."""
    return max_seg_seq(catalog) + 1


def maybe_compact(
    spark: SparkSession, catalog: Catalog, min_segments: int
) -> bool:
    """Segment-count compaction policy (`Rdb.h:279` m_minToMerge;
    `Rdb.cpp:41` attemptMergeAll — the reference fires merges ITSELF when
    an Rdb reaches minToMerge files; callers never schedule them): compact
    when the live segment count reaches ``min_segments``, no-op below it.
    Returns True iff a compaction fired. Queries are identical either way
    (compaction is physical annihilation of already-invisible rows —
    gated in tests/test_updates.py::test_auto_compaction_policy)."""
    if live_segments(catalog) >= int(min_segments):
        compact_updates(spark, catalog)
        return True
    return False


def compact_updates(spark: SparkSession, catalog: Catalog) -> int:
    """RdbMerge annihilation pass: drop tombstoned postings physically,
    merge every (term_id, block_id) back to one row, reset sequences,
    clear tombstones. Returns the number of tombstones cleared."""
    from .resumable import merge_postings

    tombs = tombstones(spark, catalog)
    n_tombs = tombs.count()
    # annihilation must look INSIDE blocks (a block's doc_ids are packed):
    # the decode-merge-encode pass applies the tombstone set row-locally
    merge_postings(spark, catalog, tombstone_df=tombs)
    # recompute term_stats from the compacted postings: df/cf stay exact
    # (tombstoned postings are physically gone) and the per-term salt-bits
    # profile -- which updates conservatively zeroed -- recovers, restoring
    # WAND's grouping granularity
    from .index_build import term_stats_from_postings

    catalog.write_table(
        term_stats_from_postings(catalog.read_table("postings")), "term_stats"
    )
    reset_update_state(spark, catalog)
    # compaction resets max_seg to 0, which would make a STALE hot-term
    # shortcut cache (hot_cache.py) look fresh again -- rebuild it against
    # the compacted postings so the freshness marker is truthful. The
    # ORIGINAL build's k1/b are read back from hot_meta and passed through:
    # rebuilding with defaults would silently change the cached tf_norm
    # ranking for a non-default-params index (r2 ADVICE)
    if catalog.table_exists("hot_meta"):
        from ..functions.bm25 import BM25Params
        from .hot_cache import build_hot_term_cache

        meta = catalog.read_table("hot_meta").collect()[0].asDict()
        params = None
        if meta.get("k1") is not None and meta.get("b") is not None:
            params = BM25Params(k1=float(meta["k1"]), b=float(meta["b"]))
        build_hot_term_cache(
            spark,
            catalog,
            min_df=int(meta["min_df"]),
            cache_k=int(meta["cache_k"]),
            params=params,
            max_seg=0,
        )
    return n_tombs


def term_stats_diff(old_catalog, new_catalog, top_k: int = 20) -> DataFrame:
    """Dictionary drift between two index states — typically a
    ``Catalog.at(capture())`` pin and the live catalog after updates: per
    term, the exact df before and after, top movers first. The ops
    surface for "what did this batch of upserts/deletes do to the
    index", and a direct audit of the update path's delta-exact
    term_stats contract (the reported df_new is the stats table the
    serving paths actually use, not a recount).

    Scale shape: both sides are term_stats reads (the dictionary — tiny
    next to postings), one full-outer join keyed on term, abs-delta
    TakeOrderedAndProject. Works across any two catalogs/snapshot views
    that share a tokenizer, including two pins of the SAME catalog
    (before/after an arbitrary span of commits)."""
    old = old_catalog.read_table("term_stats").select(
        "term", F.col("df").alias("df_old")
    )
    new = new_catalog.read_table("term_stats").select(
        "term", F.col("df").alias("df_new")
    )
    return (
        old.join(new, "term", "full_outer")
        .select(
            "term",
            F.coalesce(F.col("df_old"), F.lit(0)).cast("long").alias("df_old"),
            F.coalesce(F.col("df_new"), F.lit(0)).cast("long").alias("df_new"),
        )
        .withColumn("delta", (F.col("df_new") - F.col("df_old")).cast("long"))
        .filter(F.col("delta") != 0)
        .orderBy(F.abs(F.col("delta")).desc(), F.asc("term"))
        .limit(int(top_k))
    )
