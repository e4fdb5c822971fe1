"""Inverted-index build pipeline (the EP2 rebuild, SURVEY.md §3.2).

Reference pipeline: spider/inject -> XmlDoc::getMetaList tokenize+hash
(`XmlDoc_Indexing.cpp:226` hashAll, `:1779-2212` hashWords3) -> per-shard
routed posting keys (`Msg4Out.cpp`, `Hostdb.cpp:1477` getShardNum) ->
memtable -> sorted dump (`RdbDump.cpp:251`) -> background merge
(`RdbMerge.cpp:53`).

Spark-first re-expression (one declarative plan; Catalyst plans the physical
strategy):

  transcripts ──mapInPandas tokenize──▶ (doc_id, term, tf, positions, dl)
      │                                        │  [the "metaList"]
      ▼                                        ▼ shuffle on (term_id, block_id)
  documents table                     groupBy + applyInPandas encode
  term_stats / corpus_stats           ──▶ postings blocks (delta+varbyte)

Skew: posting blocks are keyed by (term_id, block_id) where
block_id = doc_id >> BLOCK_BITS. A stopword term's postings therefore spread
across its many doc blocks -- the block key IS the salt (north rule's salted
repartitioning), while still keeping each block's doc_ids sorted and
independently decodable. AQE handles residual imbalance.

Everything scales per-partition: no driver-side loops, no collect() of data
(only counts / tiny stats).
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import Catalog
from ..functions import codec
from ..functions.bm25 import BM25Params
from ..functions.hashing import block_id_col, doc_id_col, pick_block_bits, term_id_col
from ..functions.tokenizer import _pattern

TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.IntegerType(), False),
        # per-(doc, term) positions ALREADY delta+varbyte encoded: binary
        # shuffles ~5x cheaper than Arrow list<int>, and a block's position
        # stream is the plain byte-concatenation of its docs' streams
        T.StructField("positions", T.BinaryType(), False),
        T.StructField("dl", T.IntegerType(), False),
    ]
)

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("block_id", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("first_doc_id", T.LongType(), False),
        T.StructField("last_doc_id", T.LongType(), False),
        T.StructField("block_max_tf", T.IntegerType(), False),
        T.StructField("block_min_dl", T.IntegerType(), False),
        T.StructField("sum_tf", T.LongType(), False),
        T.StructField("doc_ids", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
        T.StructField("positions", T.BinaryType(), False),
    ]
)


@dataclass
class IndexConfig:
    tokenizer_mode: str = "unicode"
    target_block_docs: int = 128
    bm25: BM25Params = field(default_factory=BM25Params)
    store_positions: bool = True


@dataclass
class BuildResult:
    n_docs: int
    avgdl: float
    n_terms: int
    n_blocks: int
    block_bits: int
    elapsed_sec: float


def transcripts_to_docs(transcripts: DataFrame) -> DataFrame:
    """Adapter: input_hint transcript table -> generic doc table.

    Document unit = (conv_id, turn_idx) under stable turn ordering
    (SURVEY.md W6); doc_id is the deterministic 63-bit hash (§7.3).
    """
    return transcripts.withColumn(
        "doc_id", doc_id_col(F.col("conv_id"), F.col("turn_idx"))
    )


def tokenize_docs(docs: DataFrame, mode: str = "unicode") -> DataFrame:
    """(doc_id, text, ...) -> (doc_id, term, tf, positions, dl) tuples.

    This is the "metaList" (reference `XmlDoc.cpp:12322` getMetaList) as a
    DataFrame. Fully vectorized inside mapInPandas: pandas str.findall does
    the segmentation; factorize + lexsort + reduceat do the per-(doc, term)
    aggregation -- no per-row Python dicts.
    """
    pattern = _pattern(mode)
    src = docs.select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            doc_ids = b["doc_id"].to_numpy(dtype=np.int64)
            token_lists = (
                b["text"].fillna("").str.lower().str.findall(pattern).to_numpy()
            )
            lens = np.fromiter((len(t) for t in token_lists), np.int64, len(b))
            dls = lens
            nz = lens > 0
            if not nz.any():
                continue
            flat = np.concatenate([t for t in token_lists if t])
            doc_rep_idx = np.repeat(np.arange(len(b)), lens)
            starts = np.cumsum(lens) - lens
            pos = np.arange(flat.size, dtype=np.int64) - np.repeat(starts, lens)
            codes, uniques = pd.factorize(pd.Series(flat), sort=False)
            order = np.lexsort((pos, codes, doc_rep_idx))
            d_s, c_s, p_s = doc_rep_idx[order], codes[order], pos[order]
            new_group = np.empty(d_s.size, dtype=bool)
            new_group[0] = True
            new_group[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
            g_starts = np.flatnonzero(new_group)
            tf = np.diff(np.append(g_starts, d_s.size)).astype(np.int32)
            pos_gaps = codec.delta_encode_groups(p_s.astype(np.uint64), g_starts)
            out = pd.DataFrame(
                {
                    "doc_id": doc_ids[d_s[g_starts]],
                    "term": np.asarray(uniques)[c_s[g_starts]],
                    "tf": tf,
                    "positions": codec.varbyte_encode_groups(pos_gaps, g_starts),
                    "dl": dls[d_s[g_starts]].astype(np.int32),
                }
            )
            yield out

    return src.mapInPandas(run, schema=TOKENS_SCHEMA)


def doc_length_col(mode: str = "unicode"):
    """Vectorized pandas UDF computing dl (token count) of a text column."""
    pattern = _pattern(mode)

    @F.pandas_udf(T.IntegerType())
    def _dl(texts: pd.Series) -> pd.Series:
        return (
            texts.fillna("")
            .str.lower()
            .str.count(pattern.pattern)
            .astype("int32")
        )

    return _dl


def _encode_sorted_batch(
    pdf: pd.DataFrame, store_positions: bool
) -> pd.DataFrame:
    """Encode MANY complete (term_id, block_id) groups at once.

    ``pdf`` must be sorted by (term_id, block_id, doc_id) and contain only
    whole groups. All per-group reductions are numpy ``reduceat``; all
    varbyte packing is one shared pass + byte-slicing
    (codec.varbyte_encode_groups) -- the sorted-dump analog
    (`RdbDump.cpp:251` dumpTree writes key-sorted lists) with zero per-group
    Python beyond a bytes slice.
    """
    tid = pdf["term_id"].to_numpy(np.int64)
    bid = pdf["block_id"].to_numpy(np.int64)
    doc_ids = pdf["doc_id"].to_numpy(np.int64)
    tfs = pdf["tf"].to_numpy(np.int64)
    dls = pdf["dl"].to_numpy(np.int64)
    n = tid.size
    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = (tid[1:] != tid[:-1]) | (bid[1:] != bid[:-1])
    gs = np.flatnonzero(new_grp)
    ge = np.append(gs[1:], n)
    if store_positions:
        # per-row buffers are already delta+varbyte (doc-start absolute), and
        # varbyte is per-value, so a block's stream is the byte concatenation
        # of its rows' buffers -- one join + per-group slicing, no re-encode
        bufs = pdf["positions"].to_numpy()
        lens = np.fromiter((len(x) for x in bufs), np.int64, n)
        all_bytes = b"".join(bufs)
        byte_ends = np.cumsum(lens)
        byte_starts = byte_ends - lens
        pos_bufs = [
            all_bytes[byte_starts[g]: byte_ends[e - 1]] for g, e in zip(gs, ge)
        ]
    else:
        pos_bufs = [b""] * gs.size
    return pd.DataFrame(
        {
            "term_id": tid[gs],
            "term": pdf["term"].to_numpy()[gs],
            "block_id": bid[gs],
            "n_docs": (ge - gs).astype(np.int32),
            "first_doc_id": doc_ids[gs],
            "last_doc_id": doc_ids[ge - 1],
            "block_max_tf": np.maximum.reduceat(tfs, gs).astype(np.int32),
            "block_min_dl": np.minimum.reduceat(dls, gs).astype(np.int32),
            "sum_tf": np.add.reduceat(tfs, gs),
            "doc_ids": codec.varbyte_encode_groups(
                codec.delta_encode_groups(doc_ids.astype(np.uint64), gs), gs
            ),
            "tfs": codec.varbyte_encode_groups(tfs, gs),
            "dls": codec.varbyte_encode_groups(dls, gs),
            "positions": pos_bufs,
        }
    )


def encode_postings(
    tokens: DataFrame, block_bits: int, store_positions: bool = True
) -> DataFrame:
    """Token tuples -> compressed posting blocks.

    ONE shuffle: range-repartition on (term_id, block_id) -- the north rule's
    salted repartitioning: a heavy (stopword) term spans many block_ids, so
    the range partitioner spreads it across partitions, while each
    (term, block) group stays whole. Groups are then encoded by a STREAMING
    mapInPandas over the sorted partition: thousands of groups per Arrow
    batch, rows of a group that straddle a batch boundary are carried over
    (partitions are sorted, so groups are contiguous).
    """
    t = tokens.withColumn("term_id", term_id_col(F.col("term"))).withColumn(
        "block_id", block_id_col(F.col("doc_id"), block_bits)
    )
    cols = ["term_id", "term", "block_id", "doc_id", "tf", "dl"] + (
        ["positions"] if store_positions else []
    )
    # hash repartition, NOT repartitionByRange: range partitioning runs a
    # boundary-sampling job that would re-execute the whole tokenize stage.
    # Rows stay sorted by (term_id, block_id) WITHIN each partition, so
    # parquet row-group min/max stats still prune term_id scans tightly.
    sorted_tokens = (
        t.select(*cols)
        .repartition(F.col("term_id"), F.col("block_id"))
        .sortWithinPartitions("term_id", "block_id", "doc_id")
    )

    def encode_stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for b in batches:
            if carry is not None and len(carry):
                b = pd.concat([carry, b], ignore_index=True)
            if len(b) == 0:
                continue
            tid = b["term_id"].to_numpy(np.int64)
            bid = b["block_id"].to_numpy(np.int64)
            # hold back the (possibly incomplete) last group
            last_mask = (tid == tid[-1]) & (bid == bid[-1])
            cut = int(len(b) - last_mask.sum())
            carry = b.iloc[cut:]
            if cut:
                yield _encode_sorted_batch(b.iloc[:cut], store_positions)
        if carry is not None and len(carry):
            yield _encode_sorted_batch(carry, store_positions)

    return sorted_tokens.mapInPandas(encode_stream, schema=POSTINGS_SCHEMA)


def term_stats_from_postings(postings: DataFrame) -> DataFrame:
    """Exact per-term document frequency from the postings table itself
    (blocks partition a term's docs, so df = sum of block n_docs). Replaces
    the reference's RdbMap page-count df ESTIMATE (`Posdb.cpp:301-353`
    getTermFreq; SURVEY.md A3) with exact counts, and avoids a second
    tokenize pass over the corpus."""
    return postings.groupBy("term_id").agg(
        F.first("term").alias("term"),
        F.sum("n_docs").cast("long").alias("df"),
        F.sum("sum_tf").cast("long").alias("cf"),
    )


def build_index(
    spark: SparkSession,
    catalog: Catalog,
    docs: DataFrame,
    config: IndexConfig | None = None,
) -> BuildResult:
    """Full index build: documents + postings + term_stats + corpus_stats.

    ``docs`` must have (doc_id long, text string, ...); use
    transcripts_to_docs for the transcript input shape.
    """
    config = config or IndexConfig()
    t0 = time.time()

    # small inputs (few parquet splits) must not serialize the map stages:
    # fan out to at least the cluster's parallelism before the heavy UDFs
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par * 2)

    docs = docs.withColumn("dl", doc_length_col(config.tokenizer_mode)(F.col("text")))
    catalog.write_table(docs, "documents")
    docs = catalog.read_table("documents")

    # doc_id collision audit (SURVEY.md §7.3)
    dup = docs.groupBy("doc_id").count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError("doc_id collision detected; rehash with a salt")

    # avgdl = exact integer sum / count, NOT F.avg: double summation order
    # varies with partitioning, and rank identity needs bit-stable avgdl
    stats_row = docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).collect()[0]
    n_docs = int(stats_row["n_docs"])
    avgdl = (int(stats_row["sum_dl"] or 0) / n_docs) if n_docs else 0.0
    block_bits = pick_block_bits(n_docs, config.target_block_docs)

    # one tokenize pass, one shuffle; postings land already range-partitioned
    # and sorted by (term_id, block_id); term_stats derives from postings
    tokens = tokenize_docs(docs, config.tokenizer_mode)
    postings = encode_postings(tokens, block_bits, config.store_positions)
    # seg_seq 0 = initial build; incremental updates append higher sequences
    # (operators/updates.py -- the negative-key versioning)
    catalog.write_table(
        postings.withColumn("seg_seq", F.lit(0).cast("long")), "postings"
    )

    postings = catalog.read_table("postings")
    catalog.write_table(term_stats_from_postings(postings), "term_stats")

    n_terms = catalog.read_table("term_stats").count()
    n_blocks = postings.count()
    corpus = spark.createDataFrame(
        [(n_docs, avgdl, block_bits, n_terms, n_blocks)],
        "n_docs long, avgdl double, block_bits int, n_terms long, n_blocks long",
    )
    catalog.write_table(corpus, "corpus_stats")
    return BuildResult(
        n_docs=n_docs,
        avgdl=avgdl,
        n_terms=n_terms,
        n_blocks=n_blocks,
        block_bits=block_bits,
        elapsed_sec=time.time() - t0,
    )
