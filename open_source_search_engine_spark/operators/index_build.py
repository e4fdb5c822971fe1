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
        T.StructField("positions", T.ArrayType(T.IntegerType()), False),
        T.StructField("dl", T.IntegerType(), False),
    ]
)

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term_id", T.LongType(), False),
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
            out = pd.DataFrame(
                {
                    "doc_id": doc_ids[d_s[g_starts]],
                    "term": np.asarray(uniques)[c_s[g_starts]],
                    "tf": tf,
                    "positions": np.split(p_s.astype(np.int32), g_starts[1:]),
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


def _encode_block(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (term_id, block_id) group -> one encoded posting-block row.

    The sorted-dump analog (`RdbDump.cpp:251` dumpTree writes key-sorted
    lists); doc_ids sorted ascending inside the block, everything
    delta+varbyte packed (codec.py).
    """
    pdf = pdf.sort_values("doc_id", kind="mergesort")
    doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    dls = pdf["dl"].to_numpy(dtype=np.int64)
    if pdf["positions"].iloc[0] is not None:
        flat_pos = (
            np.concatenate(pdf["positions"].to_numpy())
            if len(pdf)
            else np.empty(0, np.int64)
        )
        pos_buf = codec.encode_positions(tfs, flat_pos.astype(np.int64))
    else:
        pos_buf = b""
    return pd.DataFrame(
        {
            "term_id": [int(pdf["term_id"].iloc[0])],
            "block_id": [int(pdf["block_id"].iloc[0])],
            "n_docs": [len(pdf)],
            "first_doc_id": [int(doc_ids[0])],
            "last_doc_id": [int(doc_ids[-1])],
            "block_max_tf": [int(tfs.max())],
            "block_min_dl": [int(dls.min())],
            "sum_tf": [int(tfs.sum())],
            "doc_ids": [codec.encode_doc_ids(doc_ids)],
            "tfs": [codec.encode_counts(tfs)],
            "dls": [codec.encode_counts(dls)],
            "positions": [pos_buf],
        }
    )


def encode_postings(
    tokens: DataFrame, block_bits: int, store_positions: bool = True
) -> DataFrame:
    """Token tuples -> compressed posting blocks, shuffled on the block key."""
    t = tokens.withColumn("term_id", term_id_col(F.col("term"))).withColumn(
        "block_id", block_id_col(F.col("doc_id"), block_bits)
    )
    if not store_positions:
        t = t.withColumn("positions", F.lit(None).cast(TOKENS_SCHEMA["positions"].dataType))
    return t.groupBy("term_id", "block_id").applyInPandas(
        _encode_block, schema=POSTINGS_SCHEMA
    )


def build_term_stats(tokens: DataFrame) -> DataFrame:
    """Exact document frequency per term (replaces the reference's RdbMap
    page-count df ESTIMATE, `Posdb.cpp:301-353` getTermFreq; SURVEY.md A3)."""
    return (
        tokens.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
        .withColumn("term_id", term_id_col(F.col("term")))
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

    docs = docs.withColumn("dl", doc_length_col(config.tokenizer_mode)(F.col("text")))
    catalog.write_table(docs, "documents")
    docs = catalog.read_table("documents")

    # doc_id collision audit (SURVEY.md §7.3)
    dup = docs.groupBy("doc_id").count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError("doc_id collision detected; rehash with a salt")

    stats_row = docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats_row["n_docs"]), float(stats_row["avgdl"] or 0.0)
    block_bits = pick_block_bits(n_docs, config.target_block_docs)

    tokens = tokenize_docs(docs, config.tokenizer_mode)
    term_stats = build_term_stats(tokens)
    catalog.write_table(term_stats, "term_stats")

    postings = encode_postings(tokens, block_bits, config.store_positions)
    catalog.write_table(
        postings.repartitionByRange(F.col("term_id"), F.col("block_id"))
        .sortWithinPartitions("term_id", "block_id"),
        "postings",
    )

    n_terms = catalog.read_table("term_stats").count()
    n_blocks = catalog.read_table("postings").count()
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
