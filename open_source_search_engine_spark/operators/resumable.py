"""Resumable, checkpointed index builds with per-partition lineage + metrics.

Reference: adds-in-progress survive restarts (`Msg4Out.h:8-10`
saveAddsInProgress); each Rdb file becomes readable only after a full dump
(`RdbDump.cpp:251`, `test/unit/PosdbTest.cpp:18-25` markNewFileReadable);
RdbBase tracks the live file set; background RdbMerge compacts N files into
one (`RdbMerge.cpp:53`) with a recorded fan-in.

Spark-first rebuild (north rule: "resumable from per-partition checkpoints
with lineage and build metrics (postings/sec, bytes compressed, merge fan-in)
recorded per partition"):

* The corpus is split into ``n_partitions`` deterministic build partitions
  (hash of doc_id -- partition membership is independent of input layout).
* Each partition's postings are written to its OWN segment directory
  (``segments/<build_id>/part-NNNN``), then a ``build_manifest`` row is
  appended: (build_id, partition, input_fingerprint, segment path, status,
  rows, blocks, bytes, elapsed, postings/sec). Write-then-mark-readable:
  a crash between segment write and manifest append just re-runs the
  partition with mode=overwrite -- idempotent.
* A restarted build skips every partition whose manifest row is committed
  AND whose input fingerprint still matches (stale partitions re-run).
* Finalize: ALL committed segment dirs are registered into the ``postings``
  table in ONE atomic snapshot commit (merge fan-in = number of segments),
  then term_stats / corpus_stats / build_metrics are derived.

At 10^12 turns each partition is a separate bounded Spark job; the driver
loop is O(n_partitions), all data movement stays distributed.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.hashing import pick_block_bits
from .index_build import (
    IndexConfig,
    doc_length_col,
    encode_postings,
    term_stats_from_postings,
    tokenize_docs,
)

MANIFEST_SCHEMA = (
    "build_id string, partition int, input_fingerprint long, segment string, "
    "status string, rows long, blocks long, bytes long, elapsed_sec double, "
    "postings_per_sec double, committed_at double"
)

METRICS_SCHEMA = (
    "build_id string, n_partitions int, merge_fan_in int, n_docs long, "
    "n_blocks long, bytes_compressed long, elapsed_sec double, "
    "turns_per_sec double, committed_at double"
)


class SimulatedFailure(RuntimeError):
    """Raised by fail_after_partition -- the kill-and-resume test hook."""


@dataclass
class ResumableResult:
    build_id: str
    n_partitions: int
    partitions_run: int
    partitions_skipped: int
    n_docs: int
    n_blocks: int
    elapsed_sec: float


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _fingerprints(docs: DataFrame, n_partitions: int) -> dict[int, tuple[int, int]]:
    """Per-partition input fingerprint: (row count, xor-fold of doc_id).
    Order-independent, cheap, detects any add/remove/change of membership."""
    rows = (
        docs.groupBy(F.pmod(F.col("doc_id"), F.lit(n_partitions)).alias("p"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash("doc_id", "text").cast("long")).alias("fp"),
        )
        .collect()
    )
    return {int(r["p"]): (int(r["n"]), int(r["fp"])) for r in rows}


def resumable_build(
    spark: SparkSession,
    catalog: Catalog,
    docs: DataFrame,
    config: IndexConfig | None = None,
    n_partitions: int = 8,
    build_id: str = "build-0",
    fail_after_partition: int | None = None,
) -> ResumableResult:
    """Checkpointed build of documents/postings/term_stats/corpus_stats.

    ``docs`` must have (doc_id long, text string, ...). Re-invoking with the
    same build_id resumes: committed, fingerprint-matching partitions are
    skipped. ``fail_after_partition=i`` raises after partition i commits
    (test hook for the kill-and-resume gate).
    """
    config = config or IndexConfig()
    t0 = time.time()

    docs = docs.withColumn("dl", doc_length_col(config.tokenizer_mode)(F.col("text")))
    catalog.write_table(docs, "documents")
    docs = catalog.read_table("documents")

    stats_row = docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats_row["n_docs"]), float(stats_row["avgdl"] or 0.0)
    block_bits = pick_block_bits(n_docs, config.target_block_docs)

    fps = _fingerprints(docs, n_partitions)
    committed: dict[int, dict] = {}
    if catalog.table_exists("build_manifest"):
        for r in (
            catalog.read_table("build_manifest")
            .filter(
                (F.col("build_id") == build_id) & (F.col("status") == "committed")
            )
            .collect()
        ):
            committed[int(r["partition"])] = r.asDict()

    seg_root = os.path.join(catalog.warehouse, "segments", build_id)
    run = skipped = 0
    segments: list[str] = []
    for p in range(n_partitions):
        n_p, fp_p = fps.get(p, (0, 0))
        fingerprint = (fp_p ^ (n_p << 1)) & ((1 << 63) - 1)
        prev = committed.get(p)
        seg_dir = os.path.join(seg_root, f"part-{p:04d}")
        if (
            prev is not None
            and int(prev["input_fingerprint"]) == fingerprint
            and os.path.exists(os.path.join(prev["segment"], "_SUCCESS"))
        ):
            segments.append(prev["segment"])
            skipped += 1
            continue
        tp = time.time()
        part_docs = docs.filter(F.pmod(F.col("doc_id"), F.lit(n_partitions)) == p)
        tokens = tokenize_docs(part_docs, config.tokenizer_mode)
        postings = encode_postings(tokens, block_bits, config.store_positions)
        postings.write.mode("overwrite").parquet(seg_dir)
        elapsed = time.time() - tp
        seg_bytes = _dir_bytes(seg_dir)
        blocks = spark.read.parquet(seg_dir).count()
        row = [
            (
                build_id, p, fingerprint, seg_dir, "committed",
                n_p, blocks, seg_bytes, elapsed,
                (n_p / elapsed) if elapsed > 0 else 0.0, time.time(),
            )
        ]
        catalog.append_table(spark.createDataFrame(row, MANIFEST_SCHEMA), "build_manifest")
        segments.append(seg_dir)
        run += 1
        if fail_after_partition is not None and p >= fail_after_partition:
            raise SimulatedFailure(f"injected failure after partition {p}")

    # finalize: one atomic commit registers every segment (merge fan-in)
    catalog.commit_data_dirs("postings", segments, mode="overwrite")
    postings = catalog.read_table("postings")
    catalog.write_table(term_stats_from_postings(postings), "term_stats")
    n_terms = catalog.read_table("term_stats").count()
    n_blocks = postings.count()
    corpus = spark.createDataFrame(
        [(n_docs, avgdl, block_bits, n_terms, n_blocks)],
        "n_docs long, avgdl double, block_bits int, n_terms long, n_blocks long",
    )
    catalog.write_table(corpus, "corpus_stats")
    elapsed = time.time() - t0
    catalog.append_table(
        spark.createDataFrame(
            [
                (
                    build_id, n_partitions, len(segments), n_docs, n_blocks,
                    sum(_dir_bytes(s) for s in segments), elapsed,
                    (n_docs / elapsed) if elapsed > 0 else 0.0, time.time(),
                )
            ],
            METRICS_SCHEMA,
        ),
        "build_metrics",
    )
    return ResumableResult(
        build_id=build_id,
        n_partitions=n_partitions,
        partitions_run=run,
        partitions_skipped=skipped,
        n_docs=n_docs,
        n_blocks=n_blocks,
        elapsed_sec=elapsed,
    )


def merge_postings(spark: SparkSession, catalog: Catalog) -> int:
    """Compaction: merge multi-segment postings so each (term_id, block_id)
    is one row again (the RdbMerge analog, `RdbMerge.cpp:53`; Iceberg:
    rewrite_data_files). Returns the file-set fan-in that was merged."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from ..functions import codec
    from .index_build import POSTINGS_SCHEMA

    postings = catalog.read_table("postings")
    fan_in = len(catalog.data_dirs("postings"))

    def merge_stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import collections

        def flush(groups: collections.OrderedDict) -> pd.DataFrame:
            out = collections.defaultdict(list)
            for (tid, bid), rows in groups.items():
                ids = np.concatenate([codec.decode_doc_ids(bytes(r.doc_ids)) for r in rows])
                tfs = np.concatenate([codec.decode_counts(bytes(r.tfs)) for r in rows])
                dls = np.concatenate([codec.decode_counts(bytes(r.dls)) for r in rows])
                pos_parts = []
                for r in rows:
                    t = codec.decode_counts(bytes(r.tfs))
                    pos_parts.append(codec.decode_positions(t, bytes(r.positions)))
                order = np.argsort(ids, kind="mergesort")
                ids_s, tfs_s, dls_s = ids[order], tfs[order], dls[order]
                # re-order flattened positions by doc
                starts = np.cumsum(tfs) - tfs
                flat = np.concatenate(pos_parts) if pos_parts else np.empty(0, np.int64)
                pos_sorted = (
                    np.concatenate(
                        [flat[starts[i]: starts[i] + tfs[i]] for i in order]
                    )
                    if flat.size
                    else flat
                )
                out["term_id"].append(tid)
                out["term"].append(rows[0].term)
                out["block_id"].append(bid)
                out["n_docs"].append(len(ids_s))
                out["first_doc_id"].append(int(ids_s[0]))
                out["last_doc_id"].append(int(ids_s[-1]))
                out["block_max_tf"].append(int(tfs_s.max()))
                out["block_min_dl"].append(int(dls_s.min()))
                out["sum_tf"].append(int(tfs_s.sum()))
                out["doc_ids"].append(codec.encode_doc_ids(ids_s))
                out["tfs"].append(codec.encode_counts(tfs_s))
                out["dls"].append(codec.encode_counts(dls_s))
                out["positions"].append(
                    codec.encode_positions(tfs_s, pos_sorted) if flat.size else b""
                )
            return pd.DataFrame(out)

        import collections as _c

        groups: _c.OrderedDict = _c.OrderedDict()
        for b in batches:
            for row in b.itertuples(index=False):
                groups.setdefault((int(row.term_id), int(row.block_id)), []).append(row)
            # flush all but the last group (sorted partitions => contiguous)
            if len(groups) > 1:
                keys = list(groups)[:-1]
                done = _c.OrderedDict((k, groups.pop(k)) for k in keys)
                pdf = flush(done)
                if len(pdf):
                    yield pdf
        if groups:
            pdf = flush(groups)
            if len(pdf):
                yield pdf

    merged = (
        postings.repartitionByRange(F.col("term_id"), F.col("block_id"))
        .sortWithinPartitions("term_id", "block_id")
        .mapInPandas(merge_stream, schema=POSTINGS_SCHEMA)
    )
    catalog.write_table(merged, "postings")
    return fan_in
