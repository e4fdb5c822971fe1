"""Streaming ingestion: live transcript turns absorbed into the index.

Reference analog (SURVEY.md §2.9): the in-memory memtable absorbs live adds
while files serve reads (`RdbTree.cpp`/`RdbBuckets.cpp`; queries merge
tree+files at read, `Msg5.cpp:139`); adds buffered per shard by Msg4Out with
saved adds-in-progress across restarts (`Msg4Out.h:8-10`).

Spark-first re-expression: Structured Streaming micro-batches ->
``foreachBatch`` -> operators/updates.apply_updates. Each micro-batch
becomes a sequence-versioned posting segment + tombstones for replaced
turns, immediately visible to queries (tree+files-merged-at-read semantics),
with the stream checkpoint directory playing saveAddsInProgress. Compaction
(compact_updates) is the background RdbMerge.

Last-WRITER-wins per (conv_id, turn_idx) needs two mechanisms, because
apply_updates' tombstone versioning alone is last-APPLIED-wins (seg_seq
order): duplicates WITHIN a batch collapse to the highest-ts row, and a
row whose stored version is STRICTLY NEWER by ts is dropped before it
reaches apply_updates (the stale-redelivery guard -- an at-least-once
source re-emitting an old turn in a later micro-batch must not overwrite
the edit a previous batch installed). Equal-ts redelivery still
re-applies, which keeps half-processed-batch replay idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..catalog import Catalog
from ..operators.index_build import IndexConfig, transcripts_to_docs
from ..operators.updates import apply_updates


def ingest_batch(
    spark: SparkSession,
    catalog: Catalog,
    batch_df: DataFrame,
    config: IndexConfig | None = None,
) -> dict:
    """Absorb one (micro-)batch of transcript rows (input_hint schema).

    Rows are upserts keyed by (conv_id, turn_idx): a re-delivered or edited
    turn replaces its prior version (negative-key annihilation), EXCEPT
    when the stored version is strictly newer by ts (stale redelivery from
    an at-least-once source; see module docstring)."""
    docs = transcripts_to_docs(batch_df)
    # duplicate turns WITHIN a batch: last write wins deterministically
    # (highest ts, then arbitrary-but-deterministic tie on text)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("doc_id").orderBy(F.desc("ts"), F.desc("text"))
    docs = (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # stale-redelivery guard ACROSS batches: drop rows older than the
    # stored version. Both joins broadcast the batch-sized side, so the
    # doc store is never shuffled (the daily-ingest shape at scale).
    if "ts" in docs.columns and catalog.table_exists("documents"):
        stored = catalog.read_table("documents")
        if "ts" in stored.columns:
            keys = docs.select("doc_id", F.col("ts").alias("_new_ts"))
            stale = (
                stored.join(F.broadcast(keys), "doc_id")
                .filter(F.col("ts") > F.col("_new_ts"))
                .select("doc_id")
            )
            docs = docs.join(F.broadcast(stale), "doc_id", "left_anti")
    return apply_updates(spark, catalog, upserts=docs, config=config)


def start_transcript_stream(
    spark: SparkSession,
    catalog: Catalog,
    source_dir: str,
    checkpoint_dir: str,
    schema,
    config: IndexConfig | None = None,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """File-source stream of transcript parquet -> incremental index.

    The checkpoint dir makes ingestion resumable across restarts
    (saveAddsInProgress analog): an already-absorbed file is never
    re-processed, a half-processed batch re-runs idempotently (apply_updates
    tombstones + re-adds the same turns)."""
    stream = (
        spark.readStream.schema(schema).parquet(source_dir)
    )

    def absorb(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ingest_batch(spark, catalog, batch_df, config)

    writer = (
        stream.writeStream.foreachBatch(absorb)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
