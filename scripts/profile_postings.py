#!/usr/bin/env python
"""Sub-phase profile of the postings pipeline: python scripts/profile_postings.py <cpus>"""
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

cpus = int(sys.argv[1])
corpus = sys.argv[2] if len(sys.argv) > 2 else "/tmp/osse-scale-corpus-1000000"

from open_source_search_engine_spark.catalog import Catalog
from open_source_search_engine_spark.functions.hashing import (
    block_id_col, pick_block_bits, term_id_col,
)
from open_source_search_engine_spark.operators.index_build import (
    IndexConfig, build_index, encode_postings, tokenize_docs, transcripts_to_docs,
)
from open_source_search_engine_spark.session import get_spark
from open_source_search_engine_spark.sources.transcripts import synth_transcripts

spark = get_spark(f"pp{cpus}", master=f"local[{cpus}]", shuffle_partitions=max(8, cpus))
spark.sparkContext.setLogLevel("ERROR")
# warmup
wcat = Catalog(spark, f"/tmp/osse-pp-warm-{cpus}")
shutil.rmtree(f"/tmp/osse-pp-warm-{cpus}", ignore_errors=True)
build_index(spark, wcat, transcripts_to_docs(synth_transcripts(spark, 5000, partitions=cpus)), IndexConfig(tokenizer_mode="ascii"))

docs = transcripts_to_docs(spark.read.parquet(corpus)).repartition(cpus * 2)
docs = docs.select(F.xxhash64("conv_id").alias("ignore"), "*").drop("ignore")  # no-op
t = {}

t0 = time.time(); n = docs.count(); t["read_count"] = time.time() - t0
bb = pick_block_bits(n, 128)

tokens = tokenize_docs(docs, "ascii")
t0 = time.time(); tokens.write.format("noop").mode("overwrite").save(); t["tokenize_noop"] = time.time() - t0

t0 = time.time()
tk = tokens.withColumn("term_id", term_id_col(F.col("term"))).withColumn(
    "block_id", block_id_col(F.col("doc_id"), bb)
).repartition(F.col("term_id"), F.col("block_id"))
tk.write.format("noop").mode("overwrite").save()
t["tokenize_shuffle_noop"] = time.time() - t0

enc = encode_postings(tokens, bb, True)
t0 = time.time(); enc.write.format("noop").mode("overwrite").save(); t["encode_noop"] = time.time() - t0

t0 = time.time(); enc.write.mode("overwrite").parquet(f"/tmp/osse-pp-out-{cpus}"); t["encode_parquet"] = time.time() - t0

print("POSTINGS_PROFILE", cpus, {k: round(v, 1) for k, v in t.items()})
spark.stop()
