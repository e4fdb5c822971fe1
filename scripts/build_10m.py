#!/usr/bin/env python
"""Build the persistent 10M-turn index that bench.py's sustained-scale
serving legs query (r3/r4 VERDICT task 8). Writes to $OSSE_10M_WH
(default: the repo-local .cache/osse-10m-wh — /tmp is torn down between
the builder session and the driver's bench run, which is how BENCH_r03/
r04 lost the 10M legs); reuses an existing build unless --force.

    python scripts/build_10m.py [--turns 10000000] [--force]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=10_000_000)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    wh = os.environ.get(
        "OSSE_10M_WH", os.path.join(REPO, ".cache", "osse-10m-wh")
    )
    if os.path.isdir(os.path.join(wh, "postings")) and not args.force:
        print(json.dumps({"wh": wh, "status": "exists"}))
        return

    from open_source_search_engine_spark.catalog import Catalog
    from open_source_search_engine_spark.operators.index_build import (
        IndexConfig,
        build_index,
        transcripts_to_docs,
    )
    from open_source_search_engine_spark.session import get_spark
    from open_source_search_engine_spark.sources.transcripts import (
        synth_transcripts,
    )

    spark = get_spark("osse-build-10m")
    spark.sparkContext.setLogLevel("ERROR")
    corpus_dir = f"/tmp/osse-bench-corpus-{args.turns}"
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        synth_transcripts(spark, args.turns).write.mode("overwrite").parquet(
            corpus_dir
        )
    shutil.rmtree(wh, ignore_errors=True)
    cat = Catalog(spark, wh)
    tr = spark.read.parquet(corpus_dir)
    t0 = time.time()
    build_index(
        spark, cat, transcripts_to_docs(tr), IndexConfig(tokenizer_mode="ascii")
    )
    dt = time.time() - t0
    # record the corpus size so bench.py's sustained legs never assume it
    with open(os.path.join(wh, "_build_meta.json"), "w") as f:
        json.dump({"turns": args.turns, "build_sec": round(dt, 1)}, f)
    print(
        json.dumps(
            {
                "wh": wh,
                "turns": args.turns,
                "build_sec": round(dt, 1),
                "turns_per_sec": round(args.turns / dt, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
