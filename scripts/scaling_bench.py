#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: >=0.8 between N and 4N).

No real multi-node cluster exists in this sandbox, so per driver instruction
the same job runs at two parallelism levels on the SAME pre-materialized
parquet corpus, and we report throughput at both plus
eff = throughput(4N) / (4 * throughput(N)).

Two masters:
  --mode threads   (default) local[N] executor threads in one JVM
  --mode executors local-cluster[N,cores,mem] -- N SEPARATE executor JVMs
                   with real netty shuffle, the closest this sandbox gets
                   to the north rule's "N and 4N executors" wording

Each leg runs in a FRESH driver JVM (subprocess) so executor count, shuffle
partitions, and memory pools are really reconfigured.

Usage: python scripts/scaling_bench.py [--turns 1000000] [--cpus 2,8]
           [--mode executors] [--exec-cores 1] [--exec-mem-mb 3072]
Child mode (internal): --child <corpus_dir> <cpus>
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(
    corpus_dir: str,
    cpus: int,
    mode: str = "threads",
    exec_cores: int = 1,
    exec_mem_mb: int = 3072,
) -> None:
    from open_source_search_engine_spark.catalog import Catalog
    from open_source_search_engine_spark.operators.index_build import (
        IndexConfig,
        build_index,
        transcripts_to_docs,
    )
    from open_source_search_engine_spark.operators.query import SearchEngine
    from open_source_search_engine_spark.session import get_spark

    wh = f"/tmp/osse-scale-wh-{cpus}"
    shutil.rmtree(wh, ignore_errors=True)
    if mode == "executors":
        # N separate executor JVMs, each with exec_cores cores: the
        # "cluster of N executors" reading of the north rule
        master = f"local-cluster[{cpus},{exec_cores},{exec_mem_mb}]"
        total_cores = cpus * exec_cores
    else:
        master = f"local[{cpus}]"
        total_cores = cpus
    spark = get_spark(
        f"osse-scale-{cpus}",
        master=master,
        shuffle_partitions=max(8, total_cores),
    )
    spark.sparkContext.setLogLevel("ERROR")
    cat = Catalog(spark, wh)
    tr = spark.read.parquet(corpus_dir)
    n_turns = tr.count()

    # untimed warmup: fork every Python worker + JIT the codegen paths so the
    # timed run measures steady-state throughput, not per-JVM constants
    from open_source_search_engine_spark.sources.transcripts import (
        synth_transcripts,
    )

    warm_cat = Catalog(spark, wh + "-warm")
    build_index(
        spark,
        warm_cat,
        transcripts_to_docs(synth_transcripts(spark, 5000, partitions=cpus)),
        IndexConfig(tokenizer_mode="ascii"),
    )

    t0 = time.time()
    build_index(
        spark, cat, transcripts_to_docs(tr), IndexConfig(tokenizer_mode="ascii")
    )
    build_s = time.time() - t0

    eng = SearchEngine(spark, cat, tokenizer_mode="ascii")
    lat = []
    for terms, mode in [
        (["spark", "index"], "AND"),
        (["query", "merge", "shard"], "AND"),
        (["vector", "stream", "window"], "OR"),
        (["the", "score"], "AND"),
        (["rareterm_xyzzy"], "AND"),
    ]:
        t0 = time.time()
        eng.search_terms(terms, mode, 10).collect()
        lat.append(time.time() - t0)
    lat.sort()
    print(
        "CHILD_RESULT "
        + json.dumps(
            {
                "cpus": cpus,
                "master": master,
                "n_turns": n_turns,
                "build_sec": round(build_s, 3),
                "turns_per_sec": round(n_turns / build_s, 1),
                "query_p50_sec": round(lat[len(lat) // 2], 4),
            }
        )
    )
    spark.stop()


def leg_probe() -> dict:
    """Per-leg host-capacity probe (pure numpy multiprocessing, zero
    Spark): the r3/r4 pair logs show the host granting 2.5-3.6x aggregate
    at 8 procs DURING sustained legs but 4.5-4.7x immediately AFTER a
    heavy job ends -- the signature of a burst CPU quota that replenishes
    when idle. Bracketing each leg (not just the pair) attributes which
    leg the throttle landed on."""
    import multiprocessing as mp

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from host_probe import work

    with mp.Pool(2) as p:  # warm fork machinery untimed
        p.map(work, range(2))
    walls = {}
    for n in (1, 2, 8):
        t0 = time.time()
        with mp.Pool(n) as p:
            p.map(work, range(n))
        walls[n] = time.time() - t0
    return {
        n: round(n * walls[1] / walls[n], 2) for n in (2, 8)
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=1_000_000)
    ap.add_argument("--cpus", default="8,32")
    ap.add_argument(
        "--gap",
        type=int,
        default=0,
        help="idle seconds before EACH leg (burst-quota replenishment; "
        "applied identically to both legs so neither is favored)",
    )
    ap.add_argument(
        "--mode",
        choices=("threads", "executors"),
        default="threads",
        help="threads = local[N]; executors = local-cluster[N,cores,mem] "
        "(N separate executor JVMs, real netty shuffle)",
    )
    ap.add_argument("--exec-cores", type=int, default=1)
    ap.add_argument("--exec-mem-mb", type=int, default=3072)
    ap.add_argument("--child", nargs=2, metavar=("CORPUS", "CPUS"))
    args = ap.parse_args()
    if args.child:
        child(
            args.child[0],
            int(args.child[1]),
            mode=args.mode,
            exec_cores=args.exec_cores,
            exec_mem_mb=args.exec_mem_mb,
        )
        return

    corpus_dir = f"/tmp/osse-scale-corpus-{args.turns}"
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        from open_source_search_engine_spark.session import get_spark
        from open_source_search_engine_spark.sources.transcripts import (
            synth_transcripts,
        )

        spark = get_spark("osse-scale-gen")
        spark.sparkContext.setLogLevel("ERROR")
        synth_transcripts(spark, args.turns).write.mode("overwrite").parquet(
            corpus_dir
        )
        spark.stop()

    results = {}
    for c in [int(x) for x in args.cpus.split(",")]:
        if args.gap:
            time.sleep(args.gap)
            print(
                f"LEG_PROBE cpus={c} after {args.gap}s idle: "
                + json.dumps(leg_probe())
            )
        out = subprocess.run(
            [
                sys.executable, os.path.abspath(__file__),
                "--child", corpus_dir, str(c),
                "--mode", args.mode,
                "--exec-cores", str(args.exec_cores),
                "--exec-mem-mb", str(args.exec_mem_mb),
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = [
            ln for ln in out.stdout.splitlines() if ln.startswith("CHILD_RESULT ")
        ]
        if not line:
            print(out.stdout[-3000:], out.stderr[-3000:])
            sys.exit(1)
        r = json.loads(line[0][len("CHILD_RESULT "):])
        results[r["cpus"]] = r
        print(json.dumps(r))

    cl = sorted(results)
    if len(cl) == 2:
        lo, hi = results[cl[0]], results[cl[1]]
        ratio = hi["turns_per_sec"] / lo["turns_per_sec"]
        ideal = cl[1] / cl[0]
        eff = ratio / ideal
        print(
            json.dumps(
                {
                    "scaling": f"{lo['master']} -> {hi['master']}",
                    "speedup": round(ratio, 3),
                    "ideal": ideal,
                    "efficiency": round(eff, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
