#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the engine's headline queries against $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also measures the core capability the north rule names: inverted-index build
throughput (turns/sec) over a deterministic synthetic transcript corpus
(sources/transcripts.py) plus BM25 top-k latency against that index.
Set OSSE_BENCH_TURNS to change corpus size (default 200_000).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from open_source_search_engine_spark.session import get_spark  # noqa: E402


# the probe workload MUST stay byte-identical to scripts/host_probe.py --
# BENCH.md's attribution method compares bench-embedded probe numbers
# against watcher/pair-log probes -- so import the one definition instead
# of keeping a third copy that could drift
sys.path.insert(0, os.path.join(REPO, "scripts"))
from host_probe import work as _work  # noqa: E402


def host_probe(procs: int) -> dict:
    """In-bench host parallel-capacity probe (r3 VERDICT task 3: the bench
    artifact must SELF-attribute shared-host noise). Zero Spark/JVM: wall
    time of the same per-process numpy workload at 1 and N processes;
    aggregate_scaling(N) = N * wall(1) / wall(N) -- the probe-implied
    ceiling for ANY parallel software on this box right now."""
    import multiprocessing as mp

    with mp.Pool(2) as p:  # warm fork machinery untimed
        p.map(_work, range(2))
    out = {}
    for n in (1, procs):
        t0 = time.time()
        with mp.Pool(n) as p:
            p.map(_work, range(n))
        out[n] = time.time() - t0
    return {
        "procs": procs,
        "wall_1_sec": round(out[1], 3),
        f"wall_{procs}_sec": round(out[procs], 3),
        "aggregate_scaling": round(procs * out[1] / out[procs], 2),
    }


# the SAME reference query set for every serving p50 leg (200k and 10M):
# the 200k-vs-10M p50 comparison (the reference's "doubling index size ~
# halves qps" envelope) is only meaningful if both legs run identical work
_REF_QUERIES = [
    (["spark", "index"], "AND"),
    (["query", "merge", "shard"], "AND"),
    (["vector", "stream", "window"], "OR"),
    (["the", "score"], "AND"),
    (["rareterm_xyzzy"], "AND"),
]


def _ref_p50_samples(eng, n_reps: int) -> list[float]:
    """n_reps sorted per-rep p50s of the reference query set."""
    samples = []
    for _ in range(n_reps):
        lat = []
        for terms, mode in _REF_QUERIES:
            t0 = time.time()
            eng.search_terms(terms, mode, 10).collect()
            lat.append(time.time() - t0)
        lat.sort()
        samples.append(lat[len(lat) // 2])
    samples.sort()
    return samples


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else 0.0
    n_turns = int(os.environ.get("OSSE_BENCH_TURNS", "200000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    probe = host_probe(cpus)

    spark = get_spark("osse-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from open_source_search_engine_spark.catalog import Catalog
    from open_source_search_engine_spark.operators.index_build import (
        IndexConfig,
        build_index,
        transcripts_to_docs,
    )
    from open_source_search_engine_spark.operators.query import SearchEngine
    from open_source_search_engine_spark.sources.transcripts import synth_transcripts

    queries: dict[str, float] = {}
    qfns = entry_mod.queries()

    # ---- per-query latency over the driver's sf tables -------------------
    # ONE-TIME BUILD STAGES are timed as their own entries so per-query
    # numbers measure serving latency, not amortized build cost (r2 VERDICT:
    # lsh_ann "6.4 s" was 5 s of lazy ANN-index build + 0.7 s of serving):
    #   index_build_sf -- inverted index + hot-term shortcut cache
    #   ann_build      -- materialized LSH/IVF ANN index (partitioned writes)
    #   pair_graph     -- capped near-dup pair graph (shared by
    #                     jaccard_pairs + dedup_clusters)
    from open_source_search_engine_spark.entry import (
        ann_for,
        cjk_for,
        documents,
        engine_for,
        pairs_for,
        passage_for,
        sigs_for,
        tt_engine_for,
    )

    # untimed warmup (same policy as the transcript-build leg below): fork
    # the Python worker pool + JIT the codegen paths on a small slice so
    # index_build_sf measures the engine, not per-JVM one-time constants
    warm_cat = Catalog(spark, "/tmp/osse-bench-warm-sf")
    shutil.rmtree("/tmp/osse-bench-warm-sf", ignore_errors=True)
    build_index(
        spark,
        warm_cat,
        documents(spark, sf_dir).limit(500),
        IndexConfig(tokenizer_mode="ascii"),
    )

    t0 = time.time()
    engine_for(spark, sf_dir)
    queries["index_build_sf"] = round(time.time() - t0, 4)

    t0 = time.time()
    ann_for(spark, sf_dir)
    queries["ann_build"] = round(time.time() - t0, 4)

    t0 = time.time()
    pairs_for(spark, sf_dir)
    queries["pair_graph"] = round(time.time() - t0, 4)

    t0 = time.time()
    sigs_for(spark, sf_dir)
    queries["sig_build"] = round(time.time() - t0, 4)

    t0 = time.time()
    cjk_for(spark, sf_dir)
    queries["cjk_build"] = round(time.time() - t0, 4)

    t0 = time.time()
    passage_for(spark, sf_dir)
    queries["passage_build"] = round(time.time() - t0, 4)

    t0 = time.time()
    tt_engine_for(spark, sf_dir)
    queries["tt_build"] = round(time.time() - t0, 4)

    headline = [
        "bm25_and", "bm25_or", "bm25_not", "bm25_stopwords", "wand",
        "phrase", "boolean", "lang_filter_bm25", "term_stats",
        "dedup_exact", "minhash", "jaccard_pairs", "simhash",
        "cosine_topk", "lsh_ann", "quality", "lang_id", "fingerprint",
        "token_counts", "events_window",
        # round 2: grammar/synonym/proximity query surface, hot-term
        # shortcut, materialized-ANN ivf, best-window snippets
        "query_grammar", "synonyms", "bm25_proximity", "bm25_hot",
        "ivf_ann", "lsh_candidates", "snippet", "bm25_source_cap",
        "dedup_clusters", "doc_keywords",
        # round 3: bigram vote-group boost, possessive word forms,
        # score-free-clause grammar, real BMP/WAV/AVI codec path
        "bm25_bigram_boost", "possessive", "query_scorefree", "media_real",
        "embed_neardup", "spellcheck", "word_split",
        # round 3: curation suite (boilerplate/F11, spam rank/W5, splits,
        # source mixing)
        "boilerplate", "spam_rank", "train_split", "source_mix",
        # round 3: faceted search + query-time field sort, Gopher rules
        "facets", "sortby", "quality_flags", "diversity", "dedup_screen",
        # round 3 (late): training-export ops -- eval decontamination,
        # token-budget shard packing (two-level distributed prefix sum)
        "decontaminate", "pack_shards", "ann_recall", "resample", "pack_export",
        # round 4: multi-word synonym phrase path, rule-based morphology,
        # serve-time result dedup + refill, UOR opcode, CJK char bigrams
        "bm25_multiword_synonym", "bm25_plural", "bm25_dedup_results",
        "uor", "bm25_cjk",
        # round 5: proximity on the WAND + batch scale paths, serving-
        # integrated did-you-mean, exact-substring dup screen
        "wand_proximity", "batch_proximity", "spell_fallback",
        "substring_dup", "bm25_cached",
        # round 5 (late): doc-level score boosts on the exact and WAND
        # serving paths (language damp / source weights)
        "bm25_lang_boost", "bm25_field_boost", "wand_field_boost",
        "batch_boosted",
        # round 5 (final): quoted phrases on the WAND scale path; one-call
        # SERP assembly (rank + source cap + page-restricted snippets);
        # dictionary-driven exact-vs-WAND routing; quality-aware duplicate
        # survivors; fixed-token-window chunking
        "wand_phrase", "serp", "bm25_auto", "dedup_survivors", "chunk_docs",
        # round 5 (final): gigabits — related-topic terms from the page;
        # one-pass per-source corpus report card
        "related", "corpus_profile",
        # round 5 (final): conversation/group-level ranking; hit-turn
        # context expansion
        "grouped_topk", "context",
        # round 5 (session 3): related-docs serving, exact total-hits
        # counting, dictionary df telemetry, PMI collocation mining
        "more_like_this", "count_only", "df_histogram", "collocations",
        # round 5 (session 3): dictionary-driven wildcard expansion,
        # in-order sloppy phrase (NEAR)
        "prefix_search", "near_phrase",
        # round 5 (session 4): hybrid lexical->dense serving -- BM25 page
        # re-ranked by cosine, and reciprocal-rank fusion of ranked lists
        "hybrid_rerank", "rrf_fusion",
        # round 5 (session 5): CCNet-style self-trained bigram-LM
        # surprisal quality score; context-aware type-ahead completion
        "doc_perplexity", "complete_query", "normalize_text",
        "mmr_rerank", "eval_rankings",
        # round 5 (session 6): passage retrieval with MaxP rollup (its
        # one-time chunk-index build is attributed to passage_build below),
        # Rocchio PRF requery, LTR feature export
        "maxp_passage", "prf_expand", "ltr_features", "percolate",
        "fuzzy_search", "relaxed_rat", "search_after", "wand_after",
        "explain_terms", "vocab_drift", "event_transitions",
        "props_extract", "fetch_docs", "sq8_ann",
        # round 5 (session 7): reversed-dictionary leading wildcard,
        # deterministic HLL distinct-term sketch, packed binary-
        # quantization ANN with exact rescore, snapshot-pinned
        # (time-travel) serving over the mutated index (its build+mutate
        # stage is attributed to tt_build above)
        "suffix_search", "hll_distinct", "bq_rescore", "bm25_snapshot",
        # round 5 (session 7): BM25F field-weighted scoring; dictionary
        # drift between a snapshot pin and the live index
        "bm25f", "index_diff",
    ]
    # median-of-N per query (default 3): shared-host noise flipped the
    # r1->r2 comparison on queries whose code had not changed; the median
    # makes a round-over-round delta attributable to the code again
    n_reps = int(os.environ.get("OSSE_BENCH_REPS", "3"))
    for name in headline:
        if name not in qfns:
            continue
        samples = []
        for _ in range(n_reps):
            t0 = time.time()
            qfns[name](spark, sf_dir).collect()
            samples.append(time.time() - t0)
        samples.sort()
        queries[name] = round(samples[len(samples) // 2], 4)

    # ---- paired WAND-vs-exact ratio (r4 VERDICT task 2) ------------------
    # The r3 "wand <= 1.5x bm25_and" criterion kept failing in driver
    # artifacts despite passing in clean windows: the two legs run minutes
    # apart in the headline loop, so a shared-host throttle spike can hit
    # one and not the other. Here the two legs run BACK-TO-BACK inside each
    # rep and the criterion value is the median of PER-REP ratios -- any
    # throttling hits both legs of a rep equally and cancels in the ratio.
    pair_ratios = []
    for _ in range(n_reps):
        t0 = time.time()
        qfns["bm25_and"](spark, sf_dir).collect()
        t_and = time.time() - t0
        t0 = time.time()
        qfns["wand"](spark, sf_dir).collect()
        t_wand = time.time() - t0
        pair_ratios.append((round(t_and, 4), round(t_wand, 4)))
    ratios = sorted(w / a for a, w in pair_ratios)
    wand_ratio = ratios[len(ratios) // 2]

    # ---- transcript-corpus build throughput (the north-rule metric) ------
    # ISOLATE these legs from the sf-query section: stop the session and
    # start a fresh one. r1's bench ran ~20 queries before this point;
    # r2/r3 run 44+, and the in-bench build throughput degraded round-over-
    # round (19-27k turns/s) while the standalone number (scripts/
    # scaling_bench.py, identical code path) held at 33-40k -- the delta is
    # accumulated JVM state (old-gen garbage, cached relations, shuffle
    # files) from unrelated preceding queries, not the engine. clearCache
    # alone did not recover it (r2->r3 variance analysis in BENCH.md).
    spark.catalog.clearCache()
    spark.stop()
    spark = get_spark("osse-bench-build")
    spark.sparkContext.setLogLevel("ERROR")
    # corpus is materialized to parquet first (untimed) so the build number
    # measures the engine, not the synthetic generator
    wh = "/tmp/osse-bench-transcripts-wh"
    shutil.rmtree(wh, ignore_errors=True)
    corpus_dir = f"/tmp/osse-bench-corpus-{n_turns}"
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        synth_transcripts(spark, n_turns).write.mode("overwrite").parquet(corpus_dir)
    cat = Catalog(spark, wh)
    tr = spark.read.parquet(corpus_dir)
    # untimed warmup (same policy as scripts/scaling_bench.py): fork the
    # Python worker pool + JIT the codegen paths on a small slice so the
    # timed run measures steady-state engine throughput, not per-JVM
    # one-time constants
    warm_cat = Catalog(spark, wh + "-warm")
    build_index(
        spark,
        warm_cat,
        transcripts_to_docs(tr).limit(20_000),
        IndexConfig(tokenizer_mode="ascii"),
    )
    # median-of-3 builds (r3 VERDICT task 3: the transcript legs were the
    # noisiest section round-over-round; the probe above + the median here
    # make the driver artifact self-attributing)
    build_samples = []
    for rep in range(n_reps):
        rep_wh = wh if rep == n_reps - 1 else f"{wh}-rep{rep}"
        shutil.rmtree(rep_wh, ignore_errors=True)
        rep_cat = Catalog(spark, rep_wh)
        t0 = time.time()
        build_index(
            spark, rep_cat, transcripts_to_docs(tr),
            IndexConfig(tokenizer_mode="ascii"),
        )
        build_samples.append(time.time() - t0)
    build_samples.sort()
    build_s = build_samples[len(build_samples) // 2]
    queries["transcript_build"] = round(build_s, 4)
    turns_per_sec = n_turns / build_s

    eng = SearchEngine(spark, cat, tokenizer_mode="ascii")
    p50_samples = _ref_p50_samples(eng, n_reps)
    p50 = p50_samples[len(p50_samples) // 2]
    queries["bm25_transcript_p50"] = round(p50, 4)

    # batch serving throughput: many queries in ONE job (SearchEngine.search_many)
    vocab = ["spark", "index", "query", "merge", "shard", "score", "posting",
             "block", "search", "rank", "table", "shuffle", "batch", "vector",
             "stream", "join", "filter", "agg", "window", "the"]
    batch = []
    for i in range(64):
        terms = [vocab[i % 20], vocab[(i * 7 + 3) % 20]]
        batch.append({
            "query_id": f"b{i}", "terms": terms,
            "mode": "AND" if i % 2 else "OR", "k": 10,
        })
    # median-of-N like the serving queries: this leg runs LAST on a full
    # old-gen heap, and its single-shot r2 number (10.7 s vs 6.4 s in r1,
    # code unchanged) was pure run-order state
    batch_samples = []
    for _ in range(n_reps):
        t0 = time.time()
        eng.search_many(batch).collect()
        batch_samples.append(time.time() - t0)
    batch_samples.sort()
    batch_s = batch_samples[len(batch_samples) // 2]
    queries["batch_64_queries"] = round(batch_s, 4)
    batch_qps = 64 / batch_s

    # ---- sustained-scale serving legs (r3/r4 VERDICT task 8) --------------
    # Measure the SAME reference query set against a much larger index so
    # the envelope "doubling index size ~ halves qps" (reference
    # html/faq.html:316) is checkable inside the driver artifact. The
    # prebuilt 10M-turn warehouse (scripts/build_10m.py) is looked up at
    # $OSSE_10M_WH, then a repo-local cache (survives /tmp teardown between
    # builder and driver runs — BENCH_r03/r04 lost the legs exactly this
    # way), then /tmp. When NO prebuilt warehouse exists anywhere, build a
    # bounded OSSE_SUSTAIN_TURNS-turn one in-bench (timed as its own
    # `sustain_build` leg) so the artifact always carries a sustained-scale
    # serving number; `tenm_turns` in the JSON records which size ran.
    tenm = {}
    candidates = [
        os.environ.get("OSSE_10M_WH", ""),
        os.path.join(REPO, ".cache", "osse-10m-wh"),
        "/tmp/osse-10m-wh",
    ]
    tenm_wh = next(
        (
            c
            for c in candidates
            if c and os.path.isdir(os.path.join(c, "postings"))
        ),
        None,
    )
    if tenm_wh is not None:
        # the warehouse records its own corpus size (build_10m.py writes
        # _build_meta.json) -- never ASSUME 10M, or a smaller prebuilt
        # warehouse would inflate the envelope comparison by its size ratio
        meta_p = os.path.join(tenm_wh, "_build_meta.json")
        if os.path.exists(meta_p):
            with open(meta_p) as f:
                tenm_turns = int(json.load(f)["turns"])
        else:
            tenm_turns = 10_000_000  # pre-meta warehouses were 10M builds
    else:
        tenm_turns = int(os.environ.get("OSSE_SUSTAIN_TURNS", "2000000"))
        tenm_wh = f"/tmp/osse-sustain-wh-{tenm_turns}"
        sus_corpus = f"/tmp/osse-bench-corpus-{tenm_turns}"
        if not os.path.exists(os.path.join(sus_corpus, "_SUCCESS")):
            synth_transcripts(spark, tenm_turns).write.mode(
                "overwrite"
            ).parquet(sus_corpus)
        shutil.rmtree(tenm_wh, ignore_errors=True)
        t0 = time.time()
        build_index(
            spark,
            Catalog(spark, tenm_wh),
            transcripts_to_docs(spark.read.parquet(sus_corpus)),
            IndexConfig(tokenizer_mode="ascii"),
        )
        queries["sustain_build"] = round(time.time() - t0, 4)
    eng10 = SearchEngine(
        spark, Catalog(spark, tenm_wh), tokenizer_mode="ascii"
    )
    p50_10 = _ref_p50_samples(eng10, n_reps)
    queries["bm25_10m_p50"] = round(p50_10[len(p50_10) // 2], 4)
    # 16 queries (not 64): at 10M docs every all-common-term query
    # routes to a pruned per-query union branch (search_many's adaptive
    # cutoff), so batch cost scales ~linearly in batch size -- 16 keeps
    # the leg honest without dominating the whole bench's wall time
    b10_samples = []
    for _ in range(n_reps):
        t0 = time.time()
        eng10.search_many(batch[:16]).collect()
        b10_samples.append(time.time() - t0)
    b10_samples.sort()
    b10 = b10_samples[len(b10_samples) // 2]
    queries["batch_16_10m"] = round(b10, 4)
    tenm = {
        "tenm_turns": tenm_turns,
        "tenm_p50_sec": queries["bm25_10m_p50"],
        "tenm_batch_qps": round(16 / b10, 2),
        "tenm_batch_samples_sec": [round(s, 4) for s in b10_samples],
        # the reference's "doubling index size ~ halves qps"
        # (html/faq.html:316) linearized from the 200k-corpus batch leg
        "tenm_envelope_qps": round(
            batch_qps * n_turns / tenm_turns, 3
        ),
    }

    total = sum(queries.values())
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(total, 4),
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "extras": {
                    "indexing_turns_per_sec": round(turns_per_sec, 1),
                    "bench_corpus_turns": n_turns,
                    "bm25_query_p50_sec": round(p50, 4),
                    "batch_qps": round(batch_qps, 1),
                    "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                    # host-capacity probe (self-attribution): if
                    # aggregate_scaling is far below `procs`, the box was
                    # shared/throttled during THIS run and absolute wall
                    # numbers carry that noise
                    "host_probe": probe,
                    # paired-rep wand/bm25_and criterion (see comment at
                    # the measurement site): median per-rep ratio + samples
                    "wand_bm25_and_ratio": round(wand_ratio, 3),
                    "wand_pair_samples_sec": pair_ratios,
                    "transcript_build_samples_sec": [
                        round(s, 4) for s in build_samples
                    ],
                    "bm25_p50_samples_sec": [
                        round(s, 4) for s in p50_samples
                    ],
                    **tenm,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
