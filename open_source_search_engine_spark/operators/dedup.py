"""Deduplication operators for large-scale training-data pipelines.

The reference dedups at two points: spider-time exact content-hash terms
(`gbcontenthash:` sharded by termId, `XmlDoc_Indexing.cpp:156` hashNoSplit,
SURVEY.md F9) and result-time summary-similarity dedup
(`Msg40.cpp:1173-1300`, A5). We generalize to the standard corpus-dedup
suite: exact hash, n-gram Jaccard, MinHash+LSH, SimHash -- all expressed as
declarative DataFrame plans (hash/sort/aggregate joins Catalyst can
optimize), no Python in the hot path.

Determinism contract: content hashes use md5 hex strings (identical in Spark,
DuckDB, and Python), so every operator here is oracle-checkable.

Scale notes (100 TB):
* exact dedup = one shuffle on the 128-bit hash; no skew (hashes uniform).
* Jaccard candidate generation joins on shared shingles. A HOT shingle is a
  quadratic pair bomb (df-D shingle => D^2/2 join rows from one key; AQE
  splits skewed partitions, not pair counts), so ngram_jaccard_pairs caps
  the join at max_shingle_df and adds the hot-shingle intersection share
  back exactly per candidate pair (see its docstring).
* MinHash/LSH: signature agg is a single groupBy; band-bucket join is the
  classic LSH candidate generation (pairs sharing a band bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenizer import ASCII_SPLIT_REGEX


def tokens_col(text: Column) -> Column:
    """ASCII-mode token array, JVM-side (identical to tokenizer mode='ascii'
    and to the DuckDB oracle's regexp_split_to_array)."""
    return F.filter(
        F.split(F.lower(text), ASCII_SPLIT_REGEX), lambda t: t != F.lit("")
    )


def shingles_expr(tokens_col_name: str, n: int = 3) -> Column:
    """n-gram shingle array from a token-array column (JVM higher-order fns,
    no UDF): shingle i = tokens[i..i+n-1] joined by spaces; docs with fewer
    than n tokens yield an EMPTY array (the size guard is load-bearing:
    sequence(1, 0) is the DESCENDING [1, 0] and slice(_, 0, n) throws, so
    without it one short doc crashes the whole query)."""
    c = tokens_col_name
    return F.expr(
        f"case when size({c}) >= {n} then "
        f"transform(sequence(1, size({c}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({c}, i, {n}))) "
        f"else array() end"
    )


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: one row per distinct text, keeping the
    lowest doc_id (deterministic winner), with the duplicate-group size."""
    return (
        docs.withColumn("content_hash", F.md5(F.col(text_col)))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def with_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Project the token array ONCE as a real column.

    Shingling must reference a materialized array column: inlining the
    split() into the per-element slice() lambda makes Spark re-tokenize the
    text for every shingle (O(tokens^2) per doc). Catalyst does not collapse
    this projection into the consumer because the array is referenced more
    than once and split() is not cheap."""
    return docs.withColumn("toks", tokens_col(F.col(text_col)))


def doc_shingles(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct pairs."""
    return (
        with_tokens(docs, text_col)
        .select("doc_id", F.explode(shingles_expr("toks", n)).alias("shingle"))
        .distinct()
    )


def candidate_shingle_pairs(
    sh: DataFrame, hot_shingles: DataFrame | None = None
) -> DataFrame:
    """Per-pair shared-shingle counts (doc_id_a < doc_id_b, inter) from a
    self-equi-join on shingle. With ``hot_shingles`` the join EXCLUDES those
    shingles, bounding the quadratic blow-up of a boilerplate shingle (a
    df-D shingle alone emits D^2/2 pairs; no AQE setting splits a
    quadratic PAIR count, only a skewed partition)."""
    if hot_shingles is not None:
        sh = sh.join(F.broadcast(hot_shingles), "shingle", "left_anti")
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
    eager: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard >= threshold.
    Output: (doc_id_a, doc_id_b, jaccard) with doc_id_a < doc_id_b.

    ``max_shingle_df`` is the 100x-scale guard: candidate-pair GENERATION
    joins only on shingles with df <= cap, so a single hot boilerplate
    shingle shared by D docs no longer emits O(D^2) join rows (the r1
    VERDICT scale trap). Intersections stay EXACT for every generated
    candidate: shingles partition into hot/low by df, the low-df join
    counts the low share, and the hot share is added back per pair via
    array_intersect of the per-doc hot-shingle arrays (each bounded by the
    doc's length, and the GLOBAL hot set is tiny by construction --
    sum(df) <= total occurrences / cap of them). The only approximation is
    candidate RECALL: a pair sharing exclusively >cap-df shingles is not
    generated -- such a pair is boilerplate-only overlap, below any useful
    threshold at a sane cap (gated: the planted-hot-shingle test asserts
    O(docs) intermediate rows AND result equality with the exact path).

    ``None`` keeps the exact all-shingles join (small corpora / oracles).

    ``eager=True`` materializes the (small) pair set NOW via localCheckpoint
    and releases the internal shingle cache -- use when the result is kept
    around (the entry pair graph); the default lazy mode leaves the shingle
    cache alive as long as the returned frame's lineage is.
    """
    sh = doc_shingles(docs, text_col, n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    hot = None
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("sdf"))
            .filter(F.col("sdf") > max_shingle_df)
            .select("shingle")
        )
    inter = candidate_shingle_pairs(sh, hot)
    if hot is not None:
        hot_sets = (
            sh.join(F.broadcast(hot), "shingle", "left_semi")
            .groupBy("doc_id")
            .agg(F.sort_array(F.collect_set("shingle")).alias("hot_arr"))
        )
        ha = hot_sets.select(
            F.col("doc_id").alias("doc_id_a"), F.col("hot_arr").alias("hot_a")
        )
        hb = hot_sets.select(
            F.col("doc_id").alias("doc_id_b"), F.col("hot_arr").alias("hot_b")
        )
        empty = F.array().cast("array<string>")
        inter = (
            inter.join(ha, "doc_id_a", "left_outer")
            .join(hb, "doc_id_b", "left_outer")
            .withColumn(
                "inter",
                F.col("inter")
                + F.size(
                    F.array_intersect(
                        F.coalesce(F.col("hot_a"), empty),
                        F.coalesce(F.col("hot_b"), empty),
                    )
                ).cast("long"),
            )
            .drop("hot_a", "hot_b")
        )
    sa = sizes.select(
        F.col("doc_id").alias("doc_id_a"), F.col("n_sh").alias("n_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_id_b"), F.col("n_sh").alias("n_b")
    )
    out = (
        inter.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )
    if eager:
        out = out.localCheckpoint(eager=True)
        sh.unpersist()
    return out


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", num_hashes: int = 8, shingle_n: int = 0
) -> DataFrame:
    """Per-doc MinHash signature: for seed s, min over the doc's token (or
    shingle) set of md5(s || ':' || item). md5-hex min is deterministic and
    identical in Spark / DuckDB / Python, so signatures are oracle-checkable.

    Output: (doc_id, mh_0 .. mh_{num_hashes-1}) string columns.

    One Arrow-vectorized pass (mapInPandas), ZERO shuffles: a signature is
    a per-row function of the text, so the explode+distinct+groupBy plan
    (two shuffles of the exploded item stream) was pure overhead at any
    scale. Items are factorized per batch and each distinct (seed, item)
    is hashed exactly once; lexicographic min over lowercase-hex strings
    is identical to the SQL/JVM min."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    split = re.compile(r"[^a-z0-9_]+")
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)]
        + [
            T.StructField(f"mh_{s}", T.StringType(), False)
            for s in range(num_hashes)
        ]
    )

    def items_of(text: str) -> list[str]:
        toks = [t for t in split.split(text.lower()) if t]
        if shingle_n and shingle_n > 1:
            return [
                " ".join(toks[i: i + shingle_n])
                for i in range(max(len(toks) - shingle_n + 1, 0))
            ]
        return toks

    def run(batches):
        for b in batches:
            if len(b) == 0:
                continue
            doc_ids = b["doc_id"].to_numpy(np.int64)
            per_doc = [
                sorted(set(items_of(str(x)))) for x in b[text_col].fillna("")
            ]
            lens = np.fromiter((len(p) for p in per_doc), np.int64, len(per_doc))
            flat = [it for p in per_doc for it in p]
            if not flat:
                continue
            codes, uniq = pd.factorize(pd.Series(flat), sort=False)
            # hash each distinct (seed, item) once
            hmat = np.empty((num_hashes, len(uniq)), dtype="<U32")
            for s in range(num_hashes):
                pre = f"{s}:".encode("utf-8")
                hmat[s] = [
                    hashlib.md5(pre + u.encode("utf-8")).hexdigest()
                    for u in uniq
                ]
            keep = lens > 0
            doc_of = np.repeat(np.arange(len(b)), lens)
            out = {"doc_id": doc_ids[keep]}
            for s in range(num_hashes):
                mins = (
                    pd.Series(hmat[s][codes]).groupby(doc_of).min()
                )  # index = docs with >=1 item, ascending = keep order
                out[f"mh_{s}"] = mins.to_numpy()
            yield pd.DataFrame(out)

    return docs.select("doc_id", text_col).mapInPandas(run, schema=schema)


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_degree: int | None = None,
) -> DataFrame:
    """LSH candidate pairs: signature split into ``bands`` bands of
    num_hashes/bands rows; pairs sharing any band bucket are candidates.
    Output: (doc_id_a, doc_id_b, n_shared_bands).

    ``max_bucket_degree`` is the 100x-scale guard for DEGENERATE buckets
    (a boilerplate cluster of B near-identical docs shares a bucket =>
    B^2/2 pairs from one key): members are ranked by doc_id within each
    (band, bucket) and each member pairs only with its next
    ``max_bucket_degree`` successors, bounding the bucket's output at
    B * degree rows. Duplicate CLUSTERS stay discoverable through chain
    transitivity (m1-m2, m2-m3, ...); only distant same-bucket pairs in a
    pathological bucket are dropped -- for dedup that is the desired
    behavior (you keep one representative per chain anyway). ``None``
    keeps the exact all-pairs join."""
    assert num_hashes % bands == 0
    sig = minhash_signatures(docs, text_col, num_hashes, shingle_n)
    banded = band_buckets(sig, num_hashes, bands)
    return (
        _bucket_pairs(banded, ["band_idx", "bucket"], max_bucket_degree)
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def band_buckets(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """Signature frame (doc_id, mh_0..mh_{n-1}) -> exploded LSH band
    buckets (doc_id, band_idx, bucket) with bucket = md5 of the band's
    '|'-joined signature rows. Shared by batch candidate generation and
    incremental screening so both sides of a screen agree bit-for-bit."""
    r = num_hashes // bands
    band_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"mh_{b * r + i}") for i in range(r)])).alias(
            f"band_{b}"
        )
        for b in range(bands)
    ]
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), band_cols[b].alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band_idx", "bb.bucket")


def minhash_lsh_screen(
    new_docs: DataFrame,
    corpus_sigs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Incremental near-dup screening: which NEW docs LSH-collide with an
    EXISTING corpus whose MinHash signatures are already stored
    (minhash_signatures output persisted as a table).

    The daily-ingest shape at 100 TB: the corpus is signed ONCE (8 hex
    strings/doc, ~0.3% of text volume); each incoming batch is signed and
    banded (shuffle-free mapInPandas), then one equi-join on
    (band_idx, bucket) against the banded corpus store finds collisions --
    the corpus TEXT is never re-read. Returns
    (new_doc_id, corpus_doc_id, n_shared_bands); confirm with
    ngram_jaccard on the collided pairs only.
    """
    assert num_hashes % bands == 0
    new_banded = band_buckets(
        minhash_signatures(new_docs, text_col, num_hashes, shingle_n),
        num_hashes,
        bands,
    ).withColumnRenamed("doc_id", "new_doc_id")
    corpus_banded = band_buckets(corpus_sigs, num_hashes, bands).withColumnRenamed(
        "doc_id", "corpus_doc_id"
    )
    return (
        new_banded.join(corpus_banded, ["band_idx", "bucket"])
        .groupBy("new_doc_id", "corpus_doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_bands"))
    )


def _bucket_pairs(
    members: DataFrame, bucket_cols: list[str], max_degree: int | None
) -> DataFrame:
    """(doc_id, *bucket_cols) -> (doc_id_a < doc_id_b) same-bucket pairs.
    With ``max_degree`` each member pairs only with its ``max_degree``
    doc_id-ordered successors (rank window, one shuffle) -- the degenerate-
    bucket guard shared by the MinHash-LSH and embedding-LSH joins."""
    from pyspark.sql import Window

    if max_degree is not None:
        w = Window.partitionBy(*bucket_cols).orderBy("doc_id")
        members = members.withColumn("_r", F.row_number().over(w))
    a, b = members.alias("a"), members.alias("b")
    cond = F.lit(True)
    for c in bucket_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    cond = cond & (F.col("a.doc_id") < F.col("b.doc_id"))
    if max_degree is not None:
        cond = cond & (F.col("b._r") - F.col("a._r") <= max_degree)
    return a.join(b, cond).select(
        F.col("a.doc_id").alias("doc_id_a"),
        F.col("b.doc_id").alias("doc_id_b"),
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star contraction step (Kiveris et al., "Connected Components
    in MapReduce and Beyond", alg. 2): every node connects its STRICTLY
    LARGER neighbors to the minimum of its neighborhood (incl. itself)."""
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    m = F.least(F.col("u"), F.col("mv"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star contraction step: edges orient toward the larger
    endpoint; every node connects its smaller-or-equal neighborhood
    (incl. itself) to the neighborhood minimum."""
    d = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = d.groupBy("u").agg(F.min("v").alias("m"))  # m < u always
    return (
        d.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(mins.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_a: str = "doc_id_a",
    id_b: str = "doc_id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Duplicate-cluster assignment: connected components over a near-dup
    pair graph, cluster_id = the smallest doc_id in the component (the
    deterministic "keep one representative" rule, generalizing
    exact_dedup's min-doc_id winner to TRANSITIVE duplicate chains --
    result-dedup clusters, `Msg40.cpp:1173-1300` A5 taken to its corpus
    conclusion). Output: (doc_id, cluster_id) for every node.

    Alternating large-star / small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond"): O(log^2 n) rounds on
    ANY graph shape -- a duplicate chain of length L needs ~log L rounds
    where min-label propagation needed L (the r2 silent-split failure on
    >max_iter chains). Each round is two groupBy+join star steps; the
    convergence check is FOLDED into the round's aggregation (count +
    order-independent hash of the edge set computed on the same persisted
    frame -- no separate compare-join job). Non-convergence at max_iter
    raises instead of silently returning split clusters."""
    e = (
        edges.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev_sig = None
    converged = False
    for _ in range(max_iter):
        # localCheckpoint TRUNCATES the lineage each round: a star round
        # references its input several times (self-join + union), so plain
        # persist() grows the logical plan exponentially across rounds and
        # melts the driver after ~15 iterations -- the classic iterative-
        # algorithm failure. The checkpoint materializes under the same
        # action as the convergence signature.
        nxt = _small_star(_large_star(e)).localCheckpoint(eager=False)
        # one action: materialize + convergence signature (count and an
        # order-independent XOR of per-edge hashes -- edges are distinct,
        # so set equality <=> signature equality up to hash collision)
        row = nxt.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        sig = (int(row["n"] or 0), int(row["h"] or 0))
        e = nxt
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged and prev_sig is not None and prev_sig[0] > 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "alternating rounds -- graph is adversarial beyond the bound; "
            "raise max_iter"
        )
    # converged: the edge set is a star forest (u -> component min)
    lbl = e.groupBy("u").agg(F.min("v").alias("_lbl")).select(
        F.col("u").alias("doc_id"), "_lbl"
    )
    labels = nodes.select("doc_id").join(lbl, "doc_id", "left_outer").select(
        "doc_id",
        F.least(
            F.col("doc_id"), F.coalesce(F.col("_lbl"), F.col("doc_id"))
        ).alias("cluster_id"),
    )
    return labels


def cluster_representatives(
    docs: DataFrame,
    labels: DataFrame,
    prefer_col: str | None = None,
) -> DataFrame:
    """One surviving document per duplicate cluster.

    Clustering (connected_components) says WHICH docs are duplicates; a
    training pipeline must then pick WHICH copy survives. ``labels`` is
    the (doc_id, cluster_id) frame; the survivor per cluster is the row
    with the highest ``prefer_col`` (quality score, length, recency —
    NULLs lose), ties and prefer_col=None broken by lowest doc_id, so
    selection is deterministic and rebuild-stable. Returns the surviving
    docs' full rows plus (cluster_id, cluster_size). Docs absent from
    ``labels`` are dropped (pass connected_components' all-nodes labeling
    to keep singletons — their only row wins trivially).

    Scale shape: ONE shuffle on cluster_id; the size count and the
    survivor window share that partitioning, and nothing reaches the
    driver. The reference applies the same min-docid winner rule
    per-result-page (`Msg40.cpp:1173-1300`, A5); prefer_col generalizes
    it to quality-aware corpus dedup.
    """
    from pyspark.sql import Window

    joined = docs.join(labels.select("doc_id", "cluster_id"), "doc_id")
    order = [F.asc("doc_id")]
    if prefer_col is not None:
        order.insert(0, F.desc_nulls_last(prefer_col))
    w = Window.partitionBy("cluster_id").orderBy(*order)
    ws = Window.partitionBy("cluster_id")
    return (
        joined.withColumn(
            "cluster_size", F.count(F.lit(1)).over(ws).cast("long")
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc, token hash = first 16 hex chars of md5(token)
    (bit i = bit i%4 of hex nibble 15 - i//4), weighted by tf.

    Output: (doc_id, simhash long). The md5 basis (not a JVM-only hash)
    makes the operator reproducible in ANY engine -- the DuckDB oracle
    computes the identical value, so simhash is hash-match gated, and
    property tests additionally check the similarity-preservation contract.

    One Arrow-vectorized pass per batch (mapInPandas): tokenize, md5 each
    DISTINCT token once (token reuse within a batch is high), unpack the
    64-bit prefix into a bit matrix, accumulate tf-weighted +-1 per bit
    with np.add.at, take signs. Replaces a 64-conditional-sum JVM
    aggregation (~2x wall) and needs no shuffle at all: simhash is a
    per-row function of the text."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    split = re.compile(r"[^a-z0-9_]+")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("simhash", T.LongType(), False),
        ]
    )

    def run(batches):
        weights = (1 << np.arange(63, dtype=np.uint64)).astype(np.uint64)
        for b in batches:
            if len(b) == 0:
                continue
            doc_ids = b["doc_id"].to_numpy(np.int64)
            toks_per_doc = [
                [t for t in split.split(str(x).lower()) if t]
                for x in b[text_col].fillna("")
            ]
            lens = np.fromiter(
                (len(t) for t in toks_per_doc), np.int64, len(toks_per_doc)
            )
            flat = [t for ts in toks_per_doc for t in ts]
            if not flat:
                continue
            codes, uniq = pd.factorize(pd.Series(flat), sort=False)
            # md5 prefix -> 64xU matrix of bits, hashed once per DISTINCT token
            hvals = np.fromiter(
                (
                    int(hashlib.md5(u.encode("utf-8")).hexdigest()[:16], 16)
                    for u in uniq
                ),
                np.uint64,
                len(uniq),
            )
            bits = (
                (hvals[None, :] >> np.arange(64, dtype=np.uint64)[:, None]) & 1
            ).astype(np.int64)  # (64, n_uniq)
            pm = 2 * bits - 1  # +-1 per (bit, uniq token)
            doc_of = np.repeat(np.arange(len(b)), lens)
            acc = np.zeros((len(b), 64), dtype=np.int64)
            np.add.at(acc, doc_of, pm[:, codes].T)
            keep = lens > 0
            sign = (acc[keep] > 0).astype(np.uint64)
            low = (sign[:, :63] * weights[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            out = low.view(np.int64) + np.where(
                sign[:, 63] == 1, np.int64(-(1 << 63)), np.int64(0)
            )
            yield pd.DataFrame({"doc_id": doc_ids[keep], "simhash": out})

    return docs.select("doc_id", text_col).mapInPandas(run, schema=schema)


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def substring_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 8,
    min_run: int = 16,
    max_gram_df: int | None = 20,
    max_gram_occ: int | None = None,
    eager: bool = False,
) -> DataFrame:
    """Exact-substring duplication detector: doc pairs sharing a contiguous
    token run of >= ``min_run`` tokens, with the exact longest shared run.

    Completes the dedup suite for training pipelines: Jaccard/MinHash/SimHash
    measure SET overlap, so a short verbatim passage (a quoted paragraph, a
    copied license block, an eval prompt embedded in a much larger document)
    inside two otherwise-different docs scores near zero on all of them.
    Substring-level dedup is the standard countermeasure (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", which dedups
    on 50-token runs); the reference's own serve-time dedup is similarity-
    based (`Msg40.cpp:1173-1300`), so this is pipeline-side scope.

    Instead of a distributed suffix array, the plan is join-native Spark:

    1. positional n-grams: (doc_id, pos, gram) via one posexplode of the
       shingle array -- positions, unlike the Jaccard path, are kept.
    2. df cap: grams present in > ``max_gram_df`` docs are dropped (the
       same quadratic-pair-bomb guard as ngram_jaccard_pairs: a df-D join
       key emits D^2 pair rows; a >cap-df gram is boilerplate phrasing).
       Because positions are kept, the join is also quadratic in a gram's
       OCCURRENCE count, and intra-doc repetition evades a docs-only cap
       (a token repeated 10k times in 2 docs is df=2 but 10^8 join rows),
       so ``max_gram_occ`` (default ``8 * max_gram_df``) additionally
       drops grams whose TOTAL occurrence count exceeds it, bounding join
       rows per gram at max_gram_occ^2. A run whose EVERY n-gram is
       capped is invisible -- degenerate repetition is precisely the
       boilerplate this screen should ignore; a run containing at least
       one surviving gram is still found (see the exactness note below
       for how the caps can shorten its REPORTED length).
    3. equi-join on gram with doc_id_a < doc_id_b -> (a, b, pos_a, diag)
       where diag = pos_a - pos_b: a shared run lies on ONE diagonal.
    4. gaps-and-islands per (a, b, diag): island id = pos_a - row_number()
       (pos_a is unique within a diagonal: pos_b = pos_a - diag), so L
       consecutive matching grams -> one island -> run of L + n - 1 tokens.
    5. max island per pair, filtered to >= min_run.

    Exactness: with ``max_gram_df=None`` the result is exactly the longest
    common token substring for every pair where it is >= max(min_run, n)
    (gated against a brute-force DP in tests; ``max_gram_occ`` is ignored
    when max_gram_df is None). With caps, a diagonal that LOSES an
    interior gram splits into two islands and the run under-reports --
    conservative in the safe direction for a screen whose failure mode
    should be a missed dup, never a phantom one; the oracle query runs the
    capped computation verbatim so parity is exact.

    ``eager=True`` materializes the (small) pair set NOW via
    localCheckpoint and releases the internal positional-gram cache (same
    contract as ngram_jaccard_pairs); the default lazy mode leaves the
    cache alive as long as the returned frame's lineage is.

    Scale notes (100 TB): one wide shuffle on gram (df- AND
    occurrence-capped keys, so no hot key by construction), then shuffles
    keyed by (pair, diag) and pair -- both quadratic-free after the caps.
    No Python anywhere; the window is a single int comparison per row.
    Returns (doc_id_a, doc_id_b, longest_run) -- run length in TOKENS.
    """
    from pyspark.sql.window import Window

    g = with_tokens(docs, text_col).select(
        "doc_id",
        F.posexplode(shingles_expr("toks", n)).alias("pos", "gram"),
    )
    cached = None
    if max_gram_df is not None:
        if max_gram_occ is None:
            max_gram_occ = 8 * max_gram_df
        cached = g.persist()
        hot = (
            cached.groupBy("gram")
            .agg(
                F.countDistinct("doc_id").alias("gdf"),
                F.count(F.lit(1)).alias("gocc"),
            )
            .filter(
                (F.col("gdf") > max_gram_df) | (F.col("gocc") > max_gram_occ)
            )
            .select("gram")
        )
        g = cached.join(F.broadcast(hot), "gram", "left_anti")
    a = g.select(
        F.col("doc_id").alias("doc_id_a"), F.col("pos").alias("pa"), "gram"
    )
    b = g.select(
        F.col("doc_id").alias("doc_id_b"), F.col("pos").alias("pb"), "gram"
    )
    m = (
        a.join(b, "gram")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select(
            "doc_id_a",
            "doc_id_b",
            "pa",
            (F.col("pa") - F.col("pb")).alias("diag"),
        )
    )
    w = Window.partitionBy("doc_id_a", "doc_id_b", "diag").orderBy("pa")
    runs = (
        m.withColumn("island", F.col("pa") - F.row_number().over(w))
        .groupBy("doc_id_a", "doc_id_b", "diag", "island")
        .agg((F.count(F.lit(1)) + F.lit(n - 1)).alias("run_tokens"))
    )
    out = (
        runs.groupBy("doc_id_a", "doc_id_b")
        .agg(F.max("run_tokens").alias("longest_run"))
        .filter(F.col("longest_run") >= min_run)
    )
    if eager:
        # checkpoint whenever eager was asked for -- uncapped runs have no
        # internal cache but the caller's contract (materialize NOW, input
        # may be mutated/unpersisted after) is the same
        out = out.localCheckpoint()
        if cached is not None:
            cached.unpersist()
    return out
