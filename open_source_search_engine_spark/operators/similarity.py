"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed variant is
the scale path (search only the query's hyperplane bucket ring). Both stay
JVM-side via higher-order functions (zip_with + aggregate) -- no UDF for the
dot product; the random hyperplanes are seeded numpy constants folded into
the plan as literals.

Scale notes: brute force is a single scan + TakeOrderedAndProject (partial
top-k per partition, tiny final merge -- same shape as the BM25 top-k);
LSH turns it into a partition-pruned scan when the table is written
bucketed/partitioned by (plane_sig).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (id, cosine) ordered cosine desc, id asc."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    cos = (_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))).alias(
        "cosine"
    )
    return (
        embeddings.select(F.col(id_col), cos)
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_signature_col(vec_col: str, planes: np.ndarray) -> Column:
    """Bit signature: bit p = 1 if dot(vec, plane_p) >= 0 (random-projection
    LSH). Returns an int column (n_planes <= 62)."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(F.col(vec_col), arr) >= 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig + bit
    return sig


def lsh_ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    max_hamming: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate NN: score only vectors whose LSH signature is within
    ``max_hamming`` bits of the query's signature, then exact cosine top-k
    on the survivors. At scale the signature is a stored/partition column
    and this becomes partition pruning instead of a computed filter."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qsig = 0
    for p, plane in enumerate(planes):
        if float(np.dot(qv, plane)) >= 0:
            qsig |= 1 << p
    sig = lsh_signature_col(vec_col, planes)
    cand = embeddings.withColumn("_sig", sig).filter(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig))) <= max_hamming
    )
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iterations: int = 2,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: k-means with hash-seeded init and
    a FIXED number of Lloyd iterations (determinism beats convergence for a
    reproducible index). Each iteration is one groupBy over cluster
    assignments -- all distributed; only (n_centroids x dim) means ever
    reach the driver."""
    # deterministic in-distribution init: the n_centroids data points with
    # the smallest seeded hash of their id (a reproducible pseudo-sample)
    seeded = (
        embeddings.select(
            F.col(vec_col),
            F.xxhash64(F.col("vec_id"), F.lit(seed)).alias("_h"),
        )
        .orderBy("_h")
        .limit(n_centroids)
        .collect()
    )
    cents = np.array(
        [[float(x) for x in r[vec_col]] for r in seeded], dtype=np.float64
    )
    n_centroids = len(cents)
    dim = cents.shape[1]
    for _ in range(iterations):
        assigned = embeddings.withColumn(
            "_c", ivf_assign_col(vec_col, cents)
        )
        sums = (
            assigned.select(
                "_c", *[F.element_at(vec_col, i + 1).cast("double").alias(f"x{i}") for i in range(dim)]
            )
            .groupBy("_c")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(f"x{i}").alias(f"s{i}") for i in range(dim)],
            )
            .collect()
        )
        new = cents.copy()
        for r in sums:
            c = int(r["_c"])
            n = int(r["n"])
            if n:
                new[c] = np.array([float(r[f"s{i}"]) for i in range(dim)]) / n
        cents = new
    return cents


def ivf_assign_col(vec_col: str, centroids: np.ndarray) -> Column:
    """Nearest-centroid id by max dot product (JVM-side expression)."""
    best_c = F.lit(0).cast("int")
    best_d = None
    for c, cent in enumerate(centroids):
        arr = F.array(*[F.lit(float(x)) for x in cent])
        d = _dot(F.col(vec_col), arr)
        if best_d is None:
            best_d = d
        else:
            cond = d > best_d
            best_c = F.when(cond, F.lit(c).cast("int")).otherwise(best_c)
            best_d = F.when(cond, d).otherwise(best_d)
    return best_c


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate NN: search only the ``n_probe`` clusters nearest the
    query, exact cosine within them. At scale the cluster id is a stored
    partition column (write once at index time), making this a
    partition-pruned scan; here it is computed inline."""
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(embeddings, n_centroids, seed=seed, vec_col=vec_col)
    )
    qv = np.asarray(query_vec, dtype=np.float64)
    order = np.argsort(-(cents @ qv))
    probe = [int(c) for c in order[:n_probe]]
    cand = embeddings.withColumn("_c", ivf_assign_col(vec_col, cents)).filter(
        F.col("_c").isin(probe)
    )
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def pairwise_cosine_neardup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket join (same signature
    bucket) then exact cosine filter. Output (id_a, id_b, cosine)."""
    first = embeddings.limit(1).select(F.size(F.col(vec_col)).alias("d")).collect()
    if not first:
        return embeddings.sparkSession.createDataFrame(
            [], f"id_a long, id_b long, cosine double"
        )
    planes = hyperplanes(int(first[0]["d"]), n_planes, seed)
    e = embeddings.withColumn("_sig", lsh_signature_col(vec_col, planes))
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(
        b,
        (F.col("a._sig") == F.col("b._sig"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    cos = _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) / (
        _norm(F.col(f"a.{vec_col}")) * _norm(F.col(f"b.{vec_col}"))
    )
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
