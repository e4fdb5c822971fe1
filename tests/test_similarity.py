"""Similarity-search gates: brute force is exact; LSH and IVF approximate
paths achieve high recall@k against it on the real embeddings testdata and
are deterministic across runs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(emb):
    return [
        float(x)
        for x in emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
    ]


def _ids(df):
    return [int(r["vec_id"]) for r in df.collect()]


def test_bruteforce_self_is_top1(emb, qvec):
    top = _ids(similarity.cosine_topk(emb, qvec, k=5))
    assert top[0] == 7


def test_lsh_recall_and_determinism(emb, qvec):
    exact = set(_ids(similarity.cosine_topk(emb, qvec, k=10)))
    a = _ids(similarity.lsh_ann_topk(emb, qvec, k=10, n_planes=12, max_hamming=4))
    b = _ids(similarity.lsh_ann_topk(emb, qvec, k=10, n_planes=12, max_hamming=4))
    assert a == b
    assert len(set(a) & exact) >= 6  # recall@10 >= 0.6 with a generous ring


def test_ivf_recall_and_determinism(emb, qvec):
    exact = set(_ids(similarity.cosine_topk(emb, qvec, k=10)))
    cents = similarity.ivf_centroids(emb, n_centroids=8, iterations=2)
    a = _ids(similarity.ivf_topk(emb, qvec, k=10, n_centroids=8, n_probe=3, centroids=cents))
    b = _ids(similarity.ivf_topk(emb, qvec, k=10, n_centroids=8, n_probe=3, centroids=cents))
    assert a == b
    assert a[0] == 7  # the query vector's own cluster is always probed
    # recall on UNSTRUCTURED synthetic embeddings is modest by nature; the
    # exactness property is the probe-all case below
    assert len(set(a) & exact) >= 3
    # probing ALL clusters must reproduce brute force exactly
    full = _ids(
        similarity.ivf_topk(emb, qvec, k=10, n_centroids=8, n_probe=8, centroids=cents)
    )
    assert full == _ids(similarity.cosine_topk(emb, qvec, k=10))


def test_neardup_pairs_symmetric_threshold(emb):
    pairs = similarity.pairwise_cosine_neardup(emb, threshold=0.99, n_planes=6)
    rows = pairs.collect()
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert r["cosine"] >= 0.99


def test_ann_recall_probe_all_is_one(emb):
    # max_hamming = n_planes admits every candidate -> approx == exact ->
    # recall must be exactly 1.0 for every probe
    rows = similarity.ann_recall(
        emb, emb, query_ids=[0, 7, 21], k=10, n_planes=12, max_hamming=12
    ).collect()
    assert [int(r["query_vec_id"]) for r in rows] == [0, 7, 21]
    assert all(r["recall"] == 1.0 and r["hits"] == 10 for r in rows)


def test_ann_recall_monotone_in_hamming(emb):
    # widening the ring can only add candidates -> recall is monotone
    def total(h):
        rows = similarity.ann_recall(
            emb, emb, query_ids=[0, 7, 21], k=10, n_planes=12, max_hamming=h
        ).collect()
        return sum(int(r["hits"]) for r in rows)

    t1, t3, t12 = total(1), total(3), total(12)
    assert t1 <= t3 <= t12 == 30


def test_ann_recall_missing_probe_id_is_skipped(emb):
    # a probe id absent from the table contributes no row (bounded probe
    # collect finds nothing); present ids are unaffected
    rows = similarity.ann_recall(
        emb, emb, query_ids=[7, 10**9], k=5, n_planes=12, max_hamming=12
    ).collect()
    assert [int(r["query_vec_id"]) for r in rows] == [7]
