"""SQ8 scalar quantization gates: per-dim round-trip error bounded by half
a quantization step, degenerate (constant) dims reconstruct exactly,
brute-force recompute of the quantized codes, and recall@10 of the
asymmetric SQ8 top-k against the exact float ranking on the real testdata
embeddings."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.similarity import (
    cosine_topk,
    sq8_compress,
    sq8_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_codes_match_bruteforce_and_roundtrip_bound(spark):
    rows = [
        (1, [0.0, 5.0, -1.0, 7.0]),
        (2, [1.0, 5.0, 1.0, 7.0]),
        (3, [2.0, 5.0, 3.0, 7.0]),  # dims 1 and 3 are constant
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qdf, mn, mx = sq8_compress(df)
    assert mn == [0.0, 5.0, -1.0, 7.0] and mx == [2.0, 5.0, 3.0, 7.0]
    got = {r["vec_id"]: r["q"] for r in qdf.collect()}
    for vid, vec in rows:
        for i, x in enumerate(vec):
            s = mx[i] - mn[i]
            want = 0 if s == 0 else min(
                255, max(0, math.floor((x - mn[i]) / s * 255 + 0.5))
            )
            assert got[vid][i] == want
            # round-trip error <= half a step (exact on constant dims)
            xh = mn[i] + got[vid][i] * s / 255
            bound = 0.0 if s == 0 else s / 255 / 2 + 1e-12
            assert abs(xh - x) <= bound


def test_recall_at_10_vs_float(emb):
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 1).collect()[0]["embedding"]
    ]
    exact = {
        r["vec_id"] for r in cosine_topk(emb, qvec, 10, id_col="vec_id").collect()
    }
    qdf, mn, mx = sq8_compress(emb)
    approx = {r["vec_id"] for r in sq8_topk(qdf, qvec, mn, mx, 10).collect()}
    recall = len(exact & approx) / 10
    assert recall >= 0.8, f"SQ8 recall@10 {recall} too low"


def test_quantize_plan_is_pure_projection(emb):
    qdf, _, _ = sq8_compress(emb)
    p = qdf._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Join" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
