"""Curation-pipeline integration gate: the stages composed as a deployment
chains them, not just unit-tested in isolation.

quality gate -> repetition gate -> exact dedup -> eval decontamination ->
PII scrub -> deterministic split -> token-budget shard export.

Each planted defect must be eliminated by EXACTLY the stage built for it
(every planted doc passes all the other gates, so a kill proves the right
stage fired), the PII doc must survive with its payload scrubbed, and the
whole chain must be deterministic end to end (re-run == byte-identical
shard payloads — the property hash_split/pack_export promise individually,
asserted here through the full composition).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators import curation, dedup, text_analysis

#: doc_id -> text. Normal docs carry common words (the/and/with) so the
#: Gopher common-word rule passes, >= 10 varied tokens so the repetition
#: top-bigram share stays low, and mean token length in [3, 10].
NORMAL = {
    i: (
        f"the quick system number{i} merges sorted blocks and writes "
        "compressed output with stable ordering every run"
    )
    for i in range(1, 11)
}
DUP_TEXT = (
    "the parser and tokenizer work with deterministic unicode folding "
    "across large corpora today"
)
EVAL_TEXT = "zebra quantum falcon nebula crystal"
PLANTED = {
    20: DUP_TEXT,  # duplicate winner (lowest doc_id)
    21: DUP_TEXT,  # duplicate loser -> killed by exact dedup
    # killed by the repetition gate (top bigram "buy now" = 5/12 > 0.20);
    # passes quality (13 tokens, common words present, mean len ~3.2)
    22: "buy now buy now buy now buy now buy now the and with",
    # killed by decontamination (shares the 3-gram "zebra quantum falcon")
    23: (
        "the report mentions zebra quantum falcon and ends with "
        "summary notes attached"
    ),
    # killed by the quality gate (zero common-word hits)
    24: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    # survives, but the payload must be scrubbed
    25: (
        "the contact address is bob@example.com and support line with "
        "extra details included"
    ),
}


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, t) for i, t in {**NORMAL, **PLANTED}.items()]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def run_chain(spark, corpus):
    q = text_analysis.gopher_quality_flags(corpus, min_tokens=5).filter(
        F.col("quality_pass") == 1
    )
    r = text_analysis.repetition_flags(corpus).filter(
        F.col("repetition_pass") == 1
    )
    kept = (
        corpus.join(q.select("doc_id"), "doc_id", "left_semi")
        .join(r.select("doc_id"), "doc_id", "left_semi")
    )
    winners = dedup.exact_dedup(kept).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    kept = kept.join(winners, "doc_id", "left_semi")
    ev = spark.createDataFrame([(0, EVAL_TEXT)], ["doc_id", "text"])
    dirty = curation.contaminated_docs(kept, ev, n=3).select("doc_id")
    kept = kept.join(dirty, "doc_id", "left_anti")
    scrubbed = kept.join(
        curation.pii_scrub(kept).select("doc_id", "clean_text"), "doc_id"
    ).select("doc_id", F.col("clean_text").alias("text"))
    train = curation.hash_split(scrubbed).filter(
        F.col("split") == "train"
    ).select("doc_id", "text")
    shards = curation.pack_export(train, budget_tokens=64)
    return kept, train, shards


def test_each_stage_kills_its_planted_doc(spark, corpus):
    kept, train, shards = run_chain(spark, corpus)
    surviving = {r["doc_id"] for r in kept.collect()}
    assert 21 not in surviving  # exact dedup (loser)
    assert 20 in surviving      # exact dedup (winner)
    assert 22 not in surviving  # repetition gate
    assert 23 not in surviving  # decontamination
    assert 24 not in surviving  # quality gate
    assert 25 in surviving      # PII doc survives (it gets scrubbed)
    assert set(NORMAL) <= surviving

    # the scrub reaches the exported payload
    payload = " ".join(r["packed"] for r in shards.collect())
    assert "bob@example.com" not in payload
    assert "<EMAIL>" in payload

    # exactly-once packing of the train split
    n_train = train.count()
    assert sum(r["n_docs"] for r in shards.collect()) == n_train
    assert n_train > 0


def test_chain_is_deterministic(spark, corpus):
    _, _, s1 = run_chain(spark, corpus)
    _, _, s2 = run_chain(spark, corpus)
    a = sorted((r["shard_id"], r["packed"]) for r in s1.collect())
    b = sorted((r["shard_id"], r["packed"]) for r in s2.collect())
    assert a == b
