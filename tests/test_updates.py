"""Incremental update/delete gates (SURVEY.md O6 / §2.9): after upserts and
deletes, queries are rank-identical to a FRESH build of the edited corpus --
both before compaction (tombstone-filtered read) and after (physical
annihilation). term_stats maintained by delta must equal a full recount."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.catalog import Catalog
from open_source_search_engine_spark.operators.index_build import (
    build_index,
    transcripts_to_docs,
)
from open_source_search_engine_spark.operators.query import SearchEngine
from open_source_search_engine_spark.operators.updates import (
    apply_updates,
    compact_updates,
)
from open_source_search_engine_spark.operators.wand import wand_search
from open_source_search_engine_spark.sources.transcripts import synth_transcripts

N_TURNS = 600

QUERIES = [
    (["spark", "index"], "AND", 10),
    (["the", "to", "spark"], "OR", 25),
    (["freshterm_qq"], "AND", 10),
    (["rareterm_xyzzy"], "OR", 10),
]


def _topk(spark, catalog, terms, mode, k):
    eng = SearchEngine(spark, catalog)
    return [
        (int(r["doc_id"]), float(r["score"]))
        for r in eng.search_terms(terms, mode, k).collect()
    ]


@pytest.fixture(scope="module")
def corpora(spark):
    """(original docs, edited docs, upserts, delete_ids)."""
    base = transcripts_to_docs(synth_transcripts(spark, N_TURNS)).withColumn(
        "text", F.col("text")
    )
    # edits: docs with turn_idx==2 get new text (incl. a brand-new term);
    # docs with turn_idx==5 are deleted; 3 brand-new docs are added
    changed = base.filter(F.col("turn_idx") == 2).withColumn(
        "text", F.concat(F.lit("freshterm_qq updated body "), F.col("text"))
    )
    new_rows = spark.createDataFrame(
        [
            ("conv-new-1", 0, "user", "freshterm_qq brand new turn", None),
            ("conv-new-1", 1, "assistant", "spark index fresh reply", None),
            ("conv-new-2", 0, "user", "totally novel words here", None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.lit("2026-01-01 00:00:00").cast("timestamp"))
    new_docs = transcripts_to_docs(new_rows.select(base.drop("doc_id").columns))
    upserts = changed.unionByName(new_docs)
    delete_src = base.filter(F.col("turn_idx") == 5)
    edited = (
        base.filter(~F.col("turn_idx").isin(2, 5))
        .unionByName(changed)
        .unionByName(new_docs)
    )
    return base, edited, upserts, delete_src.select("doc_id")


@pytest.fixture(scope="module")
def expected_catalog(spark, tmp_path_factory, corpora):
    _, edited, _, _ = corpora
    cat = Catalog(spark, str(tmp_path_factory.mktemp("upd-expected")))
    build_index(spark, cat, edited)
    return cat


@pytest.fixture(scope="module")
def updated_catalog(spark, tmp_path_factory, corpora):
    base, _, upserts, delete_ids = corpora
    cat = Catalog(spark, str(tmp_path_factory.mktemp("upd-live")))
    build_index(spark, cat, base)
    res = apply_updates(spark, cat, upserts=upserts, delete_ids=delete_ids)
    assert res["seg_seq"] == 1
    return cat


@pytest.mark.parametrize("terms,mode,k", QUERIES)
def test_updates_visible_before_compaction(
    spark, updated_catalog, expected_catalog, terms, mode, k
):
    got = _topk(spark, updated_catalog, terms, mode, k)
    want = _topk(spark, expected_catalog, terms, mode, k)
    assert got == want


def test_wand_respects_tombstones(spark, updated_catalog, expected_catalog):
    eng = SearchEngine(spark, updated_catalog)
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in wand_search(eng, ["spark", "index"], "AND", 10).collect()
    ]
    assert got == _topk(spark, expected_catalog, ["spark", "index"], "AND", 10)


def test_term_stats_delta_exact(spark, updated_catalog, expected_catalog):
    a = {
        r["term"]: (r["df"], r["cf"])
        for r in updated_catalog.read_table("term_stats").collect()
    }
    b = {
        r["term"]: (r["df"], r["cf"])
        for r in expected_catalog.read_table("term_stats").collect()
    }
    assert a == b


def test_route_tombstones_routing_is_exact(spark):
    """route_tombstones: every (doc, granularity) pair lands in exactly one
    block row, and the block_id equals the build combiner's routing hash
    (top salt_bits bits of the splitmix doc hash)."""
    import numpy as np

    from open_source_search_engine_spark.functions.hashing import py_block_ids
    from open_source_search_engine_spark.operators.resumable import (
        route_tombstones,
    )

    tombs = spark.createDataFrame(
        [(int(d), 3) for d in range(0, 5000, 7)], "doc_id long, upto_seq long"
    )
    routed = route_tombstones(tombs, [0, 5, 12]).collect()
    seen: dict[tuple[int, int], int] = {}
    for r in routed:
        s, bid = int(r["salt_bits"]), int(r["block_id"])
        for t in r["tombs"]:
            d = int(t["doc_id"])
            assert (d, s) not in seen
            seen[(d, s)] = bid
            h = int(py_block_ids(np.array([d], dtype=np.int64), 0)[0])
            assert bid == (h >> (63 - s)) if s else bid == 0
    assert len(seen) == 3 * len(range(0, 5000, 7))


def test_mass_tombstone_compaction(spark, tmp_path_factory):
    """Planted mass-deletion gate: half the corpus tombstoned in one
    update, then compacted -- the tombstones flow through the distributed
    (salt_bits, block_id) join (route_tombstones), never a driver dict,
    and the compacted index is rank-identical to a fresh build of the
    surviving corpus."""
    n = 20_000
    docs = transcripts_to_docs(synth_transcripts(spark, n))
    cat = Catalog(spark, str(tmp_path_factory.mktemp("mass-live")))
    build_index(spark, cat, docs)
    delete_ids = docs.filter(F.col("turn_idx") % 2 == 0).select("doc_id")
    n_del = delete_ids.count()
    assert n_del > 5_000
    apply_updates(spark, cat, delete_ids=delete_ids)
    assert compact_updates(spark, cat) == n_del
    cold = Catalog(spark, str(tmp_path_factory.mktemp("mass-cold")))
    build_index(
        spark, cold, docs.filter(F.col("turn_idx") % 2 != 0)
    )
    for terms, mode, k in QUERIES[:2]:
        assert _topk(spark, cat, terms, mode, k) == _topk(
            spark, cold, terms, mode, k
        )


def test_compaction_annihilates(spark, updated_catalog, expected_catalog):
    n = compact_updates(spark, updated_catalog)
    assert n > 0
    # tombstones cleared; single row per (term, block); queries unchanged
    assert (
        updated_catalog.read_table("tombstones").count() == 0
    )
    dup = (
        updated_catalog.read_table("postings")
        .groupBy("term_id", "salt_bits", "block_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    for terms, mode, k in QUERIES:
        assert _topk(spark, updated_catalog, terms, mode, k) == _topk(
            spark, expected_catalog, terms, mode, k
        )


def test_lifecycle_delete_readd_cycles_match_fresh_builds(
    spark, tmp_path_factory, corpora
):
    """The reference's Posdb lifecycle matrix (PosdbTest.cpp:248-441,
    SingleDocSpiderDelete / SpiderDumpDelete / SpiderDumpDeleteDumpSpider
    ...): a doc deleted, compacted away, RE-ADDED under the same key with
    new text, compacted again, then deleted once more must serve queries
    rank-identically to a fresh build of the equivalent corpus at EVERY
    step -- resurrection across compaction boundaries is the case a
    tombstone implementation gets wrong."""
    base, *_ = corpora
    victim = base.orderBy("doc_id").limit(1)
    vrow = victim.collect()[0]
    vid = int(vrow["doc_id"])
    rest = base.filter(F.col("doc_id") != vid)

    cat = Catalog(spark, str(tmp_path_factory.mktemp("lifecycle")))
    build_index(spark, cat, base)
    probe = ([vrow["text"].split()[0].lower(), "the"], "OR", 15)

    def expect(docs):
        ecat = Catalog(spark, str(tmp_path_factory.mktemp("lifecycle-exp")))
        build_index(spark, ecat, docs)
        return _topk(spark, ecat, *probe)

    # 1: delete, pre-compaction (Spider -> Delete)
    apply_updates(spark, cat, delete_ids=victim.select("doc_id"))
    want_without = expect(rest)
    assert _topk(spark, cat, *probe) == want_without
    # 2: compact the deletion away (Dump)
    compact_updates(spark, cat)
    assert _topk(spark, cat, *probe) == want_without
    # 3: re-add the SAME doc_id with new text (DeleteDumpSpider)
    revived = victim.withColumn(
        "text", F.concat(F.lit("revived_zz body "), F.col("text"))
    )
    apply_updates(spark, cat, upserts=revived)
    want_revived = expect(rest.unionByName(revived))
    assert _topk(spark, cat, *probe) == want_revived
    assert _topk(spark, cat, ["revived_zz"], "AND", 5) == _topk_of(
        spark, cat, vid
    )
    # 4: compact the resurrection (DumpSpiderDump)
    compact_updates(spark, cat)
    assert _topk(spark, cat, *probe) == want_revived
    # 5: delete it AGAIN post-compaction and verify it is really gone
    apply_updates(spark, cat, delete_ids=victim.select("doc_id"))
    assert _topk(spark, cat, *probe) == want_without
    assert _topk(spark, cat, ["revived_zz"], "AND", 5) == []


def test_auto_compaction_policy(spark, tmp_path_factory, corpora):
    """r4 VERDICT task 4 — the reference fires merges ITSELF at minToMerge
    files (`Rdb.h:279`, `Rdb.cpp:41` attemptMergeAll); callers never
    schedule them. Interleave M update batches under
    IndexConfig(min_to_merge=3) and assert (a) the live segment count
    stays < 3 after every batch (the policy fires inside apply_updates),
    (b) at least one auto-compaction actually fired, and (c) after every
    batch queries are rank-identical to a FRESH build of the current
    corpus — auto-firing mid-stream changes nothing observable."""
    from open_source_search_engine_spark.operators.index_build import (
        IndexConfig,
    )
    from open_source_search_engine_spark.operators.updates import (
        live_segments,
    )

    base, *_ = corpora
    cfg = IndexConfig(min_to_merge=3)
    cat = Catalog(spark, str(tmp_path_factory.mktemp("autocompact")))
    build_index(spark, cat, base, cfg)
    assert live_segments(cat) == 1

    victims = [int(r["doc_id"]) for r in base.orderBy("doc_id").limit(4).collect()]
    current = base
    probe = (["spark", "the"], "OR", 15)
    fired = 0
    for i, vid in enumerate(victims):
        batch_up = current.filter(F.col("doc_id") == vid).withColumn(
            "text", F.concat(F.lit(f"autocmp_{i} edited "), F.col("text"))
        )
        res = apply_updates(spark, cat, upserts=batch_up, config=cfg)
        fired += int(res["auto_compacted"])
        assert live_segments(cat) < 3
        current = current.filter(F.col("doc_id") != vid).unionByName(batch_up)
        ecat = Catalog(spark, str(tmp_path_factory.mktemp(f"autocmp-exp{i}")))
        build_index(spark, ecat, current)
        assert _topk(spark, cat, *probe) == _topk(spark, ecat, *probe)
        assert _topk(spark, cat, [f"autocmp_{i}"], "AND", 5) == _topk(
            spark, ecat, [f"autocmp_{i}"], "AND", 5
        )
    # 4 batches under min_to_merge=3: segments go 1->2->3(fire)->1->2->3(fire)
    assert fired == 2


def _topk_of(spark, catalog, doc_id):
    eng = SearchEngine(spark, catalog)
    return [
        (int(r["doc_id"]), float(r["score"]))
        for r in eng.search_terms(["revived_zz"], "AND", 5).collect()
        if int(r["doc_id"]) == doc_id
    ]
