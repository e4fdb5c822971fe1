"""Dedup-suite gates: the hot-shingle cap keeps ngram_jaccard_pairs exact
while bounding the candidate join to O(docs) rows under a planted
boilerplate shingle; SimHash preserves similarity ordering; MinHash-LSH
banding surfaces genuine near-dups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators import dedup


def _corpus(spark, n_docs: int = 300):
    """Every doc shares one boilerplate trigram (the hot-shingle bomb);
    otherwise unique text -- except doc 1 is a near-dup of doc 0."""
    rows = []
    base = "alpha beta gamma "  # df = n_docs shingle once tokenized
    for i in range(n_docs):
        body = " ".join(f"tok{i}x{j} tok{i}y{j} tok{i}z{j}" for j in range(6))
        rows.append((i, base + body))
    # near-dup pair: doc 1 copies doc 0's body with one token changed
    rows[1] = (1, rows[0][1].replace("tok0x5", "changed"))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def docs(spark):
    return _corpus(spark).persist()


def test_hot_shingle_cap_bounds_candidate_join(spark, docs):
    sh = dedup.doc_shingles(docs, "text", 3)
    n_docs = docs.count()
    uncapped = dedup.candidate_shingle_pairs(sh).count()
    # every doc pair shares the boilerplate shingles -> quadratic
    assert uncapped >= n_docs * (n_docs - 1) / 2
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("sdf"))
        .filter(F.col("sdf") > 20)
        .select("shingle")
    )
    capped = dedup.candidate_shingle_pairs(sh, hot).count()
    # with the bomb defused, candidates are only genuinely-overlapping docs
    assert capped <= 4 * n_docs


def test_capped_jaccard_equals_exact(spark, docs):
    exact = {
        (r["doc_id_a"], r["doc_id_b"]): round(r["jaccard"], 9)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.25).collect()
    }
    capped = {
        (r["doc_id_a"], r["doc_id_b"]): round(r["jaccard"], 9)
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.25, max_shingle_df=20
        ).collect()
    }
    assert exact == capped
    assert (0, 1) in capped  # the planted near-dup survives with exact J


def test_simhash_similarity_ordering(spark):
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = a.replace("lazy", "sleepy")  # near-dup
    c = "entirely different words about spark shuffles and posting lists"
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "doc_id long, text string"
    )
    sims = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(df).collect()}
    d_ab = bin((sims[0] ^ sims[1]) & ((1 << 64) - 1)).count("1")
    d_ac = bin((sims[0] ^ sims[2]) & ((1 << 64) - 1)).count("1")
    assert d_ab < d_ac
    assert d_ab <= 16  # near-identical docs land within a small radius


def test_degenerate_bucket_degree_cap(spark):
    # 200 IDENTICAL docs share every band bucket: all-pairs would emit
    # 200*199/2 = 19900 rows per band; the degree cap bounds it at
    # ~200*degree while the duplicate CLUSTER stays connected as a chain
    n = 200
    df = spark.createDataFrame(
        [(i, "same boilerplate text repeated through the corpus here")
         for i in range(n)],
        "doc_id long, text string",
    )
    capped = dedup.minhash_lsh_candidates(
        df, num_hashes=8, bands=4, shingle_n=3, max_bucket_degree=3
    ).collect()
    assert len(capped) <= n * 3
    # chain connectivity: union-find over emitted pairs keeps ONE cluster
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in capped:
        a, b = find(int(r["doc_id_a"])), find(int(r["doc_id_b"]))
        parent[a] = b
    assert len({find(i) for i in range(n)}) == 1


def test_neardup_bucket_degree_cap(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.standard_normal(16)
    rows = [(i, [float(x) for x in base]) for i in range(100)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from open_source_search_engine_spark.operators import similarity

    capped = similarity.pairwise_cosine_neardup(
        emb, threshold=0.99, n_planes=4, max_bucket_degree=2
    ).collect()
    assert 0 < len(capped) <= 100 * 2
    for r in capped:
        assert r["cosine"] >= 0.99


def test_connected_components_chain_and_singletons(spark):
    nodes = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    # chain 0-1-2-3, pair 5-6, singletons 4 and 7
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 6)], "doc_id_a long, doc_id_b long"
    )
    got = {
        int(r["doc_id"]): int(r["cluster_id"])
        for r in dedup.connected_components(edges, nodes).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 7}


def test_connected_components_long_chain_converges_fast(spark):
    """The large-star/small-star contraction handles a 10k-node chain --
    the shape that silently split under 20 rounds of min-label propagation
    (O(diameter)) -- inside the default round budget (O(log^2 n))."""
    n = 10_000
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_id_a long, doc_id_b long"
    )
    got = dedup.connected_components(edges, nodes, max_iter=30)
    assert (
        got.filter(F.col("cluster_id") != 0).count() == 0
    )  # one component, min-label 0


def test_connected_components_two_components_and_star(spark):
    nodes = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    # star centered at 9 (out-of-order ids) + triangle 2-5-7 + singletons
    edges = spark.createDataFrame(
        [(9, 11), (9, 3), (9, 10), (2, 5), (5, 7), (2, 7)],
        "doc_id_a long, doc_id_b long",
    )
    got = {
        int(r["doc_id"]): int(r["cluster_id"])
        for r in dedup.connected_components(edges, nodes).collect()
    }
    assert got == {
        0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 2, 6: 6,
        7: 2, 8: 8, 9: 3, 10: 3, 11: 3,
    }


def test_lang_id_breadth(spark):
    """Extended language ID (X11): marker votes for ~13 Latin-script
    languages + script-range detection for 9 non-Latin scripts, kana
    winning over the shared CJK-ideograph range."""
    from open_source_search_engine_spark.operators import text_analysis

    rows = [
        (0, "the cat is on the mat and it is fine"),          # en
        (1, "der hund ist nicht mit der katze"),               # de
        (2, "il gatto che non sono per la casa della nonna"),  # it
        (3, "het is een huis van de straat niet dat"),         # nl
        (4, "och det som jag inte har den med ett hus"),       # sv
        (5, "yang dan di untuk dengan tidak ini itu"),         # id
        (6, "bir ve bu ile olarak ancak gibi daha"),           # tr
        (7, "nie jest czy tak ale jak przez tego"),            # pl
        (8, "这是中文文本"),                                     # zh: ideographs only
        (9, "これは日本語のテキストです 漢字もある"),              # ja: kana beats kanji
        (10, "한국어 텍스트입니다"),                              # ko
        (11, "это русский текст"),                             # ru
        (12, "αυτό είναι ελληνικό κείμενο"),                   # el
        (13, "هذا نص عربي"),                                   # ar
        (14, "זהו טקסט בעברית"),                               # he
        (15, "यह हिंदी पाठ है"),                                # hi
        (16, "นี่คือข้อความภาษาไทย"),                            # th
        (17, "xyzzy qwerty zzz"),                              # und
    ]
    expect = {
        0: "en", 1: "de", 2: "it", 3: "nl", 4: "sv", 5: "id", 6: "tr",
        7: "pl", 8: "zh", 9: "ja", 10: "ko", 11: "ru", 12: "el",
        13: "ar", 14: "he", 15: "hi", 16: "th", 17: "und",
    }
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = text_analysis.lang_id(docs).collect()
    got = {int(r["doc_id"]): r["lang_pred"] for r in out}
    assert got == expect
    # confidence margin (CLD2-style, r4 VERDICT task 9): best marker hits
    # minus runner-up. Clear-language docs separate; no-hit docs sit at 0.
    marg = {int(r["doc_id"]): int(r["lang_margin"]) for r in out}
    assert marg[0] > 0 and marg[1] > 0
    assert marg[17] == 0
    assert all(m >= 0 for m in marg.values())


def test_doc_keywords_rank_order(spark):
    from open_source_search_engine_spark.operators import text_analysis

    df = spark.createDataFrame(
        [
            (0, "apple apple apple banana common common"),
            (1, "banana banana cherry common common"),
            (2, "cherry common common common"),
        ],
        "doc_id long, text string",
    )
    rows = text_analysis.doc_keywords(df, top_k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(int(r["doc_id"]), []).append(r["term"])
    # 'common' appears everywhere -> idf = ln(1) = 0 -> never a keyword
    assert by_doc[0][0] == "apple"
    assert by_doc[1][0] == "banana"
    assert by_doc[2][0] == "cherry"
    for terms in by_doc.values():
        assert "common" not in terms[:1]


def test_lsh_candidates_surface_neardups(spark, docs):
    # r=1 rows/band: P(candidate) = 1 - (1-J)^bands ~ 1 for J ~ 0.8
    cands = dedup.minhash_lsh_candidates(
        docs, num_hashes=8, bands=8, shingle_n=3
    ).collect()
    pairs = {(r["doc_id_a"], r["doc_id_b"]) for r in cands}
    assert (0, 1) in pairs


def test_minhash_lsh_screen_incremental(spark):
    from open_source_search_engine_spark.operators import dedup

    base = ("the quick brown fox jumps over the lazy dog while the "
            "merge sort runs in the background of the spark cluster today")
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different content about event windows "
                        "and session gaps in the streaming pipeline")],
        ["doc_id", "text"],
    )
    new_batch = spark.createDataFrame(
        [(100, base + " extra"),  # near-copy of corpus doc 1
         (101, "fresh unrelated material mentioning nothing shared at all "
               "with anything stored before")],
        ["doc_id", "text"],
    )
    sigs = dedup.minhash_signatures(corpus, num_hashes=8, shingle_n=3)
    hits = dedup.minhash_lsh_screen(
        new_batch, sigs, num_hashes=8, bands=4, shingle_n=3
    ).collect()
    pairs = {(r["new_doc_id"], r["corpus_doc_id"]) for r in hits}
    assert (100, 1) in pairs
    assert all(n != 101 for n, _ in pairs)
    # screening equals what full batch candidates would find across the split
    both = corpus.unionByName(new_batch)
    full = dedup.minhash_lsh_candidates(
        both, num_hashes=8, bands=4, shingle_n=3
    ).collect()
    cross = {(b, a) for r in full
             for a, b in [(r["doc_id_a"], r["doc_id_b"])] if a < 100 <= b}
    assert pairs == cross


def test_cluster_representatives_quality_aware(spark):
    from open_source_search_engine_spark.operators.dedup import (
        cluster_representatives,
    )

    docs = spark.createDataFrame(
        [(1, 10, "a"), (2, 30, "b"), (3, 30, "c"), (4, 5, "d"), (9, 7, "e")],
        "doc_id long, quality long, text string",
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (9, 9)], "doc_id long, cluster_id long"
    )
    surv = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in cluster_representatives(
            docs, labels, prefer_col="quality"
        ).collect()
    }
    # cluster 1: quality tie 30/30 between docs 2 and 3 -> lowest doc_id
    assert surv == {2: (1, 3), 4: (4, 1), 9: (9, 1)}
    # prefer_col=None falls back to the min-doc_id winner (A5's rule)
    surv2 = {
        r["doc_id"]
        for r in cluster_representatives(docs, labels).collect()
    }
    assert surv2 == {1, 4, 9}
