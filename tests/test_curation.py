"""Curation-operator gates: boilerplate suppression (F11), word-spam rank
(W5), deterministic splits, source mixing. The oracle hash-match lives in
test_entry_oracle; these are the behavioral properties the SQL can't state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators import curation, text_analysis


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # src_a: three docs sharing a templated footer -> boilerplate
        (1, "alpha beta gamma visit our help center today", "src_a", "en"),
        (2, "delta epsilon zeta visit our help center today", "src_a", "en"),
        (3, "eta theta iota visit our help center today", "src_a", "en"),
        # src_a: clean doc, no shared fragment
        (4, "kappa lambda mu nu xi omicron pi rho", "src_a", "en"),
        # src_b: same footer text but only ONE doc -> NOT boilerplate there
        (5, "visit our help center today sigma tau", "src_b", "en"),
        # spam doc: one token stamped over and over
        (6, "spam spam spam spam spam spam spam spam", "src_b", "en"),
    ]
    return spark.createDataFrame(
        rows, ["doc_id", "text", "source", "lang"]
    ).withColumn("n_chars", F.length("text"))


def test_boilerplate_is_per_source(docs):
    boiler = curation.boilerplate_fragments(docs, n=3, min_docs=3).collect()
    assert all(r["source"] == "src_a" for r in boiler)
    shingles = {r["shingle"] for r in boiler}
    assert "visit our help" in shingles
    # src_b's single copy of the footer must not be flagged
    stats = {
        r["doc_id"]: r
        for r in curation.boilerplate_stats(docs, n=3, min_docs=3).collect()
    }
    assert stats[1]["n_boiler"] > 0 and stats[4]["n_boiler"] == 0
    assert stats[5]["n_boiler"] == 0
    # doc 3's footer fragments dominate a short doc
    assert stats[3]["boiler_ratio"] > stats[4]["boiler_ratio"]


def test_hash_split_stable_and_complete(docs):
    a = {r["doc_id"]: r["split"] for r in curation.hash_split(docs).collect()}
    # stability: a second run over a re-partitioned frame deals identically
    b = {
        r["doc_id"]: r["split"]
        for r in curation.hash_split(docs.repartition(7)).collect()
    }
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}
    with pytest.raises(ValueError):
        curation.hash_split(docs, weights={"train": 50, "val": 10})


def test_hash_split_ratio_converges(spark):
    big = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
    counts = dict(
        curation.hash_split(big)
        .groupBy("split")
        .count()
        .rdd.map(lambda r: (r["split"], r["count"]))
        .collect()
    )
    assert abs(counts["train"] / 20000 - 0.90) < 0.02
    assert abs(counts["val"] / 20000 - 0.05) < 0.01
    assert abs(counts["test"] / 20000 - 0.05) < 0.01


def test_spam_rank_extremes(docs):
    ranks = {
        r["doc_id"]: r for r in text_analysis.word_spam_rank(docs).collect()
    }
    assert ranks[6]["spam_rank"] == 10 and ranks[6]["top_term"] == "spam"
    assert ranks[4]["spam_rank"] <= 1  # all-distinct prose
    assert ranks[4]["repetition_ratio"] == 0.0


def test_source_mix_flattens(docs):
    w = {r["source"]: r for r in curation.source_mix_weights(docs).collect()}
    assert abs(sum(r["token_share"] for r in w.values()) - 1.0) < 1e-3
    # resampling by mix_weight equalizes: weight * source_tokens is constant
    eq = [r["mix_weight"] * r["source_tokens"] for r in w.values()]
    assert max(eq) / min(eq) < 1.001


def test_gopher_quality_flags(spark):
    rows = [
        # clean prose: all rules pass
        (1, "the quick brown fox jumps over the lazy dog and that is fine "
            "to say because we have many plain words with good length here "
            + "word " * 40),
        # too short
        (2, "tiny doc"),
        # bullet-dominated
        (3, "\n".join(f"- item {i} the of and that have with to be" * 1 for i in range(10))
            + "\n" + "the be to of and that have with " * 10),
        # ellipsis-heavy lines
        (4, "\n".join(f"truncated thought number {i} goes on..." for i in range(10))
            + "\n" + "the be to of and that have with " * 10),
        # symbol spam
        (5, "### " * 60 + "the be to of and have with that " * 8),
        # no common words
        (6, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
            * 10),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    f = {
        r["doc_id"]: r
        for r in text_analysis.gopher_quality_flags(docs).collect()
    }
    assert f[1]["quality_pass"] == 1
    assert f[2]["flag_n_tokens"] == 1 and f[2]["quality_pass"] == 0
    assert f[3]["flag_bullets"] == 1
    assert f[4]["flag_ellipsis"] == 1
    assert f[5]["flag_symbols"] == 1
    assert f[6]["flag_common_words"] == 1 and f[6]["quality_pass"] == 0


def test_diversity_rank_w4(spark):
    rows = [
        # 'spark' always inside the fixed phrase 'apache spark engine':
        # one predecessor, one successor over tf=3 -> diversity 2/6
        (1, "apache spark engine apache spark engine apache spark engine"),
        # 'join' in three different contexts -> diversity 1.0
        (2, "hash join fast merge join slow sort join wide"),
        # no repeated terms -> doc omitted
        (3, "all words here are completely distinct tokens"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    d = {r["doc_id"]: r for r in text_analysis.diversity_rank(docs).collect()}
    assert 3 not in d
    assert d[1]["min_div_term"] == "apache"  # ties at 0.333 break by term
    assert abs(d[1]["min_diversity"] - round(2 / 6, 4)) < 1e-9
    assert d[2]["min_div_term"] == "join"
    assert d[2]["min_diversity"] == 1.0 and d[2]["n_repeated"] == 1


def test_detect_query_language_hint_precedence():
    """Behavior table from the reference's test/system/test_search_language.py:
    explicit qlang wins; script/marker text detection next; browser lang,
    then country TLD break ties or fill in when the text is silent."""
    d = text_analysis.detect_query_language
    # explicit qlang always wins
    assert d("øl", qlang="da") == "da"
    assert d("øl", qlang="da", blang="en-US") == "da"
    assert d("the smurfs", qlang="en", blang="da-DK") == "en"
    # decisive text detection beats weaker hints
    assert d("smølferne") == "da"
    assert d("smølferne", blang="en-US") == "da"
    assert d("smølferne", country="uk") == "da"
    assert d("smurfene", blang="no-NO") == "no"
    assert d("スパーク") == "ja"
    assert d("что это") == "ru"
    # silent text falls back: blang, then country, then en
    assert d("zzqqxx", blang="da-dk") == "da"
    assert d("zzqqxx", country="no") == "no"
    assert d("zzqqxx") == "en"
    # ambiguous marker vote broken by hint ('og' votes da AND no)
    assert d("og", country="dk") == "da"
    assert d("og", blang="no-NO") == "no"


def test_contaminated_docs_flags_eval_overlap(spark):
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog", "eval", "en")],
        ["doc_id", "text", "source", "lang"],
    )
    corpus = spark.createDataFrame(
        [
            # contains the 4-gram "quick brown fox jumps" (and one more)
            (1, "note the quick brown fox jumps here", "train", "en"),
            # shares words but no 4-gram window
            (2, "brown dog and lazy fox quick jumps", "train", "en"),
            # clean
            (3, "completely unrelated transcript text body", "train", "en"),
        ],
        ["doc_id", "text", "source", "lang"],
    )
    hits = {
        r["doc_id"]: r["n_hits"]
        for r in curation.contaminated_docs(corpus, ev, n=4).collect()
    }
    assert hits == {1: 2}  # 'the quick brown fox' + 'quick brown fox jumps'


def test_contaminated_docs_plan_broadcasts_eval(spark):
    ev = spark.createDataFrame([(1, "a b c d e", "e", "en")],
                               ["doc_id", "text", "source", "lang"])
    corpus = spark.createDataFrame([(2, "a b c d e f", "t", "en")],
                                   ["doc_id", "text", "source", "lang"])
    plan = curation.contaminated_docs(corpus, ev, n=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # eval shingles never shuffle the corpus


def test_pack_shards_matches_serial_prefix_sum(spark):
    import random

    rng = random.Random(7)
    rows = [(i, " ".join(f"w{rng.randrange(50)}" for _ in range(rng.randrange(1, 40))))
            for i in range(0, 500, 3)]  # sparse doc_ids exercise the bucketing
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(16)
    budget = 100
    got = {
        r["doc_id"]: (r["n_tokens"], r["shard_id"])
        for r in curation.pack_shards(docs, budget, n_buckets=8).collect()
    }
    # serial reference: exclusive running sum in doc_id order
    running = 0
    for doc_id, text in sorted(rows):
        n = len(text.split())
        assert got[doc_id] == (n, running // budget), doc_id
        running += n
    # every shard except the last must have crossed the budget boundary
    n_shards = max(s for _, s in got.values()) + 1
    assert n_shards == (running + budget - 1) // budget or n_shards == running // budget + 1


def test_pack_shards_empty_and_single(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert curation.pack_shards(empty, 100).count() == 0
    one = spark.createDataFrame([(5, "a b c")], ["doc_id", "text"])
    row = curation.pack_shards(one, 100).first()
    assert (row["doc_id"], row["n_tokens"], row["shard_id"]) == (5, 3, 0)


def test_decontaminate_drops_only_flagged(spark):
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog", "eval", "en")],
        ["doc_id", "text", "source", "lang"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "note the quick brown fox jumps here", "train", "en"),
            (2, "brown dog and lazy fox quick jumps", "train", "en"),
            (3, "completely unrelated transcript text body", "train", "en"),
        ],
        ["doc_id", "text", "source", "lang"],
    )
    kept = sorted(
        r["doc_id"] for r in curation.decontaminate(corpus, ev, n=4).collect()
    )
    assert kept == [2, 3]
    # min_hits above the overlap keeps everything
    kept_all = curation.decontaminate(corpus, ev, n=4, min_hits=3).count()
    assert kept_all == 3


def test_resample_flattens_and_is_stable(spark):
    import random

    rng = random.Random(11)
    rows = []
    did = 0
    # src_big has ~10x the tokens of src_small
    for src, n_docs, lo, hi in [("src_big", 400, 20, 40), ("src_small", 40, 20, 40)]:
        for _ in range(n_docs):
            rows.append(
                (did, " ".join(f"w{rng.randrange(99)}" for _ in range(rng.randrange(lo, hi))), src)
            )
            did += 1
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    kept = curation.resample_to_uniform(docs)
    per = {
        r["source"]: r["tok"]
        for r in kept.groupBy("source").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    # the big source is downsampled toward the small source's budget
    # (hash sampling is exact only in expectation: allow 25%)
    assert per["src_small"] > 0
    assert abs(per["src_big"] - per["src_small"]) / per["src_small"] < 0.25
    # determinism: identical kept set on a re-run over a repartitioned frame
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(
        r["doc_id"]
        for r in curation.resample_to_uniform(docs.repartition(13)).collect()
    )
    assert a == b


def test_pack_export_order_and_budget(spark):
    rows = [(i, f"doc{i} body " + "x " * (i % 7)) for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)
    out = {
        r["shard_id"]: r
        for r in curation.pack_export(docs, budget_tokens=30, n_buckets=4).collect()
    }
    # within-shard concatenation follows doc_id order exactly
    for r in out.values():
        texts = r["packed"].split("\n\n")
        ids = [int(t.split()[0][3:]) for t in texts]
        assert ids == sorted(ids)
        assert r["n_docs"] == len(texts)
    # every doc appears exactly once across shards
    assert sum(r["n_docs"] for r in out.values()) == 40
    # shard token sums equal the assignment's sums
    assign = curation.pack_shards(docs, 30, n_buckets=4)
    from pyspark.sql import functions as SF
    exp = {
        r["shard_id"]: r["t"]
        for r in assign.groupBy("shard_id").agg(SF.sum("n_tokens").alias("t")).collect()
    }
    assert {k: r["n_tokens"] for k, r in out.items()} == exp


def test_pii_scrub_goldens(spark):
    rows = [
        (1, "write to alice.smith+x@mail.example.org about the invoice"),
        (2, "server at 192.168.1.254 timed out; retry 10.0.0.1"),
        (3, "call +44 020 711 1234 or +1 555 010 4242"),
        (4, "card 4111 1111 1111 1111 declined"),
        (5, "no pii here at all"),
        (6, None),
        # user@IPv4: the email pattern requires an alphabetic TLD, so
        # only the IPv4 class counts and only the IP span is redacted
        (7, "root@10.1.2.3 logged in"),
    ]
    out = {
        r["doc_id"]: r
        for r in curation.pii_scrub(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert out[1]["n_email"] == 1 and out[1]["pii_total"] == 1
    assert "alice" not in out[1]["clean_text"]
    assert "<EMAIL>" in out[1]["clean_text"]
    assert out[2]["n_ipv4"] == 2
    assert out[2]["clean_text"] == "server at <IP> timed out; retry <IP>"
    assert out[3]["n_phone"] == 2 and "<PHONE>" in out[3]["clean_text"]
    assert out[4]["n_card"] == 1
    assert out[4]["clean_text"] == "card <CARD> declined"
    assert out[5]["pii_total"] == 0 and out[5]["clean_text"] == rows[4][1]
    assert out[6]["pii_total"] == 0 and out[6]["clean_text"] == ""
    assert out[7]["n_email"] == 0 and out[7]["n_ipv4"] == 1
    assert out[7]["clean_text"] == "root@<IP> logged in"


def test_pii_scrub_plan_is_pure_projection(spark):
    df = curation.pii_scrub(
        spark.createDataFrame([(1, "x@y.zz")], ["doc_id", "text"])
    )
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p  # zero shuffles: scales by partition count
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in p  # JVM-side regex only, no Python workers


def test_repetition_flags_goldens(spark):
    rows = [
        # 4 lines, 2 identical -> dup_line_frac 0.25 passes (<= 0.30);
        # but the repeated "alpha one" bigram is 2 of 9 (> 0.20) -> flagged
        (1, "alpha one\nbeta two\nalpha one\ngamma three delta four"),
        # 3 lines all identical -> dup_line_frac 2/3, flagged
        (2, "same line\nsame line\nsame line"),
        # stamped bigram: "buy now" is every bigram -> top share 1.0, flagged
        (3, "buy now buy now buy now buy now"),
        # duplicate paragraphs (blank-line separated), unique lines inside
        (4, "para one text\n\npara two text\n\npara one text"),
        (5, "perfectly normal varied sentence with distinct words"),
        (6, None),
    ]
    out = {
        r["doc_id"]: r
        for r in text_analysis.repetition_flags(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert out[1]["n_lines"] == 4 and out[1]["dup_line_frac"] == 0.25
    assert out[1]["flag_dup_lines"] == 0 and out[1]["flag_dup_paras"] == 0
    assert out[1]["top_bigram_frac"] == 2 / 9
    assert out[1]["flag_top_bigram"] == 1 and out[1]["repetition_pass"] == 0
    assert out[2]["flag_dup_lines"] == 1 and out[2]["dup_line_frac"] == 2 / 3
    assert out[3]["flag_top_bigram"] == 1
    # "buy now"/"now buy" alternate: top bigram = 4 of 7
    assert out[3]["top_bigram_frac"] == 4 / 7
    assert out[4]["flag_dup_paras"] == 1 and out[4]["flag_dup_lines"] == 1
    assert out[5]["repetition_pass"] == 1 and out[5]["top_bigram_frac"] > 0
    assert out[6]["n_lines"] == 0 and out[6]["repetition_pass"] == 1


def test_chunk_docs_windows_and_tail(spark):
    from open_source_search_engine_spark.operators.curation import chunk_docs

    toks = " ".join(f"t{i}" for i in range(1, 11))  # 10 tokens
    docs = spark.createDataFrame(
        [(1, toks), (2, "a b c"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_docs(docs, max_tokens=4, overlap=1).collect()
    }
    # doc 1: stride 3 -> starts 1,4,7,10 (1 + ceil((10-4)/3) = 3)... check:
    # n=10 > 4 -> 1 + ceil(6/3) = 3 chunks at token starts 1, 4, 7
    assert out[(1, 0)] == ("t1 t2 t3 t4", 4)
    assert out[(1, 1)] == ("t4 t5 t6 t7", 4)
    assert out[(1, 2)] == ("t7 t8 t9 t10", 4)
    # consecutive chunks share exactly `overlap` tokens; union covers all
    assert out[(2, 0)] == ("a b c", 3)  # n <= max_tokens -> one chunk
    assert (2, 1) not in out
    assert not any(d in (3, 4) for d, _ in out)  # empty/NULL -> no rows


def test_chunk_docs_tail_is_short_not_dropped(spark):
    from open_source_search_engine_spark.operators.curation import chunk_docs

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(1, 6)))],  # 5 tokens
        "doc_id long, text string",
    )
    rows = sorted(
        (r["chunk_idx"], r["chunk_text"])
        for r in chunk_docs(docs, max_tokens=4, overlap=2).collect()
    )
    # stride 2: chunks at 1 and 3; the tail chunk has 3 tokens (short)
    assert rows == [(0, "t1 t2 t3 t4"), (1, "t3 t4 t5")]


def test_chunk_docs_rejects_bad_overlap(spark):
    import pytest as _pytest

    from open_source_search_engine_spark.operators.curation import chunk_docs

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_docs(docs, max_tokens=4, overlap=4)


def test_corpus_profile_exact_stats(spark):
    from open_source_search_engine_spark.operators.text_analysis import (
        corpus_profile,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c", "s1"),
            (2, "a b c d e", "s1"),
            (3, "", "s1"),
            (4, None, "s2"),
            (5, "x y", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in corpus_profile(docs).collect()}
    s1 = out["s1"]
    assert s1["n_docs"] == 3 and s1["tokens_sum"] == 8
    assert s1["tokens_p50"] == 3.0  # exact interpolated median of [0,3,5]
    assert s1["empty_frac"] == 1 / 3
    s2 = out["s2"]
    assert s2["n_docs"] == 2 and s2["tokens_sum"] == 2
    assert s2["empty_frac"] == 0.5  # NULL text counts as empty
