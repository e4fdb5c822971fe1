"""Best-window snippet gates: the anchored-window argmax is semantically
identical to brute-force enumeration of every window start (the
Summary.cpp:161 contract: max matched-token coverage, earliest start wins)."""

from __future__ import annotations

import random
import re

from open_source_search_engine_spark.operators.snippets import (
    best_window_snippets,
)

WIDTH = 7
TERMS = ["merge", "vector"]


def _brute(text: str, terms: list[str], width: int):
    toks = [t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t]
    flags = [1 if t in terms else 0 for t in toks]
    if sum(flags) == 0:
        return None
    n = len(toks)
    starts = range(1, max(1, n - width + 1) + 1)
    counts = [sum(flags[s - 1: s - 1 + width]) for s in starts]
    m = max(counts)
    best = counts.index(m) + 1
    first = flags.index(1) + 1
    return first, best, m, " ".join(toks[best - 1: best - 1 + width])


def test_anchored_equals_enumeration_random(spark):
    rng = random.Random(1234)
    vocab = ["merge", "vector", "aaa", "bbb", "ccc", "ddd", "eee"]
    rows = []
    for i in range(300):
        n = rng.randint(0, 40)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # adversarial shapes: all-matches, match at ends, exactly width apart
    rows += [
        (1000, "merge " * 20),
        (1001, "aaa " * 10 + "merge"),
        (1002, "merge " + "aaa " * 10),
        (1003, "merge " + "aaa " * (WIDTH - 2) + " vector"),
        (1004, "merge " + "aaa " * (WIDTH - 1) + " vector"),
        (1005, "vector vector aaa merge merge merge"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        int(r["doc_id"]): (
            int(r["first_pos"]), int(r["best_start"]),
            int(r["n_matched"]), r["snippet"],
        )
        for r in best_window_snippets(df, TERMS, width=WIDTH).collect()
    }
    expect = {}
    for i, text in rows:
        b = _brute(text, TERMS, WIDTH)
        if b is not None:
            expect[i] = b
    assert got == expect


def test_expand_context_turn_neighborhood(spark):
    # context expansion on the transcript doc unit: hit turn +-1 within
    # the same conversation; edges clamp (turn 0 has no -1 row); a hit
    # neighboring another hit appears once per hit
    from open_source_search_engine_spark.operators.index_build import (
        transcripts_to_docs,
    )
    from open_source_search_engine_spark.operators.snippets import (
        expand_context,
    )
    from open_source_search_engine_spark.sources.transcripts import (
        synth_transcripts,
    )

    docs = transcripts_to_docs(synth_transcripts(spark, 300))
    meta = {
        r["doc_id"]: (r["conv_id"], r["turn_idx"], r["text"])
        for r in docs.collect()
    }
    # pick a mid-conversation turn and a turn-0 edge case
    mid = next(d for d, (c, t, _) in meta.items() if t == 2)
    edge = next(d for d, (c, t, _) in meta.items() if t == 0)
    hits = spark.createDataFrame([(mid,), (edge,)], "doc_id long")
    out = expand_context(docs, hits, "conv_id", "turn_idx", 1, 1).collect()
    by_hit = {}
    for r in out:
        by_hit.setdefault(r["hit_doc_id"], []).append(r)
    mid_rows = sorted(by_hit[mid], key=lambda r: r["offset"])
    assert [r["offset"] for r in mid_rows] == [-1, 0, 1]
    for r in mid_rows:
        assert meta[r["doc_id"]][0] == meta[mid][0]  # same conversation
        assert meta[r["doc_id"]][1] == meta[mid][1] + r["offset"]
        assert r["text"] == meta[r["doc_id"]][2]
    edge_offsets = sorted(r["offset"] for r in by_hit[edge])
    assert edge_offsets[0] == 0  # no turn before 0
    # before=after=0 degenerates to the hits themselves
    only = expand_context(docs, hits, "conv_id", "turn_idx", 0, 0).collect()
    assert sorted(r["doc_id"] for r in only) == sorted([mid, edge])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        expand_context(docs, hits, "conv_id", "turn_idx", -1, 1)
