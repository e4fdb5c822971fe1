"""Snippet generation + query-term highlighting (the SERP rendering path).

Reference: `Summary.cpp:161` setSummary SCORES candidate windows of matched
query terms and keeps the best one (`Matches.cpp:252` locates positions;
`Highlight.cpp` wraps matches; SURVEY.md X12). Two operators:

* ``best_window_snippets`` -- the setSummary rebuild: every window start is
  scored by how many matched tokens it covers; the best-scoring window wins,
  earliest start on ties (Summary.cpp prefers earlier candidates at equal
  score). Entirely JVM higher-order functions (transform / slice /
  aggregate), so it is SQL-expressible and oracle-checked in DuckDB with
  identical 1-based clamped-slice semantics.
* ``snippets`` -- the cheaper first-match window (kept for callers that
  only need a fixed anchor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import with_tokens


def best_window_snippets(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    width: int = 11,
) -> DataFrame:
    """(doc_id, first_pos, best_start, n_matched, snippet, highlighted) for
    docs matching ANY term.

    Window scoring (`Summary.cpp:161`): for every 1-based start s in
    [1, max(1, len - width + 1)], score = number of matched tokens
    (counting repeats) in toks[s .. s+width-1]; best_start = the earliest s
    with the maximum score; n_matched = that maximum. first_pos = earliest
    matched position (kept for anchor/debug parity with the first-match
    operator)."""
    t = with_tokens(docs, text_col)
    terms_sorted = sorted(set(terms))
    term_arr = F.array(*[F.lit(x) for x in terms_sorted])
    # 1-based positions of matched tokens -- the window count for start s is
    # |{p in mpos : s <= p <= s+width-1}|, an O(len x matches) program
    # instead of the naive O(len x width) slice-and-sum (measured ~20x
    # faster through Spark's interpreted higher-order-function path; the
    # produced counts are identical, and so is the oracle)
    mpos = F.filter(
        F.transform(
            F.col("toks"),
            lambda tok, i: F.when(
                F.array_contains(term_arr, tok), i + F.lit(1)
            ).otherwise(F.lit(-1)),
        ),
        lambda p: p > 0,
    )
    t = t.withColumn("_mpos", mpos)
    # anchored-window argmax, O(matches^2) instead of O(len) start
    # enumeration: any max-count window can shift right until its start
    # sits ON a matched position without losing matches, so
    #   M = max_j |{q in mpos : mpos[j] <= q <= mpos[j]+width-1}|.
    # The EARLIEST start achieving M covers the first (leftmost) group of
    # M matches that fits a window; with j* = first anchor whose count is
    # M, that start is max(1, mpos[j*+M-1] - width + 1) -- any other
    # M-count window's leftmost match has a later index, hence a later
    # minimal start. Semantics identical to enumerating every start
    # (property-gated against a brute-force enumerator).
    cnt = F.transform(
        F.col("_mpos"),
        lambda p: F.size(
            F.filter(
                F.col("_mpos"),
                lambda q: (q >= p) & (q <= p + F.lit(width - 1)),
            )
        ),
    )
    t = t.withColumn("_cnt", cnt)
    n_matched = F.array_max("_cnt")
    j_star = F.array_position(F.col("_cnt"), F.array_max("_cnt"))
    last_of_group = F.element_at(
        F.col("_mpos"), (j_star + F.array_max("_cnt") - F.lit(1)).cast("int")
    )
    best_start = F.greatest(F.lit(1), last_of_group - F.lit(width - 1))
    first_pos = F.element_at(F.col("_mpos"), 1)
    window = F.slice(F.col("toks"), best_start.cast("int"), width)
    highlighted = F.transform(
        window,
        lambda tok: F.when(
            F.array_contains(term_arr, tok), F.concat(F.lit("["), tok, F.lit("]"))
        ).otherwise(tok),
    )
    return (
        t.withColumn("n_matched", n_matched)
        .filter(F.col("n_matched") > 0)
        .select(
            "doc_id",
            first_pos.cast("long").alias("first_pos"),
            best_start.cast("long").alias("best_start"),
            F.col("n_matched").cast("long").alias("n_matched"),
            F.concat_ws(" ", window).alias("snippet"),
            F.concat_ws(" ", highlighted).alias("highlighted"),
        )
    )


def snippets(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    before: int = 5,
    width: int = 11,
) -> DataFrame:
    """(doc_id, first_pos, snippet, highlighted) for docs matching ANY term.

    first_pos = 1-based position of the earliest occurrence of any query
    term; window = ``width`` tokens starting max(1, first_pos - before);
    highlighted wraps matched terms in square brackets.
    """
    t = with_tokens(docs, text_col)
    pos_cols = [
        F.array_position(F.col("toks"), F.lit(term)) for term in sorted(set(terms))
    ]
    first_pos = F.array_min(
        F.filter(F.array(*pos_cols), lambda p: p > 0)
    )
    term_arr = F.array(*[F.lit(x) for x in sorted(set(terms))])
    start = F.greatest(F.lit(1), (first_pos - F.lit(before)).cast("int"))
    window = F.slice(F.col("toks"), start, width)
    highlighted = F.transform(
        window,
        lambda tok: F.when(
            F.array_contains(term_arr, tok), F.concat(F.lit("["), tok, F.lit("]"))
        ).otherwise(tok),
    )
    return (
        t.withColumn("first_pos", first_pos)
        .filter(F.col("first_pos").isNotNull())
        .select(
            "doc_id",
            F.col("first_pos").cast("long").alias("first_pos"),
            F.concat_ws(" ", window).alias("snippet"),
            F.concat_ws(" ", highlighted).alias("highlighted"),
        )
    )


def snippets_for_topk(
    engine, docs: DataFrame, terms: list[str], mode: str = "AND", k: int = 10
) -> DataFrame:
    """SERP assembly: BM25 top-k joined back to the doc store for snippet
    rendering -- the Msg40 -> Msg20 -> summary path (`Msg40.cpp:841`
    launchMsg20s; SURVEY.md J4). The top-k side is tiny, so the join to
    documents broadcasts it."""
    top = engine.search_terms(terms, mode, k).select("doc_id", "score")
    snip = best_window_snippets(docs, terms)
    return (
        snip.join(F.broadcast(top), "doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .select(
            "doc_id", "score", "first_pos", "best_start", "n_matched",
            "snippet", "highlighted",
        )
    )


def expand_context(
    docs: DataFrame,
    hits: DataFrame,
    group_col: str = "conv_id",
    seq_col: str = "turn_idx",
    before: int = 1,
    after: int = 1,
) -> DataFrame:
    """Context expansion for a result page: every doc within ``before``/
    ``after`` sequence positions of a hit, in the hit's group — for
    transcripts, the surrounding turns of the same conversation that a
    result UI shows around the matching turn (the reference's result
    rendering pulls the neighborhood of the match from the doc store the
    same way its summary path does, `Msg20` per-result fetch; this is
    that fetch widened to the (conv_id, turn_idx) neighborhood).

    ``hits`` is a small frame with at least (doc_id); rows are joined
    back to the doc store for their (group, seq) coordinates, then the
    neighborhood is an equi-join on ``group_col`` with a range filter on
    ``seq_col`` — the hit side is broadcast, so the doc-store scan never
    shuffles and group-partition pruning applies when the store is
    partitioned by group. A doc neighboring two hits appears once per
    hit (callers see per-hit context blocks); offset = neighbor_seq −
    hit_seq, 0 for the hit itself.

    Output: (hit_doc_id, doc_id, offset, <group_col>, <seq_col>, text),
    ordered by (hit_doc_id, offset).
    """
    if before < 0 or after < 0:
        raise ValueError("before/after must be >= 0")
    h = (
        docs.join(F.broadcast(hits.select("doc_id")), "doc_id", "left_semi")
        .select(
            F.col("doc_id").alias("hit_doc_id"),
            F.col(group_col).alias("_hg"),
            F.col(seq_col).alias("_hs"),
        )
    )
    n = docs.select(
        "doc_id", F.col(group_col).alias("_hg"), F.col(seq_col), "text"
    )
    return (
        n.join(F.broadcast(h), "_hg")
        .filter(
            (F.col(seq_col) >= F.col("_hs") - F.lit(int(before)))
            & (F.col(seq_col) <= F.col("_hs") + F.lit(int(after)))
        )
        .select(
            "hit_doc_id",
            "doc_id",
            (F.col(seq_col) - F.col("_hs")).cast("long").alias("offset"),
            F.col("_hg").alias(group_col),
            F.col(seq_col).cast("long").alias(seq_col),
            "text",
        )
        .orderBy("hit_doc_id", "offset")
    )
