"""Snippet generation + query-term highlighting (the SERP rendering path).

Reference: Summary.cpp:161 setSummary picks the best window of matched query
terms from the doc text; Highlight.cpp wraps matched terms; Matches.cpp:252
locates term positions (SURVEY.md X12). Transcript rebuild: a deterministic
"first-match window" -- the window of ``width`` tokens starting ``before``
tokens before the FIRST matched query term -- entirely in JVM array
functions (array_position / slice / transform), so it is SQL-expressible
and oracle-checked in DuckDB with the same 1-based clamped-slice semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import with_tokens


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
    snip = snippets(docs, terms)
    return (
        snip.join(F.broadcast(top), "doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .select("doc_id", "score", "first_pos", "snippet", "highlighted")
    )
