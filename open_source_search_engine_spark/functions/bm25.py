"""BM25 formula module -- shared by the Spark engine and the golden oracle.

The north rule pins scoring to BM25 (the reference's own scorer is
proximity-based and explicitly not TF/IDF, `html/faq.html:337`; its full
formula is documented in SURVEY.md §4.5). One formula module guarantees the
engine and the brute-force oracle cannot diverge:

    idf(df)     = ln((N - df + 0.5) / (df + 0.5) + 1)        (Lucene-style, >0)
    tf_norm     = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(d, Q) = sum over q in Q of idf(df_q) * tf_norm(tf_qd, dl_d)

All math is float64 with a canonical accumulation order (terms sorted by
term string asc, then docs) so per-doc sums are bit-stable across
partitionings (SURVEY.md §7.4.1).

Tie-break contract (reference `TopTree.cpp:185-260` addNode and
`Msg3a.cpp:807-811` "prefer lower docids on top"): score DESC, doc_id ASC.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


@dataclass(frozen=True)
class BM25Params:
    """Ranking parameters (the analog of the reference's scoring parms,
    `Parms.cpp:3644-3790` / `ScoringWeights.cpp` -- parameterized, not
    programmable)."""

    k1: float = K1_DEFAULT
    b: float = B_DEFAULT


def idf(df: np.ndarray | float, n_docs: int) -> np.ndarray | float:
    """Always-positive BM25 idf."""
    return np.log((n_docs - np.asarray(df, dtype=np.float64) + 0.5)
                  / (np.asarray(df, dtype=np.float64) + 0.5) + 1.0)


def tf_norm(
    tf: np.ndarray,
    dl: np.ndarray,
    avgdl: float,
    params: BM25Params = BM25Params(),
) -> np.ndarray:
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    denom = tf + params.k1 * (1.0 - params.b + params.b * dl / float(avgdl))
    return tf * (params.k1 + 1.0) / denom


def term_score(
    tf: np.ndarray,
    dl: np.ndarray,
    df: float,
    n_docs: int,
    avgdl: float,
    params: BM25Params = BM25Params(),
) -> np.ndarray:
    """Per-doc contribution of one term: idf * tf_norm."""
    return float(idf(df, n_docs)) * tf_norm(tf, dl, avgdl, params)


def max_term_score(
    max_tf: int,
    min_dl: int,
    df: float,
    n_docs: int,
    avgdl: float,
    params: BM25Params = BM25Params(),
) -> float:
    """Upper bound of a term's contribution over a posting block.

    tf_norm is increasing in tf and decreasing in dl, so (block_max_tf,
    block_min_dl) bounds every doc in the block. This is the block-max
    metadata for WAND pruning -- the analog of the reference's
    getMaxPossibleScore prefilter (`PosdbTable.cpp:3910-3947, 4351-4516`).
    """
    return float(
        term_score(
            np.asarray([max_tf]), np.asarray([min_dl]), df, n_docs, avgdl, params
        )[0]
    )


def sql_score_expr(
    tf_col: str,
    dl_col: str,
    df_col: str,
    n_docs: str,
    avgdl: str,
    params: BM25Params = BM25Params(),
) -> str:
    """ANSI-SQL text of the same formula (used for Spark SQL and the DuckDB
    oracle, so both gates compute from one string template)."""
    i = f"ln(({n_docs} - {df_col} + 0.5) / ({df_col} + 0.5) + 1.0)"
    t = (
        f"({tf_col} * ({params.k1} + 1.0) / "
        f"({tf_col} + {params.k1} * (1.0 - {params.b} + {params.b} * {dl_col} / {avgdl})))"
    )
    return f"({i} * {t})"
