"""Brute-force golden BM25 oracle (pure Python/numpy, no Spark).

The rank-identity contract (north rule; SURVEY.md §5.3): the Spark engine
must reproduce this oracle's top-k doc_ids, order, and float64 scores on the
reference query set. It shares the tokenizer and the BM25 formula module with
the engine, and sums per-doc contributions in the same canonical order
(term string ascending), so agreement is bit-level, not approximate.

Tie-break: score DESC, doc_id ASC (reference `TopTree.cpp:185-260`,
`Msg3a.cpp:807-811`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from .bm25 import BM25Params, idf as bm25_idf, tf_norm
from .tokenizer import term_counts, tokenize


@dataclass
class OracleIndex:
    n_docs: int
    avgdl: float
    dl: dict[int, int]                      # doc_id -> token count
    postings: dict[str, dict[int, int]]     # term -> {doc_id: tf}

    @property
    def df(self) -> dict[str, int]:
        return {t: len(p) for t, p in self.postings.items()}


def build_oracle_index(
    docs: pd.DataFrame, mode: str = "unicode"
) -> OracleIndex:
    """docs: pandas frame with columns (doc_id, text)."""
    postings: dict[str, dict[int, int]] = {}
    dl: dict[int, int] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        doc_id = int(doc_id)
        tc = term_counts(text, mode)
        dl[doc_id] = sum(tf for tf, _ in tc.values())
        for term, (tf, _pos) in tc.items():
            postings.setdefault(term, {})[doc_id] = tf
    n = len(docs)
    avgdl = (sum(dl.values()) / n) if n else 0.0
    return OracleIndex(n_docs=n, avgdl=avgdl, dl=dl, postings=postings)


def oracle_topk(
    index: OracleIndex,
    query_terms: list[str],
    mode: str = "AND",
    k: int = 10,
    params: BM25Params | None = None,
    exclude_terms: list[str] | None = None,
) -> list[tuple[int, float]]:
    """Top-k (doc_id, score), canonical accumulation order (term asc)."""
    params = params or BM25Params()
    terms = sorted(set(query_terms))
    present = [t for t in terms if t in index.postings]
    if not terms:
        return []
    if mode == "AND" and len(present) < len(terms):
        return []
    # candidate docs
    if mode == "AND":
        cands: set[int] | None = None
        for t in present:
            ids = set(index.postings[t])
            cands = ids if cands is None else (cands & ids)
        cands = cands or set()
    else:
        cands = set()
        for t in present:
            cands |= set(index.postings[t])
    if exclude_terms:
        for t in set(exclude_terms):
            cands -= set(index.postings.get(t, ()))
    scores: dict[int, float] = {}
    for t in present:  # terms ascending = canonical accumulation order
        df_t = len(index.postings[t])
        idf_t = float(bm25_idf(df_t, index.n_docs))
        plist = index.postings[t]
        for d in cands:
            tf = plist.get(d)
            if tf is None:
                continue
            contrib = idf_t * float(
                tf_norm(
                    np.asarray([tf], dtype=np.float64),
                    np.asarray([index.dl[d]], dtype=np.float64),
                    index.avgdl,
                    params,
                )[0]
            )
            scores[d] = scores.get(d, 0.0) + contrib
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def oracle_search(
    index: OracleIndex,
    query: str,
    mode: str = "AND",
    k: int = 10,
    tokenizer_mode: str = "unicode",
    params: BM25Params | None = None,
) -> list[tuple[int, float]]:
    include, exclude = [], []
    for w in query.split():
        if w.startswith("-") and len(w) > 1:
            exclude.extend(tokenize(w[1:], tokenizer_mode))
        else:
            include.extend(tokenize(w, tokenizer_mode))
    return oracle_topk(
        index, include, mode=mode, k=k, params=params, exclude_terms=exclude
    )
