"""Regression gate: the byte-level fast tokenizer is EXACTLY equivalent to
the regex path -- same (doc, term, tf, dl) groups, same positions, and term
ids identical to hashing.py_term_id -- on planted edge cases and random
inputs (hypothesis)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_source_search_engine_spark.functions.hashing import py_term_id, py_term_ids
from open_source_search_engine_spark.functions.tokenizer import _pattern
from open_source_search_engine_spark.operators.index_build import (
    _fnv_hash_tokens,
    _tokenize_batch,
    _tokenize_batch_fast,
)
from open_source_search_engine_spark.sources.transcripts import PLANTED


def _groups_slow(b):
    tk = _tokenize_batch(b, _pattern("ascii"))
    if tk is None:
        return None, None
    tids = py_term_ids(tk["terms"])[tk["codes"]]
    groups = sorted(
        zip(tk["doc_id"].tolist(), tids.tolist(), tk["tf"].tolist(), tk["dl"].tolist())
    )
    return groups, int(tk["pos_flat"].sum())


def _groups_fast(b):
    tk = _tokenize_batch_fast(b, {})
    if tk is None:
        return None, None
    groups = sorted(
        zip(tk["doc_id"].tolist(), tk["tid"].tolist(), tk["tf"].tolist(), tk["dl"].tolist())
    )
    return groups, int(tk["pos_flat"].sum())


def _batch(texts):
    return pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )


def test_planted_edge_cases_equivalent():
    b = _batch(list(PLANTED) + ["MiXeD CaSe_And_1 23x", "__", "a" * 300])
    assert _groups_slow(b) == _groups_fast(b)


def test_term_strings_registered():
    ts: dict[int, str] = {}
    _tokenize_batch_fast(_batch(["alpha beta alpha", "Gamma!"]), ts)
    assert set(ts.values()) == {"alpha", "beta", "gamma"}
    for tid, term in ts.items():
        assert py_term_id(term) == tid


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF),
            max_size=80,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_random_unicode_equivalence(texts):
    b = _batch(texts)
    assert _groups_slow(b) == _groups_fast(b)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abz01_ .,-", max_size=120))
def test_fnv_matches_py_term_id_on_tokens(text):
    for tok in _pattern("ascii").findall(text.lower()):
        arr = np.frombuffer(tok.encode(), np.uint8)
        hv = int(
            _fnv_hash_tokens(arr, np.array([0]), np.array([len(arr)]))[0]
        )
        assert hv == py_term_id(tok)
