"""Tokenizer: lowercased maximal word-character runs with ordinal positions.

Re-expresses the reference tokenizer's observable contract (reference
`Words.cpp:216` addWords: UTF-8 alnum-run segmentation; lowercasing before
hashing per `hash.h:126-182`) as a vectorized regex tokenizer. The reference
assigns word positions with sentence/tag gaps (`XmlDoc.cpp:19772-19859`
getWordPosVec); for transcript turns there is no markup, so position = token
ordinal within the turn (SURVEY.md W1).

Two modes, one spec each:
  * ``unicode`` (engine default): tokens are maximal runs of Python ``\\w``
    word characters (Unicode letters/digits/underscore) over ``str.lower()``.
  * ``ascii``: tokens are maximal runs of ``[a-z0-9_]`` over ``str.lower()``.
    This mode is byte-identical to the ANSI-SQL expression
    ``regexp_split_to_array(lower(text), '[^a-z0-9_]+')`` (minus empties),
    which is what the DuckDB oracle gate runs -- RE2 and java.util.regex both
    treat this class identically, so Spark / DuckDB / Python agree exactly.

The same function is used by the Spark build pipeline (inside mapInPandas --
Arrow-batched, no per-row Python at the DataFrame API level) and by the
brute-force golden oracle, so rank identity cannot drift on tokenization.
"""

from __future__ import annotations

import re

_ASCII_RE = re.compile(r"[a-z0-9_]+")
_UNICODE_RE = re.compile(r"\w+", re.UNICODE)

#: SQL fragment (DuckDB + Spark SQL compatible) equivalent to mode='ascii'.
ASCII_SPLIT_REGEX = "[^a-z0-9_]+"

#: CJK scripts indexed as overlapping character bigrams in unicode mode
#: (reference `Words.cpp:216` segments words per script;
#: `UnicodeProperties.cpp` script tables. An unsegmented CJK run has no
#: spaces, so a \w+ run would become ONE giant unsearchable token --
#: character bigrams are the standard public re-expression, symmetric on
#: index and query side). Ranges: Hiragana, Katakana, CJK ext A, CJK
#: unified, Hangul syllables.
_CJK_RANGES = "぀-ヿ㐀-䶿一-鿿가-힯"
_HAS_CJK_RE = re.compile(f"[{_CJK_RANGES}]")
_CJK_SPLIT_RE = re.compile(f"([{_CJK_RANGES}]+)")


def expand_cjk_token(token: str) -> list[str]:
    """One \\w+ run -> sub-tokens: non-CJK segments pass through; each CJK
    segment becomes its overlapping character bigrams (a single isolated
    CJK char stays a unigram). "ab<XYZ>cd" -> ["ab", "XY", "YZ", "cd"]."""
    out: list[str] = []
    for seg in _CJK_SPLIT_RE.split(token):
        if not seg:
            continue
        if _HAS_CJK_RE.match(seg):
            if len(seg) == 1:
                out.append(seg)
            else:
                out.extend(seg[i: i + 2] for i in range(len(seg) - 1))
        else:
            out.append(seg)
    return out


def _expand_cjk_tokens(tokens) -> list[str]:
    """Apply the ONE CJK expansion rule to a token list: a token containing
    a CJK char expands via expand_cjk_token, others pass through. Shared by
    the scalar tokenize() path and the vectorized build path so the policy
    cannot diverge (index/query symmetry depends on it)."""
    return [
        s
        for t in tokens
        for s in (expand_cjk_token(t) if _HAS_CJK_RE.search(t) else (t,))
    ]


def expand_cjk_in_lists(lowered_texts, token_lists):
    """Vectorized-build hook (index_build regex path): apply
    expand_cjk_token to the token lists of the docs whose RAW text contains
    a CJK char. ``lowered_texts`` is the pandas str Series the lists came
    from; docs without CJK (the overwhelming common case) are untouched and
    the whole call is one vectorized contains() when none match."""
    mask = lowered_texts.str.contains(_HAS_CJK_RE).to_numpy()
    if not mask.any():
        return token_lists
    import numpy as np

    # element-wise fill: np.array(list_of_lists) would coerce equal-length
    # lists into a 2D array and break per-row list assignment
    out = np.empty(len(token_lists), dtype=object)
    for i, ts in enumerate(token_lists):
        out[i] = ts
    for i in np.flatnonzero(mask):
        out[i] = _expand_cjk_tokens(token_lists[i])
    return out


def _pattern(mode: str) -> re.Pattern:
    if mode == "ascii":
        return _ASCII_RE
    if mode == "unicode":
        return _UNICODE_RE
    raise ValueError(f"unknown tokenizer mode: {mode!r}")


def tokenize(text: str | None, mode: str = "unicode") -> list[str]:
    """Tokens of ``text`` in document order. None/empty -> []. In unicode
    mode, CJK-script runs expand to character bigrams (expand_cjk_token);
    ascii mode never sees CJK (those bytes are outside [a-z0-9_])."""
    if not text:
        return []
    toks = _pattern(mode).findall(text.lower())
    if mode == "unicode" and _HAS_CJK_RE.search(text):
        toks = _expand_cjk_tokens(toks)
    return toks


def tokenize_with_positions(
    text: str | None, mode: str = "unicode"
) -> list[tuple[str, int]]:
    """(token, position) pairs; position is the 0-based token ordinal."""
    return [(tok, i) for i, tok in enumerate(tokenize(text, mode))]


def doc_length(text: str | None, mode: str = "unicode") -> int:
    """``dl`` for BM25: total token count of the document (turn)."""
    if not text:
        return 0
    if mode == "unicode" and _HAS_CJK_RE.search(text):
        return len(tokenize(text, mode))
    return sum(1 for _ in _pattern(mode).finditer(text.lower()))


def term_counts(
    text: str | None, mode: str = "unicode"
) -> dict[str, tuple[int, list[int]]]:
    """Per-term (tf, positions) for one document.

    This is the reference's per-doc "count table" (`XmlDoc.cpp` getCountTable,
    SURVEY.md A1) plus the positional payload that posdb keys carry
    (`Posdb.h:3-27` wordpos bits).
    """
    out: dict[str, tuple[int, list[int]]] = {}
    for tok, pos in tokenize_with_positions(text, mode):
        if tok in out:
            tf, positions = out[tok]
            positions.append(pos)
            out[tok] = (tf + 1, positions)
        else:
            out[tok] = (1, [pos])
    return out
