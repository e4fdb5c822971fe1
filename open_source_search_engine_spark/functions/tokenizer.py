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


def _pattern(mode: str) -> re.Pattern:
    if mode == "ascii":
        return _ASCII_RE
    if mode == "unicode":
        return _UNICODE_RE
    raise ValueError(f"unknown tokenizer mode: {mode!r}")


def tokenize(text: str | None, mode: str = "unicode") -> list[str]:
    """Tokens of ``text`` in document order. None/empty -> []."""
    if not text:
        return []
    return _pattern(mode).findall(text.lower())


def tokenize_with_positions(
    text: str | None, mode: str = "unicode"
) -> list[tuple[str, int]]:
    """(token, position) pairs; position is the 0-based token ordinal."""
    return [(tok, i) for i, tok in enumerate(tokenize(text, mode))]


def doc_length(text: str | None, mode: str = "unicode") -> int:
    """``dl`` for BM25: total token count of the document (turn)."""
    if not text:
        return 0
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
