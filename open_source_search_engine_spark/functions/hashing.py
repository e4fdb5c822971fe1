"""Deterministic identifiers: doc_id and term_id.

Reference: docId = 38-bit hash of the URL with a domain-hash overlay
(`Titledb.h:8-11, 54-78`), termId = 48-bit positional XOR hash of the
lowercased token (`hash.h:126-182`, `termid_mask.h:4`). 38 bits cannot cover
10^12 turns, so we use 63-bit ids (SURVEY.md §7.3); exact hash-function parity
with the C++ is not required because rank identity is defined against our own
golden scorer (SURVEY.md §5.3).

Both ids are computed JVM-side with Spark's built-in ``xxhash64`` (no Python
in the hot path); the sign bit is masked so ids are non-negative 63-bit ints,
which keeps block_id = doc_id >> BLOCK_BITS well defined and keeps the
doc_id-asc tie-break a plain numeric sort.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SIGN_MASK = (1 << 63) - 1

#: docs per posting block = 2**BLOCK_BITS of docid space. Because doc_ids are
#: xxhash64 outputs (uniform), a block holds ~N / 2**(63-BLOCK_BITS) docs.
#: pick_block_bits() sizes this from the corpus count.
DEFAULT_TARGET_BLOCK_DOCS = 128


def doc_id_col(conv_id: Column, turn_idx: Column) -> Column:
    """63-bit deterministic doc id for a transcript turn.

    ``xxhash64(concat(conv_id, ':', turn_idx)) & SIGN_MASK``. Collision audit
    happens at build time (groupBy(doc_id).count() > 1 must be empty --
    SURVEY.md §7.3; reference precedent: probable-docid collision chain,
    `html/developer.html:1904-1908`).
    """
    return F.xxhash64(
        F.concat(conv_id.cast("string"), F.lit(":"), turn_idx.cast("string"))
    ).bitwiseAND(F.lit(SIGN_MASK))


def term_id_col(term: Column) -> Column:
    """63-bit term id from the (already lowercased) token string."""
    return F.xxhash64(term).bitwiseAND(F.lit(SIGN_MASK))


def block_id_col(doc_id: Column, block_bits: int) -> Column:
    """Posting-block key: high bits of a HASH of doc_id (not doc_id itself).

    Hashing first keeps block sizes uniform for any doc_id distribution
    (external corpora often have dense sequential ids, which would otherwise
    collapse into one giant block). The same doc always lands in the same
    block across all terms, which is what DAAT intersection colocation needs;
    doc_ids within a block are still sorted + delta-encodable.
    """
    return F.shiftrightunsigned(
        F.xxhash64(doc_id).bitwiseAND(F.lit(SIGN_MASK)), block_bits
    )


def pick_block_bits(n_docs: int, target_block_docs: int = DEFAULT_TARGET_BLOCK_DOCS) -> int:
    """Shift amount s.t. block_id = doc_id >> bits gives ~target docs/block.

    doc_ids are uniform in [0, 2^63), so the expected docs per block of width
    2^bits is n_docs * 2^bits / 2^63. Solve for bits; clamp to [20, 62].
    """
    import math

    if n_docs <= 0:
        return 62
    bits = 63 - max(0, math.ceil(math.log2(max(1.0, n_docs / target_block_docs))))
    return int(min(62, max(20, bits)))
