"""Seedable query-side synonym table.

Reference: `Synonyms.cpp:59` getSynonyms (597 LoC) expands query terms from
a Wiktionary dump plus a user file (`mysynonyms.txt`); `Query.cpp:414-445`
applies the expansion at plan time when queryExpansion is on, and the
reference system test `test/system/test_search_terms.py:8` expects e.g.
``html`` to match documents containing only "Hypertext Markup Language".

The Wiktionary dictionary itself is out of scope for the transcript graft
(SURVEY.md X5); what matters architecturally is the PLAN-TIME join: a tiny
seeded table mapping term -> alternatives, consulted once per query on the
driver (the dictionary's Spark-side analog would be a broadcast table).
Deployments load their own table; this seed covers the test corpus's vocab
so the expansion path is exercised end-to-end.
"""

from __future__ import annotations

#: term -> word forms / synonyms scored as the same vote group (J2 union)
DEFAULT_SYNONYMS: dict[str, list[str]] = {
    "speedy": ["fast"],
    "quick": ["fast"],
    "rapid": ["fast"],
    "sluggish": ["slow"],
    "large": ["big"],
    "huge": ["big"],
    "tiny": ["small"],
    "little": ["small"],
    "rows": ["row"],
    "columns": ["column"],
    "tables": ["table"],
    "queries": ["query"],
    "joins": ["join"],
    "merges": ["merge"],
}


def expand(term: str, table: dict[str, list[str]] | None = None) -> list[str]:
    """Group members for one query term: [term] + its alternatives
    (deduplicated, term first -- the base form keeps weight 1.0)."""
    table = DEFAULT_SYNONYMS if table is None else table
    alts = [a for a in table.get(term, []) if a != term]
    seen, out = {term}, [term]
    for a in alts:
        if a not in seen:
            seen.add(a)
            out.append(a)
    return out
