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

#: term -> word forms / synonyms scored as the same vote group (J2 union).
#: Common-English seed (public-knowledge pairs, the mysynonyms.txt default
#: a deployment overrides via load_synonyms): general synonyms, tech-abbrev
#: expansions, and regular plural->singular forms for the test vocabulary.
DEFAULT_SYNONYMS: dict[str, list[str]] = {
    # general English
    "speedy": ["fast"], "quick": ["fast"], "rapid": ["fast"],
    "swift": ["fast"], "sluggish": ["slow"],
    "large": ["big"], "huge": ["big"], "enormous": ["big"],
    "giant": ["big"], "massive": ["big"],
    "tiny": ["small"], "little": ["small"], "miniature": ["small"],
    "begin": ["start"], "commence": ["start"], "launch": ["start"],
    "end": ["finish", "stop"], "halt": ["stop"], "terminate": ["stop"],
    "error": ["mistake", "fault"], "bug": ["error", "defect"],
    "fix": ["repair"], "mend": ["repair"],
    "build": ["construct"], "create": ["make"], "produce": ["make"],
    "delete": ["remove", "erase"], "drop": ["remove"],
    "search": ["find", "lookup"], "locate": ["find"],
    "show": ["display"], "render": ["display"],
    "aid": ["help"], "assist": ["help"],
    "purchase": ["buy"], "acquire": ["buy"],
    "sell": ["vend"], "ship": ["send"], "transmit": ["send"],
    "receive": ["get"], "obtain": ["get"],
    "reply": ["answer", "response"], "ask": ["question", "query"],
    "document": ["doc"], "doc": ["document"],
    "image": ["picture", "img"], "picture": ["image"],
    "automobile": ["car"], "vehicle": ["car"],
    "physician": ["doctor"], "attorney": ["lawyer"],
    "house": ["home"], "residence": ["home"],
    "job": ["work", "employment"], "task": ["job"],
    "cash": ["money"], "currency": ["money"],
    "film": ["movie"], "cinema": ["movie"],
    "song": ["track"], "tune": ["song"],
    # tech abbreviations. Multi-word alternatives (the `html` ->
    # "hypertext markup language" golden, `Synonyms.cpp:59` +
    # `test/system/test_search_terms.py:8`) are first-class: a member
    # containing a space is scored through the PHRASE path (positional
    # adjacency / bigram termlist) as a 0.9-weight vote-group member.
    "html": ["hypertext markup language"],
    "sql": ["structured query language"],
    "cpu": ["central processing unit"],
    "ram": ["random access memory"],
    "api": ["application programming interface"],
    "os": ["operating system"],
    "db": ["database"], "config": ["configuration"],
    "repo": ["repository"], "app": ["application"],
    "info": ["information"], "docs": ["documentation", "doc"],
    "dir": ["directory"], "env": ["environment"],
    "auth": ["authentication"], "admin": ["administrator"],
    "spec": ["specification"], "param": ["parameter"],
    "arg": ["argument"], "func": ["function"],
    "var": ["variable"], "util": ["utility"],
    # regular plural forms are NOT listed here: they derive from the
    # morphology rules in ``morph_forms`` below (the Synonyms.cpp wordform
    # machinery, generalized -- r3 VERDICT task 5 deleted the hardcoded
    # plural table). Irregulars that the rules cannot reach stay:
    "indices": ["index"],
}


#: number-word <-> digit forms (the reference's number synonyms: the query
#: 'the one' expands with '1', `test/system/test_search_terms.py:4-18`,
#: `Query.cpp:364` setQTerms). Both directions are generated below.
_NUMBER_WORDS: dict[str, str] = {
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "ten": "10", "eleven": "11", "twelve": "12", "twenty": "20",
    "thirty": "30", "forty": "40", "fifty": "50", "hundred": "100",
    "thousand": "1000", "million": "1000000",
}
NUMBER_FORMS: dict[str, str] = {
    **_NUMBER_WORDS,
    **{v: k for k, v in _NUMBER_WORDS.items()},
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


def strip_possessive(word: str) -> str:
    """Possessive/apostrophe base form (`XmlDoc_Indexing.cpp:2072-2115`:
    "bob's" indexes "bob" at synonym weight): drop a trailing 's / ' and
    any remaining apostrophes ("don't" -> "dont")."""
    w = word
    for apo in ("'s", "’s"):
        if w.lower().endswith(apo):
            w = w[: -len(apo)]
            break
    else:
        if w.endswith(("'", "’")):
            w = w[:-1]
    return w.replace("'", "").replace("’", "")


def fold_accents(word: str) -> str:
    """Accent-stripped form (`Synonyms.cpp` accent folding): NFD decompose
    and drop combining marks ("café" -> "cafe")."""
    import unicodedata

    return "".join(
        c
        for c in unicodedata.normalize("NFD", word)
        if not unicodedata.combining(c)
    )


# s/es-final English words that are NOT inflections of their stripped form
# (the stripped form is a real, unrelated word, so plan-time
# corpus-presence validation would wrongly admit it into the vote group)
_NON_INFLECTIONS = frozenset(
    {
        "news", "series", "species", "always", "perhaps", "whereas",
        "besides", "outdoors", "indoors",
    }
)


_IRREGULARS: dict[str, list[str]] | None = None


def irregular_forms() -> dict[str, list[str]]:
    """Bundled irregular-forms dictionary (r4 VERDICT task 6): ~190
    public-knowledge English irregular plurals and verb forms mapped to
    their base ("children" -> "child", "went" -> "go") in the
    mysynonyms.txt loader format (`Synonyms.cpp:59`; the reference ships
    these Wiktionary-scale, `Wiktionary.cpp`). Parsed by load_synonyms from
    functions/data/irregular_forms.txt once per process — driver-side only
    (morphology runs at plan time). Deployments extend or override by
    passing their own table through the same loader."""
    global _IRREGULARS
    if _IRREGULARS is None:
        import os

        _IRREGULARS = load_synonyms(
            os.path.join(
                os.path.dirname(__file__), "data", "irregular_forms.txt"
            )
        )
    return _IRREGULARS


def morph_forms(token: str) -> list[str]:
    """Rule-based de-inflection CANDIDATES for one index term (regular
    s / es / ies / ed / ing English morphology).

    Reference: `Synonyms.cpp` derives word forms from a Wiktionary
    dictionary; the Spark graft has no dictionary, so it generates every
    candidate a regular rule could produce ("indexes" -> ["indexe",
    "index"]; "merging" -> ["merg", "merge"]) and lets the QUERY PLAN
    validate them: candidates absent from the index's term_stats drop out
    of the vote group at plan time (plan_terms confirmed-absent path), so
    only real corpus words ever score. This replaces the hardcoded ~20-word
    plural table (r3 VERDICT task 5) and generalizes to any vocabulary.

    Returns candidates in fixed rule order, the token itself excluded.

    Corpus-presence validation cannot catch LEXICALIZED false friends --
    words that end in an inflection suffix but are not inflections of the
    stripped form, where the stripped form is itself a common word
    ("news" -> "new") -- so those are excluded outright. This list covers
    the dictionary entries a rule cannot; everything else stays
    rule-generated + plan-validated (the dictionary-free trade-off)."""
    t = token
    if t in _NON_INFLECTIONS:
        return []
    out: list[str] = []

    def add(c: str):
        if c and c != t and c not in out:
            out.append(c)

    # irregular forms first (dictionary entries a rule cannot produce:
    # "children" -> "child", "went" -> "go" — the bundled fixture,
    # irregular_forms()); like rule candidates, anything absent from the
    # corpus drops at plan time
    for irr in irregular_forms().get(t, ()):
        add(irr)
    if len(t) > 3 and t.endswith("ies"):
        add(t[:-3] + "y")          # queries -> query
    if len(t) > 3 and t.endswith("es"):
        add(t[:-2])                # batches -> batch, indexes -> index
    if len(t) > 2 and t.endswith("s") and not t.endswith(("ss", "us", "is")):
        add(t[:-1])                # joins -> join (also indexes -> indexe)
    if len(t) > 4 and t.endswith("ed"):
        add(t[:-2])                # sorted -> sort
        add(t[:-1])                # merged -> merge
        if len(t) > 5 and t[-3] == t[-4]:
            add(t[:-3])            # planned -> plan
    if len(t) > 5 and t.endswith("ing"):
        add(t[:-3])                # sorting -> sort
        add(t[:-3] + "e")          # merging -> merge
        if len(t) > 6 and t[-4] == t[-5]:
            add(t[:-4])            # running -> run
    return out


def word_forms(
    raw_word: str,
    tokenizer_mode: str = "unicode",
    form_weight: float = 0.9,
    morphology: bool = True,
) -> list[tuple[str, float]]:
    """Derived word forms of one RAW query word (before tokenization),
    as (index term, weight) members of the word's vote group:

    * no apostrophe: the tokenized word itself at weight 1.0, plus its
      accent-folded form at ``form_weight`` when different.
    * apostrophe word ("bob's"): the possessive-stripped base at
      ``form_weight`` -- the index never contains apostrophe terms (the
      tokenizer splits on them), and the reference scores the base form at
      synonym weight, so "bob's" matches docs containing only "bob".
    * ``morphology`` (default on): regular de-inflection candidates from
      ``morph_forms`` at ``form_weight`` ("tables" also votes "table");
      invalid candidates ("indexe") drop at plan time, see morph_forms.

    Multi-token words after normalization (e.g. hyphenations the tokenizer
    splits) contribute each token as its own member."""
    from .tokenizer import tokenize

    out: list[tuple[str, float]] = []
    seen: set[str] = set()

    def add(term: str, w: float):
        if term and term not in seen:
            seen.add(term)
            out.append((term, w))

    has_apo = "'" in raw_word or "’" in raw_word
    if has_apo:
        base = strip_possessive(raw_word)
        for t in tokenize(base, tokenizer_mode):
            add(t, form_weight)
            folded = fold_accents(t)
            if folded != t:
                add(folded, form_weight)
    else:
        for t in tokenize(raw_word, tokenizer_mode):
            add(t, 1.0)
            folded = fold_accents(t)
            if folded != t:
                add(folded, form_weight)
    if morphology:
        for t, _w in list(out):
            for cand in morph_forms(t):
                add(cand, form_weight)
    return out


def load_synonyms(source) -> dict[str, list[str]]:
    """User synonym table loader (the ``mysynonyms.txt`` analog,
    `Synonyms.cpp:59`): accepts

    * a path to a text file -- one group per line: whitespace-separated,
      first word is the base term, the rest its alternatives; '#' starts a
      comment. A line WITH commas splits on commas instead ("html,
      hypertext markup language"), so a multi-word alternative keeps its
      internal spaces and routes through the phrase path (`Synonyms.cpp:59`
      multi-word targets);
    * a Spark DataFrame with columns (term, alt) or (term, alts array);
    * a dict (returned as-is).

    Returns {term: [alternatives...]} for SearchEngine.search_synonyms /
    search_expanded."""
    if isinstance(source, dict):
        return source
    if hasattr(source, "collect"):  # DataFrame
        out: dict[str, list[str]] = {}
        cols = source.columns
        for r in source.collect():
            if r["term"] is None:
                continue
            term = str(r["term"]).lower()
            if "alts" in cols:
                # skip NULL cells: str(None) would register the literal
                # word 'none' as a synonym and silently corrupt rankings
                alts = [
                    str(a).lower() for a in (r["alts"] or []) if a is not None
                ]
            else:
                alts = [] if r["alt"] is None else [str(r["alt"]).lower()]
            out.setdefault(term, [])
            for a in alts:
                if a and a != term and a not in out[term]:
                    out[term].append(a)
        return out
    table: dict[str, list[str]] = {}
    with open(source, encoding="utf-8") as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            if "," in line:
                # comma syntax preserves multi-word alternatives; the BASE
                # must stay a single token (expand() looks up per query
                # word), so extra words in the first field become leading
                # alternatives -- this also keeps legacy space-separated
                # lines that happen to contain a comma parsing as before
                fields = [
                    " ".join(f.lower().split())
                    for f in line.split(",")
                    if f.strip()
                ]
                if not fields:
                    continue
                words = fields[0].split() + fields[1:]
            else:
                words = [w.lower() for w in line.split() if w]
            if len(words) < 2:
                continue
            base, alts = words[0], words[1:]
            table.setdefault(base, [])
            for a in alts:
                if a != base and a not in table[base]:
                    table[base].append(a)
    return table
