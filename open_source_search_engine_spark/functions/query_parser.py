"""Query-string grammar: quotes, parens, AND/OR/|, -exclusion, +inclusion,
field:value restriction.

Reference: `Query.cpp:1229` setQWords parses signs/quotes/fields/boolean
operators into QueryWords; opcodes OP_AND/OP_OR/OP_NOT/OP_LEFTPAREN/...
(`Query.h:146-152`); term signs '-'/'+' (`Query.h:191-193`); quoted phrases
carry quote start/end (`Query.h:219-226`); `title:`/`site:`/`gblang:` field
codes (`Query.h:33-102` field_code_t -- our transcript analogs are plain
document columns like ``role:``/``tool:``/``lang:``/``source:``). The
reference evaluates boolean structure per-doc over termlist bit vectors
(`Query.h:26-28` qvec_t, 64 explicit operands max); we normalize to DNF at
plan time and evaluate each clause with semi/anti-join algebra instead
(SearchEngine.boolean_docs machinery).

This module is PURE PYTHON (driver-side planning, runs once per query):

    parse_query('("merge sort" -vector) OR (spark join)')
      -> AST of ('term'|'phrase'|'field'|'not'|'and'|'or', ...) tuples
    to_dnf(ast)
      -> [[(negated, atom), ...], ...]   # OR of AND-clauses

Grammar (recursive descent):
    expr   := and ( ('OR' | '|') and )*
    and    := item+                      # implicit AND; explicit AND ignored
    item   := ['-'|'+'] ( '"'text'"' | field ':' value | word | '(' expr ')' )
"""

from __future__ import annotations

import re

#: cap mirroring the reference's 64-operand boolean limit (`Query.h:26-28`)
MAX_DNF_CLAUSES = 64

_FIELD_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$", re.S)


class QueryParseError(ValueError):
    pass


def _lex(query: str) -> list[tuple[str, str]]:
    """-> [(kind, text)]: kind in {'(', ')', 'OR', 'AND', 'NEG', 'POS',
    'PHRASE', 'WORD'}. Signs are emitted as separate NEG/POS tokens bound
    to the next item."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(query)
    while i < n:
        c = query[i]
        if c.isspace():
            i += 1
            continue
        if c in "()":
            out.append((c, c))
            i += 1
            continue
        if c == "|":
            out.append(("OR", "|"))
            i += 1
            continue
        if c in "-+" and i + 1 < n and not query[i + 1].isspace():
            out.append(("NEG" if c == "-" else "POS", c))
            i += 1
            continue
        if c == '"':
            j = query.find('"', i + 1)
            if j < 0:
                raise QueryParseError(f"unterminated quote at {i}: {query!r}")
            out.append(("PHRASE", query[i + 1: j]))
            i = j + 1
            continue
        # bare word (may be field:value); stop at space/paren/pipe/quote
        j = i
        while j < n and not query[j].isspace() and query[j] not in '()|"':
            j += 1
        w = query[i:j]
        if w == "OR":
            out.append(("OR", w))
        elif w == "UOR":
            # weighted-or opcode (`Query.h:146-152` OP_UOR): OR eligibility
            # whose arms rank-blend as ONE vote group (J2 listGroupNum)
            out.append(("UOR", w))
        elif w == "AND":
            out.append(("AND", w))
        elif w == "NOT":
            # keyword negation (OP_NOT, `Query.h:148`) binds to the next item
            out.append(("NEG", w))
        else:
            out.append(("WORD", w))
        i = j
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.pos = 0

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.pos += 1
        return t

    def parse_expr(self):
        # OR and UOR share one precedence level, folded left-associatively
        # so mixed chains ("a OR b UOR c") stay well-defined
        node = self.parse_and()
        while self.peek() and self.peek()[0] in ("OR", "UOR"):
            op = self.next()[0]
            rhs = self.parse_and()
            kind = "uor" if op == "UOR" else "or"
            if node[0] == kind:
                node = (kind, node[1] + [rhs])
            else:
                node = (kind, [node, rhs])
        return node

    def parse_and(self):
        items = []
        while True:
            t = self.peek()
            if t is None or t[0] in (")", "OR", "UOR"):
                break
            if t[0] == "AND":  # explicit AND is the default conjunction
                self.next()
                continue
            items.append(self.parse_item())
        if not items:
            raise QueryParseError("empty clause")
        return items[0] if len(items) == 1 else ("and", items)

    def parse_item(self):
        t = self.next()
        if t is None:
            # dangling operator at end of input ("foo NOT", "bar +"):
            # the documented contract is QueryParseError, never a raw
            # TypeError from subscripting None
            raise QueryParseError("unexpected end of query")
        if t[0] in ("NEG", "POS"):
            inner = self.parse_item()
            if t[0] == "NEG":
                return ("not", inner)
            # '+' = forced inclusion (`Query.h:192`): survives query-side
            # stopword dropping (the QW_SIGN_PLUS contract); a no-op when
            # stopword dropping is off (the engine default)
            return ("force", inner)
        if t[0] == "(":
            e = self.parse_expr()
            if not self.peek() or self.next()[0] != ")":
                raise QueryParseError("unbalanced parenthesis")
            return e
        if t[0] == "PHRASE":
            return ("phrase", t[1])
        if t[0] == "WORD":
            m = _FIELD_RE.match(t[1])
            if m:
                return ("field", m.group(1), m.group(2))
            return ("term", t[1])
        raise QueryParseError(f"unexpected token {t}")


def parse_query(query: str):
    toks = _lex(query)
    if not toks:
        raise QueryParseError("empty query")
    p = _Parser(toks)
    ast = p.parse_expr()
    if p.peek() is not None:
        raise QueryParseError(f"trailing input at token {p.peek()}")
    return ast


def to_dnf(ast) -> list[list[tuple[bool, tuple]]]:
    """AST -> disjunctive normal form: a list of clauses, each a list of
    (negated, atom) with atom one of ('term', w) / ('phrase', text) /
    ('field', name, value). Negation is pushed to the leaves (De Morgan);
    clause count capped at MAX_DNF_CLAUSES."""

    def norm(node, neg: bool):
        kind = node[0]
        if kind == "not":
            return norm(node[1], not neg)
        if kind == "force":
            # forced atoms keep a marker so stopword dropping can skip them
            inner = norm(node[1], neg)
            return [
                [(n, ("force", a) if a[0] != "force" else a) for n, a in cl]
                for cl in inner
            ]
        if kind == "and":
            parts = [norm(c, neg) for c in node[1]]
            return _cross(parts) if not neg else _union(parts)
        if kind in ("or", "uor"):
            # UOR eligibility == OR; the rank-blend difference is applied
            # by the scorer (SearchEngine groups a UOR's terms as one vote
            # group), not by the boolean structure
            parts = [norm(c, neg) for c in node[1]]
            return _union(parts) if not neg else _cross(parts)
        return [[(neg, node)]]

    def _union(parts):
        out = []
        for p in parts:
            out.extend(p)
            if len(out) > MAX_DNF_CLAUSES:
                raise QueryParseError("boolean query too complex (DNF blowup)")
        return out

    def _cross(parts):
        out = [[]]
        for p in parts:
            out = [a + b for a in out for b in p]
            if len(out) > MAX_DNF_CLAUSES:
                raise QueryParseError("boolean query too complex (DNF blowup)")
        return out

    clauses = norm(ast, False)
    for cl in clauses:
        if not any(not neg for neg, _ in cl):
            raise QueryParseError(
                "clause with no positive atom (pure negation is unbounded; "
                "the reference requires a positive term too)"
            )
    return clauses


def uor_groups(ast) -> list[list[str]]:
    """Raw texts of the positive term/phrase atoms under each OUTERMOST
    ``uor`` node (`Query.h:146-152` OP_UOR): each returned list is one
    rank-blend vote group for the scorer. Negated atoms don't score and are
    excluded; nested UORs merge into their outermost group."""

    def collect_atoms(node, neg: bool, out: list[str]):
        kind = node[0]
        if kind == "not":
            collect_atoms(node[1], not neg, out)
        elif kind == "force":
            collect_atoms(node[1], neg, out)
        elif kind in ("and", "or", "uor"):
            for c in node[1]:
                collect_atoms(c, neg, out)
        elif kind in ("term", "phrase") and not neg:
            out.append(node[1])

    groups: list[list[str]] = []

    def walk(node, neg: bool = False):
        kind = node[0]
        if kind == "uor":
            if neg:
                # a UOR under an odd number of NOTs: its atoms are negated,
                # so none of them score -- no vote group (descending with
                # neg=False here used to resurrect excluded terms as a
                # POSITIVE group)
                return
            g: list[str] = []
            collect_atoms(node, False, g)
            if g:
                groups.append(g)
            return
        if kind in ("and", "or"):
            for c in node[1]:
                walk(c, neg)
        elif kind == "not":
            walk(node[1], not neg)
        elif kind == "force":
            walk(node[1], neg)

    walk(ast)
    return groups


def unwrap_forced(atom) -> tuple[tuple, bool]:
    """('force', inner) -> (inner, True); plain atom -> (atom, False)."""
    if atom[0] == "force":
        return atom[1], True
    return atom, False


def drop_stopword_terms(
    clauses: list[list[tuple[bool, tuple]]], stop_words: set[str]
) -> list[list[tuple[bool, tuple]]]:
    """Query-side stopword dropping (`Query.h:136-143` IGNORE_DEFAULT /
    IGNORE_QSTOP): positive, UNFORCED plain-term atoms made only of
    stopwords are removed from a clause; '+'-signed terms, quoted phrases,
    fields, and negations always survive (`Query.h:192`; quoted terms keep
    their stop status off per the quote rules). A clause that would lose
    every positive atom keeps its original atoms -- an all-stopword query
    is answered as-is, like the reference."""
    out = []
    for cl in clauses:
        kept = []
        for negd, atom in cl:
            inner, forced = unwrap_forced(atom)
            droppable = (
                not negd
                and not forced
                and inner[0] == "term"
                and all(
                    w in stop_words
                    for w in inner[1].lower().replace("-", " ").split()
                )
            )
            if not droppable:
                kept.append((negd, atom))
        if any(not negd for negd, _ in kept):
            out.append(kept)
        else:
            out.append(cl)
    return out
