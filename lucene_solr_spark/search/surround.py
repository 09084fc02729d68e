"""Surround query language (lucene/queryparser/src/java/org/apache/
lucene/queryparser/surround/): proximity-operator query strings over
span queries.

Surface (parser.java grammar + query/ classes):

  ``a``            SrndTermQuery -> SpanTerm
  ``pre*``         SrndPrefixQuery -> SpanOr over term-dict expansion
  ``w?ld*card``    SrndTruncQuery (embedded ``*``/``?``) -> SpanOr
  ``nW(q, ...)``   DistanceQuery ordered: SpanNear(subs, n-1, true)
                   (DistanceQuery.java:100 — slop = opDistance - 1;
                   ``W`` alone = 1W, i.e. adjacency)
  ``nN(q, ...)``   unordered: SpanNear(subs, n-1, false)
  ``a W b W c``    infix form, n-ary same-op chain (parser's
                   OpDistance production)
  ``OR(q, ...)``   inside a distance op: SpanOr of span-able subs;
                   top level: disjunction over sub-results
  ``AND(q, ...)``  top level only: conjunction (all subs match)
  ``NOT(a, b)``    top level only: a minus b (NotQuery is binary)

Boolean composition scoring: sub-scores are summed in double and cast
to float32 once, the DisjunctionSumScorer accumulation the rewritten
BooleanQuery would use; AND keeps only docs present in every sub, NOT
anti-joins. Distance/term/prefix queries score through the span kernel
(SpanScorer), identical to search_spans.

TooManyBasicQueries (query/TooManyBasicQueries.java) maps to the
engine's TooManyClauses via the shared expansion cap.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Optional, Tuple

from lucene_solr_spark.search.queryparser import QueryParseError

__all__ = ["parse_surround", "SrndTerm", "SrndPrefix", "SrndTrunc",
           "SrndDistance", "SrndBool"]


@dataclass(frozen=True)
class SrndTerm:
    text: str


@dataclass(frozen=True)
class SrndPrefix:
    stem: str


@dataclass(frozen=True)
class SrndTrunc:
    pattern: str


@dataclass(frozen=True)
class SrndDistance:
    subs: Tuple
    distance: int
    ordered: bool


@dataclass(frozen=True)
class SrndBool:
    op: str           # 'and' | 'or' | 'not'
    subs: Tuple


_TOK = re.compile(r"\s*(\(|\)|,|[^\s(),]+)")
_DISTOP = re.compile(r"^(\d*)([WwNn])$")


class _P:
    def __init__(self, s: str):
        self.toks: List[str] = _TOK.findall(s)
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise QueryParseError("unexpected end of surround query")
        self.i += 1
        return t

    def expect(self, t: str) -> None:
        got = self.next()
        if got != t:
            raise QueryParseError(f"expected {t!r}, got {got!r}")


def _is_distop(t: Optional[str]) -> Optional[Tuple[int, bool]]:
    if t is None:
        return None
    m = _DISTOP.match(t)
    if not m:
        return None
    n = int(m.group(1)) if m.group(1) else 1
    return n, m.group(2).upper() == "W"


def _parse_list(p: _P) -> List:
    p.expect("(")
    subs = [_parse_expr(p)]
    while p.peek() == ",":
        p.next()
        subs.append(_parse_expr(p))
    p.expect(")")
    return subs


def _parse_primary(p: _P):
    t = p.peek()
    if t is None:
        raise QueryParseError("unexpected end of surround query")
    up = t.upper()
    d = _is_distop(t)
    if d is not None and p.toks[p.i + 1: p.i + 2] == ["("]:
        p.next()
        n, ordered = d
        subs = _parse_list(p)
        if len(subs) < 2:
            raise QueryParseError("distance op needs >= 2 subqueries")
        return SrndDistance(tuple(subs), n, ordered)
    if up in ("AND", "OR", "NOT") and p.toks[p.i + 1: p.i + 2] == ["("]:
        p.next()
        subs = _parse_list(p)
        if up == "NOT" and len(subs) != 2:
            raise QueryParseError("NOT(a, b) is binary (NotQuery.java)")
        if len(subs) < 2:
            raise QueryParseError(f"{up} needs >= 2 subqueries")
        return SrndBool(up.lower(), tuple(subs))
    if t == "(":
        p.next()
        e = _parse_expr(p)
        p.expect(")")
        return e
    p.next()
    word = t
    if word.endswith("*") and "*" not in word[:-1] and "?" not in word:
        return SrndPrefix(word[:-1].lower())
    if "*" in word or "?" in word:
        return SrndTrunc(word.lower())
    return SrndTerm(word.lower())


def _parse_expr(p: _P):
    """Infix distance chain: primary (op primary)* with a single op
    (the parser's OpDistance production requires the same operator
    throughout one chain)."""
    first = _parse_primary(p)
    d = _is_distop(p.peek())
    if d is None:
        return first
    subs = [first]
    n0, ord0 = d
    while True:
        d = _is_distop(p.peek())
        if d is None:
            break
        if d != (n0, ord0):
            raise QueryParseError(
                "infix distance chain must use one operator")
        p.next()
        subs.append(_parse_primary(p))
    return SrndDistance(tuple(subs), n0, ord0)


def parse_surround(q: str):
    p = _P(q)
    e = _parse_expr(p)
    if p.peek() is not None:
        raise QueryParseError(f"trailing input: {p.peek()!r}")
    return e
