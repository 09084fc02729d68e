"""Span query family re-expression (lucene/core/src/java/org/apache/
lucene/search/spans/): SpanTermQuery, SpanNearQuery (ordered via
NearSpansOrdered.java, unordered via NearSpansUnordered.java),
SpanOrQuery, SpanNotQuery, SpanFirstQuery (SpanPositionCheckQuery /
SpanPositionRangeQuery acceptPosition rules).

The engine drives spans DOC-AT-A-TIME over candidate docs whose
positions are already decoded (the same execution shape as
search/sloppy.py): each reference Spans class is mirrored here as a
single-document iterator with the exact advance/shrink/queue control
flow — cross-document branches (`matchDoc != spans.doc()`) reduce to
clause exhaustion within the doc, which the reference handles through
the same `more = false` paths.

Scoring (SpanScorer.java:86-96 setFreqCurrentDoc): each match
contributes computeSlopFactor(end - start) = 1/(matchLength + 1)
(BM25Similarity.sloppyFreq, :70-72,246-248) to a float32 freq
accumulated in match order; the doc scores through the standard BM25
kernel weightValue * freq / (freq + norm) with weightValue built from
the f32 idf SUM over the query's distinct terms in SORTED order
(SpanWeight.java:33-50 — TreeSet<Term> extractTerms, not clause
order).

Candidate-doc pre-filtering (executor-side) is sound because a doc can
yield a span match only if: Near -> ALL clause subtrees match the doc;
Or -> at least one; Not -> the include tree; First -> the wrapped
tree. Evaluating a pruned doc would enumerate zero matches.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

F32 = np.float32


# -- span query AST ---------------------------------------------------------


@dataclass(frozen=True)
class SpanTerm:
    """SpanTermQuery.java: each position p of `term` is a span
    [p, p+1)."""

    term: str


@dataclass(frozen=True)
class SpanNear:
    """SpanNearQuery.java(clauses, slop, inOrder)."""

    clauses: Tuple
    slop: int
    in_order: bool


@dataclass(frozen=True)
class SpanOr:
    """SpanOrQuery.java: union of sub-spans."""

    clauses: Tuple


@dataclass(frozen=True)
class SpanNot:
    """SpanNotQuery.java: include spans with no overlapping exclude
    span."""

    include: object
    exclude: object


@dataclass(frozen=True)
class SpanFirst:
    """SpanFirstQuery.java: wrapped spans with end() <= `end`."""

    match: object
    end: int


def span_terms(node) -> List[str]:
    """extractTerms in query-tree order (callers sort/dedup as the
    SpanWeight TreeSet does)."""
    if isinstance(node, SpanTerm):
        return [node.term]
    if isinstance(node, SpanNear):
        return [t for c in node.clauses for t in span_terms(c)]
    if isinstance(node, SpanOr):
        return [t for c in node.clauses for t in span_terms(c)]
    if isinstance(node, SpanNot):
        # SpanNotQuery.extractTerms adds ONLY the include terms (the
        # exclude side does not contribute to the weight)
        return span_terms(node.include)
    if isinstance(node, SpanFirst):
        return span_terms(node.match)
    raise TypeError(f"not a span node: {node!r}")


def positions_terms(node) -> List[str]:
    """All terms whose positions the evaluator needs (include +
    exclude sides)."""
    if isinstance(node, SpanNot):
        return positions_terms(node.include) + positions_terms(node.exclude)
    if isinstance(node, (SpanNear, SpanOr)):
        return [t for c in node.clauses for t in positions_terms(c)]
    if isinstance(node, SpanFirst):
        return positions_terms(node.match)
    return span_terms(node)


# -- single-document span iterators -----------------------------------------
# Protocol: .next() -> bool advances to the next span; .start/.end hold
# the current span and KEEP their last values after exhaustion (Java
# Spans semantics relied on by shrinkToAfterShortestMatch).


class _TermSpans:
    """TermSpans.java: start = position, end = position + 1."""

    __slots__ = ("arr", "n", "i", "start", "end")

    def __init__(self, positions: np.ndarray):
        self.arr = positions
        self.n = len(positions)
        self.i = 0
        self.start = -1
        self.end = -1

    def next(self) -> bool:
        if self.i < self.n:
            self.start = int(self.arr[self.i])
            self.end = self.start + 1
            self.i += 1
            return True
        return False


def _ordered4(s1: int, e1: int, s2: int, e2: int) -> bool:
    """NearSpansOrdered.docSpansOrdered(int,int,int,int)."""
    return (e1 < e2) if s1 == s2 else (s1 < s2)


class _NearOrdered:
    """NearSpansOrdered.java, single-doc: stretchToOrder +
    shrinkToAfterShortestMatch with the exact advance rules."""

    __slots__ = ("subs", "slop", "first_time", "more", "in_same_doc",
                 "start", "end")

    def __init__(self, subs: list, slop: int):
        self.subs = subs
        self.slop = slop
        self.first_time = True
        self.more = False
        self.in_same_doc = False
        self.start = -1
        self.end = -1

    def next(self) -> bool:
        if self.first_time:
            self.first_time = False
            for s in self.subs:
                if not s.next():
                    self.more = False
                    return False
            self.more = True
            self.in_same_doc = True
        while self.more and self.in_same_doc:
            if self._stretch_to_order() and self._shrink():
                return True
        return False

    def _stretch_to_order(self) -> bool:
        subs = self.subs
        for i in range(1, len(subs)):
            if not self.in_same_doc:
                break
            while not _ordered4(subs[i - 1].start, subs[i - 1].end,
                                subs[i].start, subs[i].end):
                if not subs[i].next():
                    self.in_same_doc = False
                    self.more = False
                    break
        return self.in_same_doc

    def _shrink(self) -> bool:
        subs = self.subs
        match_start = subs[-1].start
        match_end = subs[-1].end
        match_slop = 0
        last_start, last_end = match_start, match_end
        for i in range(len(subs) - 2, -1, -1):
            prev = subs[i]
            prev_start, prev_end = prev.start, prev.end
            while True:  # advance prev until after (last_start, last_end)
                if not prev.next():
                    self.in_same_doc = False
                    self.more = False
                    break
                pp_start, pp_end = prev.start, prev.end
                if not _ordered4(pp_start, pp_end, last_start, last_end):
                    break  # prev now positioned after the match
                prev_start, prev_end = pp_start, pp_end
            if match_start > prev_end:  # only non-overlap adds slop
                match_slop += match_start - prev_end
            match_start = prev_start
            last_start, last_end = prev_start, prev_end
        self.start = match_start
        self.end = match_end
        return match_slop <= self.slop


class _NearUnordered:
    """NearSpansUnordered.java, single-doc: CellQueue ordered by
    (start, end) (docSpansOrdered tie rule), running totalLength, max
    cell by strictly-greater end, match when
    max.end - min.start - totalLength <= slop."""

    __slots__ = ("cells", "slop", "first_time", "more", "total_length",
                 "max_cell", "heap", "start", "end", "_stamp")

    def __init__(self, subs: list, slop: int):
        self.cells = subs
        self.slop = slop
        self.first_time = True
        self.more = True
        self.total_length = 0
        self.max_cell = None
        self.heap: list = []
        self.start = -1
        self.end = -1
        self._stamp = 0  # heap tiebreak for equal (start, end)

    def next(self) -> bool:
        if self.first_time:
            self.first_time = False
            for cell in self.cells:
                if not cell.next():  # initList: all clauses must start
                    self.more = False
                    return False
                # SpansCell.adjust: maintain totalLength and max
                self.total_length += cell.end - cell.start
                if self.max_cell is None or cell.end > self.max_cell.end:
                    self.max_cell = cell
            for cell in self.cells:
                self._push(cell)
        elif self.more:
            top = self._top()
            old_len = top.end - top.start
            if top.next():
                self.total_length += (top.end - top.start) - old_len
                if self.max_cell is None or top.end > self.max_cell.end:
                    self.max_cell = top
                self._reheap_top()
            else:
                self.more = False
        while self.more:
            if self._at_match():
                mn = self._top()
                self.start = mn.start
                self.end = self.max_cell.end
                return True
            top = self._top()
            old_len = top.end - top.start
            if top.next():
                self.total_length += (top.end - top.start) - old_len
                if self.max_cell is None or top.end > self.max_cell.end:
                    self.max_cell = top
                self._reheap_top()
            else:
                self.more = False
        return False

    def _key(self, cell):
        self._stamp += 1
        return (cell.start, cell.end, self._stamp)

    def _push(self, cell):
        heapq.heappush(self.heap, (*self._key(cell), cell))

    def _top(self):
        return self.heap[0][3]

    def _reheap_top(self):
        _, _, _, cell = heapq.heappop(self.heap)
        self._push(cell)

    def _at_match(self) -> bool:
        return (self.max_cell.end - self._top().start
                - self.total_length) <= self.slop


class _SpanOr:
    """SpanOrQuery.java spans: SpanQueue ordered (start, end); next()
    advances the top, pops exhausted clauses."""

    __slots__ = ("heap", "first_time", "subs", "start", "end", "_stamp")

    def __init__(self, subs: list):
        self.subs = subs
        self.heap: list = []
        self.first_time = True
        self.start = -1
        self.end = -1
        self._stamp = 0

    def _push(self, s):
        self._stamp += 1
        heapq.heappush(self.heap, (s.start, s.end, self._stamp, s))

    def next(self) -> bool:
        if self.first_time:
            self.first_time = False
            for s in self.subs:  # initSpanQueue
                if s.next():
                    self._push(s)
        else:
            if not self.heap:
                return False
            _, _, _, top = heapq.heappop(self.heap)
            if top.next():
                self._push(top)
        if not self.heap:
            return False
        top = self.heap[0][3]
        self.start, self.end = top.start, top.end
        return True


class _SpanNot:
    """SpanNotQuery.java spans, single-doc: include spans that do not
    overlap any exclude span."""

    __slots__ = ("inc", "exc", "more_inc", "more_exc", "start", "end")

    def __init__(self, include, exclude):
        self.inc = include
        self.exc = exclude
        self.more_inc = True
        self.more_exc = exclude.next()  # ctor advances exclude once
        self.start = -1
        self.end = -1

    def next(self) -> bool:
        if self.more_inc:
            self.more_inc = self.inc.next()
        while self.more_inc and self.more_exc:
            while self.more_exc and self.exc.end <= self.inc.start:
                self.more_exc = self.exc.next()  # exclude is before
            if (not self.more_exc
                    or self.inc.end <= self.exc.start):
                break  # no intersection: match
            self.more_inc = self.inc.next()  # intersected: keep going
        if self.more_inc:
            self.start, self.end = self.inc.start, self.inc.end
        return self.more_inc


class _SpanFirst:
    """SpanFirstQuery acceptPosition (SpanFirstQuery.java:acceptPosition
    via SpanPositionCheckQuery.doNext): YES iff end() <= limit;
    start() >= limit would skip to the next doc — exhaustion here."""

    __slots__ = ("sub", "limit", "start", "end")

    def __init__(self, sub, limit: int):
        self.sub = sub
        self.limit = limit
        self.start = -1
        self.end = -1

    def next(self) -> bool:
        if not self.sub.next():
            return False
        while True:
            if self.sub.start >= self.limit:
                return False  # NO_AND_ADVANCE -> next doc -> exhausted
            if self.sub.end <= self.limit:
                self.start, self.end = self.sub.start, self.sub.end
                return True
            if not self.sub.next():  # NO: try next span
                return False


def build_spans(node, pos_of) -> object:
    """Instantiate the single-doc iterator tree for one document.
    ``pos_of(term)`` -> ascending np.ndarray of the term's positions in
    the doc (empty array if absent)."""
    if isinstance(node, SpanTerm):
        return _TermSpans(pos_of(node.term))
    if isinstance(node, SpanNear):
        subs = [build_spans(c, pos_of) for c in node.clauses]
        if node.in_order:
            return _NearOrdered(subs, node.slop)
        return _NearUnordered(subs, node.slop)
    if isinstance(node, SpanOr):
        return _SpanOr([build_spans(c, pos_of) for c in node.clauses])
    if isinstance(node, SpanNot):
        return _SpanNot(build_spans(node.include, pos_of),
                        build_spans(node.exclude, pos_of))
    if isinstance(node, SpanFirst):
        return _SpanFirst(build_spans(node.match, pos_of), node.end)
    raise TypeError(f"not a span node: {node!r}")


def span_freq(node, pos_of) -> np.float32:
    """SpanScorer.setFreqCurrentDoc for one doc: f32 freq accumulated
    in match order, each match adding 1/(matchLength + 1) computed in
    f32 (sloppyFreq)."""
    it = build_spans(node, pos_of)
    freq = F32(0.0)
    while it.next():
        freq = F32(freq + F32(1.0) / F32((it.end - it.start) + 1))
    return freq


def field_masking_span_near(streams, steps):
    """FieldMaskingSpanQuery (search/spans/FieldMaskingSpanQuery.java:
    the maskedQuery's spans are reported AS IF they came from the
    masking field, letting SpanNear compose position-aligned PARALLEL
    fields — the reference's teacherid/first/last example; getField()
    lies, the positions are the wrapped field's own). Relational form:
    each step scans ITS OWN field's position stream, the adjacency
    join runs in the shared position space.

    ``streams``: {field: DataFrame(doc_id, pos, term)};
    ``steps``: [(field, term)] — the ordered slop=0 SpanNear shape.
    Returns (doc_id, matches) like span_payload_check.

    Scale shape: one pushed-down (term-filtered) scan per step,
    (len-1) adjacency equi-joins keyed (doc_id, pos), one count agg —
    no UDF, no cross-field shuffle beyond the join keys."""
    from pyspark.sql import functions as F

    fld0, t0 = steps[0]
    m = streams[fld0].filter(F.col("term") == t0).select(
        "doc_id", F.col("pos").alias("p0"))
    for i, (fld, t) in enumerate(steps[1:], start=1):
        nxt = streams[fld].filter(F.col("term") == t).select(
            "doc_id", F.col("pos").alias(f"p{i}"))
        m = m.join(nxt, "doc_id").filter(
            F.col(f"p{i}") == F.col(f"p{i-1}") + 1)
    return (m.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("matches"))
            .orderBy("doc_id"))
