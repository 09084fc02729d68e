"""SloppyPhraseScorer re-expression (lucene/core/src/java/org/apache/
lucene/search/SloppyPhraseScorer.java): per-candidate-doc greedy match
enumeration over PhrasePositions, priority-queue ordered by adjusted
position (PhraseQueue.java:28-44 — position, then query offset, then
ord). Each match with matchLength <= slop contributes
computeSlopFactor(matchLength) = 1/(matchLength+1) (float32;
Similarity.sloppyFreq, similarities/BM25Similarity.java:70-72,246-248)
to the doc's phrase frequency; the scorer then feeds that float freq
through the normal score kernel (weightValue * freq / (freq + norm)).

The traversal is intentionally ORDER-DEPENDENT (the class javadoc
documents that "a b c"~4 and "c b a"~4 score differently on
"a b c b a"); this module mirrors the reference's exact advance rules,
including the repeating-terms handling (rptGroups / advanceRpts /
collide, SloppyPhraseScorer.java:150-213) for phrases that repeat a
term ("ho my my"). Multi-term (synonym) postings do not exist in this
engine, so the hasMultiTermRpts branches are structurally dead and the
simpler non-MTP group logic is always the faithful path.

Docs are pre-filtered to those containing ALL phrase terms (the
ConjunctionScorer doc-level walk that drives the reference scorer), so
the per-doc Python loop below runs on candidate docs only and is
linear in their position-list sizes — the same asymptotics as the
reference's per-doc work, embarrassingly parallel across partitions.
"""

from __future__ import annotations

import heapq
from typing import List, Sequence

import numpy as np

F32 = np.float32


class _PP:
    """PhrasePositions (search/PhrasePositions.java): position =
    term position - query offset, so an exact phrase aligns at equal
    positions."""

    __slots__ = ("arr", "n", "i", "offset", "ord", "pos",
                 "rpt_group", "rpt_ind")

    def __init__(self, arr: np.ndarray, offset: int, ord_: int):
        self.arr = arr
        self.n = len(arr)
        self.i = 0
        self.offset = int(offset)
        self.ord = int(ord_)
        self.pos = 0
        self.rpt_group = -1
        self.rpt_ind = -1

    def first_position(self) -> bool:
        self.i = 0
        return self.next_position()

    def next_position(self) -> bool:
        if self.i < self.n:
            self.pos = int(self.arr[self.i]) - self.offset
            self.i += 1
            return True
        return False

    def key(self):
        # PhraseQueue.lessThan: same doc -> position, offset, ord
        return (self.pos, self.offset, self.ord)


def sloppy_phrase_freq(
    pos_arrays: Sequence[np.ndarray],
    offsets: Sequence[int],
    terms: Sequence[str],
    slop: int,
) -> np.float32:
    """phraseFreq() (SloppyPhraseScorer.java:103-137) for one document.

    pos_arrays[i]: ascending raw positions of the i-th phrase clause's
    term in this doc (every clause's term MUST occur — callers
    pre-intersect doc sets); offsets[i]: the clause's query position
    (holes from stopword removal preserved); terms[i]: the clause term
    (repeat detection); slop: max allowed matchLength.
    """
    pps = [
        _PP(a, off, i)
        for i, (a, off) in enumerate(zip(pos_arrays, offsets))
    ]
    # repeat groups: clauses sharing a term, sorted by query offset
    # (gatherRptGroups; sorted "by (query) offset",
    # SloppyPhraseScorer.java:280+)
    by_term: dict = {}
    for pp, t in zip(pps, terms):
        by_term.setdefault(t, []).append(pp)
    rpt_groups: List[List[_PP]] = []
    for group in by_term.values():
        if len(group) > 1:
            group.sort(key=lambda p: p.offset)
            gi = len(rpt_groups)
            for j, p in enumerate(group):
                p.rpt_group = gi
                p.rpt_ind = j
            rpt_groups.append(group)
    has_rpts = bool(rpt_groups)

    heap: List[tuple] = []
    state = {"end": -(1 << 62)}

    def advance_pp(pp: _PP) -> bool:
        # advancePP (SloppyPhraseScorer.java:139-146)
        if not pp.next_position():
            return False
        if pp.pos > state["end"]:
            state["end"] = pp.pos
        return True

    def collide(pp: _PP) -> int:
        # collide (:194-204); tpPos = position + offset (non-MTP)
        tp_pos = pp.pos + pp.offset
        rg = rpt_groups[pp.rpt_group]
        for pp2 in rg:
            if pp2 is not pp and (pp2.pos + pp2.offset) == tp_pos:
                return pp2.rpt_ind
        return -1

    def lesser(a: _PP, b: _PP) -> _PP:
        # lesser (:185-191): position then offset
        if a.pos < b.pos or (a.pos == b.pos and a.offset < b.offset):
            return a
        return b

    def advance_rpts(pp: _PP) -> bool:
        # advanceRpts (:150-182): resolve repeater collisions by
        # advancing the lesser of the two colliders; re-queue every
        # in-queue pp that was advanced (pop to a stack until all
        # marked inds were seen, then push back).
        if pp.rpt_group < 0:
            return True
        rg = rpt_groups[pp.rpt_group]
        bits: set = set()
        k0 = pp.rpt_ind
        while True:
            k = collide(pp)
            if k < 0:
                break
            pp = lesser(pp, rg[k])
            if not advance_pp(pp):
                return False
            if k != k0:
                bits.add(k)
        stack: List[_PP] = []
        while bits:
            e = heapq.heappop(heap)
            pp2 = e[3]
            stack.append(pp2)
            if pp2.rpt_group >= 0 and pp2.rpt_ind in bits:
                bits.discard(pp2.rpt_ind)
        for pp2 in reversed(stack):
            heapq.heappush(heap, (*pp2.key(), pp2))
        return True

    # -- initPhrasePositions (:206-218 / initSimple / initComplex) ----
    state["end"] = -(1 << 62)
    heap.clear()
    if not has_rpts:
        for pp in pps:
            pp.first_position()
            if pp.pos > state["end"]:
                state["end"] = pp.pos
            heapq.heappush(heap, (*pp.key(), pp))
    else:
        for pp in pps:  # placeFirstPositions
            pp.first_position()
        # advanceRepeatGroups, non-MTP branch (:255-276): rg[j] starts
        # j positions in, so the initial state has no collisions
        for rg in rpt_groups:
            for j in range(1, len(rg)):
                for _ in range(j):
                    if not rg[j].next_position():
                        return F32(0.0)
        for pp in pps:  # fillQueue
            if pp.pos > state["end"]:
                state["end"] = pp.pos
            heapq.heappush(heap, (*pp.key(), pp))

    # -- the phraseFreq loop (:103-137) -------------------------------
    freq = F32(0.0)
    pp = heapq.heappop(heap)[3]
    match_length = state["end"] - pp.pos
    next_pos = heap[0][3].pos
    while advance_pp(pp):
        if has_rpts and not advance_rpts(pp):
            break
        if pp.pos > next_pos:  # done minimizing current match length
            if match_length <= slop:
                freq = F32(freq + (F32(1.0) / F32(match_length + 1)))
            heapq.heappush(heap, (*pp.key(), pp))
            pp = heapq.heappop(heap)[3]
            next_pos = heap[0][3].pos
            match_length = state["end"] - pp.pos
        else:
            ml2 = state["end"] - pp.pos
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        freq = F32(freq + (F32(1.0) / F32(match_length + 1)))
    return freq
