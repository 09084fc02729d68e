"""Property gates for the two round-5 boolean characterizations that
oracles and percolation rely on:

1. classic_hl_sloppy's oracle claims the 2-term unit-span
   NearSpansUnordered iterator emits EXACTLY the spans (p, q), p < q,
   where q is the FIRST opposite-term occurrence after p and
   q - p <= slop + 1 — fuzzed here against the real _NearUnordered
   walk over random position lists.

2. percolate_sloppy claims SloppyPhraseScorer freq > 0 iff some
   choice of one occurrence per clause has adjusted-position window
   max(p_j - o_j) - min(p_j - o_j) <= slop (repeat-free phrases) —
   fuzzed against the real sloppy_phrase_freq greedy walk.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from lucene_solr_spark.search.sloppy import sloppy_phrase_freq
from lucene_solr_spark.search.spans import _NearUnordered, _TermSpans

_POSLIST = st.lists(st.integers(0, 40), min_size=1, max_size=8,
                    unique=True).map(sorted)


def _disjoint(a, b):
    bset = set(b)
    return [x for x in a if x not in bset], b


@settings(max_examples=300, deadline=None)
@given(a=_POSLIST, b=_POSLIST, slop=st.integers(0, 6))
def test_unordered_two_term_span_rule(a, b, slop):
    a, b = _disjoint(a, b)
    if not a:
        return
    it = _NearUnordered(
        [_TermSpans(np.asarray(a, np.int64)),
         _TermSpans(np.asarray(b, np.int64))], slop)
    emitted = set()
    while it.next():
        emitted.add((it.start, it.end - 1))
    rule = set()
    for p, pterm in [(x, 0) for x in a] + [(x, 1) for x in b]:
        opp = b if pterm == 0 else a
        after = [q for q in opp if q > p]
        if not after:
            continue
        q = min(after)
        if q - p <= slop + 1:
            rule.add((p, q))
    assert emitted == rule, (a, b, slop)


@settings(max_examples=300, deadline=None)
@given(
    poss=st.lists(
        st.lists(st.integers(0, 30), min_size=1, max_size=6,
                 unique=True).map(sorted),
        min_size=2, max_size=4),
    offs_gaps=st.lists(st.integers(1, 3), min_size=1, max_size=3),
    slop=st.integers(0, 8),
)
def test_sloppy_freq_positive_iff_window(poss, offs_gaps, slop):
    """Repeat-free phrases: the greedy phraseFreq walk finds a match
    iff the minimal adjusted-position window fits in the slop — the
    existence form percolate_sloppy compiles."""
    import itertools

    n = len(poss)
    # distinct terms -> distinct position lists are fine as-is
    offs = [0]
    for g in offs_gaps[:n - 1]:
        offs.append(offs[-1] + g)
    while len(offs) < n:
        offs.append(offs[-1] + 1)
    terms = [f"t{i}" for i in range(n)]
    arrs = [np.asarray(p, np.int64) for p in poss]
    freq = sloppy_phrase_freq(arrs, offs, terms, slop)
    exists = any(
        max(p - o for p, o in zip(combo, offs))
        - min(p - o for p, o in zip(combo, offs)) <= slop
        for combo in itertools.product(*poss))
    assert (freq > 0) == exists, (poss, offs, slop, float(freq))
