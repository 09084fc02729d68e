"""PostingsHighlighter unit gates: sentence bounds, f32 PassageScorer
math (hand-derived), passage selection tie rule, formatter output."""

import math

import numpy as np

from lucene_solr_spark.search.postings_highlighter import (
    _norm,
    _tf,
    _weight,
    highlight_doc,
    sentence_bounds,
)

F32 = np.float32


def test_sentence_bounds():
    assert sentence_bounds("ab cd. ef gh") == [0, 7, 12]
    assert sentence_bounds("ab") == [0, 2]
    assert sentence_bounds("") == [0, 0]
    assert sentence_bounds("a. b. c") == [0, 3, 6, 7]


def test_scorer_math_f32():
    # weight = (k1+1) * (float)ln(1 + (numDocs+0.5)/(ttf+0.5))
    w = _weight(174, 3)
    nd = F32(1) + F32(174) / F32(87.0)
    want = (F32(1.2) + F32(1)) * F32(math.log(1 + (float(nd) + 0.5) / 3.5))
    assert w == want
    t = _tf(2, 50)
    nrm = F32(1.2) * (F32(0.25) + F32(0.75) * (F32(50) / F32(87.0)))
    assert t == F32(2) / (F32(2) + nrm)
    assert _norm(0) == F32(1) + F32(1) / F32(math.log(87.0))


def test_highlight_single_passage():
    content = "the quick fox. lazy dog fox"
    # occurrences of 'fox' at (10,13) and (24,27)
    ps = highlight_doc(content, [(10, 13, "fox"), (24, 27, "fox")],
                       max_passages=2)
    assert len(ps) == 2
    assert [p[0] for p in ps] == [0, 15]  # sorted by start
    assert ps[0][3] == "the quick <b>fox</b>. "
    assert ps[1][3] == "lazy dog <b>fox</b>"


def test_highlight_run_tf_and_order():
    # two terms in one passage: fold order = first occurrence order
    content = "aa bb aa"
    ps = highlight_doc(content, [(0, 2, "aa"), (3, 5, "bb"),
                                 (6, 8, "aa")], max_passages=1)
    (start, end, score, snip) = ps[0]
    assert snip == "<b>aa</b> <b>bb</b> <b>aa</b>"
    w_aa, w_bb = _weight(8, 2), _weight(8, 1)
    s = F32(0)
    s = F32(s + w_aa * _tf(2, 8))   # aa first (offset 0), run tf=2
    s = F32(s + w_bb * _tf(1, 8))
    s = F32(s * _norm(0))
    assert float(s) == score


def test_top_passage_selection():
    # second passage is shorter (no trailing '. ') -> larger tf beats
    # the first passage's position-norm boost; top-1 must pick it
    content = "x y. x y"
    full = highlight_doc(content, [(0, 1, "x"), (5, 6, "x")],
                         max_passages=2)
    assert full[1][2] > full[0][2]
    top = highlight_doc(content, [(0, 1, "x"), (5, 6, "x")],
                        max_passages=1)
    assert top[0][0] == 5


def test_no_matches():
    assert highlight_doc("abc def", []) == []
