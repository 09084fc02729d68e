"""Span query gates (lucene/core/.../search/spans/): hand-traced
golden vectors for the single-doc iterator algebra (NearSpansOrdered /
NearSpansUnordered / SpanOr / SpanNot / SpanFirst match enumeration),
then engine-vs-oracle duels over the built fixture — the dual
execution exercises the engine's codec decode, candidate-doc
recursion and distributed kernel against the oracle's raw-position
full walk."""

import numpy as np
import pytest

from lucene_solr_spark.fixtures import PHRASE_QUERY_SET
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.spans import (
    SpanFirst,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanTerm,
    span_freq,
)

F32 = np.float32


def _pos(d):
    return lambda t: np.asarray(d.get(t, []), np.int64)


class TestGoldenVectors:
    def test_ordered_basic_and_shrink(self):
        """"a ... b" ordered: b@1 pairs with closest a (0) at slop 0;
        the second enumeration (a@5, b@9) exceeds slop."""
        f = span_freq(SpanNear((SpanTerm("a"), SpanTerm("b")), 0, True),
                      _pos({"a": [0, 5], "b": [1, 9]}))
        assert f.tobytes() == F32(F32(1.0) / F32(3)).tobytes()

    def test_ordered_rejects_reversed(self):
        f = span_freq(SpanNear((SpanTerm("a"), SpanTerm("b")), 5, True),
                      _pos({"a": [4], "b": [0]}))
        assert f == F32(0.0)

    def test_unordered_both_directions(self):
        q = SpanNear((SpanTerm("a"), SpanTerm("b")), 1, False)
        assert span_freq(q, _pos({"a": [0], "b": [2]})) == F32(0.25)
        assert span_freq(q, _pos({"a": [2], "b": [0]})) == F32(0.25)
        # atMatch: max.end - min.start - totalLength <= slop
        assert span_freq(q, _pos({"a": [0], "b": [3]})) == F32(0.0)

    def test_three_clause_ordered_slop(self):
        # match [0,5): slop = (2-1) + (4-3) = 2; length 5 -> 1/6
        f = span_freq(
            SpanNear((SpanTerm("a"), SpanTerm("b"), SpanTerm("c")),
                     2, True),
            _pos({"a": [0], "b": [2], "c": [4]}))
        assert f.tobytes() == F32(F32(1.0) / F32(6)).tobytes()

    def test_span_or_sums_all_positions(self):
        f = span_freq(SpanOr((SpanTerm("a"), SpanTerm("b"))),
                      _pos({"a": [1, 4], "b": [0, 2, 9]}))
        assert f == F32(2.5)  # five 1-wide spans at 1/2 each

    def test_span_not_overlap_rules(self):
        inc = SpanNear((SpanTerm("a"), SpanTerm("b")), 0, True)
        q = SpanNot(inc, SpanTerm("c"))
        # c@10 kills the [10,12) pair, [0,2) survives
        f = span_freq(q, _pos({"a": [0, 10], "b": [1, 11], "c": [10]}))
        assert f.tobytes() == F32(F32(1.0) / F32(3)).tobytes()
        # exclude strictly before include start: no overlap
        f = span_freq(q, _pos({"a": [5], "b": [6], "c": [4]}))
        assert f.tobytes() == F32(F32(1.0) / F32(3)).tobytes()
        # exclude at include end boundary (exc.start == inc.end): keeps
        f = span_freq(q, _pos({"a": [5], "b": [6], "c": [7]}))
        assert f.tobytes() == F32(F32(1.0) / F32(3)).tobytes()

    def test_span_first_end_boundary(self):
        assert span_freq(SpanFirst(SpanTerm("a"), 4),
                         _pos({"a": [3, 8]})) == F32(0.5)
        assert span_freq(SpanFirst(SpanTerm("a"), 3),
                         _pos({"a": [3, 8]})) == F32(0.0)

    def test_nested_or_in_near(self):
        """near(or(a, b), c, slop 1, ordered): either leading term."""
        q = SpanNear((SpanOr((SpanTerm("a"), SpanTerm("b"))),
                      SpanTerm("c")), 1, True)
        f = span_freq(q, _pos({"a": [0], "b": [7], "c": [2, 8]}))
        # a@0 -> c@2 slop 1 (len 3, 1/4); b@7 -> c@8 slop 0 (len 2, 1/3)
        assert f.tobytes() == F32(
            F32(F32(1.0) / F32(4)) + F32(F32(1.0) / F32(3))
        ).tobytes()


def _spanset():
    """Span queries over fixture phrase vocabulary."""
    w = {}
    for ph in PHRASE_QUERY_SET[:4]:
        for t in ph.split():
            w[t] = True
    ts = list(w)  # seven hundred doc two one thousand seventy...
    a, b, c, d = ts[0], ts[1], ts[2], ts[3]
    return [
        SpanNear((SpanTerm(a), SpanTerm(b)), 0, True),
        SpanNear((SpanTerm(a), SpanTerm(b)), 3, True),
        SpanNear((SpanTerm(a), SpanTerm(b)), 2, False),
        SpanNear((SpanTerm(b), SpanTerm(c), SpanTerm(a)), 4, False),
        SpanOr((SpanTerm(a), SpanTerm(c))),
        SpanNot(SpanNear((SpanTerm(a), SpanTerm(b)), 4, True),
                SpanTerm(c)),
        SpanFirst(SpanTerm(b), 12),
        SpanNear((SpanOr((SpanTerm(a), SpanTerm(d))), SpanTerm(b)),
                 1, True),
        SpanNot(SpanTerm(a), SpanTerm("nonexistent_phrase_term")),
    ]


@pytest.mark.parametrize("qi", range(9))
def test_spans_rank_identical(spark, built, qi):
    """Engine span kernel vs oracle raw-position walk: docIDs and f32
    score bits identical for every span shape."""
    span = _spanset()[qi]
    index_dir, oracle = built
    searcher = IndexSearcher(spark, index_dir)
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in searcher.search_spans(span, k=10).collect()
    ]
    want = oracle.search_spans(span, k=10)
    assert [d for d, _ in got] == [d for d, _ in want], span
    for (dg, sg), (dw, sw) in zip(got, want):
        assert sg.tobytes() == np.float32(sw).tobytes(), span


def test_span_near_exact_matches_phrase_docset(spark, built):
    """Ordered slop-0 two-term span near matches the exact-phrase doc
    set (spans count every minimal pair, phrase counts aligned starts —
    doc SETS agree for adjacent pairs)."""
    index_dir, _ = built
    searcher = IndexSearcher(spark, index_dir)
    a, b = PHRASE_QUERY_SET[0].split()
    span_docs = {
        r["doc_id"] for r in searcher.search_spans(
            SpanNear((SpanTerm(a), SpanTerm(b)), 0, True), k=None
        ).collect()
    }
    phrase_docs = {
        r["doc_id"]
        for r in searcher.search_phrase(PHRASE_QUERY_SET[0],
                                        k=None).collect()
    }
    assert span_docs == phrase_docs


class TestComplexPhrase:
    """ComplexPhraseQueryParser surface (queryparser/complexPhrase/):
    phrase positions holding prefix/wildcard/fuzzy terms rewrite to
    SpanOr-inside-SpanNear; plain phrases must agree with the direct
    span construction, and expansion edge cases must behave like the
    embedded parser (TooManyClauses / unsatisfiable position)."""

    def test_plain_equals_manual_span(self, spark, built):
        index_dir, _ = built
        s = IndexSearcher(spark, index_dir)
        a, b = PHRASE_QUERY_SET[0].split()
        got = s.search_complex_phrase(f"{a} {b}", slop=0, k=10).collect()
        want = s.search_spans(
            SpanNear((SpanTerm(a), SpanTerm(b)), 0, True), k=10).collect()
        assert [(r["doc_id"], np.float32(r["score"]).tobytes())
                for r in got] == \
               [(r["doc_id"], np.float32(r["score"]).tobytes())
                for r in want]

    def test_prefix_equals_manual_spanor(self, spark, built):
        index_dir, _ = built
        s = IndexSearcher(spark, index_dir)
        a, b = PHRASE_QUERY_SET[0].split()
        stem = a[:3]
        terms = [r["term"] for r in s.expand_terms(
            __import__("pyspark.sql.functions", fromlist=["col"])
            .col("term").startswith(stem)).collect()]
        assert len(terms) > 1, "fixture stem must be multi-term"
        got = s.search_complex_phrase(f"{stem}* {b}", slop=1,
                                      k=None).collect()
        want = s.search_spans(
            SpanNear((SpanOr(tuple(SpanTerm(t) for t in terms)),
                      SpanTerm(b)), 1, True), k=None).collect()
        assert [(r["doc_id"], np.float32(r["score"]).tobytes())
                for r in got] == \
               [(r["doc_id"], np.float32(r["score"]).tobytes())
                for r in want]

    def test_unsatisfiable_position_empty(self, spark, built):
        index_dir, _ = built
        s = IndexSearcher(spark, index_dir)
        a = PHRASE_QUERY_SET[0].split()[0]
        assert s.search_complex_phrase(
            f"zzzzqqqq* {a}", k=10).count() == 0

    def test_fuzzy_position(self, spark, built):
        """A fuzzy position must cover at least the exact term's docs
        when paired with the same neighbor."""
        index_dir, _ = built
        s = IndexSearcher(spark, index_dir)
        a, b = PHRASE_QUERY_SET[0].split()
        exact = {r["doc_id"] for r in
                 s.search_complex_phrase(f"{a} {b}", k=None).collect()}
        fuzzy = {r["doc_id"] for r in
                 s.search_complex_phrase(f"{a}~ {b}", k=None).collect()}
        assert exact <= fuzzy
