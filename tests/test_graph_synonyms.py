"""Query-time multi-word synonym graph expansion (r2 verdict item 9):
expand_graph_query must build the SpanNear-of-SpanOr tree the
reference's QueryBuilder builds from graph token streams, and the
resulting spans must MATCH (via the reference-ported span iterators)
documents phrased either way."""

import pytest

from lucene_solr_spark.functions.synonyms import (
    SynonymMapBuilder,
    expand_graph_query,
)
from lucene_solr_spark.search.spans import (
    SpanNear,
    SpanOr,
    SpanTerm,
    span_freq,
)


def _posmap(text):
    pos = {}
    for i, t in enumerate(text.split()):
        pos.setdefault(t, []).append(i)
    return lambda t: pos.get(t, [])


def _matches(node, text):
    return float(span_freq(node, _posmap(text))) > 0.0


def _equiv_map(a, b):
    """Solr equivalent set 'a, b' with expand: both directions, orig
    kept."""
    m = SynonymMapBuilder()
    m.add(a, b, include_orig=True)
    m.add(b, a, include_orig=True)
    return m.build()


def test_two_word_synonym_expands_phrase():
    syn = _equiv_map(("fast", "merge"), ("table",))
    q = expand_graph_query(["fast", "merge"], syn)
    # single element: SpanOr(orig SpanNear, SpanTerm alternative)
    assert isinstance(q, SpanOr)
    assert q.clauses[0] == SpanNear(
        (SpanTerm("fast"), SpanTerm("merge")), slop=0, in_order=True)
    assert SpanTerm("table") in q.clauses
    assert _matches(q, "a fast merge b")
    assert _matches(q, "big table scan")      # the two-word rule's twin
    assert not _matches(q, "fast scan merge")  # not adjacent


def test_single_word_expands_to_two_word_phrase():
    syn = _equiv_map(("table",), ("fast", "merge"))
    q = expand_graph_query(["big", "table", "scan"], syn)
    assert isinstance(q, SpanNear) and len(q.clauses) == 3
    mid = q.clauses[1]
    assert isinstance(mid, SpanOr)
    assert SpanTerm("table") in mid.clauses
    assert SpanNear((SpanTerm("fast"), SpanTerm("merge")),
                    slop=0, in_order=True) in mid.clauses
    # phrase 'big table scan' matches text phrased with the synonym
    assert _matches(q, "big table scan")
    assert _matches(q, "big fast merge scan")
    assert not _matches(q, "big slow merge scan")


def test_replacement_rule_drops_original():
    m = SynonymMapBuilder()
    m.add(("fast", "merge"), ("table",), include_orig=False)
    syn = m.build()
    q = expand_graph_query(["fast", "merge"], syn)
    assert q == SpanTerm("table")
    assert _matches(q, "table scan")
    assert not _matches(q, "fast merge")


def test_greedy_longest_match_wins():
    m = SynonymMapBuilder()
    m.add(("fast",), ("quick",), include_orig=True)
    m.add(("fast", "merge"), ("table",), include_orig=True)
    syn = m.build()
    q = expand_graph_query(["fast", "merge"], syn)
    # the 2-token rule consumes both tokens; the 1-token rule is dead
    assert isinstance(q, SpanOr)
    assert SpanTerm("table") in q.clauses


def test_unmatched_tokens_pass_through():
    syn = _equiv_map(("fast", "merge"), ("table",))
    q = expand_graph_query(["window", "scan"], syn)
    assert q == SpanNear((SpanTerm("window"), SpanTerm("scan")),
                         slop=0, in_order=True)


def test_empty_raises():
    syn = _equiv_map(("a",), ("b",))
    with pytest.raises(ValueError):
        expand_graph_query([], syn)
