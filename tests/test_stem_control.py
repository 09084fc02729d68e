"""Stemming-control pack gates (miscellaneous/SetKeywordMarkerFilter,
StemmerOverrideFilter, KeywordRepeatFilter, RemoveDuplicatesTokenFilter,
LimitTokenCountFilter, LimitTokenPositionFilter). Pure stream-level
tests — the Spark/oracle duel is the stem_control_terms entry."""

from lucene_solr_spark.functions.analysis import (
    get_analyzer, limit_token_count_post, limit_token_position_post,
    stem_control_post)
from lucene_solr_spark.functions.porter import porter_stem


def run(post, toks):
    return post([(t, i) for i, t in enumerate(toks)])


def test_override_wins_over_stemming():
    post = stem_control_post(porter_stem,
                             overrides={"customer": "client"})
    assert run(post, ["customer"]) == [("client", 0)]


def test_keyword_marker_blocks_stemmer():
    post = stem_control_post(porter_stem, keywords={"merge"})
    assert run(post, ["merge"]) == [("merge", 0)]
    # unprotected sibling still stems
    assert run(post, ["table"]) == [("tabl", 0)]


def test_keyword_repeat_emits_both_at_same_position():
    post = stem_control_post(porter_stem, repeat=True)
    assert run(post, ["table"]) == [("table", 0), ("tabl", 0)]


def test_remove_duplicates_collapses_identical_pair():
    # stem == original -> RemoveDuplicatesTokenFilter drops the copy
    post = stem_control_post(porter_stem, repeat=True)
    assert run(post, ["sort"]) == [("sort", 0)]


def test_full_chain_stream():
    spec = get_analyzer("stem_control_ws")
    got = spec.analyze_with_positions(
        "customer merge table sort window")
    assert got == [("client", 0), ("merge", 1), ("table", 2),
                   ("tabl", 2), ("sort", 3), ("pane", 4)]


def test_limit_token_count():
    post = limit_token_count_post(3)
    assert run(post, list("abcdef")) == [("a", 0), ("b", 1), ("c", 2)]
    assert run(post, ["a"]) == [("a", 0)]


def test_limit_token_position_uses_positions_not_count():
    post = limit_token_position_post(3)
    # a hole-bearing stream: positions 0,2,3,4 — position 2 survives
    # even though it is the second token; position 3 is the 1-based 4th
    got = post([("a", 0), ("c", 2), ("d", 3), ("e", 4)])
    assert got == [("a", 0), ("c", 2)]
