"""HTMLStrip offset correction (charfilter/BaseCharFilter.java:44-118
correct/addOffCorrectMap + the HTMLStripCharFilter offset behavior):
hand-traced golden vectors for the OffsetMap port and for token
offsets through the offset-correcting html_strip chain, plus the
round-trip property that slicing the ORIGINAL text at corrected
offsets yields exactly the token's source characters."""

import pytest

from lucene_solr_spark.functions.analysis import (
    OffsetMap,
    get_analyzer,
    html_strip_with_offsets,
)
from lucene_solr_spark.search.classic_highlighter import token_stream
from lucene_solr_spark.search.fvh import _term_stack


def test_offsetmap_correct_semantics():
    # BaseCharFilter.correct: identity before the first pair; last
    # pair at-or-before otherwise; repeated offset overwrites
    m = OffsetMap()
    assert m.correct(5) == 5
    m.add(3, 2)
    m.add(7, 6)
    assert m.correct(0) == 0
    assert m.correct(2) == 2
    assert m.correct(3) == 5
    assert m.correct(6) == 8
    assert m.correct(7) == 13
    assert m.correct(100) == 106
    m.add(7, 9)          # overwrite path (:113-116)
    assert m.correct(7) == 16
    with pytest.raises(ValueError):
        m.add(5, 1)      # monotonicity assert (:108-111)


def test_html_strip_offsets_entity():
    text = "fish &amp; chips"
    stripped, omap = html_strip_with_offsets(text)
    assert stripped == "fish & chips"
    # 'chips' at stripped [7,12) -> original [11,16)
    assert omap.correct(7) == 11
    assert omap.correct(12) == 16
    # '&' itself at stripped [5,6): start is pre-correction-point
    assert omap.correct(5) == 5


def test_html_strip_offsets_tags():
    text = "<p>Hello <b>World</b></p>"
    stripped, omap = html_strip_with_offsets(text)
    assert stripped == " Hello  World  "
    # 'World' at stripped [8,13) -> original [12,17)
    assert stripped[8:13] == "World"
    assert omap.correct(8) == 12
    assert omap.correct(13) == 17
    assert text[12:17] == "World"


@pytest.mark.parametrize("html,tokens", [
    ("<p>alpha <b>merge</b> beta</p>", ["alpha", "merge", "beta"]),
    # 'a' and 'this' are stop-filtered by the standard chain
    ("a&lt;b &amp; c&gt;d", ["b", "c", "d"]),
    ("<script>var x = 'merge';</script>plain merge", ["plain", "merge"]),
    ("<!-- merge --><i>only</i> words", ["only", "words"]),
])
def test_token_offsets_roundtrip(html, tokens):
    """Both highlighter token streams must emit offsets that slice the
    ORIGINAL html to the token's exact source characters."""
    an = get_analyzer("html_strip_std")
    for stream_fn in (_term_stack, token_stream):
        stack = stream_fn(html, an)
        assert [t for t, _p, _s, _e in stack] == tokens
        for t, _p, s, e in stack:
            assert html[s:e].lower() == t, (stream_fn, t, s, e)


def test_entities_inside_token_offsets():
    # decoded entity merges into one token; offsets span the source
    # entity text (HTMLStripCharFilter's corrected-offset behavior)
    an = get_analyzer("html_strip_std")
    stack = token_stream("me&#114;ge works", an)
    assert [t for t, _p, _s, _e in stack] == ["merge", "works"]
    t, _p, s, e = stack[0]
    assert (s, e) == (0, 10)
    assert "me&#114;ge works"[s:e] == "me&#114;ge"

def test_unknown_entity_passthrough():
    stripped, omap = html_strip_with_offsets("a &nosuch; b")
    assert stripped == "a &nosuch; b"
    assert omap.correct(11) == 11
