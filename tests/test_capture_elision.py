"""Golden gates for PatternCaptureGroupTokenFilter (every vector from
lucene/analysis/common/src/test/.../pattern/
TestPatternCaptureGroupTokenFilter.java, terms + position increments),
ElisionFilter and EnglishPossessiveFilter."""

import pytest

from lucene_solr_spark.functions.analysis import (
    elision_post,
    english_possessive_post,
    pattern_capture_post,
)


def _ws(text):
    """MockTokenizer.WHITESPACE, positions = token index."""
    return [(t, i) for i, t in enumerate(text.split())]


def _expected(tokens, incrs):
    pos, out = -1, []
    for t, inc in zip(tokens, incrs):
        pos += inc
        out.append((t, pos))
    return out


# (input, patterns, tokens, increments, preserve_original) —
# TestPatternCaptureGroupTokenFilter.java vectors verbatim
VECTORS = [
    ("foobarbaz", [], ["foobarbaz"], [1], False),
    ("foobarbaz", [], ["foobarbaz"], [1], True),
    ("foo bar baz", [], ["foo", "bar", "baz"], [1, 1, 1], False),
    ("foo bar baz", [], ["foo", "bar", "baz"], [1, 1, 1], True),
    ("foobarbaz", ["xx"], ["foobarbaz"], [1], False),
    ("foobarbaz", ["xx"], ["foobarbaz"], [1], True),
    ("foobarbaz", [".."], ["foobarbaz"], [1], False),
    ("foobarbaz", [".."], ["foobarbaz"], [1], True),
    ("foobarbaz", [".(y*)"], ["foobarbaz"], [1], False),
    ("foobarbaz", [".(y*)"], ["foobarbaz"], [1], True),
    ("foobarbaz", ["(.+)"], ["foobarbaz"], [1], False),
    ("foobarbaz", ["(.+)"], ["foobarbaz"], [1], True),
    ("foo bar baz", ["(.+)"], ["foo", "bar", "baz"], [1, 1, 1], False),
    ("foo bar baz", ["(.+)"], ["foo", "bar", "baz"], [1, 1, 1], True),
    ("foobarbaz", ["^(.)"], ["f"], [1], False),
    ("foobarbaz", ["^(.)"], ["foobarbaz", "f"], [1, 0], True),
    ("foo bar baz", ["^(.)"], ["f", "b", "b"], [1, 1, 1], False),
    ("foo bar baz", ["^(.)"],
     ["foo", "f", "bar", "b", "baz", "b"], [1, 0, 1, 0, 1, 0], True),
    ("foobarbaz", ["^.(.)."], ["o"], [1], False),
    ("foobarbaz", ["^.(.)."], ["foobarbaz", "o"], [1, 0], True),
    ("foo bar baz", ["^.(.)."], ["o", "a", "a"], [1, 1, 1], False),
    ("foo bar baz", ["^.(.)."],
     ["foo", "o", "bar", "a", "baz", "a"], [1, 0, 1, 0, 1, 0], True),
    ("foobarbaz", ["(.)$"], ["z"], [1], False),
    ("foobarbaz", ["(.)$"], ["foobarbaz", "z"], [1, 0], True),
    ("foo bar baz", ["(.)$"], ["o", "r", "z"], [1, 1, 1], False),
    ("foo bar baz", ["(.)$"],
     ["foo", "o", "bar", "r", "baz", "z"], [1, 0, 1, 0, 1, 0], True),
    ("foobarbaz", ["^(.)(.)"], ["f", "o"], [1, 0], False),
    ("foobarbaz", ["^(.)(.)"], ["foobarbaz", "f", "o"], [1, 0, 0], True),
    ("foo bar baz", ["^(.)(.)"],
     ["f", "o", "b", "a", "b", "a"], [1, 0, 1, 0, 1, 0], False),
    ("foo bar baz", ["^(.)(.)"],
     ["foo", "f", "o", "bar", "b", "a", "baz", "b", "a"],
     [1, 0, 0, 1, 0, 0, 1, 0, 0], True),
    ("foobarbaz", ["^(.).+(.)$"], ["f", "z"], [1, 0], False),
    ("foobarbaz", ["^(.).+(.)$"],
     ["foobarbaz", "f", "z"], [1, 0, 0], True),
    ("foo bar baz", ["^(.).+(.)$"],
     ["f", "o", "b", "r", "b", "z"], [1, 0, 1, 0, 1, 0], False),
    ("foo bar baz", ["^(.).+(.)$"],
     ["foo", "f", "o", "bar", "b", "r", "baz", "b", "z"],
     [1, 0, 0, 1, 0, 0, 1, 0, 0], True),
    ("foobarbaz", ["(.)(.)$"], ["a", "z"], [1, 0], False),
    ("foobarbaz", ["(.)(.)$"], ["foobarbaz", "a", "z"], [1, 0, 0], True),
    ("foo bar baz", ["(.)(.)$"],
     ["o", "o", "a", "r", "a", "z"], [1, 0, 1, 0, 1, 0], False),
    ("foo bar baz", ["(.)(.)$"],
     ["foo", "o", "o", "bar", "a", "r", "baz", "a", "z"],
     [1, 0, 0, 1, 0, 0, 1, 0, 0], True),
    ("foobarbaz", ["(.(.(.)))"],
     ["foo", "oo", "o", "bar", "ar", "r", "baz", "az", "z"],
     [1, 0, 0, 0, 0, 0, 0, 0, 0], False),
    ("foobarbaz", ["(.(.(.)))"],
     ["foobarbaz", "foo", "oo", "o", "bar", "ar", "r", "baz", "az", "z"],
     [1, 0, 0, 0, 0, 0, 0, 0, 0, 0], True),
    ("foo bar baz", ["(.(.(.)))"],
     ["foo", "oo", "o", "bar", "ar", "r", "baz", "az", "z"],
     [1, 0, 0, 1, 0, 0, 1, 0, 0], False),
    ("foo bar baz", ["(.(.(.)))"],
     ["foo", "oo", "o", "bar", "ar", "r", "baz", "az", "z"],
     [1, 0, 0, 1, 0, 0, 1, 0, 0], True),
    ("aaabbbaaa", ["(aaa)", "(bbb)", "(ccc)"],
     ["aaa", "bbb", "aaa"], [1, 0, 0], False),
    ("aaabbbaaa", ["(aaa)", "(bbb)", "(ccc)"],
     ["aaabbbaaa", "aaa", "bbb", "aaa"], [1, 0, 0, 0], True),
    ("aaa bbb aaa", ["(aaa)", "(bbb)", "(ccc)"],
     ["aaa", "bbb", "aaa"], [1, 1, 1], False),
    ("aaa bbb aaa", ["(aaa)", "(bbb)", "(ccc)"],
     ["aaa", "bbb", "aaa"], [1, 1, 1], True),
    ("letsPartyLIKEits1999_dude",
     ["([A-Z]{2,})", "(?<![A-Z])([A-Z][a-z]+)",
      r"(?:^|\b|(?<=[0-9_])|(?<=[A-Z]{2}))([a-z]+)", "([0-9]+)"],
     ["lets", "Party", "LIKE", "its", "1999", "dude"],
     [1, 0, 0, 0, 0, 0], False),
    ("letsPartyLIKEits1999_dude",
     ["([A-Z]{2,})", "(?<![A-Z])([A-Z][a-z]+)",
      r"(?:^|\b|(?<=[0-9_])|(?<=[A-Z]{2}))([a-z]+)", "([0-9]+)"],
     ["letsPartyLIKEits1999_dude",
      "lets", "Party", "LIKE", "its", "1999", "dude"],
     [1, 0, 0, 0, 0, 0, 0], True),
]


@pytest.mark.parametrize("i", range(len(VECTORS)))
def test_pattern_capture_vectors(i):
    text, pats, tokens, incrs, preserve = VECTORS[i]
    post = pattern_capture_post(pats, preserve_original=preserve)
    assert post(_ws(text)) == _expected(tokens, incrs)


def test_elision():
    post = elision_post()
    toks = [("l'avion", 0), ("d'avion", 1), ("qu’elle", 2),
            ("x'y", 3), ("L'avion", 4), ("sans", 5), ("l'", 6)]
    assert post(toks) == [
        ("avion", 0), ("avion", 1), ("elle", 2),
        ("x'y", 3), ("avion", 4), ("sans", 5), ("", 6)]


def test_english_possessive():
    post = english_possessive_post()
    toks = [("dog's", 0), ("DOG'S", 1), ("dog’s", 2), ("dogs'", 3),
            ("'s", 4), ("s", 5), ("its", 6)]
    assert post(toks) == [
        ("dog", 0), ("DOG", 1), ("dog", 2), ("dogs'", 3),
        ("", 4), ("s", 5), ("its", 6)]
