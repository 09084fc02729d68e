"""WordlistLoader parse rules (TestWordlistLoader.java vectors) and
the TeeSinkTokenFilter one-pass splitter."""

from lucene_solr_spark.functions.analysis import token_type
from lucene_solr_spark.functions.wordlists import (
    get_lines,
    get_snowball_word_set,
    get_stem_dict,
    get_word_set,
    tee_sink,
)


def test_word_set_basic():
    # TestWordlistLoader.testWordlistLoading
    s = get_word_set("ONE\n  two \nthree")
    assert s == {"ONE", "two", "three"}


def test_word_set_comments():
    # comment lines skipped on the RAW line prefix, others trimmed
    s = get_word_set("ONE\n#two\nthree\n # not a comment", comment="#")
    assert s == {"ONE", "three", "# not a comment".strip()}
    # a comment marker mid-line does NOT comment (startsWith only)
    assert get_word_set("three #tail", comment="#") == {"three #tail"}


def test_snowball_set():
    # TestWordlistLoader.testSnowballListLoading shape
    txt = ("  |comment\n"
           " |comment\n"
           "\n"
           "  \t\n"
           " |comment | comment\n"
           "ONE\n"
           "   two   \n"
           " three   four five \n"
           "six seven | comment\n")
    s = get_snowball_word_set(txt)
    assert s == {"ONE", "two", "three", "four", "five", "six", "seven"}


def test_stem_dict():
    d = get_stem_dict("running\trun\nmice\tmouse\nodd\tsplit\ttail")
    assert d == {"running": "run", "mice": "mouse",
                 "odd": "split\ttail"}  # split("\t", 2): one split


def test_get_lines():
    txt = "﻿#comment\none\n\n  two  \n#x\nthree"
    assert get_lines(txt) == ["one", "two", "three"]


def test_tee_sink_one_pass():
    tp = [("abc", 0), ("42", 1), ("de", 2), ("7", 3)]
    src, sinks = tee_sink(tp, {
        "nums": lambda t, p: token_type(t) == "<NUM>",
        "short": lambda t, p: len(t) <= 2,
    })
    assert src == tp  # source unchanged
    assert sinks["nums"] == [("42", 1), ("7", 3)]
    assert sinks["short"] == [("42", 1), ("de", 2), ("7", 3)]
