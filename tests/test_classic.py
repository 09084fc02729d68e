"""ClassicTokenizer grammar vectors (ClassicTokenizerImpl.jflex rule
table) + ClassicFilter transforms (ClassicFilter.java:53-63). Pure
Python — the scanner is the same code the pandas_udf slot runs."""

from lucene_solr_spark.functions.classic import (
    classic_analyze, classic_filter, classic_scan)


def test_typed_productions():
    got = classic_scan(
        "U.S.A. AT&T bob-1@ex-ample.com wiki.apache.org "
        "O'Reilly's plain7")
    assert got == [
        ("U.S.A.", "<ACRONYM>"),
        ("AT&T", "<COMPANY>"),
        ("bob-1@ex-ample.com", "<EMAIL>"),
        ("wiki.apache.org", "<HOST>"),
        ("O'Reilly's", "<APOSTROPHE>"),
        ("plain7", "<ALPHANUM>"),
    ]


def test_num_vs_host_rule_order():
    # equal-length matches: HOST precedes NUM in the jflex rule table,
    # so dotted digit runs classify HOST; hyphen serials are NUM
    assert classic_scan("1.2") == [("1.2", "<HOST>")]
    assert classic_scan("v1.5.2") == [("v1.5.2", "<HOST>")]
    assert classic_scan("1-800-x") == [("1-800-x", "<NUM>")]
    assert classic_scan("x-9") == [("x-9", "<NUM>")]
    # every other segment must hold a digit: pure-alpha split on '-'
    # is NOT one NUM token
    assert classic_scan("ab-cd") == [
        ("ab", "<ALPHANUM>"), ("cd", "<ALPHANUM>")]


def test_classic_filter_transforms():
    assert classic_filter("O'Reilly's", "<APOSTROPHE>") == "O'Reilly"
    assert classic_filter("you're", "<APOSTROPHE>") == "you're"
    assert classic_filter("U.S.A.", "<ACRONYM>") == "USA"
    assert classic_filter("AT&T", "<COMPANY>") == "AT&T"


def test_analyzer_chain_lower_stop():
    out = classic_analyze("The U.S.A. stores")
    assert out == [("usa", "<ACRONYM>"), ("stores", "<ALPHANUM>")]
