"""Synonym parser + filter golden gates, ported from
TestSolrSynonymParser.java (testSimple/testEscapedStuff/error cases)
and TestSynonymMapFilter.java (testBasic/testBasic2 verify vectors)."""

import pytest

from lucene_solr_spark.functions.synonyms import (
    SynonymMapBuilder,
    parse_solr_synonyms,
    parse_wordnet_synonyms,
    synonym_filter_post,
)


def _run(syn_map, text):
    """-> 'a/b c' verify format (slash-joined same-position stacks),
    matching BaseTokenStreamTestCase.verify in the reference test."""
    post = synonym_filter_post(syn_map)
    toks = [(t, i) for i, t in enumerate(text.split())]
    out = post(toks)
    by_pos = {}
    order = []
    for t, p in out:
        if p not in by_pos:
            by_pos[p] = []
            order.append(p)
        by_pos[p].append(t)
    assert order == sorted(order)
    return " ".join("/".join(by_pos[p]) for p in order)


SOLR_FILE = ("i-pod, ipod, ipoooood\n"
             "foo => foo bar\n"
             "foo => baz\n"
             "this test, that testing")


def test_solr_parser_simple_vectors():
    m = parse_solr_synonyms(SOLR_FILE)
    assert _run(m, "ball") == "ball"
    assert _run(m, "i-pod") == "i-pod/ipod/ipoooood"
    assert _run(m, "foo") == "foo/baz bar"
    assert _run(m, "this test") == "this/that test/testing"


def test_solr_parser_errors():
    with pytest.raises(ValueError, match="line 1"):
        parse_solr_synonyms("a => b => c")
    # a side the analyzer eliminates entirely
    with pytest.raises(ValueError, match="line 1"):
        parse_solr_synonyms(
            "a => 1", analyze=lambda s: [t for t in s.lower().split()
                                         if t.isalpha()])
    with pytest.raises(ValueError, match="line 1"):
        parse_solr_synonyms(
            "1 => a", analyze=lambda s: [t for t in s.lower().split()
                                         if t.isalpha()])


def test_solr_parser_escapes():
    # 'a=>a => b=>b' and 'a,a => b,b' with escaped separators parse
    # as single-token keyword sides (TestSolrSynonymParser
    # .testEscapedStuff uses a KEYWORD analyzer)
    f = "a\\=>a => b\\=>b\na\\,a => b\\,b"
    m = parse_solr_synonyms(f, analyze=lambda s: [s])
    assert _run(m, "ball") == "ball"
    assert _run(m, "a=>a") == "b=>b"
    assert _run(m, "a,a") == "b,b"


def test_filter_basic_vectors():
    # TestSynonymMapFilter.testBasic
    b = SynonymMapBuilder(True)
    b.add(["a"], ["foo"], True)
    b.add(["a", "b"], ["bar", "fee"], True)
    b.add(["b", "c"], ["dog", "collar"], True)
    b.add(["c", "d"], ["dog", "harness", "holder", "extras"], True)
    b.add(["m", "c", "e"], ["dog", "barks", "loudly"], False)
    b.add(["i", "j", "k"], ["feep"], True)
    b.add(["e", "f"], ["foo", "bar"], False)
    b.add(["e", "f"], ["baz", "bee"], False)
    b.add(["z"], ["boo"], False)
    b.add(["y"], ["bee"], True)
    m = b.build()

    assert _run(m, "a b c") == "a/bar b/fee c"
    # syn output extends beyond input tokens
    assert _run(m, "x a b c d") == \
        "x a/bar b/fee c/dog d/harness holder extras"
    assert _run(m, "a b a") == "a/bar b/fee a/foo"
    # outputs that add to one another
    assert _run(m, "c d c d") == \
        "c/dog d/harness c/holder/dog d/extras/harness holder extras"
    # keepOrig=false drops the matched originals
    assert _run(m, "m c e") == "dog barks loudly"
    assert _run(m, "z") == "boo"
    assert _run(m, "y") == "y/bee"


def test_filter_basic2_vectors():
    # TestSynonymMapFilter.testBasic2 (keepOrig = false)
    b = SynonymMapBuilder(True)
    b.add(["aaa"], ["aaaa1", "aaaa2", "aaaa3"], False)
    b.add(["bbb"], ["bbbb1", "bbbb2"], False)
    m = b.build()
    assert _run(m, "xyzzy bbb pot of gold") == \
        "xyzzy bbbb1 pot/bbbb2 of gold"
    assert _run(m, "xyzzy aaa pot of gold") == \
        "xyzzy aaaa1 pot/aaaa2 of/aaaa3 gold"


def test_builder_dedup_and_merge():
    b = SynonymMapBuilder(True)
    b.add(["foo"], ["bar"], False)
    b.add(["foo"], ["bar"], False)
    b.add(["foo"], ["baz"], False)
    m = b.build()
    assert m.mapping[("foo",)] == [("bar",), ("baz",)]
    b2 = SynonymMapBuilder(False)
    b2.add(["foo"], ["bar"], False)
    b2.add(["foo"], ["bar"], False)
    assert b2.build().mapping[("foo",)] == [("bar",), ("bar",)]


WORDNET = (
    "s(100000001,1,'woods',n,1,0).\n"
    "s(100000001,2,'wood',n,1,0).\n"
    "s(100000001,3,'forest',n,1,0).\n"
    "s(100000002,1,'wolfish',a,1,0).\n"
    "s(100000002,2,'ravenous',a,1,0).\n"
    "s(100000003,1,'king',n,1,1).\n"
    "s(100000004,1,'baron''s',n,1,1).\n"
)


def test_wordnet_parser():
    m = parse_wordnet_synonyms(WORDNET)
    assert _run(m, "woods") == "woods/wood/forest"
    assert _run(m, "wolfish") == "wolfish/ravenous"
    # singleton synsets contribute nothing
    assert _run(m, "king") == "king"
    # '' unescapes to ' inside quoted words
    assert ("baron's",) not in m.mapping  # singleton -> dropped
    m2 = parse_wordnet_synonyms(WORDNET, expand=False)
    assert _run(m2, "forest") == "woods"
