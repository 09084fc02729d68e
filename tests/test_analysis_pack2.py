"""Golden vectors for the round-2f analysis pack: PathHierarchy /
ReversePathHierarchy tokenizers, CJKBigramFilter, and
DictionaryCompoundWordTokenFilter. Vectors mirror the reference's unit
tests (TestPathHierarchyTokenizer, TestReversePathHierarchyTokenizer,
TestCJKBigramFilter/TestCJKAnalyzer, TestCompoundWordTokenFilter)."""

from lucene_solr_spark.functions.analysis import get_analyzer
from lucene_solr_spark.functions.autostop import auto_stop_post
from lucene_solr_spark.functions.cjk import (
    ALL,
    HAN,
    cjk_bigram_post,
    token_script,
)
from lucene_solr_spark.functions.compound import dictionary_compound_post
from lucene_solr_spark.functions.pathhier import path_hierarchy_tokens


def toks(pairs):
    return [t for t, _ in pairs]


# -- PathHierarchyTokenizer (TestPathHierarchyTokenizer vectors) -----------

def test_path_basic():
    assert toks(path_hierarchy_tokens("/a/b/c")) == ["/a", "/a/b", "/a/b/c"]


def test_path_end_delimiter():
    assert toks(path_hierarchy_tokens("/a/b/c/")) == [
        "/a", "/a/b", "/a/b/c", "/a/b/c/"]


def test_path_start_char():
    assert toks(path_hierarchy_tokens("a/b/c")) == ["a", "a/b", "a/b/c"]


def test_path_only_delimiter():
    # TestPathHierarchyTokenizer testOnlyDelimiter / testOnlyDelimiters
    assert toks(path_hierarchy_tokens("/")) == ["/"]
    assert toks(path_hierarchy_tokens("//")) == ["/", "//"]
    assert toks(path_hierarchy_tokens("/", skip=1)) == []


def test_path_replace():
    assert toks(path_hierarchy_tokens("/a/b/c", replacement="\\")) == [
        "\\a", "\\a\\b", "\\a\\b\\c"]


def test_path_skip():
    assert toks(path_hierarchy_tokens("/a/b/c", skip=1)) == ["/b", "/b/c"]
    assert toks(path_hierarchy_tokens("a/b/c", skip=1)) == ["/b", "/b/c"]
    assert toks(path_hierarchy_tokens("/a/b/c/", skip=1)) == [
        "/b", "/b/c", "/b/c/"]
    assert toks(path_hierarchy_tokens("/a/b/c", skip=3)) == []


def test_path_positions_all_zero():
    assert [p for _, p in path_hierarchy_tokens("/a/b/c")] == [0, 0, 0]


# -- ReversePathHierarchyTokenizer ------------------------------------------

def test_reverse_basic():
    assert toks(path_hierarchy_tokens("/a/b/c", reverse=True)) == [
        "/a/b/c", "a/b/c", "b/c", "c"]


def test_reverse_domain():
    assert toks(path_hierarchy_tokens(
        "www.site.co.uk", delimiter=".", reverse=True)) == [
        "www.site.co.uk", "site.co.uk", "co.uk", "uk"]


def test_reverse_end_delimiter():
    assert toks(path_hierarchy_tokens("/a/b/c/", reverse=True)) == [
        "/a/b/c/", "a/b/c/", "b/c/", "c/"]


def test_reverse_skip():
    assert toks(path_hierarchy_tokens("/a/b/c", reverse=True, skip=1)) == [
        "/a/b/", "a/b/", "b/"]


# -- CJKBigramFilter ---------------------------------------------------------

HANS = "多かカ가"  # han, hiragana, katakana, hangul


def test_token_script_classes():
    assert token_script("多") == HAN
    assert token_script("ab") == 0
    assert token_script("多a") == 0


def test_cjk_bigrams_simple():
    # standard chain emits han chars as single tokens
    a = get_analyzer("cjk")
    got = a.analyze_with_positions("多か多")
    assert toks(got) == ["多か", "か多"]
    assert [p for _, p in got] == [0, 1]


def test_cjk_lone_char_is_unigram():
    a = get_analyzer("cjk")
    got = a.analyze_with_positions("data 多 base")
    assert toks(got) == ["data", "多", "base"]
    assert [p for _, p in got] == [0, 1, 2]


def test_cjk_mixed_passthrough_positions():
    a = get_analyzer("cjk")
    got = a.analyze_with_positions("x 多多多 y")
    assert toks(got) == ["x", "多多", "多多", "y"]
    assert [p for _, p in got] == [0, 1, 2, 3]


def test_cjk_output_unigrams_overlap():
    post = cjk_bigram_post(ALL, output_unigrams=True)
    got = post([("多", 0), ("か", 1)])
    assert got == [("多", 0), ("多か", 0), ("か", 1)]


def test_cjk_flag_gating():
    post = cjk_bigram_post(HAN)
    # hiragana not enabled: passes through untouched, breaks the run
    got = post([("多", 0), ("か", 1), ("多", 2)])
    assert [t for t, _ in got] == ["多", "か", "多"]


def test_cjk_hole_breaks_run():
    post = cjk_bigram_post(ALL)
    # position hole (stopword removed between) -> two separate runs
    got = post([("多", 0), ("多", 1), ("多", 3), ("多", 4)])
    assert [t for t, _ in got] == ["多多", "多多"]
    assert [p for _, p in got] == [0, 2]


# -- DictionaryCompoundWordTokenFilter --------------------------------------

def test_compound_basic():
    post = dictionary_compound_post(["soft", "ball", "team"])
    got = post([("softballteam", 0), ("cup", 1)])
    assert got == [("softballteam", 0), ("soft", 0), ("ball", 0),
                   ("team", 0), ("cup", 1)]


def test_compound_min_word_size():
    post = dictionary_compound_post(["so", "ft"], min_word_size=5)
    assert post([("soft", 0)]) == [("soft", 0)]  # 4 < minWordSize


def test_compound_only_longest():
    post = dictionary_compound_post(
        ["base", "basket", "ball"], only_longest_match=True)
    got = post([("basketball", 0)])
    assert got == [("basketball", 0), ("basket", 0), ("ball", 0)]


def test_compound_every_start_offset():
    # overlapping hits at different starts all emit (onlyLongest=False)
    post = dictionary_compound_post(["aa", "aaa"])
    got = post([("aaaaa", 0)])
    # starts 0..3: 'aa' at each; 'aaa' at starts 0..2
    assert sorted(t for t, _ in got[1:]) == sorted(
        ["aa"] * 4 + ["aaa"] * 3)


# -- QueryAutoStopWordAnalyzer ----------------------------------------------

def test_auto_stop_post_keeps_holes():
    post = auto_stop_post({"hot"})
    assert post([("hot", 0), ("x", 1)]) == [("x", 1)]


# -- TypeTokenFilter ----------------------------------------------------------

def test_token_type_classification():
    from lucene_solr_spark.functions.analysis import token_type

    # jflex NUM rule: digit runs with medial [.,;'], underscore joins,
    # underscore padding (StandardTokenizerImpl.jflex:129-133)
    for t in ("7", "123", "1,234", "3.14", "1_2", "_12_", "1'000"):
        assert token_type(t) == "<NUM>", t
    # WORD rule wins anywhere a letter appears
    for t in ("abc", "abc123", "123abc", "x1,2", "a_1"):
        assert token_type(t) == "<ALPHANUM>", t


def test_type_filter_blacklist_keeps_holes():
    from lucene_solr_spark.functions.analysis import (
        type_token_filter_post)

    post = type_token_filter_post({"<NUM>"})
    # dropped token leaves a position hole, survivors untouched
    assert post([("abc", 0), ("42", 1), ("def", 2)]) == [
        ("abc", 0), ("def", 2)]


def test_type_filter_whitelist_inverts():
    from lucene_solr_spark.functions.analysis import (
        type_token_filter_post)

    post = type_token_filter_post({"<NUM>"}, use_white_list=True)
    assert post([("abc", 0), ("42", 1), ("def", 2)]) == [("42", 1)]
    # accept() = useWhiteList == contains: whitelisting ALPHANUM keeps
    # only words
    post2 = type_token_filter_post({"<ALPHANUM>"}, use_white_list=True)
    assert post2([("abc", 0), ("42", 1)]) == [("abc", 0)]
