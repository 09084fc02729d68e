"""Golden vectors for the stream-level token filters (Shingle /
single-token Synonym / EdgeNGram), taken from the reference test
suites:

- shingle/ShingleFilterTest.java (BI_GRAM_TOKENS :91+,
  BI_GRAM_TOKENS_WITH_HOLES :114+, TRI_GRAM_TOKENS :189+)
- ngram/EdgeNGramTokenFilterTest.java (front-gram semantics,
  short-token position accumulation)
- plus the discountOverlaps norm rule (BM25Similarity.java:137-141)
  through invert_segment(overlap_aware=True).
"""

import numpy as np

from lucene_solr_spark.functions.analysis import (
    AnalyzerSpec,
    edge_ngram_post,
    get_analyzer,
    shingle_post,
    synonym_post,
)

SENT = "please divide this sentence into shingles"


def _ws(post):
    return AnalyzerSpec("t", str.split, False, post=post,
                        emits_overlaps=True)


def _ws_stop(post, stop):
    return AnalyzerSpec("t", str.split, False, frozenset(stop), post=post,
                        emits_overlaps=True)


def test_shingle_bigram_no_holes():
    spec = _ws(shingle_post(2, 2, True))
    got = spec.analyze_with_positions(SENT)
    assert got == [
        ("please", 0), ("please divide", 0),
        ("divide", 1), ("divide this", 1),
        ("this", 2), ("this sentence", 2),
        ("sentence", 3), ("sentence into", 3),
        ("into", 4), ("into shingles", 4),
        ("shingles", 5),
    ]


def test_shingle_bigram_with_holes():
    # ShingleFilterTest.BI_GRAM_TOKENS_WITH_HOLES (stopset {this, into})
    spec = _ws_stop(shingle_post(2, 2, True), {"this", "into"})
    got = spec.analyze_with_positions(SENT)
    assert got == [
        ("please", 0), ("please divide", 0),
        ("divide", 1), ("divide _", 1),
        ("_ sentence", 2),
        ("sentence", 3), ("sentence _", 3),
        ("_ shingles", 4),
        ("shingles", 5),
    ]


def test_shingle_trigram():
    spec = _ws(shingle_post(2, 3, True))
    got = [t for t, _ in spec.analyze_with_positions(SENT)]
    assert got == [
        "please", "please divide", "please divide this",
        "divide", "divide this", "divide this sentence",
        "this", "this sentence", "this sentence into",
        "sentence", "sentence into", "sentence into shingles",
        "into", "into shingles",
        "shingles",
    ]


def test_shingle_without_unigrams():
    spec = _ws(shingle_post(2, 2, False))
    got = spec.analyze_with_positions(SENT)
    assert [t for t, _ in got] == [
        "please divide", "divide this", "this sentence",
        "sentence into", "into shingles",
    ]
    assert [p for _, p in got] == [0, 1, 2, 3, 4]


def test_shingle_single_token_passthrough():
    spec = _ws(shingle_post(2, 2, True))
    assert spec.analyze_with_positions("please") == [("please", 0)]


def test_edge_ngram_front_grams():
    spec = _ws(edge_ngram_post(2, 3))
    got = spec.analyze_with_positions("abcde no x")
    # 'no' emits only its 2-gram; 'x' (< min_gram) emits nothing but
    # still holds position 2 (savePosIncr accumulation)
    assert got == [("ab", 0), ("abc", 0), ("no", 1)]


def test_edge_ngram_defaults_are_1_1():
    spec = _ws(edge_ngram_post())
    assert spec.analyze_with_positions("abc de") == [("a", 0), ("d", 1)]


def test_synonym_injection_same_position():
    spec = _ws(synonym_post({"fast": ["quick", "rapid"]}))
    got = spec.analyze_with_positions("a fast one")
    assert got == [
        ("a", 0), ("fast", 1), ("quick", 1), ("rapid", 1), ("one", 2),
    ]


def test_synonym_replace_mode():
    spec = _ws(synonym_post({"fast": ["quick"]}, keep_orig=False))
    assert spec.analyze("a fast one") == ["a", "quick", "one"]


def test_registered_chains_exist():
    for name in ("shingle", "shingle_ws", "edge_ngram"):
        spec = get_analyzer(name)
        assert spec.emits_overlaps
    # standard chain base: stopword holes become fillers
    got = get_analyzer("shingle").analyze_with_positions("spark the small")
    assert got == [
        ("spark", 0), ("spark _", 0), ("_ small", 1), ("small", 2),
    ]


def test_overlap_aware_norm_length():
    from lucene_solr_spark.indexing.build import invert_segment
    from lucene_solr_spark.functions.smallfloat import encode_norm

    toks = [["a", "a b", "b", "b c", "c"]]
    poss = [[0, 0, 1, 1, 2]]
    out = invert_segment(0, np.array([0]), toks, poss, ["sha"],
                         overlap_aware=True)
    meta = out[out["term"].isna()]
    # doc_len keeps sumTotalTermFreq semantics: all 5 emitted tokens
    lens = np.frombuffer(meta.iloc[0]["doc_lens_enc"], dtype="<i4")
    assert lens[0] == 5
    # the norm byte discounts posInc-0 overlaps: 3 distinct positions
    nb = np.frombuffer(meta.iloc[0]["norms_enc"], dtype=np.uint8)
    assert nb[0] == np.atleast_1d(encode_norm(np.array([3])))[0]
    assert nb[0] != np.atleast_1d(encode_norm(np.array([5])))[0]


# --- WordDelimiterFilter golden vectors (WordDelimiterFilter.java
# javadoc :36-53 examples + WordDelimiterIterator subword rules) ---

from lucene_solr_spark.functions.analysis import word_delimiter_post


def _wdf(**kw):
    return AnalyzerSpec("t", str.split, False,
                        post=word_delimiter_post(**kw),
                        emits_overlaps=True)


def test_wdf_basic_splits():
    spec = _wdf()
    assert spec.analyze("Wi-Fi") == ["Wi", "Fi"]
    assert spec.analyze("PowerShot") == ["Power", "Shot"]
    assert spec.analyze("SD500") == ["SD", "500"]
    assert spec.analyze("common_util") == ["common", "util"]
    assert spec.analyze("parseURL2") == ["parse", "URL", "2"]


def test_wdf_delimiter_trim_and_possessive():
    spec = _wdf()
    assert spec.analyze("//hello---there, 'dude'") == [
        "hello", "there", "dude"
    ]
    assert spec.analyze("O'Neil's") == ["O", "Neil"]


def test_wdf_acronym_boundary():
    spec = _wdf()
    # "ABCDef" -> "ABC" + "Def" (upper-run keeps all but the upper
    # that starts the following capitalized word)
    assert spec.analyze("ABCDef") == ["ABC", "Def"]


def test_wdf_positions_shift_following_tokens():
    spec = _wdf()
    got = spec.analyze_with_positions("wi-fi router")
    assert got == [("wi", 0), ("fi", 1), ("router", 2)]


def test_wdf_catenate_words_javadoc_example():
    spec = _wdf(catenate_words=True)
    got = spec.analyze_with_positions("Super-Duper-XL500-42-AutoCoder!")
    assert got == [
        ("Super", 0), ("Duper", 1), ("XL", 2), ("SuperDuperXL", 2),
        ("500", 3), ("42", 4), ("Auto", 5), ("Coder", 6),
        ("AutoCoder", 6),
    ]


def test_wdf_catenate_possessive_run():
    spec = _wdf(catenate_words=True)
    got = spec.analyze_with_positions("A's+B's&C's")
    assert got == [("A", 0), ("B", 1), ("C", 2), ("ABC", 2)]


def test_wdf_preserve_original():
    spec = _wdf(preserve_original=True)
    got = spec.analyze_with_positions("500-42")
    assert got == [("500-42", 0), ("500", 0), ("42", 1)]


def test_wdf_passthrough_and_vanish():
    spec = _wdf()
    assert spec.analyze_with_positions("plain token") == [
        ("plain", 0), ("token", 1)
    ]
    # all-delimiter token vanishes, hole remains
    assert spec.analyze_with_positions("a +++ b") == [("a", 0), ("b", 2)]


def test_wdf_catenate_all():
    spec = _wdf(catenate_all=True)
    got = spec.analyze_with_positions("wi-fi-4000")
    assert ("wifi4000", 2) in got


# --- CharFilter stage (charfilter/) ---

from lucene_solr_spark.functions.analysis import (
    html_strip_charfilter,
    make_charfiltered_analyzer,
    mapping_charfilter,
    pattern_replace_charfilter,
)


def test_html_strip():
    pre = html_strip_charfilter()
    spec = AnalyzerSpec("t", str.split, True, pre=pre)
    got = spec.analyze(
        "<html><head><script>var x=1;</script><style>b{}</style></head>"
        "<body><p>Hello&nbsp;<b>World</b></p><!-- note -->a<br>b</body>"
    )
    assert got == ["hello", "world", "a", "b"]


def test_html_strip_entities():
    pre = html_strip_charfilter()
    assert pre("fish &amp; chips &lt;now&gt;") == "fish & chips <now>"


def test_mapping_charfilter_longest_match():
    pre = mapping_charfilter({"ph": "f", "p": "b"})
    assert pre("phone pot") == "fone bot"


def test_pattern_replace_charfilter():
    pre = pattern_replace_charfilter(r"\d+", "#")
    spec = AnalyzerSpec("t", str.split, False, pre=pre)
    assert spec.analyze("abc123 45def") == ["abc#", "#def"]


def test_charfiltered_analyzer_registration():
    spec = make_charfiltered_analyzer(
        "html_standard", "standard", html_strip_charfilter()
    )
    got = spec.analyze_with_positions("<p>Spark the engine</p>")
    # stopword hole at 'the' preserved after the strip
    assert got == [("spark", 0), ("engine", 2)]


class TestRound2cFilters:
    """LengthFilter / ReverseStringFilter / CommonGramsFilter vectors."""

    def test_length_filter_holes(self):
        from lucene_solr_spark.functions.analysis import length_filter_post

        p = length_filter_post(3, 5)
        tp = [("ab", 0), ("abc", 1), ("abcdef", 2), ("abcde", 3)]
        assert p(tp) == [("abc", 1), ("abcde", 3)]  # positions kept

    def test_reverse_filter(self):
        from lucene_solr_spark.functions.analysis import reverse_post

        assert reverse_post()([("abc", 0), ("x", 1)]) == \
            [("cba", 0), ("x", 1)]

    def test_common_grams_index_mode(self):
        from lucene_solr_spark.functions.analysis import common_grams_post

        p = common_grams_post({"the", "of"})
        tp = [("the", 0), ("quick", 1), ("fox", 2), ("of", 3), ("war", 4)]
        out = p(tp)
        assert ("the_quick", 0) in out
        assert ("fox_of", 2) in out and ("of_war", 3) in out
        # unigrams all preserved in index mode
        for t in tp:
            assert t in out
        # non-common adjacent pair emits no gram
        assert all(g != "quick_fox" for g, _ in out)

    def test_common_grams_query_mode_drops_covered(self):
        from lucene_solr_spark.functions.analysis import common_grams_post

        p = common_grams_post({"the"}, query_mode=True)
        tp = [("the", 0), ("quick", 1), ("fox", 2)]
        out = p(tp)
        assert ("the_quick", 0) in out
        assert ("fox", 2) in out          # uncovered unigram kept
        assert ("the", 0) not in out      # covered unigrams dropped
        assert ("quick", 1) not in out

    def test_common_grams_respects_holes(self):
        from lucene_solr_spark.functions.analysis import common_grams_post

        p = common_grams_post({"the"})
        # positions 0 and 2: a hole between them, no gram across it
        out = p([("the", 0), ("fox", 2)])
        assert all("_" not in t for t, _ in out)


# ---------------------------------------------------------------------------
# PrefixAwareTokenFilter family (stream concatenation)
# ---------------------------------------------------------------------------

def test_prefix_aware_published_vectors():
    """TestPrefixAwareTokenFilter.test: (a,0,1)+(b,0,1) -> offsets
    (0,1),(1,2); and the chained 2x-prefix ^ hello world $ vector."""
    from lucene_solr_spark.functions.analysis import prefix_aware_concat

    a = [["a", 0, 0, 1, ""]]
    b = [["b", 0, 0, 1, ""]]
    out = prefix_aware_concat(a, b)
    assert [(e[0], e[2], e[3]) for e in out] == [("a", 0, 1), ("b", 1, 2)]

    ws = [["hello", 0, 0, 5, ""], ["world", 1, 6, 11, ""]]
    ts = prefix_aware_concat([["^", 0, 0, 0, ""]], ws)
    ts = prefix_aware_concat(ts, [["$", 0, 0, 0, ""]])
    assert [(e[0], e[2], e[3]) for e in ts] == [
        ("^", 0, 0), ("hello", 0, 5), ("world", 6, 11), ("$", 11, 11)]
    # absolute positions continue across the join
    assert [e[1] for e in ts] == [0, 1, 2, 3]


def test_prefix_and_suffix_aware_published_vector():
    """TestPrefixAndSuffixAwareTokenFilter.test — same contents via
    the convenience wrapper."""
    from lucene_solr_spark.functions.analysis import (
        prefix_and_suffix_aware)

    ws = [["hello", 0, 0, 5, ""], ["world", 1, 6, 11, ""]]
    out = prefix_and_suffix_aware(
        [["^", 0, 0, 0, ""]], ws, [["$", 0, 0, 0, ""]])
    assert [(e[0], e[2], e[3]) for e in out] == [
        ("^", 0, 0), ("hello", 0, 5), ("world", 6, 11), ("$", 11, 11)]


def test_prefix_aware_empty_streams():
    """Empty prefix -> zero Token shift (new Token() offsets 0,0);
    empty input -> the outer shift falls back to the prefix's last
    token (previousPrefixToken passthrough)."""
    from lucene_solr_spark.functions.analysis import (
        prefix_and_suffix_aware, prefix_aware_concat)

    suf = [["eos", 0, 0, 3, ""]]
    assert prefix_aware_concat([], suf) == [["eos", 0, 0, 3, ""]]
    out = prefix_and_suffix_aware(
        [["bos", 0, 0, 3, ""]], [], suf)
    assert [(e[0], e[2], e[3]) for e in out] == [
        ("bos", 0, 3), ("eos", 3, 6)]


def test_prefix_aware_custom_update():
    """The updateSuffixToken hook is overridable (the
    PrefixAndSuffixAware wiring uses exactly this seam)."""
    from lucene_solr_spark.functions.analysis import prefix_aware_concat

    def upper(tok, last):
        tok[0] = tok[0].upper()
        return tok

    out = prefix_aware_concat(
        [["p", 0, 0, 1, ""]], [["x", 0, 0, 1, ""]], update=upper)
    assert [e[0] for e in out] == ["p", "X"]
