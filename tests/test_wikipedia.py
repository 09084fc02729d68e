"""WikipediaTokenizer golden gates, ported from
lucene/analysis/common/src/test/.../wikipedia/WikipediaTokenizerTest.java
(testSimple, testHandwritten, testLinkPhrases, testLinks,
testLucene1133, testBoth incl. flags) plus the plain-text
degenerate case."""

from lucene_solr_spark.functions.wikipedia import (
    BOTH,
    TOKENS_ONLY,
    UNTOKENIZED_ONLY,
    UNTOKENIZED_TOKEN_FLAG,
    wikipedia_tokenize,
)

AL = "<ALPHANUM>"
LINK_PHRASES = ("click [[link here again]] click "
                "[http://lucene.apache.org here again] "
                "[[Category:a b c d]]")


def test_simple():
    text = "This is a [[Category:foo]]"
    toks = wikipedia_tokenize(text)
    assert [t.term for t in toks] == ["This", "is", "a", "foo"]
    assert [t.start for t in toks] == [0, 5, 8, 21]
    assert [t.end for t in toks] == [4, 7, 9, 24]
    assert [t.type for t in toks] == [AL, AL, AL, "c"]
    assert [t.pos_inc for t in toks] == [1, 1, 1, 1]


def test_handwritten():
    test = (
        "[[link]] This is a [[Category:foo]] Category  This is a linked "
        "[[:Category:bar none withstanding]] "
        "Category This is (parens) This is a [[link]]  This is an "
        "external URL [http://lucene.apache.org] "
        "Here is ''italics'' and ''more italics'', '''bold''' and "
        "'''''five quotes''''' "
        " This is a [[link|display info]]  This is a period.  Here is "
        "$3.25 and here is 3.50.  Here's Johnny.  "
        "==heading== ===sub head=== followed by some text  "
        "[[Category:blah| ]] "
        "''[[Category:ital_cat]]''  here is some that is ''italics "
        "[[Category:foo]] but is never closed."
        "'''same [[Category:foo]] goes for this '''''and2 "
        "[[Category:foo]] and this"
        " [http://foo.boo.com/test/test/ Test Test] "
        "[http://foo.boo.com/test/test/test.html Test Test]"
        " [http://foo.boo.com/test/test/test.html?g=b&c=d Test Test] "
        "<ref>Citation</ref> <sup>martian</sup> "
        "<span class=\"glue\">code</span>"
    )
    toks = wikipedia_tokenize(test)
    exp_terms = [
        "link", "This", "is", "a", "foo", "Category", "This", "is", "a",
        "linked", "bar", "none", "withstanding", "Category", "This",
        "is", "parens", "This", "is", "a", "link", "This", "is", "an",
        "external", "URL", "http://lucene.apache.org", "Here", "is",
        "italics", "and", "more", "italics", "bold", "and", "five",
        "quotes", "This", "is", "a", "link", "display", "info", "This",
        "is", "a", "period", "Here", "is", "3.25", "and", "here", "is",
        "3.50", "Here's", "Johnny", "heading", "sub", "head",
        "followed", "by", "some", "text", "blah", "ital", "cat", "here",
        "is", "some", "that", "is", "italics", "foo", "but", "is",
        "never", "closed", "same", "foo", "goes", "for", "this", "and2",
        "foo", "and", "this", "http://foo.boo.com/test/test/", "Test",
        "Test", "http://foo.boo.com/test/test/test.html", "Test",
        "Test", "http://foo.boo.com/test/test/test.html?g=b&c=d",
        "Test", "Test", "Citation", "martian", "code",
    ]
    exp_types = [
        "il", AL, AL, AL, "c", AL, AL, AL, AL, AL, "c", "c", "c", AL,
        AL, AL, AL, AL, AL, AL, "il", AL, AL, AL, AL, AL, "elu", AL,
        AL, "i", AL, "i", "i", "b", AL, "bi", "bi", AL, AL, AL, "il",
        "il", "il", AL, AL, AL, AL, AL, AL, "<NUM>", AL, AL, AL,
        "<NUM>", "<APOSTROPHE>", AL, "h", "sh", "sh", AL, AL, AL, AL,
        "c", "c", "c", AL, AL, AL, AL, AL, "i", "c", AL, AL, AL, AL,
        "b", "c", AL, AL, AL, "bi", "c", AL, AL, "elu", "el", "el",
        "elu", "el", "el", "elu", "el", "el", "ci", AL, AL,
    ]
    assert [t.term for t in toks] == exp_terms
    assert [t.type for t in toks] == exp_types


def test_link_phrases():
    toks = wikipedia_tokenize(LINK_PHRASES)
    assert [t.term for t in toks] == [
        "click", "link", "here", "again", "click",
        "http://lucene.apache.org", "here", "again", "a", "b", "c", "d"]
    assert [t.pos_inc for t in toks] == [1, 1, 1, 1, 1, 1, 0, 1, 1, 1,
                                         1, 1]


def test_links():
    test = ("[http://lucene.apache.org/java/docs/index.html#news here] "
            "[http://lucene.apache.org/java/docs/index.html?b=c here] "
            "[https://lucene.apache.org/java/docs/index.html?b=c here]")
    toks = wikipedia_tokenize(test)
    assert [t.term for t in toks] == [
        "http://lucene.apache.org/java/docs/index.html#news", "here",
        "http://lucene.apache.org/java/docs/index.html?b=c", "here",
        "https://lucene.apache.org/java/docs/index.html?b=c", "here"]
    assert [t.type for t in toks] == ["elu", "el", "elu", "el", "elu",
                                      "el"]


UNTOKS = {"c", "i"}
L1133_TEST = ("[[Category:a b c d]] [[Category:e f g]] [[link here]] "
              "[[link there]] ''italics here'' something "
              "''more italics'' [[Category:h   i   j]]")


def test_lucene1133_tokens_only_unaffected():
    toks = wikipedia_tokenize(LINK_PHRASES, TOKENS_ONLY, UNTOKS)
    assert [t.term for t in toks] == [
        "click", "link", "here", "again", "click",
        "http://lucene.apache.org", "here", "again", "a", "b", "c", "d"]


def test_lucene1133_untokenized_only():
    toks = wikipedia_tokenize(L1133_TEST, UNTOKENIZED_ONLY, UNTOKS)
    assert [t.term for t in toks] == [
        "a b c d", "e f g", "link", "here", "link", "there",
        "italics here", "something", "more italics", "h   i   j"]
    assert [t.start for t in toks] == [
        11, 32, 42, 47, 56, 61, 71, 86, 98, 124]
    assert [t.end for t in toks] == [
        18, 37, 46, 51, 60, 66, 83, 95, 110, 133]
    assert [t.pos_inc for t in toks] == [1] * 10


def test_both_mode():
    toks = wikipedia_tokenize(L1133_TEST, BOTH, UNTOKS)
    assert [t.term for t in toks] == [
        "a b c d", "a", "b", "c", "d", "e f g", "e", "f", "g", "link",
        "here", "link", "there", "italics here", "italics", "here",
        "something", "more italics", "more", "italics", "h   i   j",
        "h", "i", "j"]
    assert [t.start for t in toks] == [
        11, 11, 13, 15, 17, 32, 32, 34, 36, 42, 47, 56, 61, 71, 71, 79,
        86, 98, 98, 103, 124, 124, 128, 132]
    assert [t.end for t in toks] == [
        18, 12, 14, 16, 18, 37, 33, 35, 37, 46, 51, 60, 66, 83, 78, 83,
        95, 110, 102, 110, 133, 125, 129, 133]
    assert [t.pos_inc for t in toks] == [
        1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 0, 1, 1,
        0, 1, 1]
    assert [t.flags for t in toks] == [
        UNTOKENIZED_TOKEN_FLAG, 0, 0, 0, 0, UNTOKENIZED_TOKEN_FLAG, 0,
        0, 0, 0, 0, 0, 0, UNTOKENIZED_TOKEN_FLAG, 0, 0, 0,
        UNTOKENIZED_TOKEN_FLAG, 0, 0, UNTOKENIZED_TOKEN_FLAG, 0, 0, 0]


def test_plain_text_degenerates_to_standard_types():
    toks = wikipedia_tokenize("Hello world 3.14 O'Reilly AT&T I.B.M. "
                              "a@b.com lucene.apache.org")
    assert [(t.term, t.type) for t in toks] == [
        ("Hello", AL), ("world", AL), ("3.14", "<NUM>"),
        ("O'Reilly", "<APOSTROPHE>"), ("AT&T", "<COMPANY>"),
        ("I.B.M.", "<ACRONYM>"), ("a@b.com", "<EMAIL>"),
        ("lucene.apache.org", "<HOST>")]


def test_random_fuzz_invariants():
    # the reference's testRandomStrings analogue: arbitrary markup
    # must never crash, and TOKENS_ONLY tokens are exact input slices
    # with sane offsets and non-negative increments (first >= 1)
    import random
    rnd = random.Random(1133)
    alphabet = list("ab12 []'={}|<>/.:\"\n\t-&@") + ["[[", "]]", "''",
                    "{{", "}}", "==", "<ref>", "</ref>", "Category:",
                    "http://", "x.y"]
    for _ in range(300):
        s = "".join(rnd.choice(alphabet)
                    for _ in range(rnd.randrange(0, 60)))
        toks = wikipedia_tokenize(s)
        last_start = -1
        for i, t in enumerate(toks):
            assert 0 <= t.start <= t.end <= len(s)
            assert t.term == s[t.start:t.end]
            assert t.pos_inc >= (1 if i == 0 else 0)
            assert t.start >= last_start
            last_start = t.start
        # BOTH mode must not crash either and collapsed rows carry the
        # flag
        for t in wikipedia_tokenize(s, BOTH, {"c", "i", "il"}):
            assert t.flags in (0, UNTOKENIZED_TOKEN_FLAG)
