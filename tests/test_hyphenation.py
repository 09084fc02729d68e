"""Knuth-Liang hyphenation + HyphenationCompoundWordTokenFilter gates:
the published TeX-paper pattern walk (hy-phen-ation), the reference's
normalization/exception/gate rules (HyphenationTree.java:315-404), and
the decompose pair enumeration incl. the genitive-s fallback
(HyphenationCompoundWordTokenFilter.java:153-222)."""

from lucene_solr_spark.functions.hyphenation import (
    Hyphenator,
    hyphenation_compound_post,
)

LIANG = [".hy3ph", "he2n", "hena4", "hen5at", "ina", "n2at", "itio",
         "2io", "o2n"]


def test_liang_published_example():
    # F.M. Liang's thesis example: these patterns hyphenate
    # "hyphenation" as hy-phen-ation
    h = Hyphenator(LIANG)
    assert h.hyphenate("hyphenation") == [0, 2, 6, 11]


def test_pattern_max_fold_and_gates():
    # "1b": break before every b; remain/push trim the window
    h = Hyphenator(["1b"])
    assert h.hyphenate("abab") == [0, 1, 3, 4]
    # push=2 removes the point one char before the end
    assert h.hyphenate("abab", remain=1, push=2) == [0, 1, 4]
    # remain=2 removes the point after the first char
    assert h.hyphenate("abab", remain=2, push=1) == [0, 3, 4]
    # even values are not hyphen points
    assert Hyphenator(["2b"]).hyphenate("abab") is None
    # higher even value from another pattern masks an odd one
    assert Hyphenator(["1b", "a2b"]).hyphenate("abab") is None


def test_exception_list_wins_over_patterns():
    h = Hyphenator(["1b"], exceptions=["ta-ble"])
    assert h.hyphenate("table") == [0, 2, 5]
    # pattern path still used for non-exception words
    assert h.hyphenate("abab") == [0, 1, 3, 4]


def test_normalization_and_nonletters():
    h = Hyphenator(["1b"])
    # uppercase normalizes through the aA class map
    assert h.hyphenate("ABAB") == [0, 1, 3, 4]
    # leading non-letters are skipped: points shift right by the skip
    # while the synthetic end stays at the LETTER length (the
    # reference's res[k+1]=len arithmetic, :391-399 — kept verbatim)
    assert h.hyphenate("--abab") == [0, 3, 5, 4]
    # interior non-letter followed by letters -> not hyphenatable
    assert h.hyphenate("ab-ab") is None
    # too short for remain+push
    assert h.hyphenate("b", remain=1, push=1) is None


def test_compound_post_no_dictionary():
    h = Hyphenator(["fast1", "slow1"])
    post = hyphenation_compound_post(h, dictionary=None,
                                     min_subword_size=4)
    got = post([("fastslow", 0)])
    assert got[0] == ("fastslow", 0)
    # pairs over points [0,4,8]: fast, fastslow, slow
    assert [t for t, _ in got[1:]] == ["fast", "fastslow", "slow"]


def test_compound_post_dictionary_and_genitive():
    h = Hyphenator(["fast1", "slows1"])
    post = hyphenation_compound_post(
        h, dictionary=["fast", "slow"], min_subword_size=4)
    got = post([("fastslows", 0)])
    # points [0,4,9]: "fast" in dict; "fastslows" not, "fastslow"
    # (minus genitive s) not in dict; "slows" not, "slow" fallback hits
    assert [t for t, _ in got[1:]] == ["fast", "slow"]


def test_compound_post_only_longest():
    h = Hyphenator(["so1", "soft1", "soft1ware"])
    post = hyphenation_compound_post(
        h, dictionary=["so", "soft", "software", "ware"],
        min_subword_size=2, only_longest_match=True)
    got = post([("software", 0)])
    # per start point only the longest accepted part survives
    assert [t for t, _ in got[1:]] == ["software", "ware"]


def test_min_word_size_gate():
    h = Hyphenator(["a1b"])
    post = hyphenation_compound_post(h, dictionary=None,
                                     min_word_size=5)
    assert post([("ab", 0)]) == [("ab", 0)]


def test_random_fuzz_invariants():
    # points strictly inside (0, n) and increasing; decomposed
    # subwords (or their genitive-shortened forms) are substrings
    import random
    rnd = random.Random(7)
    vocab = ["fast", "slow", "merge", "table", "scan", "sort", "row"]
    h = Hyphenator([w + "1" for w in vocab])
    post = hyphenation_compound_post(h, dictionary=vocab)
    for _ in range(300):
        w = "".join(rnd.choice("abfastslowmergetscanrow")
                    for _ in range(rnd.randrange(0, 20)))
        pts = h.hyphenate(w)
        if pts is not None:
            inner = pts[1:-1]
            assert inner == sorted(set(inner))
            assert all(1 <= p for p in inner)
        for t, _p in post([(w, 0)])[1:]:
            assert t in w
