"""Hunspell dictionary + stemmer + filter — fixtures and vectors from
HunspellStemmerTest / HunspellDictionaryTest (test.aff/test.dic and
the FLAG long + AF alias testCompressed pair)."""

import pytest

from lucene_solr_spark.functions.hunspell import (
    HunspellDictionary,
    HunspellParseError,
    HunspellStemmer,
    hunspell_stem_post,
)

TEST_AFF = """SET UTF-8
TRY abcdefghijklmopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ

SFX A Y 3
SFX A   0     e         n
SFX A   0     e         t
SFX A   0     e         h

SFX C Y 2
SFX C   0     d/C       c
SFX C   0     c         b

SFX D Y 1
SFX D   0     s         o

SFX E Y 1
SFX E   0     d         o

PFX B Y 1
PFX B   0     s         o"""

TEST_DIC = """6
lucen/A
lucene
mahout/A
olr/B
ab/C
Apach/A
foo/D
Foo/E"""

COMPRESSED_AFF = """SET UTF-8
TRY abcdefghijklmopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ

FLAG long

AF 5
AF AA
AF BB
AF CC
AF DD
AF EE

SFX AA Y 3
SFX AA   0     e         n
SFX AA   0     e         t
SFX AA   0     e         h

SFX CC Y 2
SFX CC   0     d/3       c
SFX CC   0     c         b

SFX DD Y 1
SFX DD   0     s         o

SFX EE Y 1
SFX EE   0     d         o

PFX BB Y 1
PFX BB   0     s         o"""

COMPRESSED_DIC = """6
lucen/1
lucene
mahout/1
olr/2
ab/3
Apach/1
foo/4
Foo/5"""


@pytest.fixture(scope="module")
def stemmer():
    return HunspellStemmer(
        HunspellDictionary(TEST_AFF, TEST_DIC, ignore_case=True))


def test_stem_simple_suffix(stemmer):
    assert stemmer.stem("lucene") == ["lucene", "lucen"]
    assert stemmer.stem("mahoute") == ["mahout"]


def test_stem_simple_prefix(stemmer):
    assert stemmer.stem("solr") == ["olr"]


def test_stem_recursive_suffix(stemmer):
    """abcd -SFX C(d/C)-> abc needs flag C cross-check -SFX C(c)-> ab."""
    assert stemmer.stem("abcd") == ["ab"]


def test_stem_ignore_case(stemmer):
    for w in ("apache", "APACHE", "Apache"):
        assert stemmer.stem(w) == ["apach"], w
    for w in ("foos", "Foos", "food", "Food"):
        assert stemmer.stem(w) == ["foo"], w


def test_stem_case_sensitive():
    st = HunspellStemmer(
        HunspellDictionary(TEST_AFF, TEST_DIC, ignore_case=False))
    assert st.stem("apache") == []
    assert st.stem("Apache") == ["Apach"]
    # E flag belongs to 'Foo' only; D to 'foo' only
    assert st.stem("Food") == ["Foo"]
    assert st.stem("foos") == ["foo"]
    assert st.stem("Foos") == []


def test_flag_long_and_aliases_match_simple():
    """FLAG long two-char flags (cooked char-code sums) + AF aliases
    must stem identically to the plain fixture
    (HunspellDictionaryTest testCompressed*)."""
    a = HunspellStemmer(
        HunspellDictionary(TEST_AFF, TEST_DIC, ignore_case=True))
    b = HunspellStemmer(
        HunspellDictionary(COMPRESSED_AFF, COMPRESSED_DIC,
                           ignore_case=True))
    for w in ("lucene", "mahoute", "solr", "abcd", "apache", "foos",
              "food", "nothing"):
        assert a.stem(w) == b.stem(w), w


def test_dictionary_shapes():
    d = HunspellDictionary(TEST_AFF, TEST_DIC, ignore_case=True)
    assert len(d.lookup_suffix("e")) == 3
    assert len(d.lookup_prefix("s")) == 1
    assert d.lookup_word("lucen")[0].has_flag("A")
    assert d.lookup_word("lucene")[0].flags is None


def test_missing_set_line_raises():
    with pytest.raises(HunspellParseError, match="SET charset"):
        HunspellDictionary("FLAG num\n", "0\n")


def test_strict_affix_rule_parsing():
    bad = "SET UTF-8\nSFX A Y 1\nSFX A 0 e\n"
    with pytest.raises(HunspellParseError, match="five elements"):
        HunspellDictionary(bad, "0\n")
    d = HunspellDictionary(bad, "0\n", strict_affix_parsing=False)
    assert d.lookup_suffix("e") is None


def test_stem_filter_post(stemmer):
    """HunspellStemFilter: unknown tokens unchanged; multiple stems
    overlay at one position; keyword passthrough."""
    d = HunspellDictionary(TEST_AFF, TEST_DIC, ignore_case=True)
    post = hunspell_stem_post(d)
    assert post([("lucene", 0), ("xyz", 1)]) == [
        ("lucene", 0), ("lucen", 0), ("xyz", 1)]
    kw = hunspell_stem_post(d, keyword_set={"lucene"})
    assert kw([("lucene", 0)]) == [("lucene", 0)]


def test_fuzz_generate_then_stem_roundtrip():
    """Generative duel: build random dictionaries + suffix/prefix
    rules, AFFIX base words forward (append the rule's append, honor
    strip/condition), and assert the stemmer recovers the base;
    plus the invariant that every stem is a dictionary entry."""
    import random

    rng = random.Random(5)
    letters = "abcdefg"
    for _ in range(25):
        words = list({"".join(rng.choice(letters)
                              for _ in range(rng.randint(3, 7)))
                      for _ in range(rng.randint(3, 8))})
        flags = ["A", "B"]
        sfx_rules = []
        for f in flags:
            for _ in range(rng.randint(1, 2)):
                append = "".join(rng.choice(letters)
                                 for _ in range(rng.randint(1, 2)))
                cond = rng.choice(["."] + list(letters))
                sfx_rules.append((f, append, cond))
        aff_lines = ["SET UTF-8"]
        by_flag = {}
        for f, append, cond in sfx_rules:
            by_flag.setdefault(f, []).append((append, cond))
        for f, rules in by_flag.items():
            aff_lines.append(f"SFX {f} Y {len(rules)}")
            for append, cond in rules:
                aff_lines.append(f"SFX {f} 0 {append}/Z {cond}")
        dic_entries = [(w, rng.choice(flags)) for w in words]
        dic = "\n".join([str(len(dic_entries))]
                        + [f"{w}/{f}" for w, f in dic_entries])
        d = HunspellDictionary("\n".join(aff_lines), dic)
        st = HunspellStemmer(d)
        for w, f in dic_entries:
            # base word stems to itself
            assert w in st.stem(w)
            for append, cond in by_flag[f]:
                if cond != "." and not w.endswith(cond):
                    continue
                surface = w + append
                stems = st.stem(surface)
                assert w in stems, (w, f, append, cond, stems)
                # every stem is a dictionary entry or the surface
                for s in st.unique_stems(surface):
                    assert s == surface or d.lookup_word(s) is not None
