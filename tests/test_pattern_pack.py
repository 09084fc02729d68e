"""Pattern-pack token semantics (analysis/pattern/* +
miscellaneous/*): PatternTokenizer split/group modes,
PatternReplaceFilter all/first, KeepWordFilter, TrimFilter,
CapitalizationFilter defaults + options, HyphenatedWordsFilter
accumulation and trailing-hyphen restore. Pure Python — AnalyzerSpec
chains run driver-side identically to their executor form."""

from lucene_solr_spark.functions.analysis import (
    capitalization_post, get_analyzer, hyphenated_words_post,
    pattern_tokenizer)


def test_pattern_tokenizer_split_drops_empties():
    scan = pattern_tokenizer("[ aeiou]+")
    assert scan("the fast key") == ["th", "f", "st", "k", "y"]
    assert scan("aeiou") == []  # fully consumed -> no empty tokens


def test_pattern_tokenizer_group_mode():
    scan = pattern_tokenizer(r"\b(s[a-z]+)", 1)
    assert scan("the sort scan x stream") == ["sort", "scan", "stream"]
    # group 0 includes the whole match
    scan0 = pattern_tokenizer(r"'([^']+)'", 0)
    assert scan0("aaa 'bbb' 'ccc'") == ["'bbb'", "'ccc'"]
    scan1 = pattern_tokenizer(r"'([^']+)'", 1)
    assert scan1("aaa 'bbb' 'ccc'") == ["bbb", "ccc"]


def test_pattern_replace_all_vs_first():
    assert get_analyzer("pattern_replace_vowel_all").analyze(
        "queue") == ["q****"]
    assert get_analyzer("pattern_replace_vowel_first").analyze(
        "queue") == ["q*eue"]


def test_keep_word_inverse_stop():
    out = get_analyzer("keep_word_ops").analyze(
        "the hash table scan join order")
    assert out == ["hash", "scan", "join"]


def test_capitalization_defaults_and_options():
    assert get_analyzer("capitalization_ws").analyze(
        "big BIG miXed") == ["Big", "Big", "Mixed"]
    # onlyFirstWord: later words inside one token lowercase
    cap = capitalization_post()
    assert cap([("hello world", 0)]) == [("Hello world", 0)]
    # minWordLength: short words untouched ("and" -> "And", "or" stays)
    cap3 = capitalization_post(min_word_length=3)
    assert cap3([("and", 0), ("or", 1)]) == [("And", 0), ("or", 1)]
    # keep list passes through but first letter still forced
    capk = capitalization_post(keep=["mcdonald"])
    assert capk([("mcdonald", 0)]) == [("Mcdonald", 0)]
    capk2 = capitalization_post(keep=["mcdonald"],
                                force_first_letter=False)
    assert capk2([("mcdonald", 0)]) == [("mcdonald", 0)]
    # okPrefix words untouched
    capp = capitalization_post(ok_prefix=["mc"])
    assert capp([("mcdonald", 0), ("smith", 1)]) == [
        ("mcdonald", 0), ("Smith", 1)]


def test_hyphenated_words_filter():
    hy = hyphenated_words_post()
    toks = [("tab-", 0), ("le", 1), ("plain", 2)]
    assert hy(toks) == [("table", 0), ("plain", 2)]
    # consecutive hyphen parts accumulate into one join
    assert hy([("sc-", 0), ("an-", 1), ("x", 2)]) == [("scanx", 0)]
    # stream ends mid-accumulation: hyphen restored (:104-110)
    assert hy([("end-", 5)]) == [("end-", 5)]


def test_trim_keyword_whole_field():
    assert get_analyzer("keyword_trim").analyze(
        "  padded text \t") == ["padded text"]
