"""WordBreakSpellChecker gates (lucene/suggest/.../spell/
WordBreakSpellChecker.java): unit vectors over a hand-built frequency
map (split recursion, mode gates, sort rules, combination runs), then
engine round-trips over the built fixture via the batched
term_stats df lookup."""

import pytest

from lucene_solr_spark.search.wordbreak import (
    SUGGEST_ALWAYS,
    SUGGEST_MORE_POPULAR,
    SUGGEST_WHEN_NOT_IN_INDEX,
    WordBreakSpellChecker,
)


def mk(dfs, **kw):
    return WordBreakSpellChecker(
        lambda terms: {t: dfs[t] for t in terms if t in dfs}, **kw)


class TestBreaks:
    def test_simple_break(self):
        wb = mk({"machine": 5, "learning": 3})
        out = wb.suggest_word_breaks("machinelearning")
        assert out == [[("machine", 5), ("learning", 3)]]

    def test_in_index_suppresses(self):
        wb = mk({"machinelearning": 1, "machine": 5, "learning": 3})
        assert wb.suggest_word_breaks("machinelearning") == []
        # SUGGEST_ALWAYS ignores the original's presence
        assert wb.suggest_word_breaks(
            "machinelearning", suggest_mode=SUGGEST_ALWAYS)

    def test_more_popular_raises_gate(self):
        wb = mk({"ab": 2, "cd": 9, "abcd": 3})
        # gate = orig freq 3: 'ab' (2) fails the left gate -> nothing
        assert wb.suggest_word_breaks(
            "abcd", suggest_mode=SUGGEST_MORE_POPULAR) == []
        wb2 = mk({"ab": 5, "cd": 9, "abcd": 3})
        out = wb2.suggest_word_breaks(
            "abcd", suggest_mode=SUGGEST_MORE_POPULAR)
        assert out == [[("ab", 5), ("cd", 9)]]

    def test_recursion_two_changes(self):
        wb = mk({"a": 1, "b": 1, "c": 1}, max_changes=2)
        out = wb.suggest_word_breaks("abc")
        # 2-word impossible (no 'ab'/'bc'); 3-word via recursion
        assert out == [[("a", 1), ("b", 1), ("c", 1)]]

    def test_sort_fewest_words_then_max_freq(self):
        wb = mk({"ab": 1, "cdef": 9, "abcd": 2, "ef": 7, "cd": 4},
                max_changes=2)
        out = wb.suggest_word_breaks("abcdef", max_suggestions=10)
        # 2-word first (ab+cdef maxfreq 9, abcd+ef maxfreq 7),
        # then the 3-word ab+cd+ef
        assert [[w for w, _ in s] for s in out] == [
            ["ab", "cdef"], ["abcd", "ef"], ["ab", "cd", "ef"]]

    def test_min_break_word_length(self):
        wb = mk({"a": 9, "bcd": 9, "ab": 9, "cd": 9},
                min_break_word_length=2)
        out = wb.suggest_word_breaks("abcd")
        assert out == [[("ab", 9), ("cd", 9)]]

    def test_max_evaluations_bounds_walk(self):
        dfs = {"a" * i: 1 for i in range(1, 30)}
        wb = mk(dfs, max_changes=5, max_evaluations=3)
        out = wb.suggest_word_breaks("a" * 20, max_suggestions=100)
        # budget 3: only the first few split points explored
        assert len(out) <= 3 + 3


class TestCombinations:
    def test_simple_combine(self):
        wb = mk({"microsoft": 8})
        out = wb.suggest_word_combinations(["micro", "soft"])
        assert out == [(("microsoft", 8), [0, 1])]

    def test_when_not_in_index_needs_a_missing_original(self):
        wb = mk({"microsoft": 8, "micro": 1, "soft": 1})
        # both originals indexed -> suppressed
        assert wb.suggest_word_combinations(["micro", "soft"]) == []
        assert wb.suggest_word_combinations(
            ["micro", "soft"], suggest_mode=SUGGEST_ALWAYS)

    def test_more_popular_gate(self):
        wb = mk({"microsoft": 2, "micro": 5, "soft": 1})
        assert wb.suggest_word_combinations(
            ["micro", "soft"], suggest_mode=SUGGEST_MORE_POPULAR) == []
        wb2 = mk({"microsoft": 6, "micro": 5, "soft": 1})
        out = wb2.suggest_word_combinations(
            ["micro", "soft"], suggest_mode=SUGGEST_MORE_POPULAR)
        assert out == [(("microsoft", 6), [0, 1])]

    def test_three_way_run_needs_max_changes_2(self):
        dfs = {"abc": 4}
        assert mk(dfs).suggest_word_combinations(["a", "b", "c"]) == []
        out = mk(dfs, max_changes=2).suggest_word_combinations(
            ["a", "b", "c"])
        assert out == [(("abc", 4), [0, 1, 2])]

    def test_separator_blocks_run(self):
        from lucene_solr_spark.search.wordbreak import SEPARATOR

        wb = mk({"microsoft": 8})
        assert wb.suggest_word_combinations(
            ["micro", SEPARATOR, "soft"]) == []

    def test_sort_fewest_combinations_then_freq(self):
        dfs = {"ab": 9, "bc": 7, "abc": 5}
        out = mk(dfs, max_changes=2).suggest_word_combinations(
            ["a", "b", "c"], suggest_mode=SUGGEST_ALWAYS,
            max_suggestions=10)
        assert [(w, f) for (w, f), _ in out] == [
            ("ab", 9), ("bc", 7), ("abc", 5)]

    def test_max_combine_word_length(self):
        wb = mk({"aaaaaabbbbbb": 9}, max_combine_word_length=10)
        assert wb.suggest_word_combinations(
            ["aaaaaa", "bbbbbb"], suggest_mode=SUGGEST_ALWAYS) == []


class TestEngineRoundTrip:
    def test_break_and_combine_on_fixture(self, spark, built):
        from lucene_solr_spark.search.executor import IndexSearcher

        index_dir, oracle = built
        s = IndexSearcher(spark, index_dir)
        wb = WordBreakSpellChecker(s._lookup_dfs)
        out = wb.suggest_word_breaks("onehundred")
        assert out and [w for w, _ in out[0]] == ["one", "hundred"]
        # freqs are the engine's docFreqs
        assert out[0][0][1] == oracle.df("one")
        assert out[0][1][1] == oracle.df("hundred")

        combos = wb.suggest_word_combinations(["merge", "idx"])
        assert combos and combos[0][0][0] == "mergeidx"
        assert combos[0][0][1] == oracle.df("mergeidx")
        assert combos[0][1] == [0, 1]


def test_spell_ngram_classic(spark, built):
    """Classic n-gram SpellChecker (suggest/spell/SpellChecker.java):
    gram-candidate retrieval + Levenstein-similarity rescore; in-dict
    words return themselves (SUGGEST_WHEN_NOT_IN_INDEX :337-339);
    suggestions are real dictionary terms above the accuracy floor."""
    from lucene_solr_spark.search.executor import IndexSearcher

    index_dir, oracle = built
    s = IndexSearcher(spark, index_dir)

    # in-dictionary word: returns itself with its df
    got = s.spell_ngram("common_util", num_sug=5).collect()
    assert len(got) == 1 and got[0]["term"] == "common_util"
    assert got[0]["score"] == 1.0

    # misspelling: candidates share grams, rescored by 1 - d/min(len)
    got = s.spell_ngram("common_utik", num_sug=5).collect()
    assert got and got[0]["term"] == "common_util"
    vocab = set(oracle.postings)
    for r in got:
        assert r["term"] in vocab
        assert r["score"] >= 0.5
    # order: score desc then df desc then term asc
    keys = [(-r["score"], -r["df"], r["term"]) for r in got]
    assert keys == sorted(keys)

    # gram-size bounds per word length (SpellChecker.java:555-575)
    assert IndexSearcher._spell_gram_bounds(4) == (1, 2)
    assert IndexSearcher._spell_gram_bounds(5) == (2, 3)
    assert IndexSearcher._spell_gram_bounds(9) == (3, 4)


# -- WordBreakSolrSpellChecker wrapper ----------------------------------------

def _mk_lookup(dfs):
    return lambda terms: {t: dfs[t] for t in terms if t in dfs}


def test_solr_wrapper_interleave_and_freqs():
    from lucene_solr_spark.search.wordbreak import (
        WordBreakSpellChecker, word_break_spelling_result)

    dfs = {"fast": 9, "slow": 7, "window": 8}
    wb = WordBreakSpellChecker(_mk_lookup(dfs), max_changes=2)
    rows = word_break_spelling_result(
        [("fastslow", 0, 0), ("win", 9, 0), ("dow", 13, 0)],
        wb, _mk_lookup(dfs), num_suggestions=5)
    # break freq 9 (max of fast/slow) > combine freq 8 -> break first
    assert rows == [
        ("fastslow", 0, 8, "fast slow", 9, 0),
        ("win dow", 9, 16, "window", 8, 0),
    ]


def test_solr_wrapper_equal_freq_tie_prefers_combine_first():
    # freq tie: breakCount(0) >= combineCount(0) -> combine emitted
    # first (WordBreakSolrSpellChecker.java:305-311)
    from lucene_solr_spark.search.wordbreak import (
        WordBreakSpellChecker, word_break_spelling_result)

    dfs = {"fast": 8, "slow": 7, "window": 8}
    wb = WordBreakSpellChecker(_mk_lookup(dfs), max_changes=2)
    rows = word_break_spelling_result(
        [("fastslow", 0, 0), ("win", 9, 0), ("dow", 13, 0)],
        wb, _mk_lookup(dfs), num_suggestions=5)
    assert [r[3] for r in rows] == ["window", "fast slow"]


def test_solr_wrapper_separator_blocks_combine():
    # required-status change between tokens injects SEPARATOR_TERM,
    # which breaks the combine run (:208-226)
    from lucene_solr_spark.search.wordbreak import (
        REQUIRED_TERM_FLAG, WordBreakSpellChecker,
        word_break_spelling_result)

    dfs = {"window": 8}
    wb = WordBreakSpellChecker(_mk_lookup(dfs), max_changes=2)
    rows = word_break_spelling_result(
        [("win", 0, 0), ("dow", 4, REQUIRED_TERM_FLAG)],
        wb, _mk_lookup(dfs), num_suggestions=5)
    assert rows == []
    # same tokens without the flag change: combine fires
    rows = word_break_spelling_result(
        [("win", 0, 0), ("dow", 4, 0)],
        wb, _mk_lookup(dfs), num_suggestions=5)
    assert [r[3] for r in rows] == ["window"]


def test_solr_wrapper_sum_tie_breaker():
    from lucene_solr_spark.search.wordbreak import (
        WordBreakSpellChecker, word_break_spelling_result)

    dfs = {"fast": 5, "slow": 4}
    wb = WordBreakSpellChecker(_mk_lookup(dfs), max_changes=2)
    rows = word_break_spelling_result(
        [("fastslow", 0, 0)], wb, _mk_lookup(dfs),
        num_suggestions=5, sort_by_sum=True)
    assert rows == [("fastslow", 0, 8, "fast slow", 9, 0)]
