"""SpellingQueryConverter gates (solr/spelling/
SpellingQueryConverter.java): token extraction regex (NMTOKEN: and
digit-run lookahead), AND NOT collapse, flag assignment, and the
whole-collection TERM_IN_BOOLEAN_QUERY OR."""

from lucene_solr_spark.search.spellconvert import (
    PROHIBITED_TERM_FLAG,
    REQUIRED_TERM_FLAG,
    TERM_IN_BOOLEAN_QUERY_FLAG,
    TERM_PRECEDES_NEW_BOOLEAN_OPERATOR_FLAG,
    convert,
)

B = TERM_IN_BOOLEAN_QUERY_FLAG
P = TERM_PRECEDES_NEW_BOOLEAN_OPERATOR_FLAG


class TestConvert:
    def test_field_prefix_skipped_value_kept(self):
        # the NMTOKEN: lookahead skips 'lang' but matches 'en'
        assert convert("lang:en foo") == [
            ("en", 5, 0), ("foo", 8, 0)]

    def test_and_not_collapse_and_flags(self):
        assert convert("lang:en foo AND NOT bar") == [
            ("en", 5, B), ("foo", 8, P | B), ("bar", 20, B)]

    def test_plus_minus_modifiers(self):
        assert convert("big +cat -dog") == [
            ("big", 0, 0),
            ("cat", 5, REQUIRED_TERM_FLAG),
            ("dog", 9, PROHIBITED_TERM_FLAG)]

    def test_operator_change_flag(self):
        # beta precedes OR after an AND -> new-operator flag (:150-155)
        assert convert("alpha AND beta OR gamma") == [
            ("alpha", 0, B), ("beta", 10, P | B), ("gamma", 18, B)]

    def test_digit_runs_skipped(self):
        # a digit-start position can't begin a token: '123abc' -> 'abc'
        assert convert("123 456") == []
        assert convert("123abc") == [("abc", 3, 0)]

    def test_stopwords_vanish_in_analyze(self):
        assert convert("hello the world") == [
            ("hello", 0, 0), ("world", 10, 0)]

    def test_none_and_plain(self):
        assert convert(None) == []
        assert convert("solo") == [("solo", 0, 0)]
