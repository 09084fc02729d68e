"""NGramTokenizer (4.4) / EdgeNGramTokenizer / Lucene43NGramTokenizer —
golden vectors from NGramTokenizerTest + EdgeNGramTokenizerTest, plus
a randomized duel against the reference's testNGrams oracle loop
(NGramTokenizerTest.java:150-192)."""

import random

import pytest

from lucene_solr_spark.functions.ngram_tokenizers import (
    edge_ngram_tokenize,
    lucene43_ngram_tokenize,
    ngram_tokenize,
)


def terms(out):
    return [t for t, _s, _e in out]


def test_unigrams_bigrams_ngrams_abcde():
    assert terms(ngram_tokenize("abcde", 1, 1)) == list("abcde")
    assert ngram_tokenize("abcde", 2, 2) == [
        ("ab", 0, 2), ("bc", 1, 3), ("cd", 2, 4), ("de", 3, 5)]
    assert terms(ngram_tokenize("abcde", 1, 3)) == [
        "a", "ab", "abc", "b", "bc", "bcd", "c", "cd", "cde", "d",
        "de", "e"]


def test_edge_front_vectors():
    assert edge_ngram_tokenize("abcde", 1, 1) == [("a", 0, 1)]
    assert terms(edge_ngram_tokenize("abcde", 1, 3)) == ["a", "ab", "abc"]
    assert edge_ngram_tokenize("abcde", 6, 6) == []


def test_invalid_args():
    with pytest.raises(ValueError):
        ngram_tokenize("abcde", 0, 0)
    with pytest.raises(ValueError):
        ngram_tokenize("abcde", 2, 1)
    with pytest.raises(ValueError):
        edge_ngram_tokenize("abcde", -1, 2)


def test_pre_tokenization_hook():
    """isTokenChar pre-tokenization: grams never span a non-token
    char; edges re-open after each non-token char."""
    tok = lambda c: c != " "
    out = ngram_tokenize("ab cd", 2, 2, is_token_char=tok)
    assert out == [("ab", 0, 2), ("cd", 3, 5)]
    out = edge_ngram_tokenize("ab cde", 2, 3, is_token_char=tok)
    assert out == [("ab", 0, 2), ("cd", 3, 5), ("cde", 3, 6)]


def test_lucene43_order_and_trim():
    """Old tokenizer: grams by ascending size then position, input
    String.trim()'d, 1024-char cap."""
    assert terms(lucene43_ngram_tokenize("abcde", 1, 3)) == [
        "a", "b", "c", "d", "e",
        "ab", "bc", "cd", "de", "abc", "bcd", "cde"]
    assert lucene43_ngram_tokenize("  ab ", 1, 1) == [
        ("a", 0, 1), ("b", 1, 2)]
    big = "x" * 2000
    assert len(lucene43_ngram_tokenize(big, 1, 1)) == 1024


def test_random_duel_vs_reference_oracle():
    """The reference's own oracle loop (testNGrams :167-187) ported
    verbatim, dueled on random strings/params for both modes."""
    rng = random.Random(42)
    for _ in range(300):
        n = rng.randint(0, 30)
        s = "".join(rng.choice("ab ._") for _ in range(n))
        non_token = rng.choice(["", " ", "._", " ._"])
        mn = rng.randint(1, 4)
        mx = rng.randint(mn, 5)
        edges = rng.random() < 0.5
        tok = lambda c: c not in non_token
        want = []
        for start in range(len(s)):
            for end in range(start + mn, min(start + mx, len(s)) + 1):
                if edges and start > 0 and tok(s[start - 1]):
                    continue
                if any(not tok(s[j]) for j in range(start, end)):
                    continue
                want.append((s[start:end], start, end))
        got = ngram_tokenize(s, mn, mx, edges_only=edges,
                             is_token_char=tok)
        assert got == want, (s, non_token, mn, mx, edges)
