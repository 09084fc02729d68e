"""N-gram TOKENIZERS (whole-input grams, not the per-token filters):

* ``analysis/ngram/NGramTokenizer.java`` (the 4.4 streaming form,
  :146-204): grams emitted by INCREASING START OFFSET, sizes
  min..max at each start; an ``isTokenChar`` pre-tokenization hook —
  grams containing a non-token codepoint are skipped; with
  ``edges_only`` (the EdgeNGramTokenizer constructor flag,
  EdgeNGramTokenizer.java:46-49) a gram is only emitted when the
  char just before its start is a non-token char (or stream start).
  Offsets index the original stream.

* ``analysis/ngram/Lucene43NGramTokenizer.java:96-140``: the old
  behavior — reads at most 1024 chars, String.trim()s the input,
  and emits grams by INCREASING GRAM SIZE, each size sweeping all
  positions.

Both are pure string -> [(term, start, end)] functions; the
distributed shape is an Arrow batch pass over a text column (one
scan, no shuffle), exactly like the other tokenizer entries.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

__all__ = ["ngram_tokenize", "edge_ngram_tokenize",
           "lucene43_ngram_tokenize"]


def _check(min_gram: int, max_gram: int):
    if min_gram < 1:
        raise ValueError("minGram must be greater than zero")
    if min_gram > max_gram:
        raise ValueError("minGram must not be greater than maxGram")


def ngram_tokenize(
    text: str,
    min_gram: int = 1,
    max_gram: int = 2,
    edges_only: bool = False,
    is_token_char: Optional[Callable[[str], bool]] = None,
) -> List[Tuple[str, int, int]]:
    """NGramTokenizer.incrementToken (:146-204) over codepoints: for
    each start (ascending), gram sizes min..max ascending; a gram
    containing a non-token char is dropped (larger grams at the same
    start inherit the char, so the start is abandoned — the
    reference's consume() path); edges_only emits only where
    ``start == 0 or not is_token_char(text[start-1])``."""
    _check(min_gram, max_gram)
    cps = list(text)
    n = len(cps)
    tok = is_token_char or (lambda c: True)
    out: List[Tuple[str, int, int]] = []
    for start in range(n):
        if edges_only and start > 0 and tok(cps[start - 1]):
            continue
        for g in range(min_gram, max_gram + 1):
            if start + g > n:
                break
            if any(not tok(c) for c in cps[start:start + g]):
                # a non-token char stays inside every larger gram at
                # this start: abandon the start (the consume() path)
                break
            out.append(("".join(cps[start:start + g]), start, start + g))
    return out


def edge_ngram_tokenize(
    text: str,
    min_gram: int = 1,
    max_gram: int = 1,
    is_token_char: Optional[Callable[[str], bool]] = None,
) -> List[Tuple[str, int, int]]:
    """EdgeNGramTokenizer (EdgeNGramTokenizer.java:46-49) ==
    NGramTokenizer(edgesOnly=true)."""
    return ngram_tokenize(text, min_gram, max_gram, edges_only=True,
                          is_token_char=is_token_char)


def lucene43_ngram_tokenize(
    text: str, min_gram: int = 1, max_gram: int = 2,
) -> List[Tuple[str, int, int]]:
    """Lucene43NGramTokenizer.incrementToken (:96-140): 1024-char cap,
    String.trim(), grams by ascending size then position."""
    _check(min_gram, max_gram)
    s = text[:1024].strip()
    n = len(s)
    out: List[Tuple[str, int, int]] = []
    for g in range(min_gram, max_gram + 1):
        if g > n:
            break
        for pos in range(0, n - g + 1):
            out.append((s[pos:pos + g], pos, pos + g))
    return out
