"""Dictionary compound-word decomposition.

Reference: ``analysis/compound/DictionaryCompoundWordTokenFilter.java``
(``decompose()``: for every start offset i, try substring lengths
minSubwordSize..maxSubwordSize; dictionary hits become subword tokens;
``onlyLongestMatch`` keeps the longest hit per start offset) and the
base contract ``CompoundWordTokenFilterBase.java`` (only tokens of
length >= minWordSize decompose; the ORIGINAL token is always emitted
first and subwords follow at the SAME position, posInc 0; defaults
MIN_WORD_SIZE=5, MIN_SUBWORD_SIZE=2, MAX_SUBWORD_SIZE=15).

Lowercase dictionary matching (CompoundWordTokenFilterBase lowercases
via the supplied CharArraySet) — callers pass an already-lowercased
dictionary here because the engine's chain lowercases upstream.
"""

from __future__ import annotations

from typing import Iterable, List, Tuple

MIN_WORD_SIZE = 5
MIN_SUBWORD_SIZE = 2
MAX_SUBWORD_SIZE = 15


def dictionary_compound_post(
    dictionary: Iterable[str],
    min_word_size: int = MIN_WORD_SIZE,
    min_subword_size: int = MIN_SUBWORD_SIZE,
    max_subword_size: int = MAX_SUBWORD_SIZE,
    only_longest_match: bool = False,
):
    """Stream post filter: [(token, pos)] -> original + subword tokens
    (subwords share the original's position)."""
    dic = frozenset(dictionary)

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        out: List[Tuple[str, int]] = []
        for tok, pos in tp:
            out.append((tok, pos))
            n = len(tok)
            if n < min_word_size:
                continue
            for i in range(n - min_subword_size + 1):
                longest = None
                for j in range(min_subword_size,
                               min(max_subword_size, n - i) + 1):
                    sub = tok[i:i + j]
                    if sub in dic:
                        if only_longest_match:
                            longest = sub
                        else:
                            out.append((sub, pos))
                if longest is not None:
                    out.append((longest, pos))
        return out

    return post
