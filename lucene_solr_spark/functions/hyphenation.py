"""Knuth-Liang hyphenation + HyphenationCompoundWordTokenFilter.

Reference semantics mirrored:
  - HyphenationTree.hyphenate (analysis/common/src/java/org/apache/
    lucene/analysis/compound/hyphenation/HyphenationTree.java:315-404):
    character-class normalization with leading-non-letter skip and
    null-on-interior-non-letter (:322-344), the too-short gate
    len < remain+push (:346-349), the exception (stoplist) path
    (:353-369), and the pattern walk — '.'-marked word, per-position
    searchPatterns MAX-fold of pattern digit values (:371-379; the
    reference's ternary tree is a lookup optimization whose contract
    is spelled out in its own javadoc :185-196 — "for every pattern
    that prefixes word[index:], update interletter values" — which is
    exactly what this port does over a pattern dict), odd interletter
    values inside the remain/push window become hyphen points
    (:381-389), and the returned point list gains synthetic 0 and len
    endpoints (:391-399).
  - pattern encoding: TeX-style strings ("1na", ".ach4", "hen5at");
    digits bind BEFORE the following letter; '.' matches the word
    boundary markers.
  - HyphenationCompoundWordTokenFilter.decompose
    (HyphenationCompoundWordTokenFilter.java:153-222): every
    hyphen-point pair within [minSubwordSize, maxSubwordSize] is a
    candidate; no-dictionary mode emits all candidates, dictionary
    mode checks the part and then the part minus its final char (the
    genitive-s fallback :196-213), onlyLongestMatch keeps the longest
    accepted candidate per start point (:186-195); subword order =
    start-point-major (the reference's loop order).
  - CompoundWordTokenFilterBase: the original token is always kept
    and subwords follow at position increment 0 (same emission
    convention as dictionary_compound_post in functions/compound.py).

The FOP pattern-XML loader is the resource tier (PatternParser.java);
patterns/classes/exceptions enter here as plain sequences — same
seam as the other rule-table filters.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

__all__ = ["Hyphenator", "hyphenation_compound_post"]


def _parse_pattern(pat: str) -> Tuple[str, List[int]]:
    """TeX pattern -> (letters, values); values[k] applies before
    letter k, values has len(letters)+1 entries."""
    letters: List[str] = []
    values = [0]
    for ch in pat:
        if ch.isdigit():
            values[-1] = int(ch)
        else:
            letters.append(ch)
            values.append(0)
    return "".join(letters), values


class Hyphenator:
    """HyphenationTree analogue over a pattern dict."""

    def __init__(self, patterns: Iterable[str],
                 exceptions: Iterable[str] = (),
                 classes: Iterable[str] = ()):
        self._patterns: Dict[str, List[int]] = {}
        for p in patterns:
            letters, values = _parse_pattern(p)
            old = self._patterns.get(letters)
            if old is None:
                self._patterns[letters] = values
            else:  # same letters, keep per-position max (tree merge)
                self._patterns[letters] = [
                    max(a, b) for a, b in zip(old, values)]
        # classmap: normalized char for each input char; default
        # identity lower-case letters plus upper->lower, the common
        # "aA" class shape (HyphenationTree.addClass :406-428)
        self._classmap: Dict[str, str] = {}
        cls = list(classes)
        if not cls:
            cls = [chr(c) + chr(c - 32) for c in range(97, 123)]
        for group in cls:
            norm = group[0]
            for ch in group:
                self._classmap[ch] = norm
        # stoplist: "hy-phen" style exception words (:353-369)
        self._stop: Dict[str, List[int]] = {}
        for e in exceptions:
            parts = e.split("-")
            word = "".join(parts)
            pts, j = [], 0
            for seg in parts[:-1]:
                j += len(seg)
                pts.append(j)
            self._stop[word] = pts

    def hyphenate(self, word: str, remain: int = 1,
                  push: int = 1) -> Optional[List[int]]:
        """-> [0, p1, ..., pk, len] hyphen points, or None."""
        # normalize (:322-344)
        norm: List[str] = []
        ignore_at_beginning = 0
        end_of_letters = False
        for i, ch in enumerate(word):
            nc = self._classmap.get(ch)
            if nc is None:
                if i == ignore_at_beginning:
                    ignore_at_beginning += 1
                else:
                    end_of_letters = True
            else:
                if end_of_letters:
                    return None
                norm.append(nc)
        n = len(norm)
        if n < remain + push:
            return None

        points: List[int] = []
        sw = "".join(norm)
        if sw in self._stop:
            for j in self._stop[sw]:
                if remain <= j < n - push:
                    points.append(j + ignore_at_beginning)
        else:
            marked = "." + sw + "."
            il = [0] * (n + 3)
            for i in range(n + 1):
                tail = marked[i:]
                for letters, values in self._patterns.items():
                    if tail.startswith(letters):
                        for k, v in enumerate(values):
                            if i + k < len(il) and v > il[i + k]:
                                il[i + k] = v
            for i in range(n):
                if (il[i + 1] & 1) and remain <= i <= n - push:
                    points.append(i + ignore_at_beginning)
        if not points:
            return None
        return [0] + points + [n]


def hyphenation_compound_post(
    hyphenator: Hyphenator,
    dictionary: Optional[Sequence[str]] = None,
    min_word_size: int = 5,
    min_subword_size: int = 2,
    max_subword_size: int = 15,
    only_longest_match: bool = False,
):
    """HyphenationCompoundWordTokenFilter as a stream post filter:
    original token kept, accepted subwords appended at the same
    position (posInc-0 emission convention)."""
    dset = None if dictionary is None else frozenset(dictionary)

    def _decompose(term: str) -> List[str]:
        if len(term) < min_word_size:
            return []
        hyp = hyphenator.hyphenate(term, 1, 1)
        if hyp is None:
            return []
        out: List[str] = []
        for i in range(len(hyp)):
            remaining = len(hyp) - i
            start = hyp[i]
            longest: Optional[str] = None
            for j in range(1, remaining):
                part_len = hyp[i + j] - start
                if part_len > max_subword_size:
                    break
                if part_len < min_subword_size:
                    continue
                part = term[start:start + part_len]
                if dset is None or part in dset:
                    if only_longest_match:
                        if longest is None or len(longest) < part_len:
                            longest = part
                    else:
                        out.append(part)
                elif term[start:start + part_len - 1] in dset:
                    short = term[start:start + part_len - 1]
                    if only_longest_match:
                        if longest is None or len(longest) < len(short):
                            longest = short
                    else:
                        out.append(short)
            if only_longest_match and longest is not None:
                out.append(longest)
        return out

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        out: List[Tuple[str, int]] = []
        for t, p in tp:
            out.append((t, p))
            for sub in _decompose(t):
                out.append((sub, p))
        return out

    return post
