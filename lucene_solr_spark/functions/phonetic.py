"""PhoneticFilter with American Soundex (lucene/analysis/phonetic/src/
java/org/apache/lucene/analysis/phonetic/PhoneticFilter.java, encoder =
commons-codec Soundex — the Solr ``<filter class="solr.PhoneticFilter
Factory" encoder="Soundex"/>`` default path).

Soundex rules implemented exactly as commons-codec's US_ENGLISH
mapping (Soundex.java getMappingCode + US_ENGLISH_MAPPING):

  - strip non-letters, uppercase; empty input -> empty code
  - first letter kept verbatim; its digit seeds the duplicate rule
  - digit map: BFPV=1 CGJKQSXZ=2 DT=3 L=4 MN=5 R=6; AEIOUY H W = 0
  - a digit equal to the previous EFFECTIVE digit is dropped;
    H and W are transparent (they do not reset the previous digit:
    "Ashcraft" -> A261, not A226), vowels DO reset it
    ("Tymczak" -> T522)
  - pad/truncate to letter + 3 digits

PhoneticFilter injects the encoded token at the SAME position as the
original (inject=true default, PhoneticFilter.java:49-80); with
inject=false it replaces the token.
"""

from __future__ import annotations

from typing import List, Tuple

__all__ = ["soundex", "phonetic_post"]

_MAP = {}
for _chars, _d in (("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
                   ("L", "4"), ("MN", "5"), ("R", "6")):
    for _c in _chars:
        _MAP[_c] = _d


def soundex(word: str) -> str:
    letters = [c for c in word.upper() if "A" <= c <= "Z"]
    if not letters:
        return ""
    out = [letters[0]]
    prev = _MAP.get(letters[0], "0")
    for c in letters[1:]:
        if len(out) >= 4:
            break
        code = _MAP.get(c, "0")
        if code == "0":
            # vowels reset the duplicate rule; H/W are transparent
            if c not in ("H", "W"):
                prev = "0"
            continue
        if code != prev:
            out.append(code)
        prev = code
    return "".join(out).ljust(4, "0")


def phonetic_post(inject: bool = True):
    """Token-stream filter: append (inject=true) or substitute the
    soundex code at each token's position."""

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        out: List[Tuple[str, int]] = []
        for t, p in tp:
            code = soundex(t)
            if inject:
                out.append((t, p))
                if code and code != t:
                    out.append((code, p))
            else:
                out.append((code or t, p))
        return out

    return post
