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


# -- additional PhoneticFilterFactory encoders -------------------------------
# (PhoneticFilterFactory.java:48-49 registry: DoubleMetaphone, Metaphone,
# Soundex, RefinedSoundex, Caverphone (v2.0), ColognePhonetic. Soundex is
# above; DoubleMetaphone lives in functions/dmetaphone.py.)

# commons-codec RefinedSoundex US_ENGLISH mapping (one digit per A..Z)
_REFINED_MAP_STR = "01360240043788015936020505"


def refined_soundex(word: str) -> str:
    """RefinedSoundex (commons-codec RefinedSoundex.java): keep the
    first letter, then append each letter's digit (INCLUDING the first
    letter's) whenever it differs from the previously appended digit.
    No vowel reset, no H/W transparency, no length cap."""
    letters = [c for c in word.upper() if "A" <= c <= "Z"]
    if not letters:
        return ""
    out = [letters[0]]
    last = None
    for c in letters:
        code = _REFINED_MAP_STR[ord(c) - 65]
        if code != last:
            out.append(code)
        last = code
    return "".join(out)


# Caverphone 2.0 (David Hood, "Caverphone Revisited", Caversham Project
# technical paper, University of Otago, 2004) — the fixed replacement
# cascade, applied in order. '2' marks consonants to delete, '3' marks
# vowels to delete (a trailing 3 becomes A); result padded to 10 with 1s.
import re as _re

_CAVER2_RULES: List[Tuple[str, str]] = [
    (r"e$", ""),
    (r"^cough", "cou2f"),
    (r"^rough", "rou2f"),
    (r"^tough", "tou2f"),
    (r"^enough", "enou2f"),
    (r"^trough", "trou2f"),
    (r"^gn", "2n"),
    (r"mb$", "m2"),
    (r"cq", "2q"),
    (r"ci", "si"),
    (r"ce", "se"),
    (r"cy", "sy"),
    (r"tch", "2ch"),
    (r"c", "k"),
    (r"q", "k"),
    (r"x", "k"),
    (r"v", "f"),
    (r"dg", "2g"),
    (r"tio", "sio"),
    (r"tia", "sia"),
    (r"d", "t"),
    (r"ph", "fh"),
    (r"b", "p"),
    (r"sh", "s2h"),
    (r"z", "s"),
    (r"^[aeiou]", "A"),
    (r"[aeiou]", "3"),
    (r"j", "y"),
    (r"^y3", "Y3"),
    (r"^y", "A"),
    (r"y", "3"),
    (r"3gh3", "3kh3"),
    (r"gh", "22"),
    (r"g", "k"),
    (r"s+", "S"),
    (r"t+", "T"),
    (r"p+", "P"),
    (r"k+", "K"),
    (r"f+", "F"),
    (r"m+", "M"),
    (r"n+", "N"),
    (r"w3", "W3"),
    (r"wh3", "Wh3"),
    (r"w$", "3"),
    (r"w", "2"),
    (r"^h", "A"),
    (r"h", "2"),
    (r"r3", "R3"),
    (r"r$", "3"),
    (r"r", "2"),
    (r"l3", "L3"),
    (r"l$", "3"),
    (r"l", "2"),
    (r"2", ""),
    (r"3$", "A"),
    (r"3", ""),
]
_CAVER2_COMPILED = [(_re.compile(p), rep) for p, rep in _CAVER2_RULES]


def caverphone2(word: str) -> str:
    """Caverphone 2.0: lowercase, strip non a-z, run the cascade,
    pad/truncate to 10 with 1s. Empty input -> '1111111111' (the
    commons-codec Caverphone2 behavior: the pad applies regardless)."""
    s = "".join(c for c in word.lower() if "a" <= c <= "z")
    for rx, rep in _CAVER2_COMPILED:
        s = rx.sub(rep, s)
    return (s + "1" * 10)[:10]


def generic_phonetic_post(encoder, inject: bool = True):
    """PhoneticFilter (PhoneticFilter.java:49-80) over any encoder
    str -> str: inject=true keeps the original and adds the code at
    the same position; inject=false substitutes. Empty codes pass the
    original through (non-convertible tokens)."""

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        out: List[Tuple[str, int]] = []
        for t, p in tp:
            code = encoder(t)
            if inject:
                out.append((t, p))
                if code and code != t:
                    out.append((code, p))
            else:
                out.append((code or t, p))
        return out

    return post


def double_metaphone_post(max_len: int = 4, inject: bool = True):
    """DoubleMetaphoneFilter (phonetic/DoubleMetaphoneFilter.java:
    70-100): per token emit the primary code and, when it differs, the
    alternate; inject=true keeps the original token; tokens with no
    encodable letters pass through unchanged."""
    from .dmetaphone import double_metaphone

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        out: List[Tuple[str, int]] = []
        for t, p in tp:
            primary, alternate = double_metaphone(t, max_len)
            if inject:
                out.append((t, p))
                if primary and primary != t:
                    out.append((primary, p))
            else:
                out.append((primary or t, p))
            if alternate and alternate != t:
                out.append((alternate, p))
        return out

    return post
