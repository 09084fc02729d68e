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


# commons-codec Metaphone (Lawrence Philips 1990, as implemented by
# org.apache.commons.codec.language.Metaphone — PhoneticFilterFactory's
# "Metaphone" registry entry). The quirks below are the commons
# implementation's, kept verbatim (e.g. initial "CH" maps to K only
# when the THIRD char is a vowel — so "CHRISTOPHER" starts with X).

_FRONTV = frozenset("EIY")
_VARSON = frozenset("CSPTG")
_VOWELS = frozenset("AEIOU")
# frozensets, not strings: "" in "EIY" is True (empty substring), and
# context chars at word edges are "" — set membership is the safe test


def metaphone(word: str, max_code_len: int = 4) -> str:
    """Metaphone code, faithful to commons-codec Metaphone.metaphone():
    1-char input returns its uppercase form; initial AE/GN/KN/PN/WR
    drop the first letter, initial X becomes S, initial WH becomes W;
    then the per-letter switch with duplicate-skip (except C), the
    DGE/DGI/DGY triple consume, silent GH/GN/GNED, TCH, terminal MB,
    and the TH -> '0' interdental marker; capped at max_code_len."""
    if not word:
        return ""
    if len(word) == 1:
        return word.upper()
    w = word.upper()
    c0, c1 = w[0], w[1]
    if c0 in "KGP" and c1 == "N":
        local = w[1:]
    elif c0 == "A" and c1 == "E":
        local = w[1:]
    elif c0 == "W" and c1 == "R":
        local = w[1:]
    elif c0 == "W" and c1 == "H":
        local = "W" + w[2:]
    elif c0 == "X":
        local = "S" + w[1:]
    else:
        local = w
    wdsz = len(local)
    code: List[str] = []
    n = 0
    while len(code) < max_code_len and n < wdsz:
        s = local[n]
        prev = local[n - 1] if n > 0 else ""
        nxt = local[n + 1] if n + 1 < wdsz else ""
        nxt2 = local[n + 2] if n + 2 < wdsz else ""
        if s != "C" and s == prev:
            n += 1
            continue
        if s in _VOWELS:
            if n == 0:
                code.append(s)
        elif s == "B":
            if not (prev == "M" and n == wdsz - 1):
                code.append("B")
        elif s == "C":
            if prev == "S" and n < wdsz - 1 and nxt in _FRONTV:
                pass  # SCE/SCI/SCY: C silent
            elif local[n:n + 3] == "CIA":
                code.append("X")
            elif n < wdsz - 1 and nxt in _FRONTV:
                code.append("S")
            elif prev == "S" and nxt == "H":
                code.append("K")
            elif nxt == "H":
                if n == 0 and wdsz >= 3 and local[2] in _VOWELS:
                    code.append("K")
                else:
                    code.append("X")
            else:
                code.append("K")
        elif s == "D":
            if n + 1 != wdsz - 1 and nxt == "G" and nxt2 in _FRONTV:
                code.append("J")
                n += 2  # consume the G and the front vowel too
            else:
                code.append("T")
        elif s == "G":
            if n + 1 == wdsz - 1 and nxt == "H":
                pass
            elif n + 1 < wdsz - 1 and nxt == "H" and nxt2 not in _VOWELS:
                pass
            elif n > 0 and (local[n:n + 2] == "GN"
                            or local[n:n + 4] == "GNED"):
                pass
            elif nxt in _FRONTV and prev != "G" and n != wdsz - 1:
                code.append("J")
            else:
                code.append("K")
        elif s == "H":
            if n == wdsz - 1:
                pass
            elif n > 0 and prev in _VARSON:
                pass
            elif nxt in _VOWELS:
                code.append("H")
        elif s in "FJLMNR":
            code.append(s)
        elif s == "K":
            if n == 0 or prev != "C":
                code.append("K")
        elif s == "P":
            code.append("F" if nxt == "H" else "P")
        elif s == "Q":
            code.append("K")
        elif s == "S":
            if (local[n:n + 2] == "SH" or local[n:n + 3] == "SIO"
                    or local[n:n + 3] == "SIA"):
                code.append("X")
            else:
                code.append("S")
        elif s == "T":
            if local[n:n + 3] in ("TIA", "TIO"):
                code.append("X")
            elif local[n:n + 3] == "TCH":
                pass
            elif local[n:n + 2] == "TH":
                code.append("0")
            else:
                code.append("T")
        elif s == "V":
            code.append("F")
        elif s in "WY":
            if n != wdsz - 1 and nxt in _VOWELS:
                code.append(s)
        elif s == "X":
            code.append("K")
            code.append("S")
        elif s == "Z":
            code.append("S")
        n += 1
    return "".join(code)[:max_code_len]


# Koelner Phonetik (Hans Joachim Postel 1969) as implemented by
# commons-codec ColognePhonetic — PhoneticFilterFactory's
# "ColognePhonetic" registry entry. Batch form: map every letter to its
# digit string with 1-letter context, collapse adjacent equal digits,
# then drop every non-leading '0'.

_COLOGNE_INITIAL_C = frozenset("AHKLOQRUX")   # C at word start followed by these -> 4
_COLOGNE_INNER_C = frozenset("AHKOQUX")       # C elsewhere followed by these -> 4


def _cologne_digit(s: str, prev: str, nxt: str, first: bool) -> str:
    if s in "AEIJOUY":
        return "0"
    if s == "B":
        return "1"
    if s == "P":
        return "3" if nxt == "H" else "1"
    if s in "DT":
        return "8" if nxt in ("C", "S", "Z") else "2"
    if s in "FVW":
        return "3"
    if s in "GKQ":
        return "4"
    if s == "C":
        if first:
            return "4" if nxt in _COLOGNE_INITIAL_C else "8"
        if prev in ("S", "Z"):
            return "8"
        return "4" if nxt in _COLOGNE_INNER_C else "8"
    if s == "X":
        return "8" if prev in ("C", "K", "Q") else "48"
    if s == "L":
        return "5"
    if s in "MN":
        return "6"
    if s == "R":
        return "7"
    if s in "SZ":
        return "8"
    return ""  # H: transparent, no digit


def cologne_phonetic(word: str) -> str:
    """ColognePhonetic code: umlauts fold to their base vowel, other
    non-letters are dropped BEFORE the walk (so context letters are
    the cleaned neighbors, matching the commons preprocess)."""
    w = (word.upper().replace("Ä", "A").replace("Ö", "O")
         .replace("Ü", "U").replace("ß", "S"))
    letters = [c for c in w if "A" <= c <= "Z"]
    raw: List[str] = []
    for i, c in enumerate(letters):
        prev = letters[i - 1] if i > 0 else ""
        nxt = letters[i + 1] if i + 1 < len(letters) else ""
        d = _cologne_digit(c, prev, nxt, i == 0)
        for ch in d:
            if not raw or raw[-1] != ch:
                raw.append(ch)
            else:
                # adjacent duplicate collapses, but stays the context
                raw[-1] = ch
    if not raw:
        return ""
    return raw[0] + "".join(c for c in raw[1:] if c != "0")
