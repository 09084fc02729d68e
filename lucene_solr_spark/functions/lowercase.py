"""Language-specific lowercase/normalization filters with REAL rule
content (not morphology tables — these are the casing-rule family,
distinct from the excluded per-language stemmer packs):

* ``analysis/tr/TurkishLowerCaseFilter.java:36-122``: the Turkish
  dotted/dotless-I rules — after a LATIN CAPITAL LETTER I (and through
  any run of non-spacing marks) a COMBINING DOT ABOVE (U+0307) is
  DELETED (composed-lowercase mimicry), 'I' itself becomes dotted
  small 'i' when a combining dot above follows (other NSMs may sit in
  between, :98-108) else DOTLESS small U+0131; everything else takes
  the plain per-codepoint lowercase.

* ``analysis/el/GreekLowerCaseFilter.java:67-127``: lowercase plus
  diacritic folding — final sigma standardized to sigma, every
  tonos/dialytika vowel form folded to the bare lowercase vowel
  (the exact switch, including the U+03A2 reserved-codepoint
  backwards-compat case).

* ``analysis/ga/IrishLowerCaseFilter.java:31-78``: t-prothesis and
  n-eclipsis — a leading 'n' or 't' followed by an UPPERCASE vowel
  (plain or fada-accented) gets a '-' inserted after it (nAthair ->
  n-athair), then the rest lowercases; the inserted hyphen protects
  the prothetic letter from the lowercase walk (idx starts at 2).

Java ``Character.toLowerCase(int)`` is the SIMPLE per-codepoint
mapping; Python ``str.lower()`` applies full case mappings (e.g.
U+0130 -> 'i' + combining dot), so ``_java_lower`` pins the simple
mapping for the divergent codepoints.
"""

from __future__ import annotations

import unicodedata

__all__ = [
    "turkish_lowercase",
    "greek_lowercase",
    "irish_lowercase",
    "turkish_lowercase_post",
    "greek_lowercase_post",
    "irish_lowercase_post",
]

_CAPITAL_I = "I"
_SMALL_I = "i"
_DOTLESS_I = "ı"
_DOT_ABOVE = "̇"


def _java_lower(ch: str) -> str:
    """Character.toLowerCase(int): SIMPLE 1:1 case mapping. The one
    full-mapping divergence reachable here is U+0130 (-> 'i' alone in
    Java, 'i'+U+0307 in Python); codepoints whose Python lower() is
    not length-1 otherwise keep themselves (no simple mapping)."""
    if ch == "İ":
        return _SMALL_I
    low = ch.lower()
    return low if len(low) == 1 else ch


def _is_nsm(ch: str) -> bool:
    return unicodedata.category(ch) == "Mn"


def turkish_lowercase(s: str) -> str:
    """TurkishLowerCaseFilter.incrementToken (:52-88) char walk."""
    buf = list(s)
    out = []
    i = 0
    i_or_after = False
    while i < len(buf):
        ch = buf[i]
        i_or_after = (ch == _CAPITAL_I
                      or (i_or_after and _is_nsm(ch)))
        if i_or_after:
            if ch == _DOT_ABOVE:
                # delete to mimic composed lowercase (:63-66)
                i += 1
                continue
            if ch == _CAPITAL_I:
                if _is_before_dot(buf, i + 1):
                    out.append(_SMALL_I)
                else:
                    out.append(_DOTLESS_I)
                    i_or_after = False
                i += 1
                continue
        out.append(_java_lower(ch))
        i += 1
    return "".join(out)


def _is_before_dot(buf, pos) -> bool:
    """Lookahead for U+0307 through other non-spacing marks
    (:98-108)."""
    for i in range(pos, len(buf)):
        if not _is_nsm(buf[i]):
            return False
        if buf[i] == _DOT_ABOVE:
            return True
    return False


_GREEK_FOLD = {}
for _srcs, _dst in [
    ("ς", "σ"),                                  # final sigma
    ("Άά", "α"),                            # alpha
    ("Έέ", "ε"),                            # epsilon
    ("Ήή", "η"),                            # eta
    ("ΊΪίϊΐ", "ι"),          # iota
    ("ΎΫύϋΰ", "υ"),          # upsilon
    ("Όό", "ο"),                            # omicron
    ("Ώώ", "ω"),                            # omega
    ("΢", "ς"),                                  # reserved
]:
    for _c in _srcs:
        _GREEK_FOLD[_c] = _dst


def greek_lowercase(s: str) -> str:
    """GreekLowerCaseFilter.lowerCase switch (:67-127) per char."""
    return "".join(_GREEK_FOLD.get(c, _java_lower(c)) for c in s)


_UPPER_VOWELS = set("AEIOUÁÉÍÓÚ")


def irish_lowercase(s: str) -> str:
    """IrishLowerCaseFilter.incrementToken (:42-60): hyphen insertion
    after prothetic n/t, lowercase walk starting past it."""
    if len(s) > 1 and s[0] in ("n", "t") and s[1] in _UPPER_VOWELS:
        return s[0] + "-" + "".join(_java_lower(c) for c in s[1:])
    return "".join(_java_lower(c) for c in s)


def _as_post(fn):
    def post(tp):
        return [(fn(t), p) for t, p in tp]

    return post


def turkish_lowercase_post():
    """AnalyzerSpec post-stage adapter (stream-level slot)."""
    return _as_post(turkish_lowercase)


def greek_lowercase_post():
    return _as_post(greek_lowercase)


def irish_lowercase_post():
    return _as_post(irish_lowercase)
