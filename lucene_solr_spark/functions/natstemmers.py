"""Per-language standalone stemmers, batch 2 — the reference's
self-contained national stemmers (analysis/{cz,bg,lv,hi,id}/
*Stemmer.java), re-expressed as pure ``str -> str`` functions for the
AnalyzerSpec ``stem=`` seam, complementing the UniNE light/minimal
pack in lightstemmers.py.

Published algorithm sources (cited by the reference files):
- Czech: Dolamic & Savoy, "Indexing and stemming approaches for the
  Czech language" (IPM 2009) — cz/CzechStemmer.java.
- Bulgarian: Nakov, "BulStem: Design and evaluation of inflectional
  stemmer for Bulgarian" — bg/BulgarianStemmer.java (light variant).
- Latvian: a light stemmer addressing case/number inflection with
  declension II/V/VI palatalization — lv/LatvianStemmer.java.
- Hindi: Ramanathan & Rao, "A Lightweight Stemmer for Hindi" —
  hi/HindiStemmer.java.
- Indonesian: Tala, "A Study of Stemming Effects on Information
  Retrieval in Bahasa Indonesia" — id/IndonesianStemmer.java.

Gated by the reference tests' own vectors in
tests/test_nat_stemmers.py (checkOneTerm tables transcribed from
Test*Stemmer.java / Test*StemFilter.java)."""

from __future__ import annotations

from typing import List

from lucene_solr_spark.functions.lightstemmers import _ends


# ---------------------------------------------------------------------------
# Czech (cz/CzechStemmer.java)
# ---------------------------------------------------------------------------

_CZ_3 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
         "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
         "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
_CZ_2 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
         "mi", "ou")
_CZ_1 = frozenset("aeiouůyáéíýě")


def _cz_remove_case(s: List[str], n: int) -> int:
    if n > 7 and _ends(s, n, "atech"):
        return n - 5
    if n > 6 and (_ends(s, n, "ětem") or _ends(s, n, "etem")
                  or _ends(s, n, "atům")):
        return n - 4
    if n > 5 and any(_ends(s, n, suf) for suf in _CZ_3):
        return n - 3
    if n > 4 and any(_ends(s, n, suf) for suf in _CZ_2):
        return n - 2
    if n > 3 and s[n - 1] in _CZ_1:
        return n - 1
    return n


def _cz_remove_possessives(s: List[str], n: int) -> int:
    if n > 5 and (_ends(s, n, "ov") or _ends(s, n, "in")
                  or _ends(s, n, "ův")):
        return n - 2
    return n


def _cz_normalize(s: List[str], n: int) -> int:
    if _ends(s, n, "čt"):
        s[n - 2] = "c"
        s[n - 1] = "k"
        return n
    if _ends(s, n, "št"):
        s[n - 2] = "s"
        s[n - 1] = "k"
        return n
    last = s[n - 1]
    if last in "cč":
        s[n - 1] = "k"
        return n
    if last in "zž":
        s[n - 1] = "h"
        return n
    if n > 1 and s[n - 2] == "e":
        s[n - 2] = s[n - 1]
        return n - 1
    if n > 2 and s[n - 2] == "ů":
        s[n - 2] = "o"
        return n
    return n


def czech_stem(term: str) -> str:
    """CzechStemmer.java:44-51 (input expected lowercase WITH
    diacritics): case removal, possessive removal, then the
    palatalization-normalizing rewrite."""
    s = list(term)
    n = len(s)
    n = _cz_remove_case(s, n)
    n = _cz_remove_possessives(s, n)
    if n > 0:
        n = _cz_normalize(s, n)
    return "".join(s[:n])


# ---------------------------------------------------------------------------
# Bulgarian (bg/BulgarianStemmer.java)
# ---------------------------------------------------------------------------

def _bg_remove_article(s: List[str], n: int) -> int:
    if n > 6 and _ends(s, n, "ият"):
        return n - 3
    if n > 5 and (_ends(s, n, "ът") or _ends(s, n, "то")
                  or _ends(s, n, "те") or _ends(s, n, "та")
                  or _ends(s, n, "ия")):
        return n - 2
    if n > 4 and _ends(s, n, "ят"):
        return n - 2
    return n


def _bg_remove_plural(s: List[str], n: int) -> int:
    if n > 6:
        if _ends(s, n, "овци"):
            return n - 3
        if _ends(s, n, "ове"):
            return n - 3
        if _ends(s, n, "еве"):
            s[n - 3] = "й"
            return n - 2
    if n > 5:
        if _ends(s, n, "ища"):
            return n - 3
        if _ends(s, n, "та"):
            return n - 2
        if _ends(s, n, "ци"):
            s[n - 2] = "к"
            return n - 1
        if _ends(s, n, "зи"):
            s[n - 2] = "г"
            return n - 1
        if s[n - 3] == "е" and s[n - 1] == "и":
            s[n - 3] = "я"
            return n - 1
    if n > 4:
        if _ends(s, n, "си"):
            s[n - 2] = "х"
            return n - 1
        if _ends(s, n, "и"):
            return n - 1
    return n


def bulgarian_stem(term: str) -> str:
    """BulgarianStemmer.java:40-72 (the light BulStem variant with the
    fixed ен->н rule)."""
    s = list(term)
    n = len(s)
    if n < 4:
        return term
    if n > 5 and _ends(s, n, "ища"):
        return "".join(s[:n - 3])
    n = _bg_remove_article(s, n)
    n = _bg_remove_plural(s, n)
    if n > 3:
        if _ends(s, n, "я"):
            n -= 1
        if (_ends(s, n, "а") or _ends(s, n, "о") or _ends(s, n, "е")):
            n -= 1
    if n > 4 and _ends(s, n, "ен"):
        s[n - 2] = "н"
        n -= 1
    if n > 5 and s[n - 2] == "ъ":
        s[n - 2] = s[n - 1]
        n -= 1
    return "".join(s[:n])


# ---------------------------------------------------------------------------
# Latvian (lv/LatvianStemmer.java)
# ---------------------------------------------------------------------------

# (affix, vowel-count threshold, palatalizes)
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False), ("īm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False), ("ie", 1, False),
    ("u", 1, True), ("a", 1, True), ("i", 1, True),
    ("e", 1, False), ("ā", 1, False), ("ē", 1, False),
    ("ī", 1, False), ("ū", 1, False), ("o", 1, False),
    ("s", 0, False), ("š", 0, False),
)

_LV_VOWELS = frozenset("aeiouāīēū")


def _lv_unpalatalize(s: List[str], n: int) -> int:
    # s[n] is the first REMOVED char (the Java peeks past len)
    if s[n] == "u":
        if _ends(s, n, "kš"):
            n += 1
            s[n - 2] = "s"
            s[n - 1] = "t"
            return n
        if _ends(s, n, "ņņ"):
            s[n - 2] = "n"
            s[n - 1] = "n"
            return n
    if (_ends(s, n, "pj") or _ends(s, n, "bj")
            or _ends(s, n, "mj") or _ends(s, n, "vj")):
        return n - 1
    if _ends(s, n, "šņ"):
        s[n - 2] = "s"
        s[n - 1] = "n"
        return n
    if _ends(s, n, "žņ"):
        s[n - 2] = "z"
        s[n - 1] = "n"
        return n
    if _ends(s, n, "šļ"):
        s[n - 2] = "s"
        s[n - 1] = "l"
        return n
    if _ends(s, n, "žļ"):
        s[n - 2] = "z"
        s[n - 1] = "l"
        return n
    if _ends(s, n, "ļņ"):
        s[n - 2] = "l"
        s[n - 1] = "n"
        return n
    if _ends(s, n, "ļļ"):
        s[n - 2] = "l"
        s[n - 1] = "l"
        return n
    if s[n - 1] == "č":
        s[n - 1] = "c"
        return n
    if s[n - 1] == "ļ":
        s[n - 1] = "l"
        return n
    if s[n - 1] == "ņ":
        s[n - 1] = "n"
        return n
    return n


def latvian_stem(term: str) -> str:
    """LatvianStemmer.java:39-51: first matching affix from the fixed
    table (requires more vowels than the affix's threshold and stem
    length >= 3), with declension II/V/VI un-palatalization."""
    s = list(term)
    n = len(s)
    num_vowels = sum(1 for ch in s[:n] if ch in _LV_VOWELS)
    for affix, vc, pal in _LV_AFFIXES:
        if (num_vowels > vc and n >= len(affix) + 3
                and _ends(s, n, affix)):
            n -= len(affix)
            if pal:
                n = _lv_unpalatalize(s, n)
            return "".join(s[:n])
    return "".join(s[:n])


# ---------------------------------------------------------------------------
# Hindi (hi/HindiStemmer.java)
# ---------------------------------------------------------------------------

_HI_5 = ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
_HI_4 = ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
         "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
         "ियों", "ियां")
_HI_3 = ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
         "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
         "ुआं")
_HI_2 = ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
         "ती", "ता", "ाँ", "ां", "ों", "ें")
_HI_1 = ("ो", "े", "ू", "ु", "ी", "ि", "ा")


def hindi_stem(term: str) -> str:
    """HindiStemmer.java:31-121 (Ramanathan & Rao lightweight
    stemmer): longest of the 5..1-char suffix tables under the
    len > suffix+1 guards."""
    s = list(term)
    n = len(s)
    for ln, table in ((5, _HI_5), (4, _HI_4), (3, _HI_3), (2, _HI_2),
                      (1, _HI_1)):
        if n > ln + 1 and any(_ends(s, n, suf) for suf in table):
            return "".join(s[:n - ln])
    return term


# ---------------------------------------------------------------------------
# Indonesian (id/IndonesianStemmer.java)
# ---------------------------------------------------------------------------

_ID_REMOVED_KE = 1
_ID_REMOVED_PENG = 2
_ID_REMOVED_DI = 4
_ID_REMOVED_MENG = 8
_ID_REMOVED_TER = 16
_ID_REMOVED_BER = 32
_ID_REMOVED_PE = 64

_ID_VOWELS = frozenset("aeiou")


class _IndState:
    __slots__ = ("syl", "flags")


def _id_starts(s: List[str], n: int, prefix: str) -> bool:
    return n >= len(prefix) and "".join(s[:len(prefix)]) == prefix


def _id_delete_front(s: List[str], n: int, count: int) -> int:
    del s[:count]
    return n - count


def _id_remove_particle(st, s, n):
    if _ends(s, n, "kah") or _ends(s, n, "lah") or _ends(s, n, "pun"):
        st.syl -= 1
        return n - 3
    return n


def _id_remove_possessive(st, s, n):
    if _ends(s, n, "ku") or _ends(s, n, "mu"):
        st.syl -= 1
        return n - 2
    if _ends(s, n, "nya"):
        st.syl -= 1
        return n - 3
    return n


def _id_remove_first_order_prefix(st, s, n):
    if _id_starts(s, n, "meng"):
        st.flags |= _ID_REMOVED_MENG
        st.syl -= 1
        return _id_delete_front(s, n, 4)
    if _id_starts(s, n, "meny") and n > 4 and s[4] in _ID_VOWELS:
        st.flags |= _ID_REMOVED_MENG
        s[3] = "s"
        st.syl -= 1
        return _id_delete_front(s, n, 3)
    if _id_starts(s, n, "men"):
        st.flags |= _ID_REMOVED_MENG
        st.syl -= 1
        return _id_delete_front(s, n, 3)
    if _id_starts(s, n, "mem"):
        st.flags |= _ID_REMOVED_MENG
        st.syl -= 1
        return _id_delete_front(s, n, 3)
    if _id_starts(s, n, "me"):
        st.flags |= _ID_REMOVED_MENG
        st.syl -= 1
        return _id_delete_front(s, n, 2)
    if _id_starts(s, n, "peng"):
        st.flags |= _ID_REMOVED_PENG
        st.syl -= 1
        return _id_delete_front(s, n, 4)
    if _id_starts(s, n, "peny") and n > 4 and s[4] in _ID_VOWELS:
        st.flags |= _ID_REMOVED_PENG
        s[3] = "s"
        st.syl -= 1
        return _id_delete_front(s, n, 3)
    if _id_starts(s, n, "peny"):
        st.flags |= _ID_REMOVED_PENG
        st.syl -= 1
        return _id_delete_front(s, n, 4)
    if _id_starts(s, n, "pen") and n > 3 and s[3] in _ID_VOWELS:
        st.flags |= _ID_REMOVED_PENG
        s[2] = "t"
        st.syl -= 1
        return _id_delete_front(s, n, 2)
    if _id_starts(s, n, "pen"):
        st.flags |= _ID_REMOVED_PENG
        st.syl -= 1
        return _id_delete_front(s, n, 3)
    if _id_starts(s, n, "pem"):
        st.flags |= _ID_REMOVED_PENG
        st.syl -= 1
        return _id_delete_front(s, n, 3)
    if _id_starts(s, n, "di"):
        st.flags |= _ID_REMOVED_DI
        st.syl -= 1
        return _id_delete_front(s, n, 2)
    if _id_starts(s, n, "ter"):
        st.flags |= _ID_REMOVED_TER
        st.syl -= 1
        return _id_delete_front(s, n, 3)
    if _id_starts(s, n, "ke"):
        st.flags |= _ID_REMOVED_KE
        st.syl -= 1
        return _id_delete_front(s, n, 2)
    return n


def _id_remove_second_order_prefix(st, s, n):
    if _id_starts(s, n, "ber"):
        st.flags |= _ID_REMOVED_BER
        st.syl -= 1
        return _id_delete_front(s, n, 3)
    if n == 7 and _id_starts(s, n, "belajar"):
        st.flags |= _ID_REMOVED_BER
        st.syl -= 1
        return _id_delete_front(s, n, 3)
    if (_id_starts(s, n, "be") and n > 4 and s[2] not in _ID_VOWELS
            and s[3] == "e" and s[4] == "r"):
        st.flags |= _ID_REMOVED_BER
        st.syl -= 1
        return _id_delete_front(s, n, 2)
    if _id_starts(s, n, "per"):
        st.syl -= 1
        return _id_delete_front(s, n, 3)
    if n == 7 and _id_starts(s, n, "pelajar"):
        st.syl -= 1
        return _id_delete_front(s, n, 3)
    if _id_starts(s, n, "pe"):
        st.flags |= _ID_REMOVED_PE
        st.syl -= 1
        return _id_delete_front(s, n, 2)
    return n


def _id_remove_suffix(st, s, n):
    if (_ends(s, n, "kan") and not st.flags & _ID_REMOVED_KE
            and not st.flags & _ID_REMOVED_PENG
            and not st.flags & _ID_REMOVED_PE):
        st.syl -= 1
        return n - 3
    if (_ends(s, n, "an") and not st.flags & _ID_REMOVED_DI
            and not st.flags & _ID_REMOVED_MENG
            and not st.flags & _ID_REMOVED_TER):
        st.syl -= 1
        return n - 2
    if (_ends(s, n, "i") and not _ends(s, n, "si")
            and not st.flags & _ID_REMOVED_BER
            and not st.flags & _ID_REMOVED_KE
            and not st.flags & _ID_REMOVED_PENG):
        st.syl -= 1
        return n - 1
    return n


def indonesian_stem(term: str, stem_derivational: bool = True) -> str:
    """IndonesianStemmer.java:47-75 (Tala's algorithm): particle and
    possessive-pronoun stripping always; derivational prefix/suffix
    rules (with the removed-prefix flag interactions) when
    stem_derivational (the filter's default)."""
    s = list(term)
    n = len(s)
    st = _IndState()
    st.flags = 0
    st.syl = sum(1 for ch in s[:n] if ch in _ID_VOWELS)
    if st.syl > 2:
        n = _id_remove_particle(st, s, n)
    if st.syl > 2:
        n = _id_remove_possessive(st, s, n)
    if stem_derivational:
        old = n
        if st.syl > 2:
            n = _id_remove_first_order_prefix(st, s, n)
        if old != n:
            old = n
            if st.syl > 2:
                n = _id_remove_suffix(st, s, n)
            if old != n and st.syl > 2:
                n = _id_remove_second_order_prefix(st, s, n)
        else:
            if st.syl > 2:
                n = _id_remove_second_order_prefix(st, s, n)
            if st.syl > 2:
                n = _id_remove_suffix(st, s, n)
    return "".join(s[:n])


NAT_STEMMERS = {
    "cz": czech_stem,
    "bg": bulgarian_stem,
    "lv": latvian_stem,
    "hi": hindi_stem,
    "id": indonesian_stem,
}


# memoized at the module names (see lightstemmers.py tail note)
from functools import lru_cache as _lru_cache

for _n in list(NAT_STEMMERS):
    _fname = NAT_STEMMERS[_n].__name__
    globals()[_fname] = _lru_cache(maxsize=1 << 17)(globals()[_fname])
    NAT_STEMMERS[_n] = globals()[_fname]
