"""Per-language light/minimal stemmer pack — the UniNE/Savoy family the
reference ships as ``analysis/common/src/java/org/apache/lucene/analysis/
{de,fr,es,it,pt,ru,sv,no,fi,hu}/*LightStemmer.java`` and
``*MinimalStemmer.java``, re-expressed as pure ``str -> str`` functions
for the AnalyzerSpec ``stem=`` seam (the PorterStemFilter slot).

Published algorithm sources (the reference files cite the same): Jacques
Savoy, "Light Stemming Approaches for the French, Portuguese, German and
Hungarian Languages" (SAC 2006); "Report on CLEF-2001/2003 Experiments";
Dolamic & Savoy, "Indexing and Searching Strategies for the Russian
Language".

Every port is duel-gated over the reference's OWN vocabulary test data
(``*testdata.zip`` / ``nb_*.txt`` — 10k-55k word/stem pairs per
language, the exact files the reference's VocabularyAssert reads) in
tests/test_light_stemmers.py, so rule-for-rule parity is checked on the
full published vocabularies, not samples.

All stemmers follow the reference's char-array convention: mutate a
buffer in place, return the new logical length. Here the buffer is a
Python list of chars; helpers mirror analysis/util/StemmerUtil.java
(endsWith :35-45, delete :49-61)."""

from __future__ import annotations

from typing import List


def _ends(s: List[str], length: int, suffix: str) -> bool:
    """StemmerUtil.endsWith(char[], len, String)."""
    n = len(suffix)
    if length < n:
        return False
    return "".join(s[length - n:length]) == suffix


def _fold(s: List[str], length: int, table: dict) -> None:
    for i in range(length):
        r = table.get(s[i])
        if r is not None:
            s[i] = r


# ---------------------------------------------------------------------------
# German (de/GermanLightStemmer.java, de/GermanMinimalStemmer.java)
# ---------------------------------------------------------------------------

_DE_FOLD = {"ä": "a", "à": "a", "á": "a", "â": "a",
            "ö": "o", "ò": "o", "ó": "o", "ô": "o",
            "ï": "i", "ì": "i", "í": "i", "î": "i",
            "ü": "u", "ù": "u", "ú": "u", "û": "u"}

_DE_ST_END = frozenset("bdfghklmnt")


def german_light_stem(term: str) -> str:
    """GermanLightStemmer.java:66-145 (UniNE): fold umlauts/accents,
    strip plural/case endings (step1), then derivational -est/-er/-en/
    -st (step2)."""
    s = list(term)
    n = len(s)
    _fold(s, n, _DE_FOLD)
    # step1 (:106-124)
    if n > 5 and s[n - 3] == "e" and s[n - 2] == "r" and s[n - 1] == "n":
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in "mnrs":
        n -= 2
    elif n > 3 and s[n - 1] == "e":
        n -= 1
    elif n > 3 and s[n - 1] == "s" and s[n - 2] in _DE_ST_END:
        n -= 1
    # step2 (:126-138)
    if n > 5 and s[n - 3] == "e" and s[n - 2] == "s" and s[n - 1] == "t":
        n -= 3
    elif n > 4 and s[n - 2] == "e" and (s[n - 1] == "r" or s[n - 1] == "n"):
        n -= 2
    elif n > 4 and s[n - 2] == "s" and s[n - 1] == "t" \
            and s[n - 3] in _DE_ST_END:
        n -= 2
    return "".join(s[:n])


def german_minimal_stem(term: str) -> str:
    """GermanMinimalStemmer.java:64-95 (Morphologie et recherche
    d'information): nur Umlaut-fold + -nen/-en/-se/-es/-er + single
    n/e/s/r."""
    s = list(term)
    n = len(s)
    if n < 5:
        return term
    _fold(s, n, {"ä": "a", "ö": "o", "ü": "u"})
    if n > 6 and s[n - 3] == "n" and s[n - 2] == "e" and s[n - 1] == "n":
        return "".join(s[:n - 3])
    if n > 5:
        last, prev = s[n - 1], s[n - 2]
        if ((last == "n" and prev == "e") or (last == "e" and prev == "s")
                or (last == "s" and prev == "e")
                or (last == "r" and prev == "e")):
            return "".join(s[:n - 2])
    if s[n - 1] in "nesr":
        return "".join(s[:n - 1])
    return "".join(s[:n])


# ---------------------------------------------------------------------------
# French (fr/FrenchLightStemmer.java, fr/FrenchMinimalStemmer.java)
# ---------------------------------------------------------------------------

_FR_FOLD = {"à": "a", "á": "a", "â": "a", "ô": "o",
            "è": "e", "é": "e", "ê": "e",
            "ù": "u", "û": "u", "î": "i", "ç": "c"}


def _fr_norm(s: List[str], n: int) -> int:
    """FrenchLightStemmer.norm (:229-266): fold accents, squeeze
    repeated adjacent letters, then strip -ie / trailing r/e/e/double."""
    if n > 4:
        _fold(s, n, _FR_FOLD)
        ch = s[0]
        i = 1
        while i < n:
            if s[i] == ch and ch.isalpha():
                del s[i]
                n -= 1
            else:
                ch = s[i]
                i += 1
    if n > 4 and _ends(s, n, "ie"):
        n -= 2
    if n > 4:
        if s[n - 1] == "r":
            n -= 1
        if s[n - 1] == "e":
            n -= 1
        if s[n - 1] == "e":
            n -= 1
        if s[n - 1] == s[n - 2] and s[n - 1].isalpha():
            n -= 1
    return n


def french_light_stem(term: str) -> str:
    """FrenchLightStemmer.java:66-227 (UniNE), rule-for-rule including
    the no-return fall-through blocks (trice/ète/ique)."""
    s = list(term)
    n = len(s)
    if n > 5 and s[n - 1] == "x":
        if s[n - 3] == "a" and s[n - 2] == "u" and s[n - 4] != "e":
            s[n - 2] = "l"
        n -= 1
    if n > 3 and s[n - 1] == "x":
        n -= 1
    if n > 3 and s[n - 1] == "s":
        n -= 1
    if n > 9 and _ends(s, n, "issement"):
        n -= 6
        s[n - 1] = "r"
        return "".join(s[:_fr_norm(s, n)])
    if n > 8 and _ends(s, n, "issant"):
        n -= 4
        s[n - 1] = "r"
        return "".join(s[:_fr_norm(s, n)])
    if n > 6 and _ends(s, n, "ement"):
        n -= 4
        if n > 3 and _ends(s, n, "ive"):
            n -= 1
            s[n - 1] = "f"
        return "".join(s[:_fr_norm(s, n)])
    if n > 11 and _ends(s, n, "ficatrice"):
        n -= 5
        s[n - 2] = "e"
        s[n - 1] = "r"
        return "".join(s[:_fr_norm(s, n)])
    if n > 10 and _ends(s, n, "ficateur"):
        n -= 4
        s[n - 2] = "e"
        s[n - 1] = "r"
        return "".join(s[:_fr_norm(s, n)])
    if n > 9 and _ends(s, n, "catrice"):
        n -= 3
        s[n - 4] = "q"
        s[n - 3] = "u"
        s[n - 2] = "e"
        return "".join(s[:_fr_norm(s, n)])
    if n > 8 and _ends(s, n, "cateur"):
        n -= 2
        s[n - 4] = "q"
        s[n - 3] = "u"
        s[n - 2] = "e"
        s[n - 1] = "r"
        return "".join(s[:_fr_norm(s, n)])
    if n > 8 and _ends(s, n, "atrice"):
        n -= 4
        s[n - 2] = "e"
        s[n - 1] = "r"
        return "".join(s[:_fr_norm(s, n)])
    if n > 7 and _ends(s, n, "ateur"):
        n -= 3
        s[n - 2] = "e"
        s[n - 1] = "r"
        return "".join(s[:_fr_norm(s, n)])
    if n > 6 and _ends(s, n, "trice"):
        n -= 1
        s[n - 3] = "e"
        s[n - 2] = "u"
        s[n - 1] = "r"
    if n > 5 and _ends(s, n, "ième"):
        return "".join(s[:_fr_norm(s, n - 4)])
    if n > 7 and _ends(s, n, "teuse"):
        n -= 2
        s[n - 1] = "r"
        return "".join(s[:_fr_norm(s, n)])
    if n > 6 and _ends(s, n, "teur"):
        n -= 1
        s[n - 1] = "r"
        return "".join(s[:_fr_norm(s, n)])
    if n > 5 and _ends(s, n, "euse"):
        return "".join(s[:_fr_norm(s, n - 2)])
    if n > 8 and _ends(s, n, "ère"):
        n -= 1
        s[n - 2] = "e"
        return "".join(s[:_fr_norm(s, n)])
    if n > 7 and _ends(s, n, "ive"):
        n -= 1
        s[n - 1] = "f"
        return "".join(s[:_fr_norm(s, n)])
    if n > 4 and (_ends(s, n, "folle") or _ends(s, n, "molle")):
        n -= 2
        s[n - 1] = "u"
        return "".join(s[:_fr_norm(s, n)])
    if n > 9 and _ends(s, n, "nnelle"):
        return "".join(s[:_fr_norm(s, n - 5)])
    if n > 9 and _ends(s, n, "nnel"):
        return "".join(s[:_fr_norm(s, n - 3)])
    if n > 4 and _ends(s, n, "ète"):
        n -= 1
        s[n - 2] = "e"
    if n > 8 and _ends(s, n, "ique"):
        n -= 4
    if n > 8 and _ends(s, n, "esse"):
        return "".join(s[:_fr_norm(s, n - 3)])
    if n > 7 and _ends(s, n, "inage"):
        return "".join(s[:_fr_norm(s, n - 3)])
    if n > 9 and _ends(s, n, "isation"):
        n -= 7
        if n > 5 and _ends(s, n, "ual"):
            s[n - 2] = "e"
        return "".join(s[:_fr_norm(s, n)])
    if n > 9 and _ends(s, n, "isateur"):
        return "".join(s[:_fr_norm(s, n - 7)])
    if n > 8 and _ends(s, n, "ation"):
        return "".join(s[:_fr_norm(s, n - 5)])
    if n > 8 and _ends(s, n, "ition"):
        return "".join(s[:_fr_norm(s, n - 5)])
    return "".join(s[:_fr_norm(s, n)])


def french_minimal_stem(term: str) -> str:
    """FrenchMinimalStemmer.java:63-79 (Savoy's stopword-list paper
    stemmer): -x (with au->al), then trailing s, r, e, é, double."""
    s = list(term)
    n = len(s)
    if n < 6:
        return term
    if s[n - 1] == "x":
        if s[n - 3] == "a" and s[n - 2] == "u":
            s[n - 2] = "l"
        return "".join(s[:n - 1])
    if s[n - 1] == "s":
        n -= 1
    if s[n - 1] == "r":
        n -= 1
    if s[n - 1] == "e":
        n -= 1
    if s[n - 1] == "é":
        n -= 1
    if s[n - 1] == s[n - 2]:
        n -= 1
    return "".join(s[:n])


# ---------------------------------------------------------------------------
# Spanish (es/SpanishLightStemmer.java)
# ---------------------------------------------------------------------------

_ES_FOLD = {"à": "a", "á": "a", "â": "a", "ä": "a",
            "ò": "o", "ó": "o", "ô": "o", "ö": "o",
            "è": "e", "é": "e", "ê": "e", "ë": "e",
            "ù": "u", "ú": "u", "û": "u", "ü": "u",
            "ì": "i", "í": "i", "î": "i", "ï": "i"}


def spanish_light_stem(term: str) -> str:
    """SpanishLightStemmer.java:64-108 (CLEF-2001): fold accents, strip
    final o/a/e; -s after vowel (with -eses/-ces special cases)."""
    s = list(term)
    n = len(s)
    if n < 5:
        return term
    _fold(s, n, _ES_FOLD)
    last = s[n - 1]
    if last in "oae":
        return "".join(s[:n - 1])
    if last == "s":
        if s[n - 2] == "e" and s[n - 3] == "s" and s[n - 4] == "e":
            return "".join(s[:n - 2])
        if s[n - 2] == "e" and s[n - 3] == "c":
            s[n - 3] = "z"
            return "".join(s[:n - 2])
        if s[n - 2] in "oae":
            return "".join(s[:n - 2])
    return "".join(s[:n])


# ---------------------------------------------------------------------------
# Italian (it/ItalianLightStemmer.java)
# ---------------------------------------------------------------------------

def italian_light_stem(term: str) -> str:
    """ItalianLightStemmer.java:64-119 (CLEF-2001): fold accents, strip
    final vowel with i/h-digraph awareness."""
    s = list(term)
    n = len(s)
    if n < 6:
        return term
    _fold(s, n, _ES_FOLD)
    last, prev = s[n - 1], s[n - 2]
    if last == "e":
        return "".join(s[:n - 2] if prev in "ih" else s[:n - 1])
    if last == "i":
        return "".join(s[:n - 2] if prev in "hi" else s[:n - 1])
    if last == "a":
        return "".join(s[:n - 2] if prev == "i" else s[:n - 1])
    if last == "o":
        return "".join(s[:n - 2] if prev == "i" else s[:n - 1])
    return "".join(s[:n])


# ---------------------------------------------------------------------------
# Portuguese (pt/PortugueseLightStemmer.java)
# ---------------------------------------------------------------------------

_PT_FOLD = {"à": "a", "á": "a", "â": "a", "ä": "a", "ã": "a",
            "ò": "o", "ó": "o", "ô": "o", "ö": "o", "õ": "o",
            "è": "e", "é": "e", "ê": "e", "ë": "e",
            "ù": "u", "ú": "u", "û": "u", "ü": "u",
            "ì": "i", "í": "i", "î": "i", "ï": "i", "ç": "c"}


def _pt_remove_suffix(s: List[str], n: int) -> int:
    """PortugueseLightStemmer.removeSuffix (:112-166)."""
    if n > 4 and _ends(s, n, "es") and s[n - 3] in "rslz":
        return n - 2
    if n > 3 and _ends(s, n, "ns"):
        s[n - 2] = "m"
        return n - 1
    if n > 4 and (_ends(s, n, "eis") or _ends(s, n, "éis")):
        s[n - 3] = "e"
        s[n - 2] = "l"
        return n - 1
    if n > 4 and _ends(s, n, "ais"):
        s[n - 2] = "l"
        return n - 1
    if n > 4 and _ends(s, n, "óis"):
        s[n - 3] = "o"
        s[n - 2] = "l"
        return n - 1
    if n > 4 and _ends(s, n, "is"):
        s[n - 1] = "l"
        return n
    if n > 3 and (_ends(s, n, "ões") or _ends(s, n, "ães")):
        n -= 1
        s[n - 2] = "ã"
        s[n - 1] = "o"
        return n
    if n > 6 and _ends(s, n, "mente"):
        return n - 5
    if n > 3 and s[n - 1] == "s":
        return n - 1
    return n


def _pt_norm_feminine(s: List[str], n: int) -> int:
    """PortugueseLightStemmer.normFeminine (:168-206)."""
    if n > 7 and (_ends(s, n, "inha") or _ends(s, n, "iaca")
                  or _ends(s, n, "eira")):
        s[n - 1] = "o"
        return n
    if n > 6:
        if (_ends(s, n, "osa") or _ends(s, n, "ica") or _ends(s, n, "ida")
                or _ends(s, n, "ada") or _ends(s, n, "iva")
                or _ends(s, n, "ama")):
            s[n - 1] = "o"
            return n
        if _ends(s, n, "ona"):
            s[n - 3] = "ã"
            s[n - 2] = "o"
            return n - 1
        if _ends(s, n, "ora"):
            return n - 1
        if _ends(s, n, "esa"):
            s[n - 3] = "ê"
            return n - 1
        if _ends(s, n, "na"):
            s[n - 1] = "o"
            return n
    return n


def portuguese_light_stem(term: str) -> str:
    """PortugueseLightStemmer.java:66-110 (UniNE): plural suffix
    removal, feminine normalization, final-vowel strip, accent fold
    (fold runs LAST, unlike the other UniNE stemmers)."""
    s = list(term)
    n = len(s)
    if n < 4:
        return term
    n = _pt_remove_suffix(s, n)
    if n > 3 and s[n - 1] == "a":
        n = _pt_norm_feminine(s, n)
    if n > 4 and s[n - 1] in "eao":
        n -= 1
    _fold(s, n, _PT_FOLD)
    return "".join(s[:n])


# ---------------------------------------------------------------------------
# Russian (ru/RussianLightStemmer.java)
# ---------------------------------------------------------------------------

_RU_4 = ("иями", "оями")
_RU_3 = ("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
         "ери", "ими", "ого", "ому", "ыми", "оев")
_RU_2 = ("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв",
         "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев",
         "ий", "им", "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")


def russian_light_stem(term: str) -> str:
    """RussianLightStemmer.java:66-152 (Dolamic & Savoy): case-ending
    removal then -ь/-и / -нн normalization."""
    s = list(term)
    n = len(s)
    # removeCase (:81-152)
    if n > 6 and any(_ends(s, n, suf) for suf in _RU_4):
        n -= 4
    elif n > 5 and any(_ends(s, n, suf) for suf in _RU_3):
        n -= 3
    elif n > 4 and any(_ends(s, n, suf) for suf in _RU_2):
        n -= 2
    elif n > 3 and s[n - 1] in "аеиоуйыяь":
        n -= 1
    # normalize (:72-79)
    if n > 3:
        if s[n - 1] in "ьи":
            n -= 1
        elif s[n - 1] == "н" and s[n - 2] == "н":
            n -= 1
    return "".join(s[:n])


# ---------------------------------------------------------------------------
# Swedish (sv/SwedishLightStemmer.java)
# ---------------------------------------------------------------------------

def swedish_light_stem(term: str) -> str:
    """SwedishLightStemmer.java:66-110 (CLEF-2003)."""
    s = list(term)
    n = len(s)
    if n > 4 and s[n - 1] == "s":
        n -= 1
    if n > 7 and (_ends(s, n, "elser") or _ends(s, n, "heten")):
        return "".join(s[:n - 5])
    if n > 6 and (_ends(s, n, "arne") or _ends(s, n, "erna")
                  or _ends(s, n, "ande") or _ends(s, n, "else")
                  or _ends(s, n, "aste") or _ends(s, n, "orna")
                  or _ends(s, n, "aren")):
        return "".join(s[:n - 4])
    if n > 5 and (_ends(s, n, "are") or _ends(s, n, "ast")
                  or _ends(s, n, "het")):
        return "".join(s[:n - 3])
    if n > 4 and (_ends(s, n, "ar") or _ends(s, n, "er")
                  or _ends(s, n, "or") or _ends(s, n, "en")
                  or _ends(s, n, "at") or _ends(s, n, "te")
                  or _ends(s, n, "et")):
        return "".join(s[:n - 2])
    if n > 3 and s[n - 1] in "taen":
        return "".join(s[:n - 1])
    return "".join(s[:n])


# ---------------------------------------------------------------------------
# Norwegian (no/NorwegianLightStemmer.java, no/NorwegianMinimalStemmer.java)
# ---------------------------------------------------------------------------

def norwegian_light_stem(term: str) -> str:
    """NorwegianLightStemmer.java:66-121 (hand-crafted, adapted from
    the Swedish rules)."""
    s = list(term)
    n = len(s)
    if n > 4 and s[n - 1] == "s":
        n -= 1
    if n > 7 and (_ends(s, n, "heter") or _ends(s, n, "heten")):
        return "".join(s[:n - 5])
    if n > 5 and (_ends(s, n, "dom") or _ends(s, n, "het")):
        return "".join(s[:n - 3])
    if n > 7 and (_ends(s, n, "elser") or _ends(s, n, "elsen")):
        return "".join(s[:n - 5])
    if n > 6 and (_ends(s, n, "ende") or _ends(s, n, "else")
                  or _ends(s, n, "este") or _ends(s, n, "eren")):
        return "".join(s[:n - 4])
    if n > 5 and (_ends(s, n, "ere") or _ends(s, n, "est")
                  or _ends(s, n, "ene")):
        return "".join(s[:n - 3])
    if n > 4 and (_ends(s, n, "er") or _ends(s, n, "en")
                  or _ends(s, n, "et") or _ends(s, n, "st")
                  or _ends(s, n, "te")):
        return "".join(s[:n - 2])
    if n > 3 and s[n - 1] in "aen":
        return "".join(s[:n - 1])
    return "".join(s[:n])


def norwegian_minimal_stem(term: str) -> str:
    """NorwegianMinimalStemmer.java:67-93 (plural/genitive only)."""
    s = list(term)
    n = len(s)
    if n > 4 and s[n - 1] == "s":
        n -= 1
    if n > 5 and _ends(s, n, "ene"):
        return "".join(s[:n - 3])
    if n > 4 and (_ends(s, n, "er") or _ends(s, n, "en")
                  or _ends(s, n, "et")):
        return "".join(s[:n - 2])
    if n > 3 and s[n - 1] in "ae":
        return "".join(s[:n - 1])
    return "".join(s[:n])


# ---------------------------------------------------------------------------
# Finnish (fi/FinnishLightStemmer.java)
# ---------------------------------------------------------------------------

_FI_VOWELS = frozenset("aeiouy")


def _fi_step1(s: List[str], n: int) -> int:
    if n > 8:
        if _ends(s, n, "kin"):
            return _fi_step1(s, n - 3)
        if _ends(s, n, "ko"):
            return _fi_step1(s, n - 2)
    if n > 11:
        if _ends(s, n, "dellinen"):
            return n - 8
        if _ends(s, n, "dellisuus"):
            return n - 9
    return n


def _fi_step2(s: List[str], n: int) -> int:
    if n > 5:
        if _ends(s, n, "lla") or _ends(s, n, "tse") or _ends(s, n, "sti"):
            return n - 3
        if _ends(s, n, "ni"):
            return n - 2
        if _ends(s, n, "aa"):
            return n - 1
    return n


def _fi_step3(s: List[str], n: int) -> int:
    if n > 8:
        if _ends(s, n, "nnen"):
            s[n - 4] = "s"
            return n - 3
        if _ends(s, n, "ntena"):
            s[n - 5] = "s"
            return n - 4
        if _ends(s, n, "tten"):
            return n - 4
        if _ends(s, n, "eiden"):
            return n - 5
    if n > 6:
        if (_ends(s, n, "neen") or _ends(s, n, "niin")
                or _ends(s, n, "seen") or _ends(s, n, "teen")
                or _ends(s, n, "inen")):
            return n - 4
        if s[n - 3] == "h" and s[n - 2] in _FI_VOWELS and s[n - 1] == "n":
            return n - 3
        if _ends(s, n, "den"):
            s[n - 3] = "s"
            return n - 2
        if _ends(s, n, "ksen"):
            s[n - 4] = "s"
            return n - 3
        if (_ends(s, n, "ssa") or _ends(s, n, "sta") or _ends(s, n, "lla")
                or _ends(s, n, "lta") or _ends(s, n, "tta")
                or _ends(s, n, "ksi") or _ends(s, n, "lle")):
            return n - 3
    if n > 5:
        if _ends(s, n, "na") or _ends(s, n, "ne"):
            return n - 2
        if _ends(s, n, "nei"):
            return n - 3
    if n > 4:
        if _ends(s, n, "ja") or _ends(s, n, "ta"):
            return n - 2
        if s[n - 1] == "a":
            return n - 1
        if s[n - 1] == "n" and s[n - 2] in _FI_VOWELS:
            return n - 2
        if s[n - 1] == "n":
            return n - 1
    return n


def _fi_norm1(s: List[str], n: int) -> int:
    if n > 5 and _ends(s, n, "hde"):
        s[n - 3] = "k"
        s[n - 2] = "s"
        s[n - 1] = "i"
    if n > 4 and (_ends(s, n, "ei") or _ends(s, n, "at")):
        return n - 2
    if n > 3 and s[n - 1] in "tsjeai":
        return n - 1
    return n


def _fi_norm2(s: List[str], n: int) -> int:
    if n > 8 and s[n - 1] in "eou":
        n -= 1
    if n > 4:
        if s[n - 1] == "i":
            n -= 1
        if n > 4:
            ch = s[0]
            i = 1
            while i < n:
                if s[i] == ch and ch in "kpt":
                    del s[i]
                    n -= 1
                else:
                    ch = s[i]
                    i += 1
    return n


def finnish_light_stem(term: str) -> str:
    """FinnishLightStemmer.java:66-240 (CLEF-2003): recursive clitic
    strip, case-ending removal, and k/p/t gemination squeeze."""
    s = list(term)
    n = len(s)
    if n < 4:
        return term
    _fold(s, n, {"ä": "a", "å": "a", "ö": "o"})
    n = _fi_step1(s, n)
    n = _fi_step2(s, n)
    n = _fi_step3(s, n)
    n = _fi_norm1(s, n)
    n = _fi_norm2(s, n)
    return "".join(s[:n])


# ---------------------------------------------------------------------------
# Hungarian (hu/HungarianLightStemmer.java)
# ---------------------------------------------------------------------------

_HU_FOLD = {"á": "a", "ë": "e", "é": "e", "í": "i",
            "ó": "o", "ő": "o", "õ": "o", "ö": "o",
            "ú": "u", "ű": "u", "ũ": "u", "û": "u", "ü": "u"}

_HU_VOWELS = frozenset("aeiouy")

_HU_CASE_3 = ("nak", "nek", "val", "vel", "ert", "rol", "ban", "ben",
              "bol", "nal", "nel", "hoz", "hez", "tol")
_HU_CASE_2 = ("at", "et", "ot", "va", "ve", "ra", "re", "ba", "be",
              "ul", "ig")


def _hu_remove_case(s: List[str], n: int) -> int:
    if n > 6 and _ends(s, n, "kent"):
        return n - 4
    if n > 5:
        if any(_ends(s, n, suf) for suf in _HU_CASE_3):
            return n - 3
        if _ends(s, n, "al") or _ends(s, n, "el"):
            if s[n - 3] not in _HU_VOWELS and s[n - 3] == s[n - 4]:
                return n - 3
    if n > 4:
        if any(_ends(s, n, suf) for suf in _HU_CASE_2):
            return n - 2
        if (_ends(s, n, "on") or _ends(s, n, "en")) \
                and s[n - 3] not in _HU_VOWELS:
            return n - 2
        last = s[n - 1]
        if last in "tn":
            return n - 1
        if last in "ae" and s[n - 2] == s[n - 3] \
                and s[n - 2] not in _HU_VOWELS:
            return n - 2
    return n


def _hu_remove_possessive(s: List[str], n: int) -> int:
    if n > 6:
        if s[n - 5] not in _HU_VOWELS and (
                _ends(s, n, "atok") or _ends(s, n, "otok")
                or _ends(s, n, "etek")):
            return n - 4
        if _ends(s, n, "itek") or _ends(s, n, "itok"):
            return n - 4
    if n > 5:
        if s[n - 4] not in _HU_VOWELS and (
                _ends(s, n, "unk") or _ends(s, n, "tok")
                or _ends(s, n, "tek")):
            return n - 3
        if s[n - 4] in _HU_VOWELS and _ends(s, n, "juk"):
            return n - 3
        if _ends(s, n, "ink"):
            return n - 3
    if n > 4:
        if s[n - 3] not in _HU_VOWELS and (
                _ends(s, n, "am") or _ends(s, n, "em")
                or _ends(s, n, "om") or _ends(s, n, "ad")
                or _ends(s, n, "ed") or _ends(s, n, "od")
                or _ends(s, n, "uk")):
            return n - 2
        if s[n - 3] in _HU_VOWELS and (
                _ends(s, n, "nk") or _ends(s, n, "ja")
                or _ends(s, n, "je")):
            return n - 2
        if _ends(s, n, "im") or _ends(s, n, "id") or _ends(s, n, "ik"):
            return n - 2
    if n > 3:
        last = s[n - 1]
        if last in "ae":
            if s[n - 2] not in _HU_VOWELS:
                return n - 1
        elif last in "md":
            if s[n - 2] in _HU_VOWELS:
                return n - 1
        elif last == "i":
            return n - 1
    return n


def _hu_remove_plural(s: List[str], n: int) -> int:
    """removePossessive's sibling (:205-214) with the reference's
    intentional fallthrough: -Vk strips two only when len > 4."""
    if n > 3 and s[n - 1] == "k":
        if s[n - 2] in "aoe" and n > 4:
            return n - 2
        return n - 1
    return n


def _hu_normalize(s: List[str], n: int) -> int:
    if n > 3 and s[n - 1] in "aeio":
        return n - 1
    return n


def hungarian_light_stem(term: str) -> str:
    """HungarianLightStemmer.java:66-245 (UniNE)."""
    s = list(term)
    n = len(s)
    _fold(s, n, _HU_FOLD)
    n = _hu_remove_case(s, n)
    n = _hu_remove_possessive(s, n)
    n = _hu_remove_plural(s, n)
    n = _hu_normalize(s, n)
    return "".join(s[:n])


LIGHT_STEMMERS = {
    "de_light": german_light_stem,
    "de_minimal": german_minimal_stem,
    "fr_light": french_light_stem,
    "fr_minimal": french_minimal_stem,
    "es_light": spanish_light_stem,
    "it_light": italian_light_stem,
    "pt_light": portuguese_light_stem,
    "ru_light": russian_light_stem,
    "sv_light": swedish_light_stem,
    "no_light": norwegian_light_stem,
    "no_minimal": norwegian_minimal_stem,
    "fi_light": finnish_light_stem,
    "hu_light": hungarian_light_stem,
}


# Stemmers are pure str -> str and corpus token streams repeat a small
# vocabulary heavily: memoize at the MODULE NAME so every consumer
# (and pickled analyzer specs, which resolve by qualified name) gets
# the cached form — per-distinct-token Python cost, bounded cache.
from functools import lru_cache as _lru_cache

for _n in list(LIGHT_STEMMERS):
    _fname = LIGHT_STEMMERS[_n].__name__
    globals()[_fname] = _lru_cache(maxsize=1 << 17)(globals()[_fname])
    LIGHT_STEMMERS[_n] = globals()[_fname]
