"""Per-language normalization filters, closing the r3 §8.1 remainder:
ArabicNormalizer (ar/ArabicNormalizer.java — hamza-seat alef, teh
marbuta->heh, dotless yeh->yeh, harakat/tatweel removal),
PersianNormalizer (fa/PersianNormalizer.java — farsi yeh/yeh
barree->yeh, keheh->kaf, heh+hamza/heh goal->heh, hamza-above
removal), HindiNormalizer (hi/HindiNormalizer.java — the Ljiljana
Dolamic light normalization: dead-n->bindu, nukta forms, ZWJ/virama
deletion, chandra and long->short vowel folding), and
GermanNormalizationFilter (de/GermanNormalizationFilter.java — the
German2-snowball normalization as a standalone filter: the N/V/U
3-state machine that deletes 'e' after an umlaut-capable u, folds
umlauts, expands eszett).

Each is a pure str -> str on the AnalyzerSpec stem= / pre slots,
gated over the reference tests' vectors in
tests/test_normalizers.py."""

from __future__ import annotations

_AR_MAP = {
    "\u0622": "\u0627", "\u0623": "\u0627", "\u0625": "\u0627",
    "\u0649": "\u064A",
    "\u0629": "\u0647",
}
_AR_DEL = frozenset(
    "\u0640\u064B\u064C\u064D\u064E\u064F\u0650\u0651\u0652")


def arabic_normalize(term: str) -> str:
    """ArabicNormalizer.normalize (:66-100)."""
    out = []
    for ch in term:
        if ch in _AR_DEL:
            continue
        out.append(_AR_MAP.get(ch, ch))
    return "".join(out)


_FA_MAP = {
    "\u06CC": "\u064A", "\u06D2": "\u064A",
    "\u06A9": "\u0643",
    "\u06C0": "\u0647", "\u06C1": "\u0647",
}


def persian_normalize(term: str) -> str:
    """PersianNormalizer.normalize (:63-89)."""
    out = []
    for ch in term:
        if ch == "\u0654":   # hamza above
            continue
        out.append(_FA_MAP.get(ch, ch))
    return "".join(out)


_HI_MAP = {
    "ँ": "ं",
    "ऩ": "न", "ऱ": "र", "ऴ": "ळ",
    "क़": "क", "ख़": "ख", "ग़": "ग",
    "ज़": "ज", "ड़": "ड", "ढ़": "ढ",
    "फ़": "फ", "य़": "य",
    "ॅ": "े", "ॆ": "े",
    "ॉ": "ो", "ॊ": "ो",
    "ऍ": "ए", "ऎ": "ए",
    "ऑ": "ओ", "ऒ": "ओ",
    "ॲ": "अ",
    "आ": "अ", "ई": "इ", "ऊ": "उ",
    "ॠ": "ऋ", "ॡ": "ऌ",
    "ऐ": "ए", "औ": "ओ",
    "ी": "ि", "ू": "ु", "ॄ": "ृ",
    "ॣ": "ॢ", "ै": "े", "ौ": "ो",
}
_HI_DEL = frozenset("़‍‌्")


def hindi_normalize(term: str) -> str:
    """HindiNormalizer.normalize (:43-180); the dead-n rule consumes
    the following virama and the deletion set mirrors the switch."""
    s = list(term)
    out = []
    i = 0
    n = len(s)
    while i < n:
        ch = s[i]
        if ch == "\u0928" and i + 1 < n and s[i + 1] == "\u094D":
            out.append("\u0902")
            i += 2
            continue
        if ch in _HI_DEL:
            i += 1
            continue
        out.append(_HI_MAP.get(ch, ch))
        i += 1
    return "".join(out)


def german_normalize(term: str) -> str:
    """GermanNormalizationFilter.incrementToken (:57-105): the
    3-state N/V/U machine, ported with the same in-place index
    discipline (the 'e'-deletion re-examines the shifted char; the
    eszett expansion advances past the first inserted 's')."""
    N, V, U = 0, 1, 2
    state = N
    buf = list(term)
    i = 0
    while i < len(buf):
        c = buf[i]
        if c in ("a", "o"):
            state = U
        elif c == "u":
            state = U if state == N else V
        elif c == "e":
            if state == U:
                del buf[i]
                i -= 1
            state = V
        elif c in ("i", "q", "y"):
            state = V
        elif c == "ä":
            buf[i] = "a"
            state = V
        elif c == "ö":
            buf[i] = "o"
            state = V
        elif c == "ü":
            buf[i] = "u"
            state = V
        elif c == "ß":
            buf[i] = "s"
            buf.insert(i + 1, "s")
            i += 1
            state = N
        else:
            state = N
        i += 1
    return "".join(buf)


NORMALIZERS = {
    "ar_norm": arabic_normalize,
    "fa_norm": persian_normalize,
    "hi_norm": hindi_normalize,
    "de_norm": german_normalize,
}


def arabic_pipeline(term: str) -> str:
    """ArabicAnalyzer's filter order (ar/ArabicAnalyzer.java:
    ArabicNormalizationFilter then ArabicStemFilter)."""
    from lucene_solr_spark.functions.classicstemmers import arabic_stem

    return arabic_stem(arabic_normalize(term))


def persian_pipeline(term: str) -> str:
    """PersianAnalyzer's filter order (fa/PersianAnalyzer.java:
    ArabicNormalizationFilter then PersianNormalizationFilter; no
    stemming)."""
    return persian_normalize(arabic_normalize(term))


def hindi_pipeline(term: str) -> str:
    """HindiAnalyzer's normalize+stem tail (hi/HindiAnalyzer.java:
    HindiNormalizationFilter then HindiStemFilter). The
    IndicNormalizer composition pass that runs upstream in the full
    default chain lives in functions/indic.py (vector-gated); the
    composed chain is registered as ``hi_default``
    (lang_analyzers.py) — this tail stays as its own seam for the
    norm_hi_pipe entry."""
    from lucene_solr_spark.functions.natstemmers import hindi_stem

    return hindi_stem(hindi_normalize(term))


from functools import lru_cache as _lru_cache  # noqa: E402

for _nn in ("arabic_normalize", "persian_normalize", "hindi_normalize",
            "german_normalize", "arabic_pipeline", "persian_pipeline",
            "hindi_pipeline"):
    globals()[_nn] = _lru_cache(maxsize=1 << 17)(globals()[_nn])

NORMALIZERS = {
    "ar_norm": arabic_normalize,
    "fa_norm": persian_normalize,
    "hi_norm": hindi_normalize,
    "de_norm": german_normalize,
    "ar_pipe": arabic_pipeline,
    "fa_pipe": persian_pipeline,
    "hi_pipe": hindi_pipeline,
}
