"""Classic per-language stemmers, batch 3: the original
GermanStemmer (de/GermanStemmer.java — the substitute/strip/optimize/
resubstitute discriminator machine predating the UniNE family) and
the ArabicStemmer (ar/ArabicStemmer.java — Larkey, Ballesteros &
Connell's light stemming: definite-article/conjunction prefix strip +
common-suffix strip).

Ported quirk-for-quirk, including GermanStemmer's ``substCount =+ 2``
line (an ASSIGNMENT of +2, not an increment — the Java bug changes
which length gates later rules see, so it is kept) and the in-place
mutation-under-iteration of its substitute() loop.

Gated in tests/test_classic_stemmers.py: German over the reference's
own data.txt vocabulary table, Arabic over TestArabicStemFilter's
check() vectors parsed from the test source."""

from __future__ import annotations

from typing import List


# ---------------------------------------------------------------------------
# German (de/GermanStemmer.java)
# ---------------------------------------------------------------------------

class _GermanStemmer:
    """Stateful port (the Java class carries substCount across
    strip/optimize calls within one stem())."""

    def __init__(self):
        self.subst_count = 0

    def stem(self, term: str) -> str:
        term = term.lower()
        if not term.isalpha() or not term:
            # isStemmable: letters only ('' is stemmable in Java;
            # every later step no-ops on it)
            if term == "":
                return term
            if not all(c.isalpha() for c in term):
                return term
        buf = list(term)
        self.subst_count = 0
        self._substitute(buf)
        self._strip(buf)
        self._optimize(buf)
        self._resubstitute(buf)
        self._remove_particle_denotion(buf)
        return "".join(buf)

    def _strip(self, buf: List[str]) -> None:
        # :91-125 — the seven base suffixes, iterated
        do_more = True
        while do_more and len(buf) > 3:
            n = len(buf)
            if n + self.subst_count > 5 and buf[n - 2:] == ["n", "d"]:
                del buf[n - 2:]
            elif n + self.subst_count > 4 and buf[n - 2:] == ["e", "m"]:
                del buf[n - 2:]
            elif n + self.subst_count > 4 and buf[n - 2:] == ["e", "r"]:
                del buf[n - 2:]
            elif buf[-1] in "esnt":
                del buf[-1]
            else:
                do_more = False

    def _optimize(self, buf: List[str]) -> None:
        # :131-143
        if len(buf) > 5 and buf[-5:] == list("erin*"):
            del buf[-1]
            self._strip(buf)
        if buf and buf[-1] == "z":
            buf[-1] = "x"

    def _remove_particle_denotion(self, buf: List[str]) -> None:
        # :148-157
        if len(buf) > 4:
            for c in range(len(buf) - 3):
                if buf[c:c + 4] == list("gege"):
                    del buf[c:c + 2]
                    return

    def _substitute(self, buf: List[str]) -> None:
        # :168-218 — mutation under iteration kept: the index walks
        # the SHIFTING buffer exactly like the Java loop
        self.subst_count = 0
        c = 0
        while c < len(buf):
            if c > 0 and buf[c] == buf[c - 1]:
                buf[c] = "*"
            elif buf[c] == "ä":
                buf[c] = "a"
            elif buf[c] == "ö":
                buf[c] = "o"
            elif buf[c] == "ü":
                buf[c] = "u"
            elif buf[c] == "ß":
                buf[c] = "s"
                buf.insert(c + 1, "s")
                self.subst_count += 1
            if c < len(buf) - 1:
                if (c < len(buf) - 2 and buf[c] == "s"
                        and buf[c + 1] == "c" and buf[c + 2] == "h"):
                    buf[c] = "$"
                    del buf[c + 1:c + 3]
                    self.subst_count = +2   # Java bug kept: =+ not +=
                elif buf[c] == "c" and buf[c + 1] == "h":
                    buf[c] = "§"
                    del buf[c + 1]
                    self.subst_count += 1
                elif buf[c] == "e" and buf[c + 1] == "i":
                    buf[c] = "%"
                    del buf[c + 1]
                    self.subst_count += 1
                elif buf[c] == "i" and buf[c + 1] == "e":
                    buf[c] = "&"
                    del buf[c + 1]
                    self.subst_count += 1
                elif buf[c] == "i" and buf[c + 1] == "g":
                    buf[c] = "#"
                    del buf[c + 1]
                    self.subst_count += 1
                elif buf[c] == "s" and buf[c + 1] == "t":
                    buf[c] = "!"
                    del buf[c + 1]
                    self.subst_count += 1
            c += 1

    def _resubstitute(self, buf: List[str]) -> None:
        # :225-255
        c = 0
        while c < len(buf):
            ch = buf[c]
            if ch == "*":
                buf[c] = buf[c - 1]
            elif ch == "$":
                buf[c] = "s"
                buf[c + 1:c + 1] = ["c", "h"]
            elif ch == "§":
                buf[c] = "c"
                buf.insert(c + 1, "h")
            elif ch == "%":
                buf[c] = "e"
                buf.insert(c + 1, "i")
            elif ch == "&":
                buf[c] = "i"
                buf.insert(c + 1, "e")
            elif ch == "#":
                buf[c] = "i"
                buf.insert(c + 1, "g")
            elif ch == "!":
                buf[c] = "s"
                buf.insert(c + 1, "t")
            c += 1


def german_classic_stem(term: str) -> str:
    """GermanStemmer.stem (:52-68): lowercase, substitute, strip,
    optimize, resubstitute, particle removal."""
    return _GermanStemmer().stem(term)


# ---------------------------------------------------------------------------
# Arabic (ar/ArabicStemmer.java)
# ---------------------------------------------------------------------------

_ALEF = "ا"
_BEH = "ب"
_TEH_MARBUTA = "ة"
_TEH = "ت"
_FEH = "ف"
_KAF = "ك"
_LAM = "ل"
_NOON = "ن"
_HEH = "ه"
_WAW = "و"
_YEH = "ي"

_AR_PREFIXES = (
    _ALEF + _LAM,
    _WAW + _ALEF + _LAM,
    _BEH + _ALEF + _LAM,
    _KAF + _ALEF + _LAM,
    _FEH + _ALEF + _LAM,
    _LAM + _LAM,
    _WAW,
)

_AR_SUFFIXES = (
    _HEH + _ALEF,
    _ALEF + _NOON,
    _ALEF + _TEH,
    _WAW + _NOON,
    _YEH + _NOON,
    _YEH + _HEH,
    _YEH + _TEH_MARBUTA,
    _HEH,
    _TEH_MARBUTA,
    _YEH,
)


def arabic_stem(term: str) -> str:
    """ArabicStemmer.java:78-84: one prefix strip (first match wins;
    the single-char waw prefix needs len >= 4, others len >=
    prefix+2), then EVERY matching suffix strips in table order
    (each requires >= 2 chars left)."""
    s = term
    for p in _AR_PREFIXES:
        n = len(s)
        if len(p) == 1 and n < 4:
            continue
        if len(p) > 1 and n < len(p) + 2:
            continue
        if s.startswith(p):
            s = s[len(p):]
            break
    for suf in _AR_SUFFIXES:
        if len(s) >= len(suf) + 2 and s.endswith(suf):
            s = s[:len(s) - len(suf)]
    return s


CLASSIC_STEMMERS = {
    "de_classic": german_classic_stem,
    "ar": arabic_stem,
}


# ---------------------------------------------------------------------------
# Brazilian Portuguese (br/BrazilianStemmer.java) — the pre-RSLP
# discriminator stemmer, ported quirk-for-quirk:
# - the step1 'logias' branch DISCARDS its replaceSuffix result
#   (BrazilianStemmer.java:428-430 assigns nothing — kept);
# - the step2 'ira' rule removes 'ava' (:875-877 — a no-op remove that
#   still reports success, kept);
# - R1/R2/RV are computed ONCE from the changed term and never refresh
#   as CT shrinks (the Java fields), so region checks run against the
#   original regions.
# ---------------------------------------------------------------------------

_BR_FOLD = {"á": "a", "â": "a", "ã": "a", "é": "e", "ê": "e",
            "í": "i", "ó": "o", "ô": "o", "õ": "o", "ú": "u",
            "ü": "u", "ç": "c", "ñ": "n"}

_BR_VOWELS = frozenset("aeiou")

# step1: (suffix, min CT length gate, region, replacement-or-None,
#         preceded-by-or-None, assign_result)
_BR_STEP1 = (
    ("uciones", 0, "R2", "u", None, True),
    ("imentos", 6, "R2", None, None, True),
    ("amentos", 6, "R2", None, None, True),
    ("adores", 6, "R2", None, None, True),
    ("adoras", 6, "R2", None, None, True),
    ("logias", 6, "R2", "log", None, False),   # result discarded
    ("encias", 6, "R2", "ente", None, True),
    ("amente", 6, "R1", None, None, True),
    ("idades", 6, "R2", None, None, True),
    ("acoes", 5, "R2", None, None, True),
    ("imento", 5, "R2", None, None, True),
    ("amento", 5, "R2", None, None, True),
    ("adora", 5, "R2", None, None, True),
    ("ismos", 5, "R2", None, None, True),
    ("istas", 5, "R2", None, None, True),
    ("logia", 5, "R2", "log", None, True),
    ("ucion", 5, "R2", "u", None, True),
    ("encia", 5, "R2", "ente", None, True),
    ("mente", 5, "R2", None, None, True),
    ("idade", 5, "R2", None, None, True),
    ("acao", 4, "R2", None, None, True),
    ("ezas", 4, "R2", None, None, True),
    ("icos", 4, "R2", None, None, True),
    ("icas", 4, "R2", None, None, True),
    ("ismo", 4, "R2", None, None, True),
    ("avel", 4, "R2", None, None, True),
    ("ivel", 4, "R2", None, None, True),
    ("ista", 4, "R2", None, None, True),
    ("osos", 4, "R2", None, None, True),
    ("osas", 4, "R2", None, None, True),
    ("ador", 4, "R2", None, None, True),
    ("ivas", 4, "R2", None, None, True),
    ("ivos", 4, "R2", None, None, True),
    ("iras", 4, "RV", "ir", "e", True),
    ("eza", 3, "R2", None, None, True),
    ("ico", 3, "R2", None, None, True),
    ("ica", 3, "R2", None, None, True),
    ("oso", 3, "R2", None, None, True),
    ("osa", 3, "R2", None, None, True),
    ("iva", 3, "R2", None, None, True),
    ("ivo", 3, "R2", None, None, True),
    ("ira", 3, "RV", "ir", "e", True),
)

# step2: (RV suffix, CT suffix actually removed) in table order with
# RV length gates implied by suffix length
_BR_STEP2 = tuple(
    (s, s) for s in (
        "issemos", "essemos", "assemos", "ariamos", "eriamos",
        "iriamos",
        "iremos", "eremos", "aremos", "avamos", "iramos", "eramos",
        "aramos", "asseis", "esseis", "isseis", "arieis", "erieis",
        "irieis",
        "irmos", "iamos", "armos", "ermos", "areis", "ereis", "ireis",
        "asses", "esses", "isses", "astes", "assem", "essem", "issem",
        "ardes", "erdes", "irdes", "ariam", "eriam", "iriam", "arias",
        "erias", "irias", "estes", "istes", "areis", "aveis",
        "aria", "eria", "iria", "asse", "esse", "isse", "aste", "este",
        "iste", "arei", "erei", "irei", "aram", "eram", "iram", "avam",
        "arem", "erem", "irem", "ando", "endo", "indo", "arao", "erao",
        "irao", "adas", "idas", "aras", "eras", "iras", "avas", "ares",
        "eres", "ires", "ados", "idos", "amos", "emos", "imos", "iras",
        "ieis",
        "ada", "ida", "ara", "era",
    )
) + (("ira", "ava"),) + tuple(          # the kept no-op quirk
    (s, s) for s in (
        "iam", "ado", "ido", "ias", "ais", "eis", "ira", "ear",
        "ia", "ei", "am", "em", "ar", "er", "ir", "as", "es", "is",
        "eu", "iu", "iu", "ou",
    )
)


def _br_get_r1(value):
    if value is None:
        return None
    i = len(value) - 1
    j = 0
    while j < i and value[j] not in _BR_VOWELS:
        j += 1
    if not j < i:
        return None
    while j < i and value[j] in _BR_VOWELS:
        j += 1
    if not j < i:
        return None
    return value[j + 1:]


def _br_get_rv(value):
    if value is None:
        return None
    i = len(value) - 1
    if i > 0 and value[1] not in _BR_VOWELS:
        j = 2
        while j < i and value[j] not in _BR_VOWELS:
            j += 1
        if j < i:
            return value[j + 1:]
    if i > 1 and value[0] in _BR_VOWELS and value[1] in _BR_VOWELS:
        j = 2
        while j < i and value[j] in _BR_VOWELS:
            j += 1
        if j < i:
            return value[j + 1:]
    if i > 2:
        return value[3:]
    return None


def _br_suffix(value, suf):
    return value is not None and len(value) >= len(suf) \
        and value.endswith(suf)


def _br_remove(value, suf):
    if not _br_suffix(value, suf):
        return value
    return value[:len(value) - len(suf)]


def _br_preceded(value, suf, pre):
    if not _br_suffix(value, suf):
        return False
    return _br_suffix(_br_remove(value, suf), pre)


def brazilian_stem(term: str):
    """BrazilianStemmer.stem (:47-78): returns the discriminator, the
    changed term for non-stemmable input, or None for non-indexable
    input (len<3 or len>=30 after cleanup) — the filter keeps the
    original token on None, like BrazilianStemFilter."""
    # createCT: lowercase+fold, strip one leading and one trailing
    # punctuation char (:355-392)
    ct = "".join(_BR_FOLD.get(c, c) for c in term.lower())
    if len(ct) >= 2 and ct[0] in "\"'-,;.?!":
        ct = ct[1:]
    if len(ct) >= 2 and ct[-1] in "-,;.?!'\"":
        ct = ct[:-1]
    if not (2 < len(ct) < 30):
        return None
    if not all(c.isalpha() for c in ct):
        return ct
    r1 = _br_get_r1(ct)
    r2 = _br_get_r1(r1)
    rv = _br_get_rv(ct)
    regions = {"R1": r1, "R2": r2, "RV": rv}

    altered = False
    for suf, gate, region, repl, pre, assign in _BR_STEP1:
        if gate and len(ct) < gate:
            continue
        if not _br_suffix(ct, suf) or not _br_suffix(regions[region], suf):
            continue
        if pre is not None and not _br_preceded(ct, suf, pre):
            continue
        if assign:
            stripped = _br_remove(ct, suf)
            ct = stripped + repl if repl is not None and \
                stripped != ct else (stripped if repl is None
                                     else ct)
        altered = True
        break
    if not altered and rv is not None:
        for rv_suf, ct_suf in _BR_STEP2:
            if _br_suffix(rv, rv_suf):
                ct = _br_remove(ct, ct_suf)
                altered = True
                break
    if altered:
        # step3
        if rv is not None and _br_suffix(rv, "i") \
                and _br_preceded(rv, "i", "c"):
            ct = _br_remove(ct, "i")
    else:
        # step4
        if rv is not None:
            for suf in ("os", "a", "i", "o"):
                if _br_suffix(rv, suf):
                    ct = _br_remove(ct, suf)
                    break
    # step5
    if rv is not None and _br_suffix(rv, "e"):
        if _br_preceded(rv, "e", "gu"):
            ct = _br_remove(ct, "e")
            ct = _br_remove(ct, "u")
        elif _br_preceded(rv, "e", "ci"):
            ct = _br_remove(ct, "e")
            ct = _br_remove(ct, "i")
        else:
            ct = _br_remove(ct, "e")
    return ct


def brazilian_stem_filter(term: str) -> str:
    """BrazilianStemFilter.incrementToken (:60-70): replace the token
    only when the stemmer returns a non-null DIFFERENT string."""
    s = brazilian_stem(term)
    if s is not None and s != term:
        return s
    return term


CLASSIC_STEMMERS["br"] = brazilian_stem_filter


# memoized at the module names (see lightstemmers.py tail note)
from functools import lru_cache as _lru_cache

for _n in list(CLASSIC_STEMMERS):
    _fname = CLASSIC_STEMMERS[_n].__name__
    globals()[_fname] = _lru_cache(maxsize=1 << 17)(globals()[_fname])
    CLASSIC_STEMMERS[_n] = globals()[_fname]
