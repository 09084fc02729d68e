"""RSLP rule-engine stemmers (pt/RSLPStemmerBase.java + the drivers
pt/PortugueseStemmer.java, pt/PortugueseMinimalStemmer.java,
gl/GalicianStemmer.java, gl/GalicianMinimalStemmer.java):

RSLP (Removedor de Sufixos da Lingua Portuguesa, Orengo et al.) is a
step machine — each Step is an ordered rule list with a min-word-size
gate and optional entry-condition suffixes; each Rule is (suffix,
min-stem-size, replacement, exceptions) where exceptions match either
whole-word or ends-with per the step's flag, and the FIRST matching
rule fires (RSLPStemmerBase.java Step.apply :215-240, Rule.matches
:109-121). Rule tables live in rslp_rules_pt.py / rslp_rules_gl.py
(the published rule data re-serialized as Python tuples).

Step wiring per driver:
- Portuguese (PortugueseStemmer.java:47-76): plural, adverb, feminine,
  augmentative; then noun, else verb, else vowel; then accent fold.
- Portuguese minimal (PortugueseMinimalStemmer.java:36-39): the
  Plural step only, no fold.
- Galician (GalicianStemmer.java:49-82): plural, unification, adverb,
  augmentative REPEATED to fixpoint, noun else verb, vowel always,
  then the RSLG accent fold.
- Galician minimal (GalicianMinimalStemmer.java): Plural only.

Gated over the reference's own vocabulary test data
(ptrslptestdata.zip, ptminimaltestdata.zip, gltestdata.zip — 55k+
pairs) in tests/test_rslp.py."""

from __future__ import annotations

from typing import List, Tuple

from lucene_solr_spark.functions.lightstemmers import _ends


class _Step:
    __slots__ = ("min", "whole_word_exc", "conds", "rules")

    def __init__(self, spec):
        minw, typ, conds, rules = spec
        if minw == 0:
            minw = min(r[1] + len(r[0]) for r in rules)
        self.min = minw
        self.whole_word_exc = typ == 1
        self.conds = conds
        # rule: (suffix, min_stem, replacement, exceptions tuple/set)
        self.rules = [
            (suf, mn, rep,
             frozenset(exc) if typ == 1 else tuple(exc))
            for suf, mn, rep, exc in rules
        ]

    def apply(self, s: List[str], n: int) -> int:
        if n < self.min:
            return n
        if self.conds and not any(_ends(s, n, c) for c in self.conds):
            return n
        for suf, mn, rep, exc in self.rules:
            sl = len(suf)
            if n - sl < mn or not _ends(s, n, suf):
                continue
            if exc:
                if self.whole_word_exc:
                    if "".join(s[:n]) in exc:
                        continue
                elif any(_ends(s, n, e) for e in exc):
                    continue
            # Rule.replace: overwrite suffix start with replacement
            # (buffer may grow by the oversized-array slot)
            base = n - sl
            for i, ch in enumerate(rep):
                if base + i < len(s):
                    s[base + i] = ch
                else:
                    s.append(ch)
            return base + len(rep)
        return n


def _load(module) -> dict:
    return {name: _Step(spec) for name, spec in module.STEPS.items()}


from lucene_solr_spark.functions import rslp_rules_gl  # noqa: E402
from lucene_solr_spark.functions import rslp_rules_pt  # noqa: E402

_PT = _load(rslp_rules_pt)
_GL = _load(rslp_rules_gl)

_PT_FOLD = {"à": "a", "á": "a", "â": "a", "ã": "a", "ä": "a", "å": "a",
            "ç": "c", "è": "e", "é": "e", "ê": "e", "ë": "e",
            "ì": "i", "í": "i", "î": "i", "ï": "i", "ñ": "n",
            "ò": "o", "ó": "o", "ô": "o", "õ": "o", "ö": "o",
            "ù": "u", "ú": "u", "û": "u", "ü": "u"}

_GL_FOLD = {"á": "a", "é": "e", "ê": "e", "í": "i", "ó": "o", "ú": "u"}


def portuguese_rslp_stem(term: str) -> str:
    """PortugueseStemmer.java:47-76 (full RSLP)."""
    s = list(term)
    n = len(s)
    n = _PT["Plural"].apply(s, n)
    n = _PT["Adverb"].apply(s, n)
    n = _PT["Feminine"].apply(s, n)
    n = _PT["Augmentative"].apply(s, n)
    old = n
    n = _PT["Noun"].apply(s, n)
    if n == old:
        old = n
        n = _PT["Verb"].apply(s, n)
        if n == old:
            n = _PT["Vowel"].apply(s, n)
    for i in range(n):
        r = _PT_FOLD.get(s[i])
        if r is not None:
            s[i] = r
    return "".join(s[:n])


def portuguese_minimal_stem(term: str) -> str:
    """PortugueseMinimalStemmer.java:36-39: the RSLP Plural step
    only."""
    s = list(term)
    return "".join(s[:_PT["Plural"].apply(s, len(s))])


def galician_stem(term: str) -> str:
    """GalicianStemmer.java:49-82 (RSLG)."""
    s = list(term)
    n = len(s)
    n = _GL["Plural"].apply(s, n)
    n = _GL["Unification"].apply(s, n)
    n = _GL["Adverb"].apply(s, n)
    while True:
        old = n
        n = _GL["Augmentative"].apply(s, n)
        if n == old:
            break
    old = n
    n = _GL["Noun"].apply(s, n)
    if n == old:
        n = _GL["Verb"].apply(s, n)
    n = _GL["Vowel"].apply(s, n)
    for i in range(n):
        r = _GL_FOLD.get(s[i])
        if r is not None:
            s[i] = r
    return "".join(s[:n])


def galician_minimal_stem(term: str) -> str:
    """GalicianMinimalStemmer.java: the RSLG Plural step only."""
    s = list(term)
    return "".join(s[:_GL["Plural"].apply(s, len(s))])


RSLP_STEMMERS = {
    "pt_rslp": portuguese_rslp_stem,
    "pt_minimal": portuguese_minimal_stem,
    "gl_rslp": galician_stem,
    "gl_minimal": galician_minimal_stem,
}


# memoized at the module names (see lightstemmers.py tail note)
from functools import lru_cache as _lru_cache

for _n in list(RSLP_STEMMERS):
    _fname = RSLP_STEMMERS[_n].__name__
    globals()[_fname] = _lru_cache(maxsize=1 << 17)(globals()[_fname])
    RSLP_STEMMERS[_n] = globals()[_fname]
