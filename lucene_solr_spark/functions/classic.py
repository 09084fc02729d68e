"""ClassicTokenizer / ClassicFilter / ClassicAnalyzer (analysis/
standard/ClassicTokenizerImpl.jflex, ClassicFilter.java,
ClassicAnalyzer.java) — the pre-3.1 Lucene StandardTokenizer grammar
with its typed tokens:

  ALPHANUM, APOSTROPHE (O'Reilly), ACRONYM (U.S.A.), COMPANY (AT&T),
  EMAIL, HOST (wiki.apache.org), NUM (every other '_-/.,'-joined
  segment has a digit: v1.5.2, 1-800-x), CJ (single CJK codepoints).

JFlex resolves each position by the LONGEST match over ALL rules with
rule order breaking ties (so 'wiki.apache.org' is HOST, not three
ALPHANUMs; 'bob@ex.com' is EMAIL, not COMPANY+HOST). The scanner here
replays exactly that: every rule (NUM's six alternatives competing
individually, since Python alternation is leftmost-first rather than
longest) matches at the cursor, longest wins, earlier rule on ties,
unmatched chars are skipped (:131).

ClassicFilter (:53-63): strips trailing 's from APOSTROPHE tokens and
every '.' from ACRONYM tokens. ClassicAnalyzer chain = tokenizer +
ClassicFilter + LowerCaseFilter + StopFilter.

Executor shape: pure-Python scanner in the same Arrow-batched
pandas_udf slot as every other analyzer chain — no JVM regex feature
gaps to paper over, costs one pass per doc.
"""

from __future__ import annotations

import re
from typing import List, Tuple

from lucene_solr_spark.constants import STOPWORDS

__all__ = ["classic_scan", "classic_filter", "classic_analyze",
           "TOKEN_TYPES"]

_CJ = ("㄀-ㄯ぀-ゟ゠-ヿㇰ-ㇿ"
       "㌀-㍿㐀-䶿一-鿿豈-﫿"
       "･-ﾟ")
# LETTER = [:letter:] minus CJ (ClassicTokenizerImpl.jflex:113-117)
_L = rf"(?:(?![{_CJ}])[^\W\d_])"
_THAI = r"[฀-๙]"
_AN = rf"(?:{_L}|{_THAI}|\d)+"          # ALPHANUM
_ALPHA = rf"{_L}+"
_P = r"[_\-/.,]"                         # NUM punctuation
_HD = rf"(?:{_L}|\d)*\d(?:{_L}|\d)*"     # HAS_DIGIT

# (type, pattern) in jflex rule order; NUM's alternatives are split so
# the longest-match competition sees each shape individually
_RULES: List[Tuple[str, re.Pattern]] = [
    ("<ALPHANUM>", re.compile(_AN)),
    ("<APOSTROPHE>", re.compile(rf"{_ALPHA}(?:'{_ALPHA})+")),
    ("<ACRONYM>", re.compile(rf"{_L}\.(?:{_L}\.)+")),
    ("<COMPANY>", re.compile(rf"{_ALPHA}[&@]{_ALPHA}")),
    ("<EMAIL>", re.compile(
        rf"{_AN}(?:[._-]{_AN})*@{_AN}(?:[.-]{_AN})+")),
    ("<HOST>", re.compile(rf"{_AN}(?:\.{_AN})+")),
    ("<NUM>", re.compile(rf"{_AN}{_P}{_HD}")),
    ("<NUM>", re.compile(rf"{_HD}{_P}{_AN}")),
    ("<NUM>", re.compile(rf"{_AN}(?:{_P}{_HD}{_P}{_AN})+")),
    ("<NUM>", re.compile(rf"{_HD}(?:{_P}{_AN}{_P}{_HD})+")),
    ("<NUM>", re.compile(rf"{_AN}{_P}{_HD}(?:{_P}{_AN}{_P}{_HD})+")),
    ("<NUM>", re.compile(rf"{_HD}{_P}{_AN}(?:{_P}{_HD}{_P}{_AN})+")),
    ("<CJ>", re.compile(rf"[{_CJ}]")),
]

TOKEN_TYPES = ("<ALPHANUM>", "<APOSTROPHE>", "<ACRONYM>", "<COMPANY>",
               "<EMAIL>", "<HOST>", "<NUM>", "<CJ>")


def classic_scan(text: str) -> List[Tuple[str, str]]:
    """Tokenize to (token, type) pairs, longest-match-wins like the
    generated JFlex DFA."""
    out: List[Tuple[str, str]] = []
    i, n = 0, len(text)
    while i < n:
        best_len = 0
        best_type = None
        for typ, rx in _RULES:
            m = rx.match(text, i)
            if m is not None:
                ln = m.end() - i
                if ln > best_len:
                    best_len, best_type = ln, typ
        if best_len == 0:
            i += 1  # ". | {WHITESPACE} -> ignore" (:131)
            continue
        out.append((text[i:i + best_len], best_type))
        i += best_len
    return out


def classic_filter(tok: str, typ: str) -> str:
    """ClassicFilter.java:53-63: strip trailing 's from APOSTROPHE,
    strip dots from ACRONYM."""
    if typ == "<APOSTROPHE>" and len(tok) >= 2 \
            and tok[-2] == "'" and tok[-1] in "sS":
        return tok[:-2]
    if typ == "<ACRONYM>":
        return tok.replace(".", "")
    return tok


def classic_analyze(text: str, stopwords=STOPWORDS,
                    max_len: int = 255) -> List[Tuple[str, str]]:
    """Full ClassicAnalyzer chain (ClassicAnalyzer.java:105-117:
    ClassicFilter -> LowerCase -> Stop; maxTokenLength 255 drop),
    keeping the token type for introspection surfaces."""
    out = []
    for tok, typ in classic_scan(text or ""):
        if len(tok) > max_len:
            continue
        t = classic_filter(tok, typ).lower()
        if t and t not in stopwords:
            out.append((t, typ))
    return out


def _classic_tokens(text: str) -> List[str]:
    return [t for t, _ in classic_analyze(text)]


# registered chain: scanner emits the filtered+typed stream's terms
from lucene_solr_spark.functions.analysis import (  # noqa: E402
    AnalyzerSpec, register_analyzer)

register_analyzer(
    AnalyzerSpec("classic", _classic_tokens, lowercase=False,
                 max_len=1 << 30))
