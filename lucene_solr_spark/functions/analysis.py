"""The analysis chain: StandardTokenizer (UAX#29 word-break subset) ->
StandardFilter (no-op) -> LowerCaseFilter -> StopFilter.

Reference chain: lucene/analysis/common/src/java/org/apache/lucene/
analysis/standard/StandardAnalyzer.java:109-123. Tokenizer grammar:
standard/StandardTokenizerImpl.jflex:119-186 (NUM :129-133, WORD
:150-158, SE-Asian :181, Han/Hiragana :184-185, drop-everything-else
:192). Max token length 255 with position still advancing:
standard/StandardTokenizer.java:145-168.

Implementation notes (Spark-first, not a port):
  - One precompiled `regex` pattern implements the jflex rules. The WORD
    rule's language is a superset of the NUM rule's (both appear in the
    grammar only to assign token *types*, which indexing ignores), so a
    single combined alternation suffices for token *boundaries*.
  - Unicode version delta: the jflex grammar is Unicode 6.1. Modern
    Unicode moved U+0027 APOSTROPHE from MidNumLet to Single_Quote and
    split Hebrew_Letter out of ALetter (both in Unicode 6.3); we fold
    them back so `don't` is one token, as in the reference.
  - LowerCaseFilter is Character.toLowerCase per codepoint
    (analysis/core/LowerCaseFilter.java:52-58). Python str.lower() uses
    full case mappings; they agree on 1:1 mappings (all of ASCII and the
    fixture set). Documented delta: U+0130 and similar expand under
    Python; out of scope for source-code corpora.
  - StopFilter drops the 33-word English set, preserving position
    increments (analysis/core/StopFilter.java:124-127); stopped and
    over-long tokens do NOT count toward norm length
    (FieldInvertState.length counts emitted tokens only;
    BM25Similarity.java:137-141 uses length - numOverlap).

The hot path is `tokenize_series` (pandas Series -> list columns),
called from Arrow-batched UDFs — no per-row Python beyond the token
lists themselves.
"""

from __future__ import annotations

from typing import Iterable, List, Tuple

try:  # the `regex` module supports \p{WB=...}; stdlib `re` does not
    import regex as _re

    _HAS_REGEX = True
except ImportError:  # pragma: no cover - regex is present in this env
    import re as _re

    _HAS_REGEX = False

from lucene_solr_spark.constants import MAX_TOKEN_LENGTH, STOPWORDS

__all__ = ["tokenize", "analyze", "tokenize_series", "TOKEN_PATTERN"]


def _build_pattern():
    if not _HAS_REGEX:  # crude ASCII fallback, tests require `regex`
        return _re.compile(r"[A-Za-z0-9_][A-Za-z0-9_.']*[A-Za-z0-9_]|[A-Za-z0-9_]")

    # jflex macros (StandardTokenizerImpl.jflex:50-76), Unicode 6.1 emulation
    aletter = r"[\p{WB=ALetter}\p{WB=HebrewLetter}]"
    numeric = r"[\p{WB=Numeric}０-９]"
    midletter = r"[\p{WB=MidLetter}\p{WB=MidNumLet}\p{WB=SingleQuote}]"
    midnumeric = r"[\p{WB=MidNum}\p{WB=MidNumLet}\p{WB=SingleQuote}]"
    extnumlet = r"\p{WB=ExtendNumLet}"
    katakana = r"\p{WB=Katakana}"
    ext = r"[\p{WB=Format}\p{WB=Extend}]*"  # WB4: X (Extend|Format)* -> X

    al = f"(?:{aletter}{ext})"
    num = f"(?:{numeric}{ext})"
    kat = f"(?:{katakana}{ext})"
    midl = f"(?:{midletter}{ext})"
    midn = f"(?:{midnumeric}{ext})"
    enl = f"(?:{extnumlet}{ext})"

    # {NumericEx} ({ExtendNumLetEx}+ {NumericEx} | {MidNumericEx}
    #  {NumericEx} | {NumericEx})*   (jflex :129-133 / inside :150-158)
    num_run = f"{num}(?:{enl}+{num}|{midn}{num}|{num})*"
    # {ALetterEx} ({ExtendNumLetEx}+ {ALetterEx} | {MidLetterEx}
    #  {ALetterEx} | {ALetterEx})*
    al_run = f"{al}(?:{enl}+{al}|{midl}{al}|{al})*"
    kat_run = f"{kat}(?:{enl}*{kat})*"
    core = f"(?:{kat_run}|(?:{num_run}|{al_run})+)"
    # WORD rule (jflex :150-158), subsumes the NUM rule (:129-133)
    word = f"{enl}*{core}(?:{enl}+{core})*{enl}*"

    se_asian = r"\p{LB=ComplexContext}+"
    han = r"(?:\p{Script=Han}" + ext + ")"
    hiragana = r"(?:\p{Script=Hiragana}" + ext + ")"

    return _re.compile(f"{word}|{se_asian}|{han}|{hiragana}", _re.V0)


TOKEN_PATTERN = _build_pattern()

# -- ASCII fast path --------------------------------------------------------
# On ASCII text the UAX#29 subset collapses to small char classes
# (probed from the full pattern's \p{WB=...} classes, Unicode 6.1
# emulation): ALetter=[A-Za-z], Numeric=[0-9], ExtendNumLet=[_],
# MidLetter=[:], MidNum=[,;], MidNumLet=[.], SingleQuote=['].
# No token can span any other ASCII char, so we pre-split on those
# delimiters with str.translate (C speed), emit pure
# [A-Za-z0-9_]-chunks directly (always exactly one token when they
# contain an alnum), and run the precise grammar only on chunks
# containing mid-punctuation. Output is identical to
# TOKEN_PATTERN.findall on ASCII input (property-tested in
# tests/test_analysis.py); non-ASCII rows take the full pattern.
import re as _stdre

_A_NUM = r"[0-9](?:_+[0-9]|[.,;'][0-9]|[0-9])*"
_A_AL = r"[A-Za-z](?:_+[A-Za-z]|[.':][A-Za-z]|[A-Za-z])*"
_A_CORE = f"(?:{_A_NUM}|{_A_AL})+"
_ASCII_FINDALL = _stdre.compile(
    f"_*{_A_CORE}(?:_+{_A_CORE})*_*"
).findall

_WORDCHARS = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_"
)
_MIDCHARS = ".,:;'"
_SPLIT_TABLE = {
    i: " " for i in range(128) if chr(i) not in set(_WORDCHARS + _MIDCHARS)
}
_DEL_WORDCHARS = {ord(c): None for c in _WORDCHARS}
# mid-punct presence test: post-split chunks contain only word+mid chars,
# so a single compiled-regex search is equivalent to (and ~3x faster
# than) the old per-chunk translate(_DEL_WORDCHARS) delete-test
_HAS_MID = _stdre.compile(r"[.,:;']").search


def _findall_ascii(text: str) -> List[str]:
    out: List[str] = []
    for p in text.translate(_SPLIT_TABLE).split():
        if _HAS_MID(p):
            out.extend(_ASCII_FINDALL(p))  # has mid-punctuation
        elif p.strip("_"):
            out.append(p)  # pure word chars with >=1 alnum: one token
    return out


def findall_tokens(text: str) -> List[str]:
    """StandardTokenizer boundary scan: ASCII fast path or full UAX#29
    pattern; identical output either way."""
    if text.isascii():
        return _findall_ascii(text)
    return TOKEN_PATTERN.findall(text)


def tokenize(text: str) -> List[str]:
    """Raw StandardTokenizer output (pre-lowercase, pre-stop), honoring
    the 255-char max-token skip rule (StandardTokenizer.java:156-167)."""
    return [
        t for t in findall_tokens(text) if len(t) <= MAX_TOKEN_LENGTH
    ]


def analyze(text: str) -> List[str]:
    """Full chain: tokenize -> lowercase -> stop-filter. Returned list
    length == norm field length (emitted-token count)."""
    if text.isascii():
        # ASCII lower() is 1:1 and the ASCII grammar is case-symmetric,
        # so lowercasing the whole doc in one C pass yields boundaries,
        # lengths and tokens identical to per-token lower()
        return [
            t for t in _findall_ascii(text.lower())
            if len(t) <= MAX_TOKEN_LENGTH and t not in STOPWORDS
        ]
    out = []
    for t in TOKEN_PATTERN.findall(text):
        if len(t) > MAX_TOKEN_LENGTH:
            continue  # skipped, still advances position; length unaffected
        t = t.lower()
        if t not in STOPWORDS:
            out.append(t)
    return out


def analyze_with_positions(text: str) -> List[Tuple[str, int]]:
    """(token, position) pairs with StopFilter position holes preserved
    (StopFilter.java:124-127) and over-long tokens advancing position
    (StandardTokenizer.java:156-167). Used by the phrase-capable tier
    and by analyzer golden-vector tests."""
    if text.isascii():
        return [
            (t, pos)
            for pos, t in enumerate(_findall_ascii(text.lower()))
            if len(t) <= MAX_TOKEN_LENGTH and t not in STOPWORDS
        ]
    out = []
    pos = -1
    for t in TOKEN_PATTERN.findall(text):
        pos += 1  # every recognized token advances position by 1
        if len(t) > MAX_TOKEN_LENGTH:
            continue
        t = t.lower()
        if t in STOPWORDS:
            continue
        out.append((t, pos))
    return out


# -- pluggable analyzers ----------------------------------------------------
# The reference's Analyzer seam (lucene/core/.../analysis/Analyzer.java;
# concrete chains in lucene/analysis/common/.../core/): an analyzer is a
# boundary scanner + optional LowerCaseFilter + optional StopFilter.
# Persisted by NAME in the index snapshot so the query side always
# re-analyzes with the identical chain (QueryParserBase re-analysis).

class AnalyzerSpec:
    """name + scanner + filter flags; generic analyze paths. The
    'standard' spec overrides them with the optimized module-level
    implementations."""

    def __init__(self, name: str, scanner, lowercase: bool = True,
                 stopwords: frozenset = frozenset(),
                 max_len: int = MAX_TOKEN_LENGTH,
                 stem=None, post=None, emits_overlaps: bool = False,
                 pre=None, pre_offsets=None, pre_stop=None):
        self.name = name
        # optional CharFilter stage (str -> str) applied BEFORE the
        # tokenizer (Lucene CharFilter slot: HTMLStrip/Mapping/
        # PatternReplace). pre_offsets is the offset-correcting form
        # (str -> (filtered, OffsetMap), the BaseCharFilter seam):
        # when given, the plain `pre` is derived from it and the
        # highlighters' token streams correct offsets back to the
        # original text (fvh._term_stack / classic token_stream).
        self.pre_offsets = pre_offsets
        if pre_offsets is not None and pre is None:
            pre = lambda t: pre_offsets(t)[0]  # noqa: E731
        self.pre = pre
        self.scanner = scanner
        self.lowercase = lowercase
        self.stopwords = stopwords
        self.max_len = max_len
        # optional token-final stem stage (PorterStemFilter slot in the
        # EnglishAnalyzer chain — runs AFTER the StopFilter)
        self.stem = stem
        # optional per-token filter between the LowerCaseFilter slot
        # and the StopFilter slot — where the reference chains put
        # ElisionFilter (fr/it/ca), the normalization filters that
        # precede the stop check (fa/hi), and the custom casing
        # filters (el/tr/ga run with lowercase=False and their casing
        # here). Returning None or "" drops the token, leaving a
        # position hole exactly like a stopword.
        self.pre_stop = pre_stop
        # optional stream-level post filter: List[(token, position)] ->
        # List[(token, position)] — the TokenFilter slot for graph-ish
        # filters (Shingle/Synonym/EdgeNGram) that inject tokens at
        # existing positions (posInc 0) or consume hole information.
        self.post = post
        # True when `post` can emit several tokens at one position; the
        # index build then counts norm length as DISTINCT positions
        # (Lucene discountOverlaps: length - numOverlap,
        # BM25Similarity.java:137-141)
        self.emits_overlaps = emits_overlaps

    def analyze(self, text: str) -> List[str]:
        if self.post is not None:
            return [t for t, _ in self.analyze_with_positions(text)]
        if self.pre is not None:
            text = self.pre(text)
        out = []
        stem = self.stem
        pre_stop = self.pre_stop
        for t in self.scanner(text):
            if len(t) > self.max_len:
                continue
            if self.lowercase:
                t = t.lower()
            if pre_stop is not None:
                t = pre_stop(t)
                if not t:
                    continue
            if t not in self.stopwords:
                if stem:
                    t = stem(t)
                    if not t:
                        # engine policy: a token the stem/normalize
                        # stage deletes entirely (e.g. ArabicNormalizer
                        # on a tatweel/harakat-only token) is DROPPED,
                        # leaving a position hole like a stopword. The
                        # reference (4.x ArabicNormalizationFilter.java:
                        # 44-49) emits the empty term instead; we
                        # diverge deliberately — empty terms are
                        # useless postings — and apply the same policy
                        # at every seam (pre_stop already drops), so
                        # ar/fa/hi chains agree. df/norms for such
                        # tokens differ from the reference by design.
                        continue
                out.append(t)
        return out

    def analyze_with_positions(self, text: str) -> List[Tuple[str, int]]:
        if self.pre is not None:
            text = self.pre(text)
        out = []
        pos = -1
        stem = self.stem
        pre_stop = self.pre_stop
        for t in self.scanner(text):
            pos += 1
            if len(t) > self.max_len:
                continue
            if self.lowercase:
                t = t.lower()
            if pre_stop is not None:
                t = pre_stop(t)
                if not t:
                    continue
            if t in self.stopwords:
                continue
            if stem:
                t = stem(t)
                if not t:  # stem-deleted token: drop, keep the hole
                    continue
            out.append((t, pos))
        if self.post is not None:
            out = self.post(out)
        return out

    def tokenize_series_positions(self, texts):
        toks_out: List[List[str]] = []
        pos_out: List[List[int]] = []
        for text in texts:
            tp = self.analyze_with_positions(text) if text else []
            toks_out.append([t for t, _ in tp])
            pos_out.append([p for _, p in tp])
        return toks_out, pos_out


class _StandardSpec(AnalyzerSpec):
    """StandardAnalyzer chain via the optimized fast paths."""

    def __init__(self):
        super().__init__("standard", None, True, STOPWORDS)

    def analyze(self, text):
        return analyze(text)

    def analyze_with_positions(self, text):
        return analyze_with_positions(text)

    def tokenize_series_positions(self, texts):
        return tokenize_series_positions(texts)


import re as _re_mod

_LETTER_RUNS = _re_mod.compile(r"[^\W\d_]+", _re_mod.UNICODE).findall

ANALYZERS: dict = {}


def register_analyzer(spec: AnalyzerSpec) -> AnalyzerSpec:
    ANALYZERS[spec.name] = spec
    return spec


register_analyzer(_StandardSpec())
# WhitespaceAnalyzer (analysis/core/WhitespaceAnalyzer.java): maximal
# non-whitespace runs, no lowercase, no stopwords
register_analyzer(AnalyzerSpec("whitespace", str.split, False))
# LetterTokenizer / LowerCaseTokenizer (analysis/core/
# LetterTokenizer.java, LowerCaseTokenizer.java): maximal letter
# runs, the latter lowercasing in the tokenizer
register_analyzer(AnalyzerSpec("letter", _LETTER_RUNS, False))
register_analyzer(AnalyzerSpec("lowercase_letter", _LETTER_RUNS, True))


def _ngram_tokenizer_scanner(n: int):
    """NGramTokenizer (analysis/common/.../ngram/NGramTokenizer.java):
    character n-grams of each whitespace run at CONSECUTIVE positions
    (one position per gram — unlike NGramTokenFilter, which stacks all
    grams at the source token's position). This consecutive-position
    stream is what NGramPhraseQuery's every-n-th-term pruning assumes."""
    def scan(text: str):
        out = []
        for w in text.split():
            out.extend(w[i:i + n] for i in range(max(len(w) - n + 1, 0)))
        return out
    return scan


register_analyzer(
    AnalyzerSpec("ngram_tok2", _ngram_tokenizer_scanner(2), False))
# SimpleAnalyzer (analysis/core/SimpleAnalyzer.java): letter runs + lower
register_analyzer(AnalyzerSpec("simple", _LETTER_RUNS, True))
# StopAnalyzer (analysis/core/StopAnalyzer.java): simple + 33 stopwords
register_analyzer(AnalyzerSpec("stop", _LETTER_RUNS, True, STOPWORDS))
# KeywordAnalyzer (analysis/core/KeywordAnalyzer.java): whole field as
# ONE token, no length cap (KeywordTokenizer buffers the entire input)
register_analyzer(
    AnalyzerSpec("keyword", lambda t: [t] if t else [], False,
                 max_len=1 << 30)
)

# EnglishAnalyzer-style chain (analysis/common/.../en/
# EnglishAnalyzer.java): tokenize + lowercase + stop + PorterStemFilter
# (stem AFTER stop, same slot as the reference chain; the possessive
# filter is omitted — letter-run scanning already splits on the
# apostrophe)
from lucene_solr_spark.functions.porter import porter_stem  # noqa: E402

register_analyzer(
    AnalyzerSpec("english", _LETTER_RUNS, True, STOPWORDS,
                 stem=porter_stem)
)

# Per-language light/minimal stemmer chains (analysis/{de,fr,es,it,pt,
# ru,sv,no,fi,hu}/*{Light,Minimal}StemFilter.java) through the same
# stem= seam as PorterStemFilter: a whitespace chain mirroring the
# reference tests' MockTokenizer(WHITESPACE)+StemFilter composition
# ("stem_<key>_ws") and a letter-run+lowercase chain mirroring each
# <Lang>Analyzer's tokenizer+lowercase+stem skeleton ("<key>"), both
# vocabulary-duel-gated in tests/test_light_stemmers.py over the
# reference's own *testdata.zip files.
from lucene_solr_spark.functions.lightstemmers import (  # noqa: E402
    LIGHT_STEMMERS,
)

for _ls_name, _ls_fn in LIGHT_STEMMERS.items():
    register_analyzer(
        AnalyzerSpec(f"stem_{_ls_name}_ws", str.split, False,
                     stem=_ls_fn))
    register_analyzer(
        AnalyzerSpec(_ls_name, _LETTER_RUNS, True, stem=_ls_fn))

# Batch-2 national stemmers (analysis/{cz,bg,lv,hi,id}/*Stemmer.java)
# through the same seam, duel-gated over the reference tests' own
# vector tables in tests/test_nat_stemmers.py.
from lucene_solr_spark.functions.natstemmers import (  # noqa: E402
    NAT_STEMMERS,
)

for _ns_name, _ns_fn in NAT_STEMMERS.items():
    register_analyzer(
        AnalyzerSpec(f"stem_{_ns_name}_ws", str.split, False,
                     stem=_ns_fn))
    register_analyzer(
        AnalyzerSpec(f"{_ns_name}_stem", _LETTER_RUNS, True,
                     stem=_ns_fn))

# RSLP/RSLG rule-engine stemmers (pt/RSLPStemmerBase.java drivers:
# full Portuguese RSLP, Portuguese minimal = Plural step, Galician
# RSLG, Galician minimal), vocabulary-duel-gated in tests/test_rslp.py.
from lucene_solr_spark.functions.rslpstemmer import (  # noqa: E402
    RSLP_STEMMERS,
)

for _rs_name, _rs_fn in RSLP_STEMMERS.items():
    register_analyzer(
        AnalyzerSpec(f"stem_{_rs_name}_ws", str.split, False,
                     stem=_rs_fn))
    register_analyzer(
        AnalyzerSpec(_rs_name, _LETTER_RUNS, True, stem=_rs_fn))

# Batch-3 classic stemmers (de/GermanStemmer.java discriminator,
# ar/ArabicStemmer.java light stemming, br/BrazilianStemmer.java),
# gated in tests/test_classic_stemmers.py.
from lucene_solr_spark.functions.classicstemmers import (  # noqa: E402
    CLASSIC_STEMMERS,
)

for _cs_name, _cs_fn in CLASSIC_STEMMERS.items():
    register_analyzer(
        AnalyzerSpec(f"stem_{_cs_name}_ws", str.split, False,
                     stem=_cs_fn))
    register_analyzer(
        AnalyzerSpec(f"{_cs_name}_an", _LETTER_RUNS, True,
                     stem=_cs_fn))

# Snowball family (SnowballFilter.java over org/tartarus/snowball/ext
# — 23 languages incl. Porter/Porter2 English, Kraaij-Pohlmann,
# Lovins, Turkish), transpiled from the generated classes and
# vocabulary-duel-gated over TestSnowballVocabData.zip in
# tests/test_snowball.py. Chain shape mirrors SnowballAnalyzer:
# tokenize + lowercase + SnowballFilter.
from lucene_solr_spark.functions.snowball_ext import (  # noqa: E402
    SNOWBALL_STEMMERS,
)

for _sb_lang, _sb_fn in SNOWBALL_STEMMERS.items():
    register_analyzer(
        AnalyzerSpec(f"stem_snow_{_sb_lang}_ws", str.split, True,
                     stem=_sb_fn))
    register_analyzer(
        AnalyzerSpec(f"snowball_{_sb_lang}", _LETTER_RUNS, True,
                     stem=_sb_fn))

# Normalizer pack (ar/ArabicNormalizer, fa/PersianNormalizer,
# hi/HindiNormalizer, de/GermanNormalizationFilter + the composed
# ArabicAnalyzer/PersianAnalyzer/HindiAnalyzer normalize+stem tails),
# vector-gated in tests/test_normalizers.py.
from lucene_solr_spark.functions.normalizers import (  # noqa: E402
    NORMALIZERS,
)

for _nz_name, _nz_fn in NORMALIZERS.items():
    register_analyzer(
        AnalyzerSpec(f"{_nz_name}_ws", str.split, False, stem=_nz_fn))

# Greek (el/GreekStemmer.java + el/GreekLowerCaseFilter.java): the
# GreekAnalyzer chain's casefold+stem, gated over TestGreekStemmer's
# 343 vectors in tests/test_greek.py.
from lucene_solr_spark.functions.greekstemmer import (  # noqa: E402
    greek_stem_chain,
)

register_analyzer(
    AnalyzerSpec("stem_el_ws", str.split, False, stem=greek_stem_chain))
register_analyzer(
    AnalyzerSpec("el_greek", _LETTER_RUNS, False, stem=greek_stem_chain))

# KStem (en/KStemmer.java — the dictionary-driven English stemmer;
# KStemFilter requires lowercase input, so the chain lowercases
# first), gated over kstemTestData.zip in tests/test_kstem.py.
from lucene_solr_spark.functions.kstem import kstem  # noqa: E402

register_analyzer(
    AnalyzerSpec("stem_kstem_ws", str.split, True, stem=kstem))
register_analyzer(
    AnalyzerSpec("kstem_en", _LETTER_RUNS, True, STOPWORDS,
                 stem=kstem))


# ---------------------------------------------------------------------------
# stream-level token filters (the TokenFilter graph slot): Shingle,
# single-token Synonym, EdgeNGram — composed over any registered base
# chain via AnalyzerSpec(post=...)
# ---------------------------------------------------------------------------

SHINGLE_FILLER = "_"    # ShingleFilter.FILLER_TOKEN (ShingleFilter.java:50)
SHINGLE_SEP = " "       # ShingleFilter.TOKEN_SEPARATOR (:70)


def shingle_post(min_shingle: int = 2, max_shingle: int = 2,
                 output_unigrams: bool = True):
    """ShingleFilter (analysis/common/.../shingle/ShingleFilter.java,
    defaults :55-70): emit unigrams (real tokens only) plus all
    shingles of ``min..max`` adjacent positions, ' '-joined, with '_'
    filler tokens standing in for StopFilter holes (posInc > 1 gaps —
    including leading holes). A shingle's position is its window start;
    all-filler shingles are never emitted (golden vectors:
    shingle/ShingleFilterTest.java BI_GRAM_TOKENS_WITH_HOLES
    :114-133, TRI_GRAM_TOKENS_WITH_HOLES :679+)."""

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        if not tp:
            return tp
        # dense stream: real tokens at their positions, fillers in gaps
        stream: List[Tuple[str, bool]] = []
        base = []  # position per stream slot
        prev = -1
        for t, p in tp:
            for q in range(prev + 1, p):
                stream.append((SHINGLE_FILLER, False))
                base.append(q)
            stream.append((t, True))
            base.append(p)
            prev = p
        out: List[Tuple[str, int]] = []
        n = len(stream)
        for i in range(n):
            tok, real = stream[i]
            if real and output_unigrams:
                out.append((tok, base[i]))
            for size in range(min_shingle, max_shingle + 1):
                if i + size > n:
                    break
                window = stream[i:i + size]
                if any(r for _, r in window):
                    out.append(
                        (SHINGLE_SEP.join(w for w, _ in window), base[i])
                    )
        return out

    return post


def synonym_post(mapping: dict, keep_orig: bool = True):
    """Single-token SynonymFilter (analysis/common/.../synonym/
    SynonymFilter.java): for each token with a rule, inject the mapped
    tokens at the SAME position (posInc 0), optionally keeping the
    original (SynonymMap.Builder keepOrig). Scope cut vs the reference:
    multi-word (graph) rules are not supported — the FST matcher's
    phrase inputs/outputs need position-length aware indexing the
    posting model doesn't carry (documented non-goal)."""

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        out: List[Tuple[str, int]] = []
        for t, p in tp:
            reps = mapping.get(t)
            if reps is None:
                out.append((t, p))
                continue
            if keep_orig:
                out.append((t, p))
            out.extend((r, p) for r in reps)
        return out

    return post


def edge_ngram_post(min_gram: int = 1, max_gram: int = 1):
    """EdgeNGramTokenFilter (analysis/common/.../ngram/
    EdgeNGramTokenFilter.java:91-120, defaults :39-40): per input
    token, front-edge grams of size min..max (sizes capped at the
    token's codepoint length), first gram carries the position
    increment and the rest posInc 0 — i.e. every gram sits at the
    source token's position. Tokens shorter than min_gram emit
    nothing but still advance the position (savePosIncr accumulation
    :102-103)."""

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        out: List[Tuple[str, int]] = []
        for t, p in tp:
            hi = min(max_gram, len(t))
            for size in range(min_gram, hi + 1):
                out.append((t[:size], p))
        return out

    return post


def ngram_post(min_gram: int = 1, max_gram: int = 2):
    """NGramTokenFilter (analysis/common/.../ngram/NGramTokenFilter.java,
    4.4 semantics per the class javadoc :34-46): per input token, ALL
    n-grams of size min..max at the source token's position, ordered
    by start offset within the token then increasing length ("abc" ->
    a, ab, abc, b, bc, c for 1..3); tokens shorter than min_gram are
    dropped (the wrapped LengthFilter, ctor :84)."""

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        out: List[Tuple[str, int]] = []
        for t, p in tp:
            n = len(t)
            for start in range(n - min_gram + 1):
                for size in range(min_gram, max_gram + 1):
                    if start + size > n:
                        break
                    out.append((t[start:start + size], p))
        return out

    return post


def word_delimiter_post(
    generate_word_parts: bool = True,
    generate_number_parts: bool = True,
    split_on_case_change: bool = True,
    split_on_numerics: bool = True,
    stem_english_possessive: bool = True,
    catenate_words: bool = False,
    catenate_numbers: bool = False,
    catenate_all: bool = False,
    preserve_original: bool = False,
):
    """WordDelimiterFilter (analysis/common/.../miscellaneous/
    WordDelimiterFilter.java:36-120 flag semantics,
    WordDelimiterIterator.java subword scan): split tokens into
    subwords at intra-word delimiters (non-alphanumeric chars), case
    transitions (camelCase; acronym rule "ABCDef" -> "ABC","Def") and
    letter<->digit transitions; strip trailing "'s"; optionally
    catenate maximal same-type subword runs (emitted at the LAST
    subword's position, posInc 0 — javadoc :46-53) and/or preserve the
    original token at the FIRST subword's position. Generated parts
    occupy consecutive positions, so following stream tokens shift
    right — the posInc-1 injection the reference performs. The key
    source-code use: identifiers like ``common_util`` / ``parseURL2``
    become searchable by their parts."""

    def ctype(c: str) -> str:
        if c.islower():
            return "l"
        if c.isupper():
            return "u"
        if c.isdigit():
            return "d"
        return "x"

    def split_token(tok: str):
        """-> list of (subword, is_alpha) in order."""
        if stem_english_possessive:
            # trailing 's of each subword (javadoc :44-46); the
            # apostrophe is a delimiter, so strip before scanning
            import re as _re

            tok = _re.sub(r"'[sS](?=$|[^0-9A-Za-z])", "", tok)
        parts = []
        cur: List[str] = []

        def flush():
            if cur:
                word = "".join(cur)
                parts.append((word, ctype(cur[0]) != "d"))
                cur.clear()

        for c in tok:
            ty = ctype(c)
            if ty == "x":
                flush()
                continue
            if cur:
                pty = ctype(cur[-1])
                if split_on_numerics and (pty == "d") != (ty == "d"):
                    flush()
                elif split_on_case_change and pty == "l" and ty == "u":
                    flush()
                elif (
                    split_on_case_change
                    and ty == "l"
                    and pty == "u"
                    and len(cur) >= 2
                    and ctype(cur[-2]) == "u"
                ):
                    # acronym boundary: "ABCd" -> "AB" + "Cd"
                    last = cur.pop()
                    flush()
                    cur.append(last)
            cur.append(c)
        flush()
        return parts

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        out: List[Tuple[str, int]] = []
        shift = 0
        for tok, pos in tp:
            p0 = pos + shift
            parts = split_token(tok)
            if not parts:
                continue  # all-delimiter token vanishes; hole remains
            if len(parts) == 1 and parts[0][0] == tok:
                out.append((tok, p0))
                continue
            emitted = []
            keep = [
                (w, alpha)
                for (w, alpha) in parts
                if (alpha and generate_word_parts)
                or (not alpha and generate_number_parts)
            ]
            for i, (w, _alpha) in enumerate(keep):
                emitted.append((w, p0 + i))
            if preserve_original:
                emitted.insert(0, (tok, p0))
            # catenate maximal same-type runs (>= 2 parts) at the run's
            # last position
            def cat_runs(want_alpha):
                run: List[Tuple[str, int]] = []
                for i, (w, alpha) in enumerate(keep):
                    if alpha == want_alpha:
                        run.append((w, i))
                    else:
                        if len(run) >= 2:
                            emitted.append(
                                ("".join(w for w, _ in run),
                                 p0 + run[-1][1])
                            )
                        run = []
                if len(run) >= 2:
                    emitted.append(
                        ("".join(w for w, _ in run), p0 + run[-1][1])
                    )

            if catenate_words:
                cat_runs(True)
            if catenate_numbers:
                cat_runs(False)
            if catenate_all and len(keep) >= 2:
                emitted.append(
                    ("".join(w for w, _ in keep), p0 + len(keep) - 1)
                )
            emitted.sort(key=lambda wp: wp[1])
            out.extend(emitted)
            shift += len(keep) - 1 if keep else 0
        return out

    return post


# ---------------------------------------------------------------------------
# CharFilter stage (pre-tokenizer str -> str): HTMLStrip / Mapping /
# PatternReplace (analysis/common/.../charfilter/)
# ---------------------------------------------------------------------------

import html as _html_mod


def html_strip_charfilter():
    """HTMLStripCharFilter (charfilter/HTMLStripCharFilter.jflex):
    drop script/style elements with their content, comments, and all
    tags; decode character entities. Documented deltas vs the jflex
    grammar: tags are replaced by ONE space (the grammar removes them
    and relies on offset correction; without offsets a space keeps
    'a<br>b' as two tokens, which is what indexing wants), and CDATA /
    processing-instruction edge cases follow the regexes below."""
    import re as _re

    script = _re.compile(
        r"<(script|style)\b[^>]*>.*?</\1\s*>", _re.I | _re.S
    )
    comment = _re.compile(r"<!--.*?-->", _re.S)
    tag = _re.compile(r"<[^>]*>")

    def pre(text: str) -> str:
        text = script.sub(" ", text)
        text = comment.sub(" ", text)
        text = tag.sub(" ", text)
        return _html_mod.unescape(text)

    return pre


class OffsetMap:
    """BaseCharFilter's offset-correction table (charfilter/
    BaseCharFilter.java:44-118): monotone (output_offset,
    cumulative_diff) pairs recorded by the charfilter as it shrinks /
    grows the stream; ``correct(out_off)`` maps an offset in the
    FILTERED text back to the original input (input = output + diff of
    the last pair at or before it — the Java binary search is the
    bisect below). Tokenizers correct BOTH token offsets
    (Tokenizer.correctOffset), so highlighters can slice the original
    stored text exactly."""

    __slots__ = ("offsets", "diffs")

    def __init__(self):
        self.offsets: list = []
        self.diffs: list = []

    def add(self, off: int, cumulative_diff: int) -> None:
        """addOffCorrectMap (:96-118): monotone offsets required; a
        repeated offset overwrites the last diff."""
        if self.offsets:
            if off < self.offsets[-1]:
                raise ValueError(
                    f"offset {off} < last recorded {self.offsets[-1]}")
            if off == self.offsets[-1]:
                self.diffs[-1] = cumulative_diff
                return
        self.offsets.append(off)
        self.diffs.append(cumulative_diff)

    def correct(self, current_off: int) -> int:
        """correct (:44-68)."""
        from bisect import bisect_right

        i = bisect_right(self.offsets, current_off) - 1
        if i < 0:
            return current_off
        return current_off + self.diffs[i]

    def last_cumulative_diff(self) -> int:
        return self.diffs[-1] if self.diffs else 0


_HTML_OFF_RX = None


def html_strip_with_offsets(text: str):
    """HTMLStripCharFilter WITH the BaseCharFilter offset map: one
    left-to-right pass over script/style elements, comments, tags
    (each replaced by one space, same one-space delta as
    html_strip_charfilter) and character entities (decoded;
    semicolon-terminated forms only — the global-unescape legacy
    semicolon-less forms are a documented delta of this offset
    variant). Returns (stripped_text, OffsetMap); every token offset
    in the stripped text maps back to the original through
    OffsetMap.correct, so highlight offsets on charfiltered fields
    are EXACT (r2 verdict item 7)."""
    import re as _re

    global _HTML_OFF_RX
    if _HTML_OFF_RX is None:
        _HTML_OFF_RX = _re.compile(
            r"<(script|style)\b[^>]*>.*?</\1\s*>"   # element + content
            r"|<!--.*?-->"                          # comment
            r"|<[^>]*>"                             # tag
            r"|&#[0-9]+;|&#[xX][0-9a-fA-F]+;|&[a-zA-Z][a-zA-Z0-9]*;",
            _re.I | _re.S,
        )
    omap = OffsetMap()
    out = []
    out_len = 0
    in_pos = 0
    for m in _HTML_OFF_RX.finditer(text):
        gap = text[in_pos:m.start()]
        out.append(gap)
        out_len += len(gap)
        piece = m.group(0)
        if piece.startswith("&"):
            rep = _html_mod.unescape(piece)
            if rep == piece:        # unknown entity passes through
                out.append(piece)
                out_len += len(piece)
                in_pos = m.end()
                continue
        else:
            rep = " "
        out.append(rep)
        out_len += len(rep)
        in_pos = m.end()
        omap.add(out_len, in_pos - out_len)
    out.append(text[in_pos:])
    return "".join(out), omap


def mapping_charfilter(mapping: dict):
    """MappingCharFilter (charfilter/MappingCharFilter.java +
    NormalizeCharMap): greedy longest-match string rewriting before
    tokenization (classic use: fold 'ph'->'f', strip diacritics)."""
    import re as _re

    if not mapping:
        return lambda text: text
    alt = _re.compile(
        "|".join(
            _re.escape(k)
            for k in sorted(mapping, key=len, reverse=True)
        )
    )

    def pre(text: str) -> str:
        return alt.sub(lambda m: mapping[m.group(0)], text)

    return pre


def pattern_replace_charfilter(pattern: str, replacement: str):
    """PatternReplaceCharFilter (charfilter/
    PatternReplaceCharFilter.java): regex replace on the raw input."""
    import re as _re

    rx = _re.compile(pattern)

    def pre(text: str) -> str:
        return rx.sub(replacement, text)

    return pre


def make_charfiltered_analyzer(name: str, base: str, pre=None,
                               pre_offsets=None) -> AnalyzerSpec:
    """Compose a registered base chain with a CharFilter pre stage and
    register under ``name``. Pass ``pre_offsets`` for the
    offset-correcting form (BaseCharFilter seam) — the plain pre is
    derived from it and the highlighters correct token offsets back
    to the original text."""
    b = ANALYZERS[base]
    spec = AnalyzerSpec(name, b.scanner, b.lowercase, b.stopwords,
                        b.max_len, b.stem, post=b.post,
                        emits_overlaps=b.emits_overlaps, pre=pre,
                        pre_offsets=pre_offsets)
    if isinstance(b, _StandardSpec):
        spec.scanner = findall_tokens
    return register_analyzer(spec)


# StandardAnalyzer chain behind an offset-correcting HTMLStrip — the
# reference's HTMLStripCharFilterFactory + StandardTokenizer
# composition; highlight offsets on this chain are exact on the raw
# HTML (tests/test_charfilter_offsets.py golden vectors).
make_charfiltered_analyzer("html_strip_std", "standard",
                           pre_offsets=html_strip_with_offsets)


def make_filtered_analyzer(name: str, base: str, post,
                           emits_overlaps: bool = True) -> AnalyzerSpec:
    """Compose a registered base chain with a stream post filter and
    register the result under ``name`` (pinnable in index snapshots)."""
    b = ANALYZERS[base]
    spec = AnalyzerSpec(name, b.scanner, b.lowercase, b.stopwords,
                        b.max_len, b.stem, post=post,
                        emits_overlaps=emits_overlaps)
    if isinstance(b, _StandardSpec):
        # the standard fast path has scanner=None; fall back to the
        # module-level findall with identical token boundaries
        spec.scanner = findall_tokens
    return register_analyzer(spec)


make_filtered_analyzer("shingle", "standard", shingle_post(2, 2, True))
_NUM_TYPE_RE = _stdre.compile(f"^_*{_A_NUM}(?:_+{_A_NUM})*_*$")


def token_type(token: str) -> str:
    """StandardTokenizer TypeAttribute for the ASCII subset this chain
    emits (StandardTokenizer.java:101-116 TOKEN_TYPES). jflex rule
    resolution: at equal match length the earlier rule wins, so a
    token is <NUM> exactly when the NUM rule
    (StandardTokenizerImpl.jflex:129-133 — digit runs with medial
    [.,;'] joined by underscores, optional underscore padding) covers
    the WHOLE token; every other token the ASCII scanner emits is
    <ALPHANUM> (the CJK/Hangul types never occur in this corpus)."""
    return "<NUM>" if _NUM_TYPE_RE.match(token) else "<ALPHANUM>"


def type_token_filter_post(stop_types, use_white_list: bool = False):
    """TypeTokenFilter (analysis/common/.../core/TypeTokenFilter.java:
    63-66): accept a token iff useWhiteList == (type in stopTypes) —
    blacklist drops the listed types, whitelist keeps only them.
    Dropped tokens leave position holes (FilteringTokenFilter
    enablePositionIncrements): survivor positions untouched."""
    stop = frozenset(stop_types)

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        return [(t, p) for t, p in tp
                if use_white_list == (token_type(t) in stop)]

    return post


def length_filter_post(min_len: int, max_len: int):
    """LengthFilter (analysis/common/.../miscellaneous/
    LengthFilter.java): keep tokens whose char length lies in
    [min, max]; dropped tokens leave position holes (the
    FilteringTokenFilter enablePositionIncrements=true behavior) —
    positions of survivors are untouched."""

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        return [(t, p) for t, p in tp if min_len <= len(t) <= max_len]

    return post


def reverse_post():
    """ReverseStringFilter (analysis/reverse/ReverseStringFilter.java):
    reverse every token in place — the index half of Solr's
    ReversedWildcardFilterFactory leading-wildcard strategy (a query
    ``*foo`` becomes the PREFIX ``oof*`` over the reversed field,
    restoring term-dict pushdown)."""

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        return [(t[::-1], p) for t, p in tp]

    return post


COMMON_GRAMS_SEP = "_"  # CommonGramsFilter.SEPARATOR (:58)


def common_grams_post(common_words, query_mode: bool = False):
    """CommonGramsFilter (analysis/commongrams/CommonGramsFilter.java):
    for each ADJACENT token pair (positions p, p+1) where either side
    is a common word, emit "prev_cur" at the first token's position
    alongside the unigrams — the phrase-speed alternative to stop
    removal. query_mode mirrors CommonGramsQueryFilter: unigrams
    covered by a gram are dropped (only grams + uncovered unigrams
    remain), so phrase queries hit the gram postings."""
    cw = frozenset(common_words)

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        grams: List[Tuple[str, int]] = []
        covered = set()
        for i in range(len(tp) - 1):
            (t1, p1), (t2, p2) = tp[i], tp[i + 1]
            if p2 == p1 + 1 and (t1 in cw or t2 in cw):
                grams.append((t1 + COMMON_GRAMS_SEP + t2, p1))
                covered.add(i)
                covered.add(i + 1)
        if query_mode:
            out = [tp[i] for i in range(len(tp)) if i not in covered]
        else:
            out = list(tp)
        out.extend(grams)
        out.sort(key=lambda x: x[1])
        return out

    return post


make_filtered_analyzer("shingle_ws", "whitespace", shingle_post(2, 2, True))
make_filtered_analyzer("edge_ngram", "standard", edge_ngram_post(2, 4))
make_filtered_analyzer("ngram_2_3", "standard", ngram_post(2, 3))
# code-identifier chain: whitespace + WordDelimiterFilter with the
# Solr schema defaults for an index-side text_code field
# (generate parts, all splits, possessive; original kept so exact
# identifier queries still match)
make_filtered_analyzer(
    "word_delimiter_code", "whitespace",
    word_delimiter_post(preserve_original=True),
)
make_filtered_analyzer("length_4_6", "whitespace", length_filter_post(4, 6))
make_filtered_analyzer("reversed", "whitespace", reverse_post())
# common-grams over the raw whitespace stream with the engine stop set
# as the common-word list (the canonical Solr text_commongrams shape)
make_filtered_analyzer(
    "common_grams_ws", "whitespace",
    common_grams_post(STOPWORDS),
)
# CJKBigramFilter over the standard chain (analysis/cjk/
# CJKBigramFilter.java semantics at the stream level). NOTE: this
# position-stream composition cannot see OFFSETS, so it joins bigram
# runs across whitespace-separated CJK tokens and keeps the standard
# chain's English stop set — the FAITHFUL CJKAnalyzer default chain
# (width fold, own stop list, offset-adjacent runs,
# CJKAnalyzer.java:81-89) is ``cjk_default`` in lang_analyzers.py.
from .cjk import cjk_bigram_post  # noqa: E402

make_filtered_analyzer("cjk", "standard", cjk_bigram_post(),
                       emits_overlaps=False)

# ASCIIFoldingFilter chain (analysis/common/.../miscellaneous/
# ASCIIFoldingFilter.java): standard chain + fold-to-ASCII post stage;
# 1:1 token mapping, so no position overlaps
from .asciifold import ascii_folding_stream  # noqa: E402

make_filtered_analyzer("ascii_folding", "standard", ascii_folding_stream,
                       emits_overlaps=False)


def get_analyzer(name: str) -> AnalyzerSpec:
    try:
        return ANALYZERS[name]
    except KeyError:
        raise ValueError(
            f"unknown analyzer {name!r}; registered: {sorted(ANALYZERS)}"
        )


def tokenize_series(texts: Iterable[str]) -> List[List[str]]:
    """Vectorized-ish batch analyze for pandas UDFs: one C-level regex
    scan per row, list building only. pandas .str methods cannot express
    the UAX#29 grammar, so a tight loop over the batch is the floor."""
    findall = findall_tokens
    stop = STOPWORDS
    maxlen = MAX_TOKEN_LENGTH
    result = []
    append = result.append
    for text in texts:
        if not text:
            append([])
            continue
        append(
            [
                lt
                for t in findall(text)
                if len(t) <= maxlen and (lt := t.lower()) not in stop
            ]
        )
    return result


def tokenize_series_positions(texts: Iterable[str]):
    """Batch analyze keeping token positions (StopFilter holes preserved,
    over-long tokens advance position — StandardTokenizer.java:156-167,
    StopFilter.java:124-127). Returns (token_lists, position_lists);
    len(token_lists[i]) is the norm field length, same as
    tokenize_series."""
    findall = findall_tokens
    stop = STOPWORDS
    maxlen = MAX_TOKEN_LENGTH
    toks_out: List[List[str]] = []
    pos_out: List[List[int]] = []
    for text in texts:
        toks: List[str] = []
        poss: List[int] = []
        if text:
            pos = -1
            for t in findall(text):
                pos += 1
                if len(t) > maxlen:
                    continue
                lt = t.lower()
                if lt not in stop:
                    toks.append(lt)
                    poss.append(pos)
        toks_out.append(toks)
        pos_out.append(poss)
    return toks_out, pos_out


# ---------------------------------------------------------------------------
# Pattern pack (analysis/pattern/* + miscellaneous/*): PatternTokenizer,
# PatternReplaceFilter, KeepWordFilter, TrimFilter, CapitalizationFilter,
# HyphenatedWordsFilter — the remaining general-purpose token surface.
# ---------------------------------------------------------------------------

def pattern_tokenizer(pattern: str, group: int = -1):
    """PatternTokenizer (analysis/pattern/PatternTokenizer.java):
    group=-1 splits on the pattern (String.split semantics, zero-length
    tokens dropped, :37-41,52); group>=0 emits that capture group of
    every non-overlapping match (:42-49), zero-length tokens dropped."""
    import re as _re

    rx = _re.compile(pattern)
    if group < 0:
        def scan(text: str) -> List[str]:
            return [t for t in rx.split(text) if t]
    else:
        def scan(text: str) -> List[str]:
            return [m.group(group) for m in rx.finditer(text)
                    if m.group(group)]
    return scan


def pattern_replace_post(pattern: str, replacement: str,
                         replace_all: bool = True):
    """PatternReplaceFilter (analysis/pattern/PatternReplaceFilter.java):
    regex replace inside each token — replaceAll vs replaceFirst
    (:74-76); empty result tokens are KEPT (:33-35). Replacement is a
    plain string here (no $n backrefs), sidestepping the Java-vs-Python
    backreference syntax split."""
    import re as _re

    rx = _re.compile(pattern)
    n = 0 if replace_all else 1

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        return [(rx.sub(replacement, t, count=n), p) for t, p in tp]

    return post


def keep_word_post(words):
    """KeepWordFilter (miscellaneous/KeepWordFilter.java): the inverse
    of StopFilter — only listed words survive; FilteringTokenFilter
    keeps position holes for dropped tokens."""
    kw = frozenset(words)

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        return [(t, p) for t, p in tp if t in kw]

    return post


def trim_post():
    """TrimFilter (miscellaneous/TrimFilter.java): strip leading and
    trailing whitespace in place; a whitespace-only token becomes the
    empty token and is KEPT (:50-53 returns true)."""

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        return [(t.strip(), p) for t, p in tp]

    return post


def capitalization_post(only_first_word: bool = True, keep=None,
                        force_first_letter: bool = True,
                        ok_prefix=(), min_word_length: int = 0,
                        max_word_count: int = None,
                        max_token_length: int = None):
    """CapitalizationFilter (miscellaneous/CapitalizationFilter.java)
    with the reference defaults: words inside a token split on
    chars <= ' ' or '.' (:104-119); word 0 gets Upper-first +
    lower-rest, later words all-lowercase when onlyFirstWord
    (:133-139); keep-list words pass through (first letter still
    forced upper when forceFirstLetter, :141-146); words shorter than
    minWordLength untouched (:148-150); okPrefix words untouched
    (:152-168); tokens with more than maxWordCount words or length
    >= maxTokenLength left as-is (:100,121-123)."""
    keep = frozenset(keep or ())
    ok_prefix = tuple(ok_prefix)

    def cap_word(w: str, word_count: int) -> str:
        if only_first_word and word_count > 0:
            return w.lower()
        if w in keep:
            if word_count == 0 and force_first_letter:
                return w[0].upper() + w[1:]
            return w
        if len(w) < min_word_length:
            return w
        for pfx in ok_prefix:
            if w.startswith(pfx):
                return w
        return w[0].upper() + w[1:].lower()

    def cap_token(t: str) -> str:
        if max_token_length is not None and len(t) >= max_token_length:
            return t
        words = []
        cur = []
        for c in t:
            if c <= " " or c == ".":
                if cur:
                    words.append("".join(cur))
                    cur = []
                words.append(c)  # separator, re-emitted verbatim
            else:
                cur.append(c)
        if cur:
            words.append("".join(cur))
        wc = 0
        out = []
        for w in words:
            if len(w) == 1 and (w <= " " or w == "."):
                out.append(w)
            else:
                out.append(cap_word(w, wc))
                wc += 1
        if max_word_count is not None and wc > max_word_count:
            return t
        return "".join(out)

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        return [(cap_token(t), p) for t, p in tp]

    return post


# FrenchAnalyzer.DEFAULT_ARTICLES (analysis/common/.../fr/
# FrenchAnalyzer.java:64-68): elision prefixes, matched ignore-case
FRENCH_ARTICLES = ("l", "m", "t", "qu", "n", "s", "j", "d", "c",
                   "jusqu", "quoiqu", "lorsqu", "puisqu")


def elision_post(articles=FRENCH_ARTICLES, ignore_case: bool = True):
    """ElisionFilter (analysis/common/.../util/ElisionFilter.java:
    41-63): if the token contains an apostrophe (U+0027 or U+2019) and
    the prefix BEFORE THE FIRST apostrophe is one of the articles, the
    token becomes everything after that apostrophe; otherwise the
    token passes unchanged (including the apostrophe)."""
    arts = {a.lower() for a in articles} if ignore_case else set(articles)

    def strip(t: str) -> str:
        idx = -1
        for i, ch in enumerate(t):
            if ch in ("'", "’"):
                idx = i
                break
        if idx >= 0:
            pre = t[:idx].lower() if ignore_case else t[:idx]
            if pre in arts:
                return t[idx + 1:]
        return t

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        return [(strip(t), p) for t, p in tp]

    return post


def english_possessive_post():
    """EnglishPossessiveFilter (analysis/common/.../en/
    EnglishPossessiveFilter.java:40-55): strip a trailing possessive
    ('s, 'S, or with U+2019/U+FF07 apostrophes) — exactly the last two
    chars, only when length >= 2."""

    def strip(t: str) -> str:
        if (len(t) >= 2 and t[-2] in ("'", "’", "＇")
                and t[-1] in ("s", "S")):
            return t[:-2]
        return t

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        return [(strip(t), p) for t, p in tp]

    return post


def pattern_capture_post(patterns, preserve_original: bool = False):
    """PatternCaptureGroupTokenFilter (analysis/common/.../pattern/
    PatternCaptureGroupTokenFilter.java): per input token, emit every
    capture group of every pattern at position-increment 0, in the
    reference's nextCapture order — across patterns the one whose
    current group starts at the smallest offset wins; within a pattern
    groups go 1..groupCount, then Matcher.find() advances (:57-86).
    Rules kept: empty captures (start == end, including
    non-participating groups) are skipped; with preserve_original the
    full-token capture (start 0, end len) is skipped and the original
    token is emitted first; without it the FIRST capture replaces the
    token term (keeping its position), and a token with no captures
    passes through unchanged (:92-136)."""
    import re as _re

    pats = [_re.compile(p) if isinstance(p, str) else p for p in patterns]
    gcounts = [p.groups for p in pats]

    def captures(term: str) -> List[str]:
        n = len(pats)
        its = [p.finditer(term) for p in pats]
        ms: List = [None] * n
        grp = [-1] * n
        out: List[str] = []
        tlen = len(term)

        def next_capture() -> int:
            min_off = tlen + 1
            cur = -1
            i = 0
            while i < n:
                if grp[i] == -1:
                    ms[i] = next(its[i], None)
                    grp[i] = 1 if ms[i] is not None else 0
                if grp[i] != 0:
                    while grp[i] < gcounts[i] + 1:
                        start = ms[i].start(grp[i])
                        end = ms[i].end(grp[i])
                        if start == end or (
                            preserve_original and start == 0
                            and end == tlen
                        ):
                            grp[i] += 1
                            continue
                        if start < min_off:
                            min_off = start
                            cur = i
                        break
                    if grp[i] == gcounts[i] + 1:
                        grp[i] = -1
                        continue   # re-pull this matcher (the i-- walk)
                i += 1
            return cur

        while True:
            c = next_capture()
            if c == -1:
                break
            out.append(term[ms[c].start(grp[c]):ms[c].end(grp[c])])
            grp[c] += 1
        return out

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        out: List[Tuple[str, int]] = []
        for t, p in tp:
            caps = captures(t)
            if preserve_original:
                out.append((t, p))
                out.extend((c, p) for c in caps)
            elif caps:
                out.extend((c, p) for c in caps)
            else:
                out.append((t, p))
        return out

    return post


def hyphenated_words_post():
    """HyphenatedWordsFilter (miscellaneous/HyphenatedWordsFilter.java):
    consecutive tokens ending in '-' accumulate (hyphen stripped) and
    join with the next plain token into one token at the FIRST part's
    position (:85-99); a stream ending mid-accumulation re-appends the
    hyphen (:104-110 backwards-compat rule)."""

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        out: List[Tuple[str, int]] = []
        buf = None
        first_pos = 0
        for t, p in tp:
            if t and t[-1] == "-":
                if buf is None:
                    buf, first_pos = "", p
                buf += t[:-1]
            elif buf is not None:
                out.append((buf + t, first_pos))
                buf = None
            else:
                out.append((t, p))
        if buf is not None:
            out.append((buf + "-", first_pos))
        return out

    return post


# pattern-split: tokens are the maximal runs BETWEEN spaces-and-vowels
register_analyzer(AnalyzerSpec(
    "pattern_split", pattern_tokenizer("[ aeiou]+"), False))
# pattern-group: capture group 1 of every \b(s[a-z]+) match
register_analyzer(AnalyzerSpec(
    "pattern_group_s", pattern_tokenizer(r"\b(s[a-z]+)", 1), False))
make_filtered_analyzer("pattern_replace_vowel_all", "whitespace",
                       pattern_replace_post("[aeiou]", "*", True))
make_filtered_analyzer("pattern_replace_vowel_first", "whitespace",
                       pattern_replace_post("[aeiou]", "*", False))
make_filtered_analyzer(
    "keep_word_ops", "whitespace",
    keep_word_post({"hash", "scan", "merge", "sort", "join"}))
make_filtered_analyzer("capitalization_ws", "whitespace",
                       capitalization_post())
make_filtered_analyzer("hyphen_join_ws", "whitespace",
                       hyphenated_words_post())
make_filtered_analyzer("keyword_trim", "keyword", trim_post())


# ---------------------------------------------------------------------------
# Stemming-control pack (miscellaneous/SetKeywordMarkerFilter.java,
# StemmerOverrideFilter.java, KeywordRepeatFilter.java,
# RemoveDuplicatesTokenFilter.java) and stream limits
# (LimitTokenCountFilter.java, LimitTokenPositionFilter.java)
# ---------------------------------------------------------------------------

def stem_control_post(stem, keywords=(), overrides=None,
                      repeat: bool = False):
    """The canonical stemming-control chain composed into one stream
    filter, in reference slot order: StemmerOverrideFilter (dictionary
    stem + keyword flag, StemmerOverrideFilter.java:58-66) ->
    SetKeywordMarkerFilter (flag only) -> KeywordRepeatFilter (emit the
    keyword-marked original plus a stemmable copy at the SAME position,
    KeywordRepeatFilter.java:45-60) -> stemmer (skips keyword-flagged
    tokens, e.g. PorterStemFilter.java:51) ->
    RemoveDuplicatesTokenFilter (drop a token equal to a previous one
    at the same position, RemoveDuplicatesTokenFilter.java:49-65).
    The keyword flag lives only inside this composition, so the
    (term, position) stream contract is unchanged."""
    kw = frozenset(keywords)
    ov = dict(overrides or {})

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        out: List[Tuple[str, int]] = []
        for t, p in tp:
            if t in ov:
                out.append((ov[t], p))
            elif t in kw:
                out.append((t, p))
            else:
                s = stem(t)
                if repeat and s != t:
                    out.append((t, p))
                    out.append((s, p))
                else:
                    out.append((s, p))
        return out

    return post


def limit_token_count_post(max_tokens: int):
    """LimitTokenCountFilter (consumeAllTokens=false default): the
    stream ends after max_tokens emitted tokens."""

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        return tp[:max_tokens]

    return post


def limit_token_position_post(max_position: int):
    """LimitTokenPositionFilter: only tokens whose 1-based accumulated
    position is <= max_position survive (positions here are 0-based,
    so keep pos < max_position)."""

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        return [(t, p) for t, p in tp if p < max_position]

    return post


from lucene_solr_spark.functions.porter import porter_stem as _porter  # noqa: E402

make_filtered_analyzer(
    "stem_control_ws", "whitespace",
    stem_control_post(_porter, keywords={"merge", "query"},
                      overrides={"customer": "client",
                                 "window": "pane"},
                      repeat=True))
make_filtered_analyzer("limit_count_5_ws", "whitespace",
                       limit_token_count_post(5),
                       emits_overlaps=False)
make_filtered_analyzer("limit_pos_3_ws", "whitespace",
                       limit_token_position_post(3),
                       emits_overlaps=False)


# -- analysis introspection (Solr /analysis handlers) -----------------------

def analyze_stages(spec: AnalyzerSpec, text: str):
    """FieldAnalysisRequestHandler.analyzeValue analogue
    (solr/core/.../handler/FieldAnalysisRequestHandler.java +
    AnalysisRequestHandlerBase.analyzeValue): run the chain one stage
    at a time and report the token stream AFTER each stage as
    (stage_ord, stage_name, position, term) — the Admin-UI analyzer
    debugger surface. Stages present depend on the spec (charfilter,
    tokenizer incl. the max-length skip, lowercase, stop, stem, post);
    the LAST stage always equals ``spec.analyze_with_positions(text)``
    (asserted in tests — introspection cannot drift from execution)."""
    out = []
    stage = 0
    if spec.pre is not None:
        text = spec.pre(text)
        # charfilter output is a string, not tokens; surface it as a
        # single pseudo-token at position 0 like the handler's
        # CharFilter stage text dump
        out.append((stage, "charfilter", 0, text))
        stage += 1

    scanner = spec.scanner
    if scanner is None:  # the optimized standard spec
        toks = findall_tokens(text)
    else:
        toks = list(scanner(text))
    cur = [(t, p) for p, t in enumerate(toks)
           if len(t) <= spec.max_len]  # over-long skip keeps the hole
    out.extend((stage, "tokenizer", p, t) for t, p in cur)
    stage += 1

    if spec.lowercase:
        cur = [(t.lower(), p) for t, p in cur]
        out.extend((stage, "lowercase", p, t) for t, p in cur)
        stage += 1

    if spec.stopwords:
        cur = [(t, p) for t, p in cur if t not in spec.stopwords]
        out.extend((stage, "stop", p, t) for t, p in cur)
        stage += 1

    if spec.stem is not None:
        # mirror the execution paths' empty-drop policy (a stem that
        # deletes the whole token leaves a position hole)
        cur = [(t, p) for t, p in ((spec.stem(t), p) for t, p in cur)
               if t]
        out.extend((stage, "stem", p, t) for t, p in cur)
        stage += 1

    if spec.post is not None:
        cur = spec.post(cur)
        out.extend((stage, "post", p, t) for t, p in cur)
        stage += 1

    return out


def analysis_stages_df(docs, analyzer: str = "stop",
                       text_col: str = "text",
                       match_query: str = None):
    """Distributed per-stage analysis over a document table: one Arrow
    pass (mapInPandas), rows (doc_id, stage_ord, stage, pos, term).
    The Spark-side shape of the /analysis/field handler over a corpus
    sample instead of a single posted value.

    ``match_query`` switches to DocumentAnalysisRequestHandler
    semantics (solr/core/.../handler/DocumentAnalysisRequestHandler
    .java + AnalysisRequestHandlerBase termsToMatch): the query is
    analyzed through the SAME chain, its final tokens form the match
    set, and every stage token carries ``match`` = membership of its
    emitted text in that set (the Admin-UI highlight flag)."""
    import pandas as pd

    spec = get_analyzer(analyzer)
    qset = frozenset(spec.analyze(match_query)) \
        if match_query is not None else None

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                for so, st, p, t in analyze_stages(spec, text or ""):
                    if qset is None:
                        rows.append((doc_id, so, st, p, t))
                    else:
                        rows.append((doc_id, so, st, p, t, t in qset))
            cols = ["doc_id", "stage_ord", "stage", "pos", "term"]
            if qset is not None:
                cols.append("match")
            yield pd.DataFrame(rows, columns=cols)

    schema = ("doc_id long, stage_ord int, stage string, "
              "pos int, term string")
    if qset is not None:
        schema += ", match boolean"
    return docs.select("doc_id", text_col).mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# Stream concatenation (PrefixAwareTokenFilter family)
# ---------------------------------------------------------------------------

def prefix_aware_concat(prefix, suffix, update=None):
    """PrefixAwareTokenFilter (analysis/common/.../miscellaneous/
    PrefixAwareTokenFilter.java:42-115): join two token streams; the
    LAST prefix token is remembered and every suffix token is passed
    through ``update(suffix_token, last_prefix_token)`` — the default
    (:155-159) adds the last prefix token's endOffset to the suffix
    token's start and end offsets. Streams are offset-stream entries
    ``[term, pos, start, end, type]`` (tokens_with_offsets format);
    positions are absolute here, so the passed-through posInc chain
    means suffix positions continue after the last prefix position.
    An empty prefix leaves the initial zero Token (new Token() ==
    offsets 0,0), so suffix tokens shift by 0 — the reference's
    behavior verbatim."""
    if update is None:
        def update(tok, last):
            tok = list(tok)
            tok[2] = last[3] + tok[2]
            tok[3] = last[3] + tok[3]
            return tok

    zero = ["", -1, 0, 0, ""]
    last = zero if not prefix else prefix[-1]
    pos_base = (last[1] + 1) if prefix else 0
    out = [list(e) for e in prefix]
    for e in suffix:
        t = update(list(e), last)
        t[1] = pos_base + e[1]
        out.append(t)
    return out


def prefix_and_suffix_aware(prefix, inner, suffix):
    """PrefixAndSuffixAwareTokenFilter (miscellaneous/
    PrefixAndSuffixAwareTokenFilter.java:31-62): two chained
    PrefixAwareTokenFilters — the inner shifts the INPUT stream by
    the last prefix token's end, the outer shifts the SUFFIX stream
    by the last token of the combined (prefix + shifted input)
    stream. When the input stream is empty the outer shift falls back
    to the prefix's own last token (the remembered previousPrefixToken
    walks through unchanged)."""
    combined = prefix_aware_concat(prefix, inner)
    return prefix_aware_concat(combined, suffix)


# Reference-default per-language chains (<lang>_default) — registered
# last: lang_analyzers composes the stemmer/normalizer packs above
# with the default stop sets (stopsets.py). Import-cycle-safe because
# every name it pulls from this module is defined above.
from lucene_solr_spark.functions import lang_analyzers  # noqa: E402,F401
