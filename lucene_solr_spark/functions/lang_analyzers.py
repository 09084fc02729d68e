"""Reference-default per-language analyzer chains.

Each <Lang>Analyzer in the reference composes: StandardTokenizer →
[ElisionFilter] → [custom casing] → LowerCaseFilter → StopFilter with
the language's DEFAULT stop set → [normalization] → stem filter(s).
Round 3 shipped every stemmer/normalizer but the composed non-English
chains ran WITHOUT their reference default stop sets — a
FrenchAnalyzer user got stopwords indexed and different df/norms than
the reference default. This module closes that gap: one
``<lang>_default`` AnalyzerSpec per language, stop sets from
stopsets.py (re-serialized reference resource data), chain order
copied from each <Lang>Analyzer.createComponents (file:line cited per
registration below).

The chains run through AnalyzerSpec's ordered seams:
scanner → max_len → lowercase → pre_stop → StopFilter → stem → post.
Elision matches ignore-case in the reference, so running it after
LowerCaseFilter is output-identical to the reference's
elide-then-lowercase order; the custom casing languages (el/tr/ga)
run with lowercase=False and their casing in pre_stop, exactly the
reference's casing-before-stop order. fa/hi normalize BEFORE their
stop check (pre_stop); ar normalizes AFTER it (inside stem).

Every chain is gated in tests/test_lang_analyzers.py over the
reference's own Test<Lang>Analyzer vectors (testBasics /
testContractions / testHyphens / testElision).

Empty-token policy (uniform across ALL chains): a token that a
normalize/stem stage deletes entirely — e.g. ArabicNormalizer on a
tatweel/harakat-only token — is DROPPED, leaving a position hole
exactly like a stopword. The reference's 4.x filters
(ar/ArabicNormalizationFilter.java:44-49) emit the empty term
instead; we diverge deliberately (empty postings are useless and
break downstream invariants), so df/norms for such degenerate tokens
differ from the reference by design. The policy is enforced at BOTH
per-token seams (pre_stop and stem) in AnalyzerSpec, so ar (stem-slot
normalizer), fa (pre_stop-slot normalizer) and hi (normalizer leaves
tatweel untouched → token survives) are mutually consistent.
"""


from lucene_solr_spark.constants import STOPWORDS
from lucene_solr_spark.functions.analysis import (
    AnalyzerSpec,
    FRENCH_ARTICLES,
    _LETTER_RUNS,  # noqa: F401  (not used; standard scanner below)
    register_analyzer,
    tokenize,
)
from lucene_solr_spark.functions.classicstemmers import CLASSIC_STEMMERS
from lucene_solr_spark.functions.cjk import cjk_width_fold
from lucene_solr_spark.functions.greekstemmer import (
    greek_lowercase,
    greek_stem,
)
from lucene_solr_spark.functions.indic import indic_normalize
from lucene_solr_spark.functions.kstem import kstem  # noqa: F401
from lucene_solr_spark.functions.lightstemmers import LIGHT_STEMMERS
from lucene_solr_spark.functions.lowercase import (
    irish_lowercase,
    turkish_lowercase,
)
from lucene_solr_spark.functions.natstemmers import NAT_STEMMERS
from lucene_solr_spark.functions.normalizers import (
    arabic_pipeline,
    german_normalize,
    hindi_normalize,
    persian_pipeline,
)
from lucene_solr_spark.functions.porter import porter_stem
from lucene_solr_spark.functions.rslpstemmer import RSLP_STEMMERS
from lucene_solr_spark.functions.snowball_ext import SNOWBALL_STEMMERS
from lucene_solr_spark.functions.stopsets import STOP_SETS


def _elide(articles):
    """ElisionFilter (util/ElisionFilter.java:41-63) as a per-token
    fn: strip through the FIRST apostrophe (U+0027/U+2019) when the
    prefix is an article (matched ignore-case)."""
    arts = frozenset(a.lower() for a in articles)

    def strip(t: str) -> str:
        for i, ch in enumerate(t):
            if ch in ("'", "’"):
                if t[:i].lower() in arts:
                    return t[i + 1:]
                return t
        return t

    return strip


# CatalanAnalyzer.java:48-52, ItalianAnalyzer.java:50-55,
# IrishAnalyzer.java:47-51 / :58-62
CATALAN_ARTICLES = ("d", "l", "m", "n", "s", "t")
ITALIAN_ARTICLES = ("c", "l", "all", "dall", "dell", "nell", "sull",
                    "coll", "pell", "gl", "agl", "dagl", "degl",
                    "negl", "sugl", "un", "m", "t", "s", "v", "d")
IRISH_ARTICLES = ("d", "m", "b")
IRISH_HYPHENATIONS = frozenset(("h", "n", "t"))

# DutchAnalyzer.java:85-89 DEFAULT_STEM_DICT (StemmerOverrideFilter:
# a dict hit replaces the term AND marks it keyword, so the Snowball
# stage is skipped)
DUTCH_STEM_DICT = {"fiets": "fiets", "bromfiets": "bromfiets",
                   "ei": "eier", "kind": "kinder"}


def _compose2(f, g):
    """g-then-f per token, dict-memoized. NOT lru_cache: the chain
    ships inside Arrow-UDF closures and cloudpickle cannot serialize
    an lru_cache wrapper around a local function."""
    cache = {}

    def h(t: str) -> str:
        r = cache.get(t)
        if r is None:
            r = f(g(t))
            if len(cache) < (1 << 17):
                cache[t] = r
        return r
    return h


def _irish_pre(t: str):
    """IrishAnalyzer.createComponents (:138-147) head: the
    HYPHENATIONS StopFilter (posInc hole, asserted by
    TestIrishAnalyzer.testHyphens), ElisionFilter(d/m/b), then
    IrishLowerCaseFilter."""
    if t.lower() in IRISH_HYPHENATIONS:
        return None
    t = _IRISH_ELIDE(t)
    return irish_lowercase(t)


_IRISH_ELIDE = _elide(IRISH_ARTICLES)


def _en_possessive(t: str) -> str:
    """EnglishPossessiveFilter (en/EnglishPossessiveFilter.java:
    40-55): strip a trailing 's (any of ' ’ ＇ apostrophes; runs
    post-lowercase here, output-identical since the filter accepts
    both s and S)."""
    if len(t) >= 2 and t[-2] in ("'", "’", "＇") and t[-1] in ("s", "S"):
        return t[:-2]
    return t


def _dutch_stem(t: str) -> str:
    o = DUTCH_STEM_DICT.get(t)
    if o is not None:
        return o
    return SNOWBALL_STEMMERS["dutch"](t)


class _CJKDefaultSpec(AnalyzerSpec):
    """CJKAnalyzer default chain (cjk/CJKAnalyzer.java:81-89):
    StandardTokenizer → CJKWidthFilter → LowerCase → CJKBigramFilter
    → StopFilter(default cjk stop set).

    Needs its own analyze paths because CJKBigramFilter breaks bigram
    runs on OFFSET adjacency (CJKBigramFilter.java:180 —
    ``startOffset != lastEndOffset`` clears the buffer), which the
    stream-post protocol cannot see: '一 二三四' yields the unigram
    一 plus 二三/三四, never the cross-whitespace 一二. Stopped
    bigrams/tokens still consume their position (StopFilter hole)."""

    def __init__(self):
        super().__init__("cjk_default", tokenize,
                         stopwords=frozenset(), emits_overlaps=False)
        self._stop = STOP_SETS["cjk"]

    def analyze_with_positions(self, text):
        from lucene_solr_spark.functions.analysis import (
            MAX_TOKEN_LENGTH,
            TOKEN_PATTERN,
        )
        from lucene_solr_spark.functions.cjk import token_script

        out = []
        state = {"pos": -1, "run": []}
        stop = self._stop
        last_end = -1

        def flush():
            run = state["run"]
            if not run:
                return
            if len(run) == 1:
                state["pos"] += 1
                if run[0] not in stop:
                    out.append((run[0], state["pos"]))
            else:
                for i in range(len(run) - 1):
                    state["pos"] += 1
                    bg = run[i] + run[i + 1]
                    if bg not in stop:
                        out.append((bg, state["pos"]))
            state["run"] = []

        for m in TOKEN_PATTERN.finditer(text):
            tok = m.group(0)
            if len(tok) > MAX_TOKEN_LENGTH:
                continue
            tok = cjk_width_fold(tok.lower())
            if token_script(tok):
                if state["run"] and m.start() != last_end:
                    flush()
                state["run"].extend(tok)
            else:
                flush()
                state["pos"] += 1
                if tok not in stop:
                    out.append((tok, state["pos"]))
            last_end = m.end()
        flush()
        return out

    def analyze(self, text):
        return [t for t, _ in self.analyze_with_positions(text)]

    def tokenize_series_positions(self, texts):
        toks_out, pos_out = [], []
        for text in texts:
            tp = self.analyze_with_positions(text) if text else []
            toks_out.append([t for t, _ in tp])
            pos_out.append([p for _, p in tp])
        return toks_out, pos_out


def _register(name, **kw):
    register_analyzer(AnalyzerSpec(name, tokenize, **kw))


# -- the 30 reference-default chains ----------------------------------------
# ArabicAnalyzer.java:120-129: lower, stop, ArabicNormalization,
# ArabicStem (stop BEFORE normalization — raw lowercased forms)
_register("ar_default", stopwords=STOP_SETS["ar"], stem=arabic_pipeline)
# BulgarianAnalyzer.java:106-115
_register("bg_default", stopwords=STOP_SETS["bg"],
          stem=NAT_STEMMERS["bg"])
# BrazilianAnalyzer.java:124-133
_register("br_default", stopwords=STOP_SETS["br"],
          stem=CLASSIC_STEMMERS["br"])
# CatalanAnalyzer.java:127-136: elision(d/l/m/n/s/t), lower, stop,
# snowball Catalan
_register("ca_default", stopwords=STOP_SETS["ca"],
          pre_stop=_elide(CATALAN_ARTICLES),
          stem=SNOWBALL_STEMMERS["catalan"])
# CJKAnalyzer.java:81-89: CJKWidth, lower, CJKBigram, stop(after!)
register_analyzer(_CJKDefaultSpec())
# CzechAnalyzer.java:122-133
_register("cz_default", stopwords=STOP_SETS["cz"],
          stem=NAT_STEMMERS["cz"])
# DanishAnalyzer.java:110-119
_register("da_default", stopwords=STOP_SETS["da"],
          stem=SNOWBALL_STEMMERS["danish"])
# GermanAnalyzer.java:133-143: lower, stop, GermanNormalization,
# GermanLightStem
_register("de_default", stopwords=STOP_SETS["de"],
          stem=_compose2(LIGHT_STEMMERS["de_light"], german_normalize))
# GreekAnalyzer.java:94-101: GreekLowerCase FIRST, stop (folded
# forms), GreekStem
_register("el_default", lowercase=False, pre_stop=greek_lowercase,
          stopwords=STOP_SETS["el"], stem=greek_stem)
# EnglishAnalyzer.java:91-101: possessive, lower, stop (the standard
# 33 via StandardAnalyzer.STOP_WORDS_SET, :54), Porter
_register("en_default", stopwords=STOPWORDS,
          pre_stop=_en_possessive, stem=porter_stem)
# SpanishAnalyzer.java:109-118
_register("es_default", stopwords=STOP_SETS["es"],
          stem=LIGHT_STEMMERS["es_light"])
# BasqueAnalyzer.java:108-117
_register("eu_default", stopwords=STOP_SETS["eu"],
          stem=SNOWBALL_STEMMERS["basque"])
# PersianAnalyzer.java:117-125 + initReader(:135-136): the
# PersianCharFilter maps ZWNJ (U+200C) to space BEFORE the tokenizer
# (fa/PersianCharFilter.java:38-46), then lower, ArabicNormalization,
# PersianNormalization, stop AFTER normalization, no stem
_register("fa_default", pre=lambda s: s.replace("\u200c", " "),
          pre_stop=persian_pipeline, stopwords=STOP_SETS["fa"])
# FinnishAnalyzer.java:110-119
_register("fi_default", stopwords=STOP_SETS["fi"],
          stem=SNOWBALL_STEMMERS["finnish"])
# FrenchAnalyzer.java:160-170: elision, lower, stop, FrenchLightStem
_register("fr_default", stopwords=STOP_SETS["fr"],
          pre_stop=_elide(FRENCH_ARTICLES),
          stem=LIGHT_STEMMERS["fr_light"])
# IrishAnalyzer.java:136-147: stop(hyphenations), elision(d/m/b),
# IrishLowerCase, stop, snowball Irish
_register("ga_default", lowercase=False, pre_stop=_irish_pre,
          stopwords=STOP_SETS["ga"],
          stem=SNOWBALL_STEMMERS["irish"])
# GalicianAnalyzer.java:108-117 (GalicianStemFilter = full RSLG)
_register("gl_default", stopwords=STOP_SETS["gl"],
          stem=RSLP_STEMMERS["gl_rslp"])
# HindiAnalyzer.java:120-130: lower, IndicNormalization,
# HindiNormalization, stop AFTER normalization, HindiStem
_register("hi_default",
          pre_stop=_compose2(hindi_normalize, indic_normalize),
          stopwords=STOP_SETS["hi"], stem=NAT_STEMMERS["hi"])
# HungarianAnalyzer.java:110-119
_register("hu_default", stopwords=STOP_SETS["hu"],
          stem=SNOWBALL_STEMMERS["hungarian"])
# ArmenianAnalyzer.java:108-117
_register("hy_default", stopwords=STOP_SETS["hy"],
          stem=SNOWBALL_STEMMERS["armenian"])
# IndonesianAnalyzer.java:100-110
_register("id_default", stopwords=STOP_SETS["id"],
          stem=NAT_STEMMERS["id"])
# ItalianAnalyzer.java:130-139
_register("it_default", stopwords=STOP_SETS["it"],
          pre_stop=_elide(ITALIAN_ARTICLES),
          stem=LIGHT_STEMMERS["it_light"])
# LatvianAnalyzer.java:108-117
_register("lv_default", stopwords=STOP_SETS["lv"],
          stem=NAT_STEMMERS["lv"])
# DutchAnalyzer.java:146-156: lower, stop, StemmerOverride(default
# dict), snowball Dutch
_register("nl_default", stopwords=STOP_SETS["nl"], stem=_dutch_stem)
# NorwegianAnalyzer.java:110-119
_register("no_default", stopwords=STOP_SETS["no"],
          stem=SNOWBALL_STEMMERS["norwegian"])
# PortugueseAnalyzer.java:109-118
_register("pt_default", stopwords=STOP_SETS["pt"],
          stem=LIGHT_STEMMERS["pt_light"])
# RomanianAnalyzer.java:113-122
_register("ro_default", stopwords=STOP_SETS["ro"],
          stem=SNOWBALL_STEMMERS["romanian"])
# RussianAnalyzer.java:120-129
_register("ru_default", stopwords=STOP_SETS["ru"],
          stem=SNOWBALL_STEMMERS["russian"])
# SwedishAnalyzer.java:110-119
_register("sv_default", stopwords=STOP_SETS["sv"],
          stem=SNOWBALL_STEMMERS["swedish"])
# TurkishAnalyzer.java:103-112: TurkishLowerCase, stop, snowball
# Turkish
_register("tr_default", lowercase=False, pre_stop=turkish_lowercase,
          stopwords=STOP_SETS["tr"], stem=SNOWBALL_STEMMERS["turkish"])

class _ThaiDefaultSpec(AnalyzerSpec):
    """ThaiAnalyzer default chain (th/ThaiAnalyzer.java:104-113):
    StandardTokenizer → StandardFilter → LowerCase → ThaiWordFilter →
    StopFilter(default th stop set). ThaiWordFilter splits each token
    whose FIRST char is in the THAI block into dictionary words, each
    consuming its own position (posInc 1, ThaiWordFilter.java:87/
    124); the stop check runs AFTER the split, so stopped words leave
    holes inside the run. Needs its own analyze paths because the
    split changes position numbering mid-stream. Segmentation
    delegates to the platform's libthai (functions/thai.py — the same
    external-runtime seam as the reference's JRE BreakIterator,
    DBBI_AVAILABLE analogue included)."""

    def __init__(self):
        super().__init__("th_default", tokenize,
                         stopwords=frozenset(), emits_overlaps=False)
        self._stop = STOP_SETS["th"]

    def analyze_with_positions(self, text):
        from lucene_solr_spark.functions.analysis import (
            MAX_TOKEN_LENGTH,
            TOKEN_PATTERN,
        )
        from lucene_solr_spark.functions.thai import (
            is_thai_leading,
            thai_segment,
        )

        out = []
        pos = -1
        stop = self._stop
        for m in TOKEN_PATTERN.finditer(text):
            tok = m.group(0)
            if len(tok) > MAX_TOKEN_LENGTH:
                pos += 1
                continue
            tok = tok.lower()
            words = (thai_segment(tok) if is_thai_leading(tok)
                     else (tok,))
            for w in words:
                pos += 1
                if w not in stop:
                    out.append((w, pos))
        return out

    def analyze(self, text):
        return [t for t, _ in self.analyze_with_positions(text)]

    def tokenize_series_positions(self, texts):
        toks_out, pos_out = [], []
        for text in texts:
            tp = self.analyze_with_positions(text) if text else []
            toks_out.append([t for t, _ in tp])
            pos_out.append([p for _, p in tp])
        return toks_out, pos_out


register_analyzer(_ThaiDefaultSpec())

LANG_DEFAULTS = tuple(sorted(
    n for n in ("ar bg br ca cjk cz da de el en es eu fa fi fr ga gl "
                "hi hu hy id it lv nl no pt ro ru sv th tr").split()))


# UAX29URLEmailAnalyzer (standard/UAX29URLEmailAnalyzer.java:99-110):
# the URL/EMAIL-aware tokenizer + lowercase + the standard 33-word
# stop set. The scanner delegates to the gated
# uax29_url_email_tokenize (all three reference golden corpora exact
# in tests/test_urlemail.py); oversize handling stays the scanner's
# own maxTokenLength rule, so the spec's max_len check is a no-op
# guard left at the default.
def _urlemail_scanner(text: str):
    from lucene_solr_spark.functions.urlemail import (
        uax29_url_email_tokenize,
    )

    return [t.term for t in uax29_url_email_tokenize(text)]


register_analyzer(AnalyzerSpec(
    "urlemail_default", _urlemail_scanner, lowercase=True,
    stopwords=STOPWORDS))
