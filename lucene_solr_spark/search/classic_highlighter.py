"""Classic Highlighter re-expression (lucene/highlighter/src/java/
org/apache/lucene/search/highlight/ — the DEFAULT Solr highlighter,
distinct from the Postings and FastVector highlighters already in
postings_highlighter.py / fvh.py).

Reference walk, kept rule-for-rule:

1. Token stream: the analyzer chain over the stored text
   (Highlighter.getBestFragment(Analyzer,...) re-analyzes — there are
   no term vectors here either; the engine's stored-fields surface is
   the corpus table). Stop-filtered tokens never reach the stream, so
   their characters flow through as interstitial text, exactly like
   the reference. Tokens whose startOffset passes
   maxDocCharsToAnalyze (default 50*1024, Highlighter.java:38) stop
   the walk; a token whose offsets exceed the text raises
   InvalidTokenOffsetsException (Highlighter.java:224-231).
2. TokenGroup (TokenGroup.java:30-83): tokens overlapping in char
   offsets accumulate into one group (isDistinct():
   ``startOffset >= group.endOffset``); the group's match span is the
   min/max span of its POSITIVE-scoring tokens (addToken :49-76), and
   the whole span is wrapped when total score > 0
   (SimpleHTMLFormatter.java:46-58, default tags <B>/</B>).
3. Fragmenter: SimpleFragmenter.isNewFragment()
   (SimpleFragmenter.java:61-67) — new fragment when the CURRENT
   token's endOffset reaches fragmentSize * numFrags; the check runs
   only when a group is flushed (Highlighter.java:245-254), and the
   flushed group's markup lands in the PREVIOUS fragment while the
   current token's score accrues to the new one, as in the reference.
4. Scorer: QueryTermScorer (QueryTermScorer.java:120-152) — fragment
   score = sum of the weights of the DISTINCT query terms present in
   the fragment (uniqueTermsInFragment resets per fragment); a
   duplicated weighted term keeps the highest weight (:80-93).
   Sums run in float32 like the Java float accumulator.
5. Selection: FragmentQueue of size maxNumFragments
   (Highlighter.java:517-531 — lessThan: score, tie broken by LOWER
   fragNum winning), popped into descending order; then
   mergeContiguousFragments (Highlighter.java:367-436) collapses
   selected fragments adjacent in the markup text (follows():
   textStartPos == other.textEndPos) keeping max score; only
   fragments with score > 0 are returned (Highlighter.java:162-168).

Execution shape: like the other two highlighters, this runs on the
TOP-K HITS ONLY — one Arrow mapInPandas over k joined rows — so
corpus scale is irrelevant to the operator; the expensive part stays
the search that produced the hits.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_FRAGMENT_SIZE = 100        # SimpleFragmenter.java:28
DEFAULT_MAX_CHARS = 50 * 1024      # Highlighter.java:38
PRE_TAG = "<B>"                    # SimpleHTMLFormatter defaults
POST_TAG = "</B>"


class InvalidTokenOffsetsError(ValueError):
    """InvalidTokenOffsetsException (Highlighter.java:224-231)."""


def token_stream(text: str, analyzer) -> List[Tuple[str, int, int, int]]:
    """(analyzed_term, position, start_offset, end_offset) for every
    token that survives the chain (255-cap drop, lowercase, stop
    filter) — the same re-derivation as fvh._term_stack; positions
    advance through stop holes exactly like the chain's position
    increments (QueryScorer.getTokenScore:148 accumulates them).
    Analyzers with a ``pre_offsets`` charfilter tokenize the FILTERED
    text with offsets corrected back to the original
    (BaseCharFilter.correct port), so markup built from these offsets
    slices the raw stored text exactly."""
    from lucene_solr_spark.functions.analysis import (
        MAX_TOKEN_LENGTH,
        TOKEN_PATTERN,
    )

    stopwords = getattr(analyzer, "stopwords", frozenset())
    lowercase = getattr(analyzer, "lowercase", True)
    pre_off = getattr(analyzer, "pre_offsets", None)
    omap = None
    if pre_off is not None:
        text, omap = pre_off(text)
    out = []
    pos = -1
    for m in TOKEN_PATTERN.finditer(text):
        tok = m.group(0)
        pos += 1
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        t = tok.lower() if lowercase else tok
        if t in stopwords:
            continue
        s, e = m.start(), m.end()
        if omap is not None:
            s, e = omap.correct(s), omap.correct(e)
        out.append((t, pos, s, e))
    return out


def query_term_weights(searcher, query_text: str,
                       prohibited: bool = False,
                       idf_weighted: bool = False) -> Dict[str, float]:
    """QueryTermExtractor port (highlight/QueryTermExtractor.java:
    46-108) over the engine's parsed boolean surface: term -> weight
    for QueryTermScorer. Every non-prohibited clause contributes its
    analyzed terms at the clause boost (phrase clauses contribute
    every phrase term — extractTerms); MUST_NOT terms only with
    ``prohibited=True``. Duplicated terms keep the HIGHEST weight
    (QueryTermScorer.java:80-93). ``idf_weighted`` multiplies each
    weight by the DefaultSimilarity idf
    f32(ln(maxDoc/(df+1)) + 1) from the searcher's term stats
    (getIdfWeightedTerms :60-78)."""
    import math

    from lucene_solr_spark.search.queryparser import parse_query

    clauses = parse_query(query_text, analyzer=searcher.analyzer)
    out: Dict[str, float] = {}
    for c in clauses:
        if c.occur == "not" and not prohibited:
            continue
        for t in c.terms:
            w = float(getattr(c, "boost", 1.0) or 1.0)
            if t not in out or w > out[t]:
                out[t] = w
    if idf_weighted and out:
        dfs = searcher._lookup_dfs(sorted(out))
        max_doc = searcher.max_doc
        for t in list(out):
            df_t = dfs.get(t, 0)
            idf = np.float32(
                math.log(max_doc / float(df_t + 1)) + 1.0)
            out[t] = float(np.float32(out[t] * idf))
    return out


class WeightedSpanTerm:
    """WeightedSpanTerm.java: weight + optional position sensitivity
    with inclusive [start, end] position spans (checkPosition
    :50-66)."""

    __slots__ = ("weight", "position_sensitive", "spans")

    def __init__(self, weight: float, position_sensitive: bool = False):
        self.weight = float(weight)
        self.position_sensitive = position_sensitive
        self.spans: List[Tuple[int, int]] = []

    def check_position(self, pos: int) -> bool:
        return any(s <= pos <= e for s, e in self.spans)


def extract_weighted_span_terms(
    clauses, stack: List[Tuple[str, int, int, int]],
) -> Dict[str, WeightedSpanTerm]:
    """WeightedSpanTermExtractor.extract
    (WeightedSpanTermExtractor.java:93-253) over ONE doc's token
    stack — the reference runs the converted SpanNearQuery against a
    per-doc MemoryIndex (:330-353); here the phrase occurrences are
    matched directly on the position-annotated stack.

    ``clauses``: sequence of ("term", term, weight) |
    ("phrase", val, weight) | ("phrase", val, weight, slop), where
    ``val`` is a tuple of terms (consecutive query positions) or a
    tuple of (term, query_position) pairs (PhraseQuery.add(term, pos)
    gaps — stop holes). Processed in clause order with the reference
    merge rules: a term clause PUTs unconditionally
    (extractWeightedTerms :330-341 overwrites); a phrase clause's
    terms get positionSensitive entries whose spans are the matched
    occurrences (spans.start(), spans.end()-1 inclusive — :290-293),
    or only add spans when the term already exists (:302-318).

    Phrase -> SpanNearQuery conversion kept rule-for-rule
    (WeightedSpanTermExtractor.java:102-136): the LARGEST position
    increment between consecutive phrase terms is added to the slop
    when > 1, and in-order is required only when the ADJUSTED slop is
    0 — so an exact phrase with stop holes highlights as an UNORDERED
    near query, exactly like the reference. The spans come from the
    engine's NearSpansOrdered/Unordered ports (search/spans.py) run
    over this doc's position stack — the per-doc MemoryIndex run of
    the reference (:330-353) without the index."""
    from lucene_solr_spark.search.spans import (
        SpanNear,
        SpanTerm,
        build_spans,
    )

    pos_by_term: Dict[str, List[int]] = {}
    for t, p, _, _ in stack:
        pos_by_term.setdefault(t, []).append(p)
    arr_by_term = {t: np.asarray(ps, dtype=np.int64)
                   for t, ps in pos_by_term.items()}
    _empty = np.empty(0, dtype=np.int64)

    terms: Dict[str, WeightedSpanTerm] = {}
    for clause in clauses:
        kind, val, weight = clause[0], clause[1], clause[2]
        if kind == "term":
            terms[val] = WeightedSpanTerm(weight)
            continue
        if kind != "phrase":
            raise ValueError(f"unknown clause kind {kind!r}")
        slop = int(clause[3]) if len(clause) > 3 else 0
        if val and isinstance(val[0], (tuple, list)):
            seq = tuple(t for t, _ in val)
            poss = [int(p) for _, p in val]
        else:
            seq = tuple(val)
            poss = list(range(len(seq)))
        largest_inc = max(
            (poss[i] - poss[i - 1] for i in range(1, len(poss))),
            default=0)
        if largest_inc > 1:          # add largest increment (:112-127)
            slop += largest_inc
        in_order = slop == 0         # checked AFTER adjustment (:131-133)
        node = SpanNear(tuple(SpanTerm(t) for t in seq), slop=slop,
                        in_order=in_order)
        it = build_spans(node, lambda t: arr_by_term.get(t, _empty))
        spans = []
        while it.next():
            spans.append((it.start, it.end - 1))
        if not spans:
            continue        # no spans found -> term not added (:297-300)
        for t in set(seq):
            wst = terms.get(t)
            if wst is None:
                wst = WeightedSpanTerm(weight, position_sensitive=True)
                wst.spans.extend(spans)
                terms[t] = wst
            else:
                wst.spans.extend(spans)
    return terms


def simple_html_encoder(plain: str) -> str:
    """SimpleHTMLEncoder.htmlEncode (SimpleHTMLEncoder.java:37-81):
    escape " & < > and every char >= 128 as a decimal entity; all
    other ASCII passes through. The Encoder seam applies to token
    text, interstitial text and the trailing tail
    (Highlighter.java:237-290) — Solr's hl.encoder=html."""
    if not plain:
        return ""
    out = []
    for ch in plain:
        if ch == '"':
            out.append("&quot;")
        elif ch == "&":
            out.append("&amp;")
        elif ch == "<":
            out.append("&lt;")
        elif ch == ">":
            out.append("&gt;")
        elif ch < "\x80":
            out.append(ch)
        else:
            out.append(f"&#{ord(ch)};")
    return "".join(out)


ENCODERS = {
    "default": None,               # DefaultEncoder: identity
    "html": simple_html_encoder,   # SimpleHTMLEncoder
}


class _TokenGroup:
    """TokenGroup.java state for one group of overlapping tokens."""

    __slots__ = ("num", "start", "end", "match_start", "match_end", "tot")

    def __init__(self):
        self.num = 0
        self.start = self.end = 0
        self.match_start = self.match_end = 0
        self.tot = np.float32(0.0)

    def add(self, s: int, e: int, score: float):
        # TokenGroup.addToken (TokenGroup.java:49-76)
        if self.num == 0:
            self.start = self.match_start = s
            self.end = self.match_end = e
            self.tot = np.float32(self.tot + np.float32(score))
        else:
            self.start = min(self.start, s)
            self.end = max(self.end, e)
            if score > 0:
                if self.tot == 0:
                    self.match_start, self.match_end = s, e
                else:
                    self.match_start = min(self.match_start, s)
                    self.match_end = max(self.match_end, e)
                self.tot = np.float32(self.tot + np.float32(score))
        self.num += 1

    def distinct(self, s: int) -> bool:
        return s >= self.end       # TokenGroup.isDistinct (:78-80)


def _hex_to_int(h: str) -> int:
    """GradientFormatter.hexToInt (GradientFormatter.java:209-230):
    two's-complement hex parse, <= 16 chars."""
    if len(h) > 16:
        raise ValueError("hex string too long")
    v = 0
    for ch in h:
        d = int(ch, 16)
        v = ((v << 4) | d) & 0xFFFFFFFF
    if v >= 0x80000000:
        v -= 0x100000000
    return v


_HEX_DIGITS = "0123456789ABCDEF"


def _int_to_hex(i: int) -> str:
    return _HEX_DIGITS[(i & 0xF0) >> 4] + _HEX_DIGITS[i & 0x0F]


class GradientFormatter:
    """GradientFormatter.java: score-graded <font> markup. Color
    channels interpolate from min(cMin, cMax) upward by
    |cMin - cMax| * min(score, maxScore)/maxScore — the reference's
    direction-insensitive getColorVal (:173-183) kept verbatim.
    Groups with total score exactly 0 pass through unformatted
    (:120-129 — note the == 0 gate, not <= 0)."""

    _open, _close = "<font ", "</font>"

    def __init__(self, max_score: float, min_fg: Optional[str] = None,
                 max_fg: Optional[str] = None, min_bg: Optional[str] = None,
                 max_bg: Optional[str] = None):
        self.max_score = float(max_score)
        self.fg = self._parse_pair(min_fg, max_fg, "ForegroundColor")
        self.bg = self._parse_pair(min_bg, max_bg, "BackgroundColor")

    @staticmethod
    def _parse_pair(lo, hi, what):
        if lo is None or hi is None:
            return None
        for c in (lo, hi):
            if len(c) != 7:
                raise ValueError(
                    f"min{what} is not 7 bytes long eg a hex RGB value "
                    "such as #FFFFFF")
        return tuple(
            (_hex_to_int(lo[i:i + 2]), _hex_to_int(hi[i:i + 2]))
            for i in (1, 3, 5))

    def _color(self, pair, score: float) -> str:
        out = "#"
        for cmin, cmax in pair:
            if cmin == cmax:
                out += _int_to_hex(cmin)
                continue
            scale = abs(cmin - cmax)
            rel = min(self.max_score, score) / self.max_score
            out += _int_to_hex(min(cmin, cmax) + int(scale * rel))
        return out

    def __call__(self, token_text: str, total: float) -> str:
        if total == 0:
            return token_text
        sb = self._open
        if self.fg is not None:
            sb += self._fg_part(total)
        if self.bg is not None:
            sb += self._bg_part(total)
        return sb + ">" + token_text + self._close

    def _fg_part(self, score):
        return f'color="{self._color(self.fg, score)}" '

    def _bg_part(self, score):
        return f'bgcolor="{self._color(self.bg, score)}" '


class SpanGradientFormatter(GradientFormatter):
    """SpanGradientFormatter.java: same gradient math, CSS <span>
    markup (:39-66)."""

    _open, _close = '<span style="', "</span>"

    def __call__(self, token_text: str, total: float) -> str:
        if total == 0:
            return token_text
        sb = self._open
        if self.fg is not None:
            sb += f"color: {self._color(self.fg, total)}; "
        if self.bg is not None:
            sb += f"background: {self._color(self.bg, total)}; "
        return sb + '">' + token_text + self._close


class SimpleFragmenterState:
    """SimpleFragmenter.java:61-67 — boundary when the current token's
    endOffset reaches fragmentSize * numFrags (absolute multiples)."""

    def __init__(self, size: int, weights, text: str):
        self.size = size
        self.n = 1

    def is_new(self, term: str, pos_inc: int, end: int) -> bool:
        new = end >= self.size * self.n
        if new:
            self.n += 1
        return new


class NullFragmenterState:
    """NullFragmenter.java — the whole text is one fragment."""

    def __init__(self, size, weights, text):
        pass

    def is_new(self, term, pos_inc, end) -> bool:
        return False


class GapFragmenterState:
    """Solr LuceneGapFragmenter (solr/highlight/GapFragmenter.java:
    62-104, hl.fragmenter=gap — Solr's DEFAULT): boundary when
    endOffset passes the LAST boundary's endOffset + fragsize
    (relative, unlike SimpleFragmenter's absolute multiples), or on a
    position increment > 50 (multi-valued-field gap)."""

    INCREMENT_THRESHOLD = 50       # GapFragmenter.java:67

    def __init__(self, size: int, weights, text: str):
        self.size = size
        self.frag_offset = 0

    def is_new(self, term, pos_inc: int, end: int) -> bool:
        new = (end >= self.frag_offset + self.size
               or pos_inc > self.INCREMENT_THRESHOLD)
        if new:
            self.frag_offset = end
        return new


class SpanFragmenterState:
    """SimpleSpanFragmenter.java:60-95 — literal port, including the
    reference's position accounting: isNewFragment() runs only at
    group-flush events (Highlighter.java:245), so the fragmenter's
    ``position`` never accumulates the FIRST token's increment and
    trails the scorer's position by one on plain streams; the
    protected window is therefore the span shifted one token right,
    exactly as the Java behaves. Requires QueryScorer weights
    (WeightedSpanTerm values); plain-float weights never arm the
    wait."""

    def __init__(self, size: int, weights, text: str):
        self.size = size
        self.weights = weights
        self.text_size = len(text)
        self.n = 1
        self.position = -1
        self.wait = -1

    def is_new(self, term: str, pos_inc: int, end: int) -> bool:
        self.position += pos_inc
        if self.wait == self.position:
            self.wait = -1
        elif self.wait != -1:
            return False
        wst = self.weights.get(term)
        if isinstance(wst, WeightedSpanTerm):
            for s, e in wst.spans:
                if s == self.position:
                    self.wait = e + 1
                    break
        new = (end >= self.size * self.n
               and (self.text_size - end) >= (self.size >> 1))
        if new:
            self.n += 1
        return new


class RegexFragmenterState:
    """Solr LuceneRegexFragmenter (solr/highlight/RegexFragmenter.java:
    112-290, hl.fragmenter=regex): fragments try to END at "hotspot"
    boundaries — the start/end offsets of regex matches over the raw
    text (default pattern ``[-\\w ,\\n"']{20,200}``, pre-scanned up to
    maxAnalyzedChars) — bending the target size by +/- slop. Ported
    rule-for-rule, keeping the f32 bound arithmetic
    ((int)((1.0f - slop) * target), :236 and :254) and the
    binarySearch quirk (:259-261 — a miss maps to insertionPoint + 1,
    SKIPPING one hotspot). The reference's hotspot walk can index one
    past the array when every remaining hotspot is below minOffset
    (:271-275); that path falls back to currentOffset + target here
    (documented guard, same as its no-more-hotspots case). Large
    position increments (> incrementGapThreshold) force a boundary
    like GapFragmenter."""

    DEFAULT_PATTERN = "[-\\w ,\\n\"']{20,200}"
    DEFAULT_INCREMENT_GAP = 50     # RegexFragmenter.java:197
    DEFAULT_SLOP = 0.6
    DEFAULT_MAX_ANALYZED_CHARS = 10000

    def __init__(self, size: int, weights, text: str,
                 increment_gap: int = DEFAULT_INCREMENT_GAP,
                 slop: float = DEFAULT_SLOP,
                 max_analyzed_chars: int = DEFAULT_MAX_ANALYZED_CHARS,
                 pattern: Optional[str] = None):
        import re as _re

        self.target = size
        self.inc_gap = increment_gap
        self.slop = slop
        hs = []
        cur = 0
        for m in _re.finditer(pattern or self.DEFAULT_PATTERN, text):
            if cur >= max_analyzed_chars:
                break
            hs.append(m.start())
            hs.append(m.end())
            cur = m.end()
        hs.sort()
        self.hotspots = hs
        self.cur = 0
        self.tgt = 0     # field-default initial value (:137)
        self.n = 1

    def is_new(self, term, pos_inc: int, end: int) -> bool:
        from bisect import bisect_left

        min_len = int(np.float32(
            np.float32(1.0) - np.float32(self.slop)) * self.target)
        if pos_inc > self.inc_gap:
            new = True
        elif end - self.cur < min_len:
            new = False
        elif self.tgt > 0:
            new = end > self.tgt
        else:
            min_off = self.cur + min_len
            max_off = int(np.float32(self.cur) + np.float32(
                np.float32(np.float32(1.0) + np.float32(self.slop))
                * self.target))
            hs = self.hotspots
            ins = bisect_left(hs, end)
            if ins < len(hs) and hs[ins] == end:
                i = ins
            else:
                i = ins + 1          # Java -(-(ins+1)) quirk
            if i >= len(hs) or hs[i] > max_off:
                self.tgt = self.cur + self.target
            else:
                goal = hs[i]
                while goal < min_off:
                    i += 1
                    if i >= len(hs):
                        goal = None  # OOB guard (see docstring)
                        break
                    goal = hs[i]
                self.tgt = (goal if goal is not None and goal <= max_off
                            else self.cur + self.target)
            new = end > self.tgt
        if new:
            self.n += 1
            self.cur = end
            self.tgt = -1
        return new


FRAGMENTERS = {
    "simple": SimpleFragmenterState,
    "null": NullFragmenterState,
    "gap": GapFragmenterState,
    "span": SpanFragmenterState,
    "regex": RegexFragmenterState,
}


class TextFragment:
    """TextFragment.java — positions are in MARKUP-text coordinates."""

    __slots__ = ("start", "end", "score", "num")

    def __init__(self, start: int, num: int):
        self.start = start
        self.end = start
        self.score = np.float32(0.0)
        self.num = num

    def follows(self, other: "TextFragment") -> bool:
        return self.start == other.end          # TextFragment.java:63-66

    def merge(self, frag2: "TextFragment"):
        self.end = frag2.end                    # TextFragment.java:52-56
        self.score = max(self.score, frag2.score)


def get_best_text_fragments(
    text: str,
    weights: Dict[str, float],
    analyzer,
    fragment_size: int = DEFAULT_FRAGMENT_SIZE,
    max_num_fragments: int = 1,
    merge_contiguous: bool = True,
    pre: str = PRE_TAG,
    post: str = POST_TAG,
    max_chars: int = DEFAULT_MAX_CHARS,
    fragmenter: str = "simple",
    formatter=None,
    encoder=None,
) -> List[Tuple[str, float, int]]:
    """Highlighter.getBestTextFragments for ONE doc (pure function —
    unit-testable and reused by the Spark kernel). ``weights`` maps
    analyzed term -> float weight (QueryTermScorer) or
    ``WeightedSpanTerm`` (QueryScorer — position-sensitive terms
    score only inside a matched span, QueryScorer.java:147-172).
    ``encoder``: None (DefaultEncoder passthrough), a name from
    ENCODERS ('html' = SimpleHTMLEncoder), or a str -> str callable —
    applied to token, interstitial and trailing text before markup
    (Highlighter.java:237-290).
    Returns [(fragment_markup, score, frag_num)] in queue order."""
    if isinstance(encoder, str):
        encoder = ENCODERS[encoder]
    enc = encoder if encoder is not None else (lambda t: t)
    parts: List[str] = []
    out_len = 0

    def append(piece: str):
        nonlocal out_len
        parts.append(piece)
        out_len += len(piece)

    frags: List[TextFragment] = []
    cur = TextFragment(0, 0)
    frags.append(cur)
    # QueryTermScorer.startFragment state
    seen: set = set()
    total = np.float32(0.0)
    frag_cls = (FRAGMENTERS[fragmenter] if isinstance(fragmenter, str)
                else fragmenter)     # callable factory (e.g. partial)
    frag_state = frag_cls(fragment_size, weights, text)
    last_end = 0
    prev_pos = -1
    group: Optional[_TokenGroup] = None

    def flush(g: _TokenGroup):
        nonlocal last_end
        token_txt = enc(text[g.match_start:g.match_end])
        if formatter is not None:
            marked = formatter(token_txt, float(g.tot))
        else:   # SimpleHTMLFormatter (<= 0 gate, :46-49)
            marked = (pre + token_txt + post) if g.tot > 0 else token_txt
        if g.match_start > last_end:
            append(enc(text[last_end:g.match_start]))
        append(marked)
        last_end = max(g.match_end, last_end)

    for term, pos, s, e in token_stream(text, analyzer):
        if s >= max_chars:
            break
        if e > len(text) or s > len(text):
            raise InvalidTokenOffsetsError(
                f"Token {term} exceeds length of provided text "
                f"sized {len(text)}")
        if group is not None and group.num > 0 and group.distinct(s):
            flush(group)
            group = None
            # Fragmenter.isNewFragment on the CURRENT token's attrs
            if frag_state.is_new(term, pos - prev_pos, e):
                cur.score = total
                cur.end = out_len
                cur = TextFragment(out_len, len(frags))
                frags.append(cur)
                seen = set()
                total = np.float32(0.0)
        # QueryTermScorer.getTokenScore (:120-136) / QueryScorer
        # position check (:147-172)
        w = weights.get(term)
        score = 0.0
        if isinstance(w, WeightedSpanTerm):
            if w.position_sensitive and not w.check_position(pos):
                w = None
            else:
                w = w.weight
        if w is not None:
            if term not in seen:
                total = np.float32(total + np.float32(w))
                seen.add(term)
            score = float(w)
        if group is None:
            group = _TokenGroup()
        group.add(s, e, score)
        prev_pos = pos

    cur.score = total
    if group is not None and group.num > 0:
        flush(group)
    # trailing text beyond the last token (Highlighter.java:280-291)
    if last_end < len(text) and len(text) <= max_chars:
        append(enc(text[last_end:]))
    cur.end = out_len
    markup = "".join(parts)

    # FragmentQueue: top maxNumFragments by (score desc, fragNum asc)
    selected = sorted(frags, key=lambda f: (-f.score, f.num))
    selected = selected[:max_num_fragments]

    if merge_contiguous and len(selected) > 1:
        # literal port of the mergeContiguousFragments double loop
        # (Highlighter.java:367-436) so slot-survival order matches
        arr: List[Optional[TextFragment]] = list(selected)
        merging = True
        while merging:
            merging = False
            for i in range(len(arr)):
                if arr[i] is None:
                    continue
                for x in range(len(arr)):
                    if arr[x] is None:
                        continue
                    if arr[i] is None:
                        break
                    frag1 = frag2 = None
                    if arr[i].follows(arr[x]):
                        frag1, f1n = arr[x], x
                        frag2, f2n = arr[i], i
                    elif arr[x].follows(arr[i]):
                        frag1, f1n = arr[i], i
                        frag2, f2n = arr[x], x
                    if frag1 is not None:
                        if frag1.score > frag2.score:
                            best, worst = f1n, f2n
                        else:
                            best, worst = f2n, f1n
                        frag1.merge(frag2)
                        arr[worst] = None
                        arr[best] = frag1
                        merging = True
        selected = [f for f in arr if f is not None]

    return [(markup[f.start:f.end], float(f.score), f.num)
            for f in selected if f.score > 0]


def classic_highlight(
    searcher,
    store: DataFrame,
    query_text: str,
    weights: Optional[Dict[str, float]] = None,
    text_col: str = "content",
    k: int = 10,
    fragment_size: int = DEFAULT_FRAGMENT_SIZE,
    max_num_fragments: int = 1,
    merge_contiguous: bool = True,
    pre: str = PRE_TAG,
    post: str = POST_TAG,
    clauses=None,
    hits: Optional[DataFrame] = None,
    fragmenter: str = "simple",
    analyzer=None,
    encoder=None,
    **search_kw,
) -> DataFrame:
    """Top-k hits of ``query_text`` with classic-Highlighter fragments
    over their stored text. Scorer selection mirrors the reference:
    pass ``weights`` (term -> weight) for QueryTermScorer, or
    ``clauses`` ([("term", t, w) | ("phrase", val, w[, slop])] with
    ``val`` a tuple of terms or of (term, query_position) pairs) for
    the position-sensitive QueryScorer (hl.usePhraseHighlighter) —
    span extraction runs PER DOC like the reference's per-doc
    MemoryIndex (WeightedSpanTermExtractor.java:330-353). Returns
    (doc_id, score, fragments array<string>,
    frag_scores array<float>)."""
    import pandas as pd

    if weights is not None and clauses is not None:
        raise ValueError("pass at most one of weights= or clauses=")
    if weights is None and clauses is None:
        # Highlighter(new QueryTermScorer(query)) default: weights
        # extracted from the query itself (QueryTermExtractor)
        weights = query_term_weights(searcher, query_text)

    if hits is None:
        hits = searcher.search(query_text, k=k, **search_kw)
    joined = hits.join(store.select("doc_id", text_col), "doc_id")
    if analyzer is None:
        analyzer = searcher.analyzer
    w = ({str(t): float(v) for t, v in weights.items()}
         if weights is not None else None)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            frag_txt, frag_sc = [], []
            for t in pdf[text_col]:
                if w is not None:
                    doc_w = w
                else:
                    doc_w = extract_weighted_span_terms(
                        clauses, token_stream(t, analyzer))
                res = get_best_text_fragments(
                    t, doc_w, analyzer, fragment_size=fragment_size,
                    max_num_fragments=max_num_fragments,
                    merge_contiguous=merge_contiguous, pre=pre, post=post,
                    fragmenter=fragmenter, encoder=encoder)
                frag_txt.append([r[0] for r in res])
                frag_sc.append([r[1] for r in res])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "score": pdf["score"],
                "fragments": frag_txt,
                "frag_scores": frag_sc,
            })

    out = joined.mapInPandas(
        kernel,
        schema=("doc_id long, score float, fragments array<string>, "
                "frag_scores array<float>"))
    return out.orderBy(F.desc("score"), F.asc("doc_id"))
