"""Multi-word synonyms: SynonymMap building (Solr + Wordnet formats)
and the SynonymFilter overlay application.

Reference semantics mirrored:
  - SynonymMap.Builder (analysis/common/.../synonym/SynonymMap.java):
    dedup of repeated (input, output) pairs; the analyze() contract —
    every side re-analyzed, zero-length tokens / posInc != 1 /
    fully-eliminated sides are errors (:114-143).
  - SolrSynonymParser (SolrSynonymParser.java:30-180): '#'/blank
    comments, escape-aware split on "=>" and "," (the split keeps the
    backslash, unescape() strips it afterwards — kept), > one "=>"
    per line is an error, explicit mappings ignore ``expand``, comma
    lists use it (outputs = inputs when true, first input when
    false), includeOrig always false (the parser's own
    documented-bug comment :119-123), multiple entries merge in add
    order; errors surface as "Invalid synonym rule at line N".
  - WordnetSynonymParser (WordnetSynonymParser.java:35-110): prolog
    s(...) lines grouped by the synset id at columns 2-11, quoted
    word with '' -> ' unescaping, expand pairs / first-word mapping,
    singleton synsets dropped.
  - SynonymFilter (SynonymFilter.java) observable contract, pinned by
    the reference test vectors (TestSynonymMapFilter.testBasic/2,
    TestSolrSynonymParser.testSimple): greedy LONGEST match over
    consecutive tokens; matched inputs are consumed (the next match
    attempt starts after the match); each matched rule's outputs are
    laid out word-by-word OVERLAYING the following positions —
    including positions of later input tokens — and only EXTEND the
    stream past its end (the filter's posLen flattening); per
    position the emission order is original token first (kept unless
    the matched rule says otherwise), then overlay words in match
    start order, then rule add order; first token at a new position
    carries the position, the rest stack at posInc 0.

Spark note: this is an analysis-chain post step — one Python pass per
document inside the same Arrow batch UDFs as every other filter.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

__all__ = [
    "SynonymMapBuilder",
    "parse_solr_synonyms",
    "parse_wordnet_synonyms",
    "synonym_filter_post",
]

Words = Tuple[str, ...]


class SynonymMapBuilder:
    """SynonymMap.Builder: ordered (input -> [outputs]) with optional
    dedup and per-input keepOrig (OR over adds)."""

    def __init__(self, dedup: bool = True):
        self.dedup = dedup
        self._map: Dict[Words, List[Words]] = {}
        self._keep: Dict[Words, bool] = {}

    def add(self, input_words: Sequence[str],
            output_words: Sequence[str], include_orig: bool) -> None:
        i, o = tuple(input_words), tuple(output_words)
        if not i or not o:
            raise ValueError("empty side")
        outs = self._map.setdefault(i, [])
        if not (self.dedup and o in outs):
            outs.append(o)
        self._keep[i] = self._keep.get(i, False) or include_orig

    def build(self) -> "SynonymMap":
        return SynonymMap(dict(self._map), dict(self._keep))


class SynonymMap:
    def __init__(self, mapping: Dict[Words, List[Words]],
                 keep: Dict[Words, bool]):
        self.mapping = mapping
        self.keep = keep
        self.max_len = max((len(k) for k in mapping), default=0)


def _default_analyze(text: str) -> List[str]:
    return text.lower().split()


def _analyze_side(analyze: Callable[[str], List[str]],
                  text: str) -> Words:
    # SynonymMap.analyze (:114-143): posInc != 1 cannot occur in a
    # plain token list, but elimination and zero-length tokens can
    toks = analyze(text)
    if any(len(t) == 0 for t in toks):
        raise ValueError(
            f"term: {text} analyzed to a zero-length token")
    if not toks:
        raise ValueError(
            f"term: {text} was completely eliminated by analyzer")
    return tuple(toks)


def _split(s: str, separator: str) -> List[str]:
    # SolrSynonymParser.split (:132-161) — backslash retained here
    out: List[str] = []
    sb: List[str] = []
    pos, end = 0, len(s)
    while pos < end:
        if s.startswith(separator, pos):
            if sb:
                out.append("".join(sb))
                sb = []
            pos += len(separator)
            continue
        ch = s[pos]
        pos += 1
        if ch == "\\":
            sb.append(ch)
            if pos >= end:
                break
            ch = s[pos]
            pos += 1
        sb.append(ch)
    if sb:
        out.append("".join(sb))
    return out


def _unescape(s: str) -> str:
    # :163-178
    if "\\" not in s:
        return s
    sb: List[str] = []
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i < len(s) - 1:
            i += 1
            sb.append(s[i])
        else:
            sb.append(ch)
        i += 1
    return sb and "".join(sb) or ""


def parse_solr_synonyms(
    text: str, dedup: bool = True, expand: bool = True,
    analyze: Optional[Callable[[str], List[str]]] = None,
) -> SynonymMap:
    """SolrSynonymParser.add/addInternal (:66-130)."""
    analyze = analyze or _default_analyze
    b = SynonymMapBuilder(dedup)
    for lineno, line in enumerate(text.splitlines(), 1):
        if not line or line[0] == "#":
            continue
        try:
            sides = _split(line, "=>")
            if len(sides) > 1:
                if len(sides) != 2:
                    raise ValueError(
                        "more than one explicit mapping specified on "
                        "the same line")
                inputs = [_analyze_side(analyze, _unescape(p).strip())
                          for p in _split(sides[0], ",")]
                outputs = [_analyze_side(analyze, _unescape(p).strip())
                           for p in _split(sides[1], ",")]
            else:
                inputs = [_analyze_side(analyze, _unescape(p).strip())
                          for p in _split(line, ",")]
                outputs = inputs if expand else [inputs[0]]
            for i in inputs:
                for o in outputs:
                    b.add(i, o, False)
        except ValueError as e:
            raise ValueError(
                f"Invalid synonym rule at line {lineno}") from e
    return b.build()


def parse_wordnet_synonyms(
    text: str, dedup: bool = True, expand: bool = True,
    analyze: Optional[Callable[[str], List[str]]] = None,
) -> SynonymMap:
    """WordnetSynonymParser.add (:45-110)."""
    analyze = analyze or _default_analyze
    b = SynonymMapBuilder(dedup)

    def flush(synset: List[Words]) -> None:
        if len(synset) <= 1:
            return
        if expand:
            for i in synset:
                for j in synset:
                    b.add(i, j, False)
        else:
            for i in synset:
                b.add(i, synset[0], False)

    last_id = ""
    synset: List[Words] = []
    for lineno, line in enumerate(text.splitlines(), 1):
        if not line.strip():
            continue
        try:
            syn_id = line[2:11]
            if syn_id != last_id:
                flush(synset)
                synset = []
            start = line.index("'") + 1
            end = line.rindex("'")
            word = line[start:end].replace("''", "'")
            synset.append(_analyze_side(analyze, word))
            last_id = syn_id
        except ValueError as e:
            raise ValueError(
                f"Invalid synonym rule at line {lineno}") from e
    flush(synset)
    return b.build()


def synonym_filter_post(syn_map: SynonymMap):
    """SynonymFilter overlay application over a (token, pos) stream
    (greedy longest match, consumed inputs, overlay emission — see
    module docstring for the pinned contract)."""

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        if not tp or not syn_map.mapping:
            return list(tp)
        tokens = [t for t, _p in tp]
        positions = [p for _t, p in tp]
        n = len(tokens)
        # overlay[k] = words stacked at output slot k (slots align
        # with input token indexes and extend past the end)
        overlay: Dict[int, List[str]] = {}
        kept = [True] * n
        i = 0
        while i < n:
            match_len = 0
            for ln in range(min(syn_map.max_len, n - i), 0, -1):
                if tuple(tokens[i:i + ln]) in syn_map.mapping:
                    match_len = ln
                    break
            if match_len == 0:
                i += 1
                continue
            key = tuple(tokens[i:i + match_len])
            if not syn_map.keep.get(key, False):
                for j in range(i, i + match_len):
                    kept[j] = False
            for out in syn_map.mapping[key]:
                for s, w in enumerate(out):
                    overlay.setdefault(i + s, []).append(w)
            i += match_len

        # slot -> position: input slots keep their stream positions;
        # slots past the end extend by +1 per slot (the filter's
        # beyond-end emission)
        def slot_pos(k: int) -> int:
            if k < n:
                return positions[k]
            return positions[-1] + (k - (n - 1))

        out_stream: List[Tuple[str, int]] = []
        max_slot = max([n - 1] + list(overlay))
        for k in range(max_slot + 1):
            if k < n and kept[k]:
                out_stream.append((tokens[k], slot_pos(k)))
                for w in overlay.get(k, ()):
                    out_stream.append((w, slot_pos(k)))
            else:
                words = overlay.get(k, ())
                for w in words:
                    out_stream.append((w, slot_pos(k)))
        return out_stream

    return post


def expand_graph_query(tokens, syn_map: SynonymMap, slop: int = 0):
    """Query-time multi-word synonym GRAPH expansion — the reference
    QueryBuilder's graph-token-stream phrase handling (later Lucene's
    QueryBuilder.analyzeGraphPhrase builds a SpanNearQuery whose
    elements are SpanOrQuery alternatives; this engine had it as a
    documented non-goal until r3): walk the analyzed query tokens with
    the SAME greedy longest-match the index-side SynonymFilter uses,
    and replace each matched input with a SpanOr over [original
    sequence if keepOrig] + every mapped output sequence (multi-word
    sequences become exact ordered SpanNear chains). The elements
    join under an outer ordered SpanNear with the phrase's slop, so a
    two-word synonym rule lets a phrase query match documents that
    phrase it the other way.

    Returns a span AST for IndexSearcher.search_spans."""
    from lucene_solr_spark.search.spans import SpanNear, SpanOr, SpanTerm

    def seq_node(words):
        if len(words) == 1:
            return SpanTerm(words[0])
        return SpanNear(tuple(SpanTerm(w) for w in words),
                        slop=0, in_order=True)

    elements = []
    i, n = 0, len(tokens)
    while i < n:
        match_len = 0
        for ln in range(min(syn_map.max_len, n - i), 0, -1):
            if tuple(tokens[i:i + ln]) in syn_map.mapping:
                match_len = ln
                break
        if match_len == 0:
            elements.append(SpanTerm(tokens[i]))
            i += 1
            continue
        key = tuple(tokens[i:i + match_len])
        alts = []
        if syn_map.keep.get(key, False):
            alts.append(seq_node(key))
        alts.extend(seq_node(out) for out in syn_map.mapping[key])
        elements.append(alts[0] if len(alts) == 1
                        else SpanOr(tuple(alts)))
        i += match_len
    if not elements:
        raise ValueError("empty query after analysis")
    if len(elements) == 1:
        return elements[0]
    return SpanNear(tuple(elements), slop=slop, in_order=True)
