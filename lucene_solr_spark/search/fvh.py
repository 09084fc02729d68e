"""FastVectorHighlighter re-expression (lucene/highlighter/src/java/
org/apache/lucene/search/vectorhighlight/).

The reference pipeline, kept rule-for-rule:

1. FieldTermStack: the doc's tokens in position order with char
   offsets. The reference reads them from term vectors
   (FieldTermStack.java); this engine's stored-fields surface is the
   corpus table, so the stack is re-derived by re-running the SAME
   tokenizer with ``finditer`` spans (the documented
   no-term-vectors stance of SURVEY.md's highlighter row — offsets
   equal StandardTokenizer's because the token boundaries are
   identical). Stop-filtered tokens are absent from the stack (they
   are not index terms) while their positions still advance, exactly
   like the term-vector content.
2. FieldPhraseList (FieldPhraseList.java:60-110): greedy longest match
   of the stack against the query's term/phrase trie (FieldQuery's
   QueryPhraseMap), with the backtrack re-push loop on failed longer
   matches, adjacency-vs-slop validity
   (FieldQuery.java:431-447 ``abs(nextPos - pos - 1) > slop``), and
   the addIfNoOverlap merge rule (:113-124).
3. BaseFragListBuilder.createFieldFragList (BaseFragListBuilder.java:
   49-99): margin 6, minFragCharSize = 3*margin, spanStart =
   max(phraseStart - margin, prevEnd), spanEnd = max(phraseEnd,
   spanStart + fragCharSize), acceptPhrase multi-term length gate
   (:113-115); fragment totalBoost = sum of its phrase boosts
   (SimpleFieldFragList.java add()).
4. ScoreOrderFragmentsBuilder: fragments sorted totalBoost desc then
   startOffset asc (ScoreOrderFragmentsBuilder.java:69-82); fragment
   text built per BaseFragmentsBuilder.makeFragment (:169-188) with
   SimpleBoundaryScanner start/end snapping (maxScan 20 over
   ``. , ! ? space tab nl`` — SimpleBoundaryScanner.java:28-90) and
   pre/post tags around every matched term span.

Execution shape: highlighting runs on the TOP-K HITS ONLY (the
reference computes it per returned hit too) — one Arrow mapInPandas
over k joined rows, so corpus scale is irrelevant to this operator;
the expensive part stays the search that produced the hits.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MARGIN_DEFAULT = 6            # BaseFragListBuilder.java:31
MIN_FRAG_CHAR_SIZE_FACTOR = 3  # :32
BOUNDARY_CHARS = {".", ",", "!", "?", " ", "\t", "\n"}
MAX_SCAN = 20                 # SimpleBoundaryScanner.java:30-31


class _PhraseTrie:
    """FieldQuery's QueryPhraseMap: term -> sub-map, terminal nodes
    carry (boost, seqnum) (FieldQuery.java QueryPhraseMap)."""

    def __init__(self):
        self.sub: Dict[str, "_PhraseTrie"] = {}
        self.terminal = False
        self.boost = 0.0
        self.seqnum = -1

    def add(self, terms: Sequence[str], boost: float, seqnum: int):
        node = self
        for t in terms:
            node = node.sub.setdefault(t, _PhraseTrie())
        node.terminal = True
        node.boost = float(boost)
        node.seqnum = seqnum


def _build_trie(phrases) -> _PhraseTrie:
    root = _PhraseTrie()
    for i, p in enumerate(phrases):
        terms, boost = (p if isinstance(p, tuple) and len(p) == 2
                        and not isinstance(p[1], str) else (p, 1.0))
        if isinstance(terms, str):
            terms = (terms,)
        root.add(tuple(terms), boost, i)
    return root


def _term_stack(text: str, analyzer) -> List[Tuple[str, int, int, int]]:
    """FieldTermStack: (term, position, start_offset, end_offset) in
    position order. Derived by re-running the analyzer's tokenizer
    with spans; stop-filtered tokens advance position but are not
    stacked (they are not index terms). When the analyzer carries a
    ``pre_offsets`` charfilter (str -> (filtered, OffsetMap)), the
    tokenizer runs over the FILTERED text and both offsets are
    corrected back to the original input
    (Tokenizer.correctOffset + BaseCharFilter.correct), so the
    highlighter slices the raw stored text exactly."""
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


def _field_phrase_list(stack, trie: _PhraseTrie, slop: int):
    """FieldPhraseList.java:60-110 greedy walk + backtrack + overlap
    merge. Returns [(start_off, end_off, boost, seqnum,
    [(tstart, tend), ...])] in discovery order."""

    def valid(cand) -> Optional[_PhraseTrie]:
        node = trie
        for t, _p, _s, _e in cand:
            node = node.sub.get(t)
            if node is None:
                return None
        if not node.terminal:
            return None
        if len(cand) > 1:  # FieldQuery.java:438-445 slop adjacency
            pos = cand[0][1]
            for i in range(1, len(cand)):
                np_ = cand[i][1]
                if abs(np_ - pos - 1) > slop:
                    return None
                pos = np_
        return node

    phrases = []  # accepted WeightedPhraseInfos

    def merged_toffs(cand):
        """WeightedPhraseInfo ctor (:169-194): consecutive-position
        terms extend ONE Toffs; only position gaps (slop matches)
        open a new one — so an adjacent phrase highlights as a single
        tagged span including its separators."""
        offs = [[cand[0][2], cand[0][3]]]
        pos = cand[0][1]
        for _t, p, s, e in cand[1:]:
            if p - pos == 1:
                offs[-1][1] = e
            else:
                offs.append([s, e])
            pos = p
        return [(s, e) for s, e in offs]

    def add_if_no_overlap(cand, node):
        start, end = cand[0][2], cand[-1][3]
        for existing in phrases:
            if not (end <= existing[0] or start >= existing[1]):
                # addIfNoOverlap (:113-124): the overlapped phrase only
                # absorbs the TermInfos; its highlight offsets stay
                return
        phrases.append([start, end, node.boost, node.seqnum,
                        merged_toffs(cand), [c[0] for c in cand]])

    i = 0
    n = len(stack)
    while i < n:
        ti = stack[i]
        curr = trie.sub.get(ti[0])
        i += 1
        if curr is None:
            continue
        cand = [ti]
        while True:
            nxt = stack[i] if i < n else None
            nmap = curr.sub.get(nxt[0]) if nxt is not None else None
            if nxt is None or nmap is None:
                node = valid(cand) if curr.terminal else None
                if node is not None:
                    add_if_no_overlap(cand, node)
                else:
                    # backtrack: re-push tail, search shorter prefix
                    while len(cand) > 1:
                        i -= 1
                        cand.pop()
                        node = valid(cand)
                        if node is not None:
                            add_if_no_overlap(cand, node)
                            break
                break
            cand.append(nxt)
            curr = nmap
            i += 1
    return phrases


def _frag_list(phrases, frag_char_size: int, margin: int,
               weighted: bool = False, term_weights=None):
    """BaseFragListBuilder.createFieldFragList (:49-99).

    ``weighted=True`` scores fragments per WeightedFieldFragList.add
    (WeightedFieldFragList.java:46-74 — Solr's default
    hl.fragListBuilder=weighted): totalBoost = f32 sum of
    termWeight * phraseBoost over the fragment's DISTINCT term texts,
    then *= length * (1/sqrt(length)) with length counting EVERY
    TermInfo; term weight = f32(ln(numDocs/(df+1)) + 1)
    (FieldTermStack.java:115-116) supplied via ``term_weights``
    (default 1.0). ``weighted=False`` is SimpleFieldFragList (sum of
    phrase boosts)."""
    min_size = max(1, margin * MIN_FRAG_CHAR_SIZE_FACTOR)
    if frag_char_size < min_size:
        raise ValueError(
            f"fragCharSize({frag_char_size}) is too small. "
            f"It must be {min_size} or higher.")
    frags = []  # (span_start, span_end, total_boost, [phrase...])
    start_offset = 0
    qi = 0
    n = len(phrases)
    while qi < n:
        ph = phrases[qi]
        if ph[0] < start_offset:  # violates previous fragment border
            qi += 1
            continue
        wpil = []
        cur_start, cur_end = ph[0], ph[1]
        span_start = max(cur_start - margin, start_offset)
        span_end = max(cur_end, span_start + frag_char_size)
        if len(ph[4]) <= 1 or (cur_end - cur_start) <= frag_char_size:
            wpil.append(ph)  # acceptPhrase (:113-115)
        qi += 1
        while qi < n:
            ph2 = phrases[qi]
            if ph2[1] <= span_end:
                if (len(ph2[4]) <= 1
                        or (ph2[1] - cur_start) <= frag_char_size):
                    wpil.append(ph2)
                qi += 1
            else:
                break
        start_offset = span_end
        if weighted:
            import numpy as np

            tw = term_weights or {}
            acc = np.float32(0.0)
            distinct = set()
            length = 0
            for w in wpil:
                for t in w[5]:
                    if t not in distinct:
                        distinct.add(t)
                        acc = np.float32(
                            acc + np.float32(
                                np.float32(tw.get(t, 1.0))
                                * np.float32(w[2])))
                    length += 1
            total = float(np.float32(
                float(acc) * (length * (1.0 / np.sqrt(length)))
            )) if length else 0.0
        else:
            total = 0.0
            for w in wpil:
                total += w[2]
        frags.append((span_start, span_end, total, wpil))
    return frags


def _snap_start(text: str, start: int) -> int:
    """SimpleBoundaryScanner.findStartOffset (:60-75)."""
    if start > len(text) or start < 1:
        return start
    offset = start
    for _ in range(MAX_SCAN):
        if offset <= 0:
            break
        if text[offset - 1] in BOUNDARY_CHARS:
            return offset
        offset -= 1
    return 0 if offset == 0 else start


def _snap_end(text: str, start: int) -> int:
    """SimpleBoundaryScanner.findEndOffset (:77-90)."""
    if start > len(text) or start < 0:
        return start
    offset = start
    for _ in range(MAX_SCAN):
        if offset >= len(text):
            break
        if text[offset] in BOUNDARY_CHARS:
            return offset
        offset += 1
    return start


def _make_fragment(text: str, frag, pre: str, post: str) -> str:
    """BaseFragmentsBuilder.makeFragment (:169-188) with boundary
    snapping (:190-202)."""
    span_start, span_end, _total, wpil = frag
    eo = len(text) if len(text) < span_end else _snap_end(text, span_end)
    mso = _snap_start(text, span_start)
    src = text[mso:eo]
    out = []
    idx = 0
    for ph in wpil:
        for (ts, te) in sorted(ph[4]):
            out.append(src[idx:ts - mso])
            out.append(pre)
            out.append(src[ts - mso:te - mso])
            out.append(post)
            idx = te - mso
    out.append(src[idx:])
    return "".join(out)


def highlight_doc(text: str, phrases, analyzer, frag_char_size: int = 100,
                  max_num_fragments: int = 1, pre: str = "<b>",
                  post: str = "</b>", slop: int = 0,
                  margin: int = MARGIN_DEFAULT,
                  frag_list: str = "simple", term_weights=None,
                  return_scores: bool = False, stack=None):
    """FastVectorHighlighter.getBestFragments for ONE doc (pure
    function — unit-testable and reused by the Spark kernel).
    ``frag_list='weighted'`` scores fragments per
    WeightedFieldFragList (Solr hl.fragListBuilder default).
    ``stack``: precomputed FieldTermStack rows (term, pos, start,
    end) from the term-vector sidecar — when given, the stored text
    is NOT re-analyzed (the reference's term-vectors fast path,
    FieldTermStack.java:77-105)."""
    trie = _build_trie(phrases)
    if stack is None:
        stack = _term_stack(text, analyzer)
    wpl = _field_phrase_list(stack, trie, slop)
    if not wpl:
        return []
    frags = _frag_list(wpl, frag_char_size, margin,
                       weighted=frag_list == "weighted",
                       term_weights=term_weights)
    # ScoreOrderFragmentsBuilder.ScoreComparator (:69-82)
    frags.sort(key=lambda f: (-f[2], f[0]))
    out = frags[:max_num_fragments]
    if return_scores:
        return [(_make_fragment(text, f, pre, post), float(f[2]))
                for f in out]
    return [_make_fragment(text, f, pre, post) for f in out]


def fast_vector_highlight(
    searcher,
    store: DataFrame,
    query_text: str,
    phrases,
    text_col: str = "content",
    k: int = 10,
    frag_char_size: int = 100,
    max_num_fragments: int = 1,
    pre: str = "<b>",
    post: str = "</b>",
    slop: int = 0,
    frag_list: str = "simple",
    term_weights=None,
    term_vectors: Optional[DataFrame] = None,
    **search_kw,
) -> DataFrame:
    """Top-k hits of ``query_text`` with FVH fragments over their
    stored text. ``phrases``: [(terms tuple, boost)] — the flattened
    FieldQuery (term queries are 1-tuples, phrase queries n-tuples).
    Returns (doc_id, score, fragments array<string>,
    frag_scores array<float>).

    ``term_vectors``: the sidecar table (build_term_vectors) — the
    FieldTermStack then comes from a JOIN against it (aggregated per
    doc) and the kernel never re-analyzes the stored text; gated
    output-identical to the re-analysis path in
    tests/test_term_vectors.py."""
    import pandas as pd

    hits = searcher.search(query_text, k=k, **search_kw)
    joined = hits.join(store.select("doc_id", text_col), "doc_id")
    if term_vectors is not None:
        tv = (
            term_vectors
            .groupBy("doc_id")
            .agg(F.array_sort(F.collect_list(F.struct(
                "pos", "term", "start", "end"))).alias("_tv"))
        )
        joined = joined.join(tv, "doc_id", "left")
    analyzer = searcher.analyzer
    norm_phrases = []
    for p in phrases:
        terms, boost = (p if isinstance(p, tuple) and len(p) == 2
                        and not isinstance(p[1], str) else (p, 1.0))
        if isinstance(terms, str):
            terms = (terms,)
        norm_phrases.append((tuple(terms), float(boost)))

    use_tv = term_vectors is not None

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            frags, fscores = [], []
            tv_col = pdf["_tv"] if use_tv else [None] * len(pdf)
            for t, tv_rows in zip(pdf[text_col], tv_col):
                stack = None
                missing = tv_rows is None or (
                    isinstance(tv_rows, float) and pd.isna(tv_rows))
                if use_tv and not missing:
                    stack = [(r["term"], int(r["pos"]), int(r["start"]),
                              int(r["end"])) for r in tv_rows]
                res = highlight_doc(
                    t, norm_phrases, analyzer,
                    frag_char_size=frag_char_size,
                    max_num_fragments=max_num_fragments,
                    pre=pre, post=post, slop=slop,
                    frag_list=frag_list, term_weights=term_weights,
                    return_scores=True, stack=stack)
                frags.append([r[0] for r in res])
                fscores.append([r[1] for r in res])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "score": pdf["score"],
                "fragments": frags,
                "frag_scores": fscores,
            })

    out = joined.mapInPandas(
        kernel,
        schema=("doc_id long, score float, fragments array<string>, "
                "frag_scores array<float>"))
    return out.orderBy(F.desc("score"), F.asc("doc_id"))


# -- term-vector sidecar -----------------------------------------------------


TERM_VECTORS_SCHEMA = (
    "doc_id long, term string, pos int, start int, end int"
)


def build_term_vectors(store: DataFrame, analyzer,
                       text_col: str = "content") -> DataFrame:
    """Term-vector sidecar build (lucene/core/.../codecs/compressing/
    CompressingTermVectorsWriter.java semantics, relationally): one
    row per surviving token occurrence with its position and char
    offsets — exactly the FieldTermStack content the reference reads
    from term vectors (FieldTermStack.java:77-105), so highlighting
    becomes a JOIN against this table instead of a re-analysis of the
    stored text. Written once at index build (write_term_vectors);
    the reference pays the same trade (withTermVectors* flags grow
    the index to save query-time re-analysis).

    One Arrow mapInPandas over the store — the same partitioning as
    the corpus scan, no shuffle."""
    import pandas as pd

    stopwords = frozenset(getattr(analyzer, "stopwords", frozenset()))
    lowercase = getattr(analyzer, "lowercase", True)
    # Charfilter stages MUST ride along: a charfiltered analyzer
    # (e.g. html_strip_std) tokenizes the FILTERED text and corrects
    # offsets back to the raw stored field — dropping pre/pre_offsets
    # here would make the sidecar diverge from the re-analysis path
    # it is gated output-identical against (r3 advice).
    pre = getattr(analyzer, "pre", None)
    pre_offsets = getattr(analyzer, "pre_offsets", None)

    def kernel(batches):
        from lucene_solr_spark.functions.analysis import (
            MAX_TOKEN_LENGTH,
            TOKEN_PATTERN,
        )

        class _An:
            pass

        _an = _An()
        _an.stopwords = stopwords
        _an.lowercase = lowercase
        _an.pre = pre
        _an.pre_offsets = pre_offsets
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, terms, poss, sts, ens = [], [], [], [], []
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                for t, p, s, e in _term_stack(text or "", _an):
                    ids.append(did)
                    terms.append(t)
                    poss.append(p)
                    sts.append(s)
                    ens.append(e)
            yield pd.DataFrame({
                "doc_id": ids, "term": terms, "pos": poss,
                "start": sts, "end": ens,
            })

    return store.select("doc_id", text_col).mapInPandas(
        kernel, schema=TERM_VECTORS_SCHEMA)


def write_term_vectors(store: DataFrame, analyzer, index_dir: str,
                       text_col: str = "content") -> str:
    """Persist the sidecar under the index directory; returns the
    path. At 100 TB: partition-aligned parquet next to the postings,
    read back with doc_id pushdown for the top-k hits only."""
    import os

    out = os.path.join(index_dir, "term_vectors")
    build_term_vectors(store, analyzer, text_col).write.mode(
        "overwrite").parquet(out)
    return out


def read_term_vectors(spark, index_dir: str) -> DataFrame:
    import os

    return spark.read.parquet(os.path.join(index_dir, "term_vectors"))
