"""Pure-Python single-process oracle: a naive dict inverted index with the
exact Lucene BM25 float32 math and collector semantics. Plays the role
Lucene itself plays in the reference's dual-execution tests
(lucene/core/src/test/org/apache/lucene/search/TestBoolean2.java:132-144,
test-framework/.../search/CheckHits.java:197): every engine query must be
rank-identical (docIDs AND float32 score bits) to this oracle.

Normative orderings reproduced here:
  - conjunction: float32 sum over clauses in ascending-df order
    (ConjunctionScorer.java:47-54,104-111), coord = 1
  - disjunction: per-doc accumulation in double, cast to float32 at the
    end (DisjunctionSumScorer.java `double score`)
  - minShouldMatch: disjunction restricted to docs matching >= mm clauses
    (MinShouldMatchSumScorer.java:36-102)
  - MUST_NOT: required-side docs minus excluded set (ReqExclScorer.java)
  - collector tie-break: score desc, then docID asc (HitQueue.java:76-81)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

import numpy as np

from lucene_solr_spark.constants import B, K1
from lucene_solr_spark.functions.analysis import (
    analyze,
    analyze_with_positions,
    get_analyzer,
)
from lucene_solr_spark.functions.bm25 import K1_PLUS_1, avgdl, idf, norm_cache
from lucene_solr_spark.functions.smallfloat import encode_norm

F32 = np.float32


@dataclass
class OracleIndex:
    postings: Dict[str, List[Tuple[int, int]]] = field(default_factory=dict)
    positions: Dict[str, Dict[int, List[int]]] = field(default_factory=dict)
    norm_bytes: Dict[int, int] = field(default_factory=dict)
    max_doc: int = 0
    sum_ttf: int = 0

    @classmethod
    def build(cls, docs: Sequence[Tuple[int, str]],
              analyzer: str = "standard") -> "OracleIndex":
        """docs: (doc_id, content) with dense pre-assigned docIDs."""
        idx = cls()
        idx.analyzer = analyzer
        spec = get_analyzer(analyzer)
        for doc_id, content in docs:
            terms = spec.analyze(content)
            idx.max_doc += 1
            idx.sum_ttf += len(terms)
            # len==0 -> 1/sqrt(0)=inf -> floatToByte315 overflow -> 0xFF,
            # matching Lucene's encodeNormValue on an empty field
            with np.errstate(divide="ignore"):
                idx.norm_bytes[doc_id] = int(encode_norm(len(terms)))
            tf: Dict[str, int] = {}
            for t in terms:
                tf[t] = tf.get(t, 0) + 1
            for t, f in tf.items():
                idx.postings.setdefault(t, []).append((doc_id, f))
            for t, pos in spec.analyze_with_positions(content):
                idx.positions.setdefault(t, {}).setdefault(
                    doc_id, []
                ).append(pos)
        for plist in idx.postings.values():
            plist.sort()
        return idx

    # -- stats ---------------------------------------------------------
    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def _cache(self) -> np.ndarray:
        return norm_cache(avgdl(self.sum_ttf, self.max_doc), K1, B)

    # -- scoring -------------------------------------------------------
    def _term_scores(self, term: str, cache: np.ndarray,
                     boost: float = 1.0) -> Dict[int, np.float32]:
        w = F32(idf(self.df(term), self.max_doc) * F32(boost))
        weight_value = F32(w * K1_PLUS_1)
        out = {}
        for doc_id, tf in self.postings.get(term, ()):
            freq = F32(tf)
            norm = cache[self.norm_bytes[doc_id]]
            out[doc_id] = F32(weight_value * freq / (freq + norm))
        return out

    def _term_scores_sim(self, term, similarity, values, mu=2000.0):
        """Per-doc scores for one term under a non-BM25 similarity
        (functions/similarity.py formulas, same f32 chains)."""
        from lucene_solr_spark.functions.similarity import (
            avg_field_length,
            classic_score_block,
            dfr_score_block,
            lmd_score_block,
            lmjm_score_block,
        )

        from lucene_solr_spark.functions.similarity import (
            sb_parse,
            sb_score_block,
        )

        sbp = sb_parse(similarity)
        out = {}
        for doc_id, tf in self.postings.get(term, ()):
            tfs = np.array([tf], np.int32)
            nbs = np.array([self.norm_bytes[doc_id]], np.uint8)
            if sbp is not None:
                df_t, cf_t = values[term]
                out[doc_id] = sb_score_block(
                    sbp, df_t, cf_t, self.max_doc,
                    avg_field_length(self.sum_ttf, self.max_doc),
                    self.sum_ttf, tfs, nbs,
                )[0]
            elif similarity == "classic":
                out[doc_id] = classic_score_block(values[term], tfs, nbs)[0]
            elif similarity == "sweetspot":
                from lucene_solr_spark.functions.similarity import (
                    sweetspot_score_block,
                )
                out[doc_id] = sweetspot_score_block(
                    values[term], tfs, nbs
                )[0]
            elif similarity == "dfr":
                df_t, cf_t = values[term]
                out[doc_id] = dfr_score_block(
                    df_t, cf_t, self.max_doc,
                    avg_field_length(self.sum_ttf, self.max_doc),
                    tfs, nbs,
                )[0]
            elif similarity == "lmjelinekmercer":
                out[doc_id] = lmjm_score_block(values[term], tfs, nbs)[0]
            elif similarity == "ib":
                from lucene_solr_spark.functions.similarity import (
                    ib_score_block,
                )

                out[doc_id] = ib_score_block(
                    values[term], self.max_doc,
                    avg_field_length(self.sum_ttf, self.max_doc),
                    tfs, nbs,
                )[0]
            elif similarity == "dfr_inl2":
                from lucene_solr_spark.functions.similarity import (
                    dfr_inl2_score_block,
                )

                out[doc_id] = dfr_inl2_score_block(
                    values[term], self.max_doc,
                    avg_field_length(self.sum_ttf, self.max_doc),
                    tfs, nbs,
                )[0]
            elif similarity == "dfr_ifb2":
                from lucene_solr_spark.functions.similarity import (
                    dfr_ifb2_score_block,
                )

                df_t, cf_t = values[term]
                out[doc_id] = dfr_ifb2_score_block(
                    df_t, cf_t, self.max_doc,
                    avg_field_length(self.sum_ttf, self.max_doc),
                    tfs, nbs,
                )[0]
            elif similarity == "dfr_pl2":
                from lucene_solr_spark.functions.similarity import (
                    dfr_pl2_score_block,
                )

                out[doc_id] = dfr_pl2_score_block(
                    values[term], self.max_doc,
                    avg_field_length(self.sum_ttf, self.max_doc),
                    tfs, nbs,
                )[0]
            elif similarity == "ib_spl":
                from lucene_solr_spark.functions.similarity import (
                    ib_spl_score_block,
                )

                out[doc_id] = ib_spl_score_block(
                    values[term], self.max_doc,
                    avg_field_length(self.sum_ttf, self.max_doc),
                    tfs, nbs,
                )[0]
            else:
                out[doc_id] = lmd_score_block(values[term], tfs, nbs, mu)[0]
        return out

    def _per_term_maps(self, qterms, similarity: str):
        """{term: {doc: f32 score}} under any similarity name, incl.
        ``multi:a+b`` (MultiSimilarity: f32 sum of sub-scores in sub
        order, MultiSimilarity.java:76-82)."""
        if similarity.startswith("multi:"):
            subs = [
                self._per_term_maps(qterms, n)
                for n in similarity[len("multi:"):].split("+")
            ]
            out = {}
            for t in qterms:
                acc: Dict[int, np.float32] = {}
                for sub in subs:
                    for d, s in sub[t].items():
                        acc[d] = F32(acc.get(d, F32(0.0)) + s)
                out[t] = acc
            return out
        if similarity == "bm25":
            cache = self._cache()
            return {t: self._term_scores(t, cache) for t in qterms}
        from lucene_solr_spark.functions.similarity import (
            LMD_MU,
            classic_values,
            lmd_p,
        )

        if similarity in ("classic", "sweetspot"):
            dfs = {t: self.df(t) for t in qterms}
            values = classic_values(qterms, dfs, self.max_doc)
        else:
            cfs = {
                t: sum(f for _, f in self.postings.get(t, ()))
                for t in qterms
            }
            from lucene_solr_spark.functions.similarity import sb_parse

            if sb_parse(similarity) is not None:
                values = {t: (self.df(t), cfs[t]) for t in qterms}
            elif similarity in ("dfr", "dfr_ifb2"):
                values = {t: (self.df(t), cfs[t]) for t in qterms}
            elif similarity in ("ib", "dfr_inl2", "ib_spl"):
                values = {t: self.df(t) for t in qterms}
            elif similarity == "dfr_pl2":
                values = {t: cfs[t] for t in qterms}
            elif similarity == "lmjelinekmercer":
                from lucene_solr_spark.functions.similarity import (
                    lmjm_p,
                )

                values = {t: lmjm_p(cfs[t], self.sum_ttf)
                          for t in qterms}
            else:
                values = {t: lmd_p(cfs[t], self.sum_ttf)
                          for t in qterms}
        return {
            t: self._term_scores_sim(t, similarity, values, LMD_MU)
            for t in qterms
        }

    def search(
        self,
        query: str,
        k: int = 10,
        mode: str = "or",
        min_should_match: int = 0,
        exclude: str = "",
        similarity: str = "bm25",
    ) -> List[Tuple[int, np.float32]]:
        """Analyze `query` with the same chain, score, return top-k
        [(doc_id, float32 score)] in collector order (score desc, doc asc).

        mode: 'or' (DisjunctionSumScorer), 'and' (ConjunctionScorer).
        min_should_match: for 'or', require >= mm matching clauses.
        exclude: text whose terms' docs are excluded (MUST_NOT).
        """
        terms = get_analyzer(getattr(self, "analyzer", "standard")).analyze(query)
        # de-dup preserving first occurrence (BooleanQuery keeps duplicate
        # clauses; our surface treats the query as a term SET, documented)
        seen, qterms = set(), []
        for t in terms:
            if t not in seen:
                seen.add(t)
                qterms.append(t)
        if mode == "and" and any(t not in self.postings for t in qterms):
            # a required clause with no matching docs produces no scorer
            # -> empty conjunction (BooleanWeight.scorer, BooleanQuery.java
            # :301-366 returns null when a MUST clause scorer is null)
            return []
        qterms = [t for t in qterms if t in self.postings]
        if not qterms:
            return []
        per_term = self._per_term_maps(qterms, similarity)

        scores: Dict[int, np.float32] = {}
        if mode == "and":
            # ascending cost = ascending df; stable by clause order for ties
            # (ConjunctionScorer sorts with ArrayUtil.mergeSort, stable)
            order = sorted(qterms, key=lambda t: self.df(t))
            docs = set(per_term[order[0]])
            for t in order[1:]:
                docs &= set(per_term[t])
            for d in docs:
                acc = F32(0.0)
                for t in order:  # float32 accumulation in cost order
                    acc = F32(acc + per_term[t][d])
                scores[d] = acc
        elif mode == "or":
            dacc: Dict[int, Tuple[float, int]] = {}
            for t in qterms:
                for d, s in per_term[t].items():
                    cur = dacc.get(d, (0.0, 0))
                    dacc[d] = (cur[0] + float(s), cur[1] + 1)  # double acc
            mm = max(min_should_match, 1)
            if similarity == "classic":
                from lucene_solr_spark.functions.similarity import (
                    classic_coords,
                )

                coords = classic_coords(len(qterms))
                scores = {
                    d: F32(F32(s) * coords[n])
                    for d, (s, n) in dacc.items() if n >= mm
                }
            else:
                scores = {
                    d: F32(s) for d, (s, n) in dacc.items() if n >= mm
                }
        else:
            raise ValueError(mode)

        if exclude:
            ex_docs = set()
            for t in analyze(exclude):
                ex_docs.update(d for d, _ in self.postings.get(t, ()))
            scores = {d: s for d, s in scores.items() if d not in ex_docs}

        ranked = sorted(scores.items(), key=lambda kv: (-float(kv[1]), kv[0]))
        return ranked[:k]


    # -- exact phrase (ExactPhraseScorer semantics) --------------------
    def search_phrase(self, phrase: str, k: int = 10, slop: int = 0,
                      boost: float = 1.0):
        """Hole-aware phrase: analyzed offsets must align; freq =
        phraseFreq; weight = float32 sum of clause idfs in order
        (BM25Similarity.java:185-198; ExactPhraseScorer.java:26-91).
        slop > 0 runs SloppyPhraseScorer.phraseFreq over the oracle's
        raw token positions (the greedy traversal in search/sloppy.py
        is the spec, pinned by hand-traced golden vectors; this path
        independently exercises the engine's codec decode, doc-set
        conjunction and distribution plumbing)."""
        tp = analyze_with_positions(phrase)
        if not tp:
            return []
        p0 = tp[0][1]
        offsets = [(t, p - p0) for t, p in tp]
        uniq = list(dict.fromkeys(t for t, _ in offsets))
        if any(t not in self.postings for t in uniq):
            return []
        w = F32(0.0)
        for t, _ in offsets:
            w = F32(w + idf(self.df(t), self.max_doc))
        weight_value = F32(F32(w * F32(boost)) * K1_PLUS_1)
        cache = self._cache()
        docs = set(self.positions[uniq[0]])
        for t in uniq[1:]:
            docs &= set(self.positions[t])
        scores = {}
        for d in docs:
            if slop > 0:
                from lucene_solr_spark.search.sloppy import (
                    sloppy_phrase_freq,
                )

                arrs = [np.asarray(self.positions[t][d], dtype=np.int64)
                        for t, _ in offsets]
                freq = sloppy_phrase_freq(
                    arrs, [o for _, o in offsets],
                    [t for t, _ in offsets], slop,
                )
                if freq > 0:
                    norm = cache[self.norm_bytes[d]]
                    scores[d] = F32(
                        weight_value * freq / (freq + norm)
                    )
                continue
            starts = None
            for t, off in offsets:
                cand = {p - off for p in self.positions[t][d]}
                starts = cand if starts is None else (starts & cand)
                if not starts:
                    break
            pf = len(starts) if starts else 0
            if pf:
                freq = F32(pf)
                norm = cache[self.norm_bytes[d]]
                scores[d] = F32(weight_value * freq / (freq + norm))
        ranked = sorted(scores.items(), key=lambda kv: (-float(kv[1]), kv[0]))
        return ranked[:k]

    def search_multi_phrase(self, slots, k: int = 10, slop: int = 0):
        """MultiPhraseQuery oracle (search/MultiPhraseQuery.java):
        ``slots`` = [(alternatives, offset)]. Weight = f32 idf sum over
        ALL terms in add order (MultiPhraseWeight :146-156, absent
        terms df=0); per doc each slot's positions are the UNION of its
        members' positions; slop=0 pf = count of aligned starts
        (set semantics — the ExactPhraseScorer last-slot duplicate
        multiplicity only differs when posInc-0 synonym tokens exist,
        which the standard-chain oracle corpus never produces; the
        multiplicity rule itself is pinned by the kernel-level golden
        vectors in tests/test_multiphrase.py); slop>0 runs the shared
        greedy SloppyPhraseScorer traversal over the union arrays."""
        norm_slots = [(tuple(a), int(off)) for a, off in slots]
        all_terms = [t for a, _ in norm_slots for t in a]
        w = F32(0.0)
        for t in all_terms:
            w = F32(w + idf(self.df(t), self.max_doc))
        weight_value = F32(w * K1_PLUS_1)
        cache = self._cache()
        if len(norm_slots) == 1:
            # rewrite(): BooleanQuery of SHOULD TermQueries, per-term
            # weights, double accumulation (DisjunctionSumScorer)
            acc: Dict[int, float] = {}
            for t in dict.fromkeys(norm_slots[0][0]):
                for d, s in self._term_scores(t, cache).items():
                    acc[d] = acc.get(d, 0.0) + float(s)
            ranked = sorted(((d, F32(s)) for d, s in acc.items()),
                            key=lambda kv: (-float(kv[1]), kv[0]))
            return ranked[:k]
        # candidate docs: every slot's union non-empty
        docsets = []
        for alts, _ in norm_slots:
            ds: set = set()
            for t in alts:
                ds |= set(self.positions.get(t, ()))
            if not ds:
                return []
            docsets.append(ds)
        docs = set.intersection(*docsets)
        scores = {}
        for d in docs:
            union_pos = []
            for alts, off in norm_slots:
                merged: List[int] = []
                for t in alts:
                    merged.extend(self.positions.get(t, {}).get(d, ()))
                merged.sort()
                union_pos.append((merged, off))
            if any(not m for m, _ in union_pos):
                continue
            if slop > 0:
                from lucene_solr_spark.search.sloppy import (
                    sloppy_phrase_freq,
                )

                freq = sloppy_phrase_freq(
                    [np.asarray(m, dtype=np.int64) for m, _ in union_pos],
                    [o for _, o in union_pos],
                    [f"\x00slot{i}" for i in range(len(union_pos))],
                    slop,
                )
            else:
                starts = None
                for m, off in union_pos:
                    cand = {p - off for p in m}
                    starts = cand if starts is None else (starts & cand)
                    if not starts:
                        break
                freq = F32(len(starts)) if starts else F32(0.0)
            if freq > 0:
                norm = cache[self.norm_bytes[d]]
                scores[d] = F32(weight_value * freq / (freq + norm))
        ranked = sorted(scores.items(), key=lambda kv: (-float(kv[1]), kv[0]))
        return ranked[:k]

    def search_spans(self, span, k: int = 10):
        """Span query oracle (search/spans/SpanScorer.java): evaluate
        the span tree's exact match enumeration (search/spans.py is
        the shared spec, unit-pinned by hand-traced vectors) over the
        oracle's RAW analyzed positions for EVERY doc containing any
        query term — no candidate pruning, independently exercising
        the engine's codec decode + candidate recursion + kernel
        distribution. weight = f32 idf sum over distinct terms in
        sorted order (SpanWeight.java TreeSet) * (k1+1)."""
        from lucene_solr_spark.search import spans as SP

        w_terms = sorted(set(SP.span_terms(span)))
        p_terms = list(dict.fromkeys(SP.positions_terms(span)))
        w = F32(0.0)
        for t in w_terms:
            w = F32(w + idf(self.df(t), self.max_doc))
        weight_value = F32(w * K1_PLUS_1)
        cache = self._cache()
        docs = set()
        for t in p_terms:
            docs.update(self.positions.get(t, {}))
        scores = {}
        empty = np.empty(0, np.int64)
        for d in sorted(docs):

            def pos_of(t, _d=d):
                lst = self.positions.get(t, {}).get(_d)
                if not lst:
                    return empty
                return np.asarray(lst, np.int64)

            freq = SP.span_freq(span, pos_of)
            if freq > 0:
                norm = cache[self.norm_bytes[d]]
                scores[d] = F32(weight_value * freq / (freq + norm))
        ranked = sorted(scores.items(), key=lambda kv: (-float(kv[1]), kv[0]))
        return ranked[:k]


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _damerau_distance(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein (Lowrance-Wagner): adjacent
    transposition as ONE primitive edit — FuzzyQuery's
    transpositions=true semantics (search/FuzzyQuery.java:52
    defaultTranspositions=true; the Schulz-Mihov transposition
    automaton behind LevenshteinAutomata). Matches DuckDB's
    damerau_levenshtein exactly (gated by
    tests/test_multiterm_datemath.py::test_damerau_matches_duckdb)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    inf = la + lb
    h = [[inf] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        h[i + 1][1] = i
    for j in range(lb + 1):
        h[1][j + 1] = j
    da: dict = {}
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            i1 = da.get(b[j - 1], 0)
            j1 = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            h[i + 1][j + 1] = min(
                h[i][j] + cost,            # substitute / match
                h[i + 1][j] + 1,           # insert
                h[i][j + 1] + 1,           # delete
                h[i1][j1] + (i - i1 - 1) + 1 + (j - j1 - 1),  # transpose
            )
        da[a[i - 1]] = i
    return h[la + 1][lb + 1]


class OracleBoolean:
    """search_boolean mirror for OracleIndex (BooleanScorer2 strategy:
    conjunction core in ascending-cost f32 order, optional disjunction
    added per ReqOptSumScorer float add, MUST_NOT exclusion). Multi-term
    expansion mirrors IndexSearcher._expand_rows: constant-score kinds
    (prefix/wildcard/regexp/range), fuzzy scoring disjunction, the
    TooManyClauses cap, and the top_terms_<n> boost-ranked rewrite."""

    MAX_CLAUSE_COUNT = 1024

    def __init__(self, idx: OracleIndex, rewrite=None):
        self.idx = idx
        self.rewrite = rewrite

    def _expand(self, c):
        """[(term, boost f32)] for a multi-term clause (sorted by term;
        top_terms: by boost desc, term asc, truncated)."""
        import re as _re

        from lucene_solr_spark.search.queryparser import TooManyClauses

        vocab = sorted(self.idx.postings)
        if c.kind == "prefix":
            hits = [t for t in vocab if t.startswith(c.pattern)]
        elif c.kind == "wildcard":
            from lucene_solr_spark.search.executor import _wildcard_regex

            rx = _re.compile(_wildcard_regex(c.pattern))
            hits = [t for t in vocab if rx.match(t)]
        elif c.kind == "regexp":
            rx = _re.compile(f"^(?:{c.pattern})$")
            hits = [t for t in vocab if rx.match(t)]
        elif c.kind == "range":
            hits = [
                t for t in vocab
                if (c.lo is None
                    or (t >= c.lo if c.include_lo else t > c.lo))
                and (c.hi is None
                     or (t <= c.hi if c.include_hi else t < c.hi))
            ]
        elif c.kind == "multi":
            # transpositions=true default (FuzzyQuery.java:52): Damerau
            # distance, so 'atbel' matches 'table' at 2 (lev would be 4)
            hits = [
                t for t in vocab
                if abs(len(t) - len(c.pattern)) <= 2
                and _damerau_distance(t, c.pattern) <= 2
            ]
        else:
            raise ValueError(c.kind)

        def boost(t):
            if c.kind != "multi":
                return 1.0
            d = _damerau_distance(t, c.pattern)
            if d == 0:
                return 1.0
            return float(F32(1.0) - F32(d) / F32(min(len(t),
                                                     len(c.pattern))))

        top_n = None
        if self.rewrite is not None:
            m = _re.match(r"^top_terms_(\d+)$", self.rewrite)
            if not m:
                raise ValueError(f"unknown rewrite {self.rewrite!r}")
            top_n = int(m.group(1))
        if top_n is None:
            # only SCORING expansions cap at maxClauseCount; the
            # constant-score kinds rewrite to a filter (no cap) —
            # CONSTANT_SCORE_AUTO semantics
            if c.kind == "multi" and len(hits) > self.MAX_CLAUSE_COUNT:
                raise TooManyClauses(c.text)
            return [(t, 1.0) for t in hits]
        scored = [(t, boost(t)) for t in hits]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:top_n]

    def _clause_eval(self, c, cache):
        """-> (dict doc->f32 score, cost) or None if unmatched."""
        idx = self.idx
        if c.kind == "term":
            t = c.terms[0]
            if t not in idx.postings:
                return None
            return idx._term_scores(t, cache, c.boost), idx.df(t)
        if c.kind == "phrase":
            hits = idx.search_phrase(c.text, k=len(idx.norm_bytes),
                                     slop=c.slop, boost=c.boost)
            if not hits:
                return None
            return dict(hits), min(idx.df(t) for t in c.terms)
        if c.kind == "multi":
            expanded = self._expand(c)
            if not expanded:
                return None
            acc = {}
            for t, b in expanded:
                wv = F32(F32(b) * F32(F32(idf(idx.df(t), idx.max_doc))
                                      * K1_PLUS_1))
                for doc_id, tf in idx.postings.get(t, ()):
                    freq = F32(tf)
                    norm = cache[idx.norm_bytes[doc_id]]
                    s = F32(wv * freq / (freq + norm))
                    acc[doc_id] = acc.get(doc_id, 0.0) + float(s)  # dbl acc
            return {d: F32(s) for d, s in acc.items()}, sum(
                idx.df(t) for t, _ in expanded
            )
        # constant-score kinds
        expanded = self._expand(c)
        if not expanded:
            return None
        docs = set()
        for t, _ in expanded:
            docs.update(d for d, _ in idx.postings[t])
        return {d: F32(1.0) for d in docs}, sum(
            idx.df(t) for t, _ in expanded
        )

    def _eval_level(self, ast, cache, min_should_match: int):
        """One BooleanQuery level -> ({doc: f32 score}, cost estimate)
        or None (null scorer). Parenthesized sub-booleans recurse —
        cost(bool) = sum of non-NOT child costs, the Scorer.cost()
        estimate the engine tree path mirrors."""
        musts, shoulds, nots = [], [], []
        for c in ast:
            if c.kind == "bool":
                ev = self._eval_level(c.sub or [], cache, 0)
                if ev is not None and not ev[0]:
                    ev = None  # empty sub-boolean = null scorer
            else:
                ev = self._clause_eval(c, cache)
            if ev is None:
                if c.occur == "must":
                    return None
                continue
            {"must": musts, "should": shoulds, "not": nots}[c.occur].append(ev)
        if not musts and not shoulds:
            return None
        cost = sum(cst for _, cst in musts) + sum(cst for _, cst in shoulds)
        scores = {}
        if musts:
            order = sorted(range(len(musts)), key=lambda i: (musts[i][1], i))
            docs = set(musts[order[0]][0])
            for i in order[1:]:
                docs &= set(musts[i][0])
            for d in docs:
                req = F32(0.0)
                for i in order:  # f32 sum, ascending-cost order
                    req = F32(req + musts[i][0][d])
                opt = 0.0
                hit = False
                for sc, _ in shoulds:
                    if d in sc:
                        opt += float(sc[d])
                        hit = True
                scores[d] = F32(req + F32(opt)) if hit else req
        else:
            mm = max(min_should_match, 1)
            dacc = {}
            for sc, _ in shoulds:
                for d, s in sc.items():
                    cur = dacc.get(d, (0.0, 0))
                    dacc[d] = (cur[0] + float(s), cur[1] + 1)
            scores = {d: F32(s) for d, (s, n) in dacc.items() if n >= mm}
        for sc, _ in nots:
            for d in sc:
                scores.pop(d, None)
        return scores, cost

    def search(self, query_string: str, k: int = 10,
               min_should_match: int = 0):
        from lucene_solr_spark.functions.analysis import get_analyzer
        from lucene_solr_spark.search.queryparser import parse_query

        ast = parse_query(
            query_string,
            analyzer=get_analyzer(getattr(self.idx, "analyzer", "standard")),
        )
        if not ast:
            return []
        cache = self.idx._cache()
        ev = self._eval_level(ast, cache, min_should_match)
        if ev is None:
            return []
        scores, _ = ev
        ranked = sorted(scores.items(), key=lambda kv: (-float(kv[1]), kv[0]))
        return ranked[:k]
