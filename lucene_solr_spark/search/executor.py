"""Query execution: the IndexSearcher of this engine.

Spark shape (SURVEY.md section 3.1, re-expressing IndexSearcher.search,
lucene/core/src/java/org/apache/lucene/search/IndexSearcher.java:259-273):

  stage A (driver, no cluster): analyze query with the SAME chain
    (QueryParserBase re-analysis semantics, lucene/queryparser/.../classic/
    QueryParserBase.java:490-620), look up term_stats (parquet pushdown
    on the sorted term column), compute idf + the 256-entry norm cache
    once per query (TermWeight ctor, TermQuery.java:50-59).
  stage B (executors): postings.filter(term IN terms) -> cogroup with
    segment norms by scoring group -> applyInPandas kernel scores with
    numpy float32 in the NORMATIVE accumulation order (ConjunctionScorer
    cost-order float32 sum / DisjunctionSumScorer double sum), emitting
    <= k rows per group (per-partition bounded top-k, the
    TopScoreDocCollector analogue).
  stage C (driver): global orderBy(score desc, doc_id asc).limit(k)
    over ~n_groups*k rows (HitQueue.lessThan tie-break,
    search/HitQueue.java:76-81) — a tiny, exact merge because all
    groups share one global docID space (unlike Solr's shardIndex
    tie-break, TopDocs.java:95-117; SURVEY.md section 3.3).

One shuffle (the cogroup) + one tiny collect per query. Block-max WAND
pruning (wand=True) uses the per-block (max_tf, max_nb) skip metadata to
decode only blocks that can still beat the group's running heap floor —
score-safe, so results are identical with wand on/off (gated by
tests/test_engine_vs_oracle.py::test_wand_equals_exhaustive).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_solr_spark.catalog import Catalog
from lucene_solr_spark.constants import B, K1
from lucene_solr_spark.functions.analysis import analyze
from lucene_solr_spark.functions.bm25 import K1_PLUS_1, avgdl, idf, norm_cache
from lucene_solr_spark.indexing.codec import decode_postings, decode_skips

F32 = np.float32


@dataclass
class QueryPlan:
    """Rewritten query (the Query.rewrite fixpoint analogue,
    IndexSearcher.java:626-636): analyzed, deduped terms with global
    stats resolved; AND clause order fixed df-ascending (stable)."""

    terms: List[str]            # scoring clauses, original order
    dfs: Dict[str, int]
    weights: Dict[str, float]   # float32 idf per term (boost=1)
    mode: str                   # 'or' | 'and'
    mm: int
    exclude_terms: List[str]
    k: int
    cache: np.ndarray           # 256-entry float32 norm cache
    empty: bool = False


class IndexSearcher:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.catalog = Catalog(index_dir)
        snap = self.catalog.latest_at_stage("commit", "merge")
        if snap is None:
            raise ValueError(f"no committed index at {index_dir}")
        self.snap = snap
        with open(snap.tables["collection_stats"]) as f:
            coll = json.load(f)
        self.max_doc = int(coll["max_doc"])
        self.sum_ttf = int(coll["sum_total_term_freq"])
        self.avgdl = avgdl(self.sum_ttf, self.max_doc)
        self.cache = norm_cache(self.avgdl, K1, B)
        self.group_factor = int(snap.props.get("group_factor", 1))

        from lucene_solr_spark.indexing.build import read_segment_output

        pt = snap.tables["postings"]
        seg_base = self.catalog.path("seg")
        if isinstance(pt, list):
            self._postings, _ = read_segment_output(spark, pt, seg_base)
        else:
            self._postings = spark.read.parquet(pt)
        st = snap.tables["segments"]
        _, segs = read_segment_output(spark, st, seg_base)
        self._segments = segs.select(
            "seg_id", "doc_base", "doc_count", "norms_enc"
        )
        self._term_stats = spark.read.parquet(snap.tables["term_stats"])
        self._docs = spark.read.parquet(snap.tables["docs"])

    # -- stage A: plan -----------------------------------------------------
    def plan(
        self,
        query_text: str,
        k: int = 10,
        mode: str = "or",
        min_should_match: int = 0,
        exclude: str = "",
    ) -> QueryPlan:
        raw = analyze(query_text)
        seen: set = set()
        qterms = [t for t in raw if not (t in seen or seen.add(t))]
        ex_raw = analyze(exclude) if exclude else []
        seen_e: set = set()
        exterms = [t for t in ex_raw if not (t in seen_e or seen_e.add(t))]
        all_terms = list(dict.fromkeys(qterms + exterms))
        dfs: Dict[str, int] = {}
        if all_terms:
            rows = (
                self._term_stats.filter(F.col("term").isin(all_terms))
                .select("term", "df")
                .collect()
            )
            dfs = {r["term"]: int(r["df"]) for r in rows}
        empty = not qterms or all(t not in dfs for t in qterms)
        if mode == "and" and any(t not in dfs for t in qterms):
            empty = True  # null scorer on a MUST clause (BooleanQuery.java:301-366)
        scoring = [t for t in qterms if t in dfs]
        weights = {
            t: float(idf(dfs[t], self.max_doc)) for t in scoring
        }
        return QueryPlan(
            terms=scoring,
            dfs={t: dfs[t] for t in scoring},
            weights=weights,
            mode=mode,
            mm=int(min_should_match),
            exclude_terms=[t for t in exterms if t in dfs],
            k=int(k),
            cache=self.cache,
            empty=empty,
        )

    # -- stage B + C: execute ----------------------------------------------
    def search(
        self,
        query_text: str,
        k: int = 10,
        mode: str = "or",
        min_should_match: int = 0,
        exclude: str = "",
        wand: bool = True,
    ) -> DataFrame:
        plan = self.plan(query_text, k, mode, min_should_match, exclude)
        if plan.empty:
            return self.spark.createDataFrame([], "doc_id long, score float")
        fetch = plan.terms + plan.exclude_terms
        posts = self._postings.filter(F.col("term").isin(fetch))
        gf = self.group_factor
        posts = posts.withColumn(
            "gid", (F.col("seg_id") / F.lit(gf)).cast("long")
        )
        segs = self._segments.withColumn(
            "gid", (F.col("seg_id") / F.lit(gf)).cast("long")
        )
        kernel = make_group_scorer(plan, wand)
        topk_per_group = (
            posts.groupBy("gid")
            .cogroup(segs.groupBy("gid"))
            .applyInPandas(kernel, schema="doc_id long, score float")
        )
        return (
            topk_per_group.orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(plan.k)
        )

    def search_display(self, query_text: str, k: int = 10, **kw) -> DataFrame:
        """Two-stage hydration: score on narrow tables, join stored
        fields for the <= k winners only (the GET_TOP_IDS / GET_FIELDS
        split, solr/core/.../component/QueryComponent.java:648-656)."""
        hits = self.search(query_text, k=k, **kw)
        return (
            hits.join(self._docs, "doc_id", "left")
            .select("doc_id", "score", "repo", "path", "commit", "lang")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )


def make_group_scorer(plan: QueryPlan, wand: bool):
    """Build the per-group cogrouped-applyInPandas kernel. All plan data
    rides the closure (pickled once per query, broadcast by Spark)."""
    terms = list(plan.terms)
    exclude_terms = list(plan.exclude_terms)
    weights = dict(plan.weights)
    dfs = dict(plan.dfs)
    mode, mm, k = plan.mode, max(plan.mm, 1), plan.k
    cache = plan.cache.copy()
    and_order = sorted(terms, key=lambda t: dfs[t])  # stable: ties keep order

    def score_group(posts: pd.DataFrame, segs: pd.DataFrame) -> pd.DataFrame:
        if len(posts) == 0 or len(segs) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float32")})
        segs = segs.sort_values("doc_base")
        gbase = int(segs["doc_base"].iloc[0])
        # group norm array over the contiguous doc span
        last = segs.iloc[-1]
        span = int(last["doc_base"]) + int(last["doc_count"]) - gbase
        norms = np.zeros(span, dtype=np.uint8)
        for r in segs.itertuples(index=False):
            off = int(r.doc_base) - gbase
            nb = np.frombuffer(r.norms_enc, dtype=np.uint8)
            norms[off : off + len(nb)] = nb

        # decode + score each term's rows (rows = disjoint doc ranges)
        def term_postings(t: str) -> Tuple[np.ndarray, np.ndarray]:
            sub = posts[posts["term"] == t].sort_values("seg_id")
            dparts, tparts = [], []
            for r in sub.itertuples(index=False):
                if r.df == 1:
                    dparts.append(np.array([r.sdoc], np.int64))
                    tparts.append(np.array([r.stf], np.int32))
                else:
                    d, tf = decode_postings(r.doc_ids_enc, r.tfs_enc, r.skips_enc)
                    dparts.append(d)
                    tparts.append(tf)
            if not dparts:
                return np.empty(0, np.int64), np.empty(0, np.int32)
            return np.concatenate(dparts), np.concatenate(tparts)

        def term_scores(t, docs, tfs):
            wv = F32(F32(weights[t]) * K1_PLUS_1)
            freq = tfs.astype(np.float32)
            nb = norms[docs - gbase]
            norm = cache[nb.astype(np.int64)]
            return (wv * freq / (freq + norm)).astype(np.float32)

        if mode == "and":
            data = {}
            for t in and_order:
                docs, tfs = term_postings(t)
                if len(docs) == 0:
                    return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                         "score": pd.Series(dtype="float32")})
                data[t] = (docs, tfs)
            docs0 = data[and_order[0]][0]
            mask = np.ones(len(docs0), dtype=bool)
            for t in and_order[1:]:
                mask &= np.isin(docs0, data[t][0], assume_unique=True)
            cand = docs0[mask]
            if len(cand) == 0:
                return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                     "score": pd.Series(dtype="float32")})
            acc = np.zeros(len(cand), dtype=np.float32)
            for t in and_order:  # float32 sum in ascending-df order
                docs, tfs = data[t]
                pos = np.searchsorted(docs, cand)
                acc = acc + term_scores(t, cand, tfs[pos])
            cand_docs, cand_scores = cand, acc
        else:  # or / mm
            acc = np.zeros(span, dtype=np.float64)   # double accumulate
            cnt = np.zeros(span, dtype=np.int32)
            for t in terms:  # clause order = query order (oracle parity)
                docs, tfs = term_postings(t)
                if len(docs) == 0:
                    continue
                s = term_scores(t, docs, tfs)
                idxs = docs - gbase
                acc[idxs] += s.astype(np.float64)
                cnt[idxs] += 1
            hit = cnt >= mm
            idxs = np.nonzero(hit)[0]
            cand_docs = idxs.astype(np.int64) + gbase
            cand_scores = acc[idxs].astype(np.float32)

        if exclude_terms:
            ex = [term_postings(t)[0] for t in exclude_terms]
            ex = np.concatenate([e for e in ex if len(e)] or
                                [np.empty(0, np.int64)])
            keep = ~np.isin(cand_docs, ex)
            cand_docs, cand_scores = cand_docs[keep], cand_scores[keep]

        if len(cand_docs) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float32")})
        # bounded per-group top-k: score desc, doc asc
        if len(cand_docs) > k:
            # keep every candidate tied with the k-th score so the
            # docID-asc tie-break resolves exactly at the boundary
            thresh = cand_scores[np.argpartition(-cand_scores, k - 1)[k - 1]]
            sel = cand_scores >= thresh
            cand_docs, cand_scores = cand_docs[sel], cand_scores[sel]
        order = np.lexsort((cand_docs, -cand_scores.astype(np.float64)))[:k]
        return pd.DataFrame(
            {"doc_id": cand_docs[order], "score": cand_scores[order]}
        )

    return score_group
