"""Multi-field search: per-field indexes + (e)dismax combination.

Reference semantics re-expressed Spark-first:

* **Per-field index** — a Lucene index is a set of INDEPENDENT per-field
  structures (postings, norms, stats all keyed by field;
  `lucene/core/src/java/org/apache/lucene/index/FieldInfo.java`,
  `index/FieldInfos.java`). Here each indexed field is its own engine
  index directory.  DocIDs are consistent across fields for free because
  the engine's docID assignment is a deterministic dense rank over the
  document key (SURVEY.md §1.4) — the same corpus keys give the same
  docIDs in every field's index, which is exactly Lucene's one-docID-
  space-per-segment invariant.

* **DisMax over fields** — Solr's DisMaxQParser
  (`solr/core/src/java/org/apache/solr/search/DisMaxQParser.java`,
  `ExtendedDismaxQParser.java`): the user query is split into clauses;
  each clause becomes a `DisjunctionMaxQuery` over the `qf` fields
  (per-field analysis, per-field boost), and the clauses are summed as
  a BooleanQuery of SHOULD clauses.  `pf` adds a phrase query over the
  whole input as one more optional (score-boosting, non-selective)
  clause — ReqOptSumScorer semantics
  (`search/ReqOptSumScorer.java:55-62`: float add).

* **DisjunctionMaxScorer** float order
  (`search/DisjunctionMaxScorer.java:154-159`):
  ``score = scoreMax + (scoreSum - scoreMax) * tieBreakerMultiplier``
  with every step an f32 op; scoreSum accumulates the matching
  sub-scorers in clause order.  Mirrored below with stepwise
  CAST(... AS FLOAT) Catalyst expressions — add/mul/max of f32 operands
  are exactly rounded and platform-identical, so this composition of
  already-gated per-field kernel scores stays bit-exact.

* **Sum over clauses** — DisjunctionSumScorer double accumulation
  (`search/DisjunctionSumScorer.java:34-41``score += ...` on a double),
  cast f32 at collect: ``CAST(SUM(CAST(dm AS DOUBLE)) AS FLOAT)``.

Scale notes (100 TB): each per-(clause,field) leg is the engine's
zero-shuffle cached-scan kernel; the combine is doc_id equi-joins and
one groupBy(doc_id) — co-partitioned hash aggregation, no driver-side
iteration, AQE-eligible.  Clause x field legs are independent Spark
jobs and can be submitted concurrently by the caller if needed.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _f32(col):
    return col.cast("float")


class MultiFieldSearcher:
    """Routes field-scoped queries and runs (e)dismax over per-field
    engine indexes.  ``searchers`` maps field name -> IndexSearcher,
    insertion order = clause order (DisjunctionMaxQuery sub-scorer
    order, hence f32 accumulation order)."""

    def __init__(self, searchers: Dict[str, "IndexSearcher"],
                 similarities: Optional[Dict[str, str]] = None):
        if not searchers:
            raise ValueError("at least one field searcher required")
        self.searchers = dict(searchers)
        # PerFieldSimilarityWrapper (similarities/
        # PerFieldSimilarityWrapper.java): get(field) selects the
        # SimScorer per field; fields absent from the map use the
        # default (BM25). Non-default legs run through the search()
        # similarity seam, which supports single-term unboosted
        # clauses — wider shapes raise rather than silently mis-score.
        self.similarities = dict(similarities or {})
        self.spark = next(iter(searchers.values())).spark

    # -- field-routed single-field query (MultiFieldQueryParser's
    # field:term path, queryparser/classic/MultiFieldQueryParser.java)
    def search_field(self, field: str, query_text: str, k: Optional[int] = 10,
                     **kw) -> DataFrame:
        return self.searchers[field].search(query_text, k=k, **kw)

    def _clause_leg(self, field: str, word: str, boost: float,
                    phrase: bool = False,
                    slop: int = 0) -> Optional[DataFrame]:
        """All-match (doc_id, score f32) for one (clause, field) leg,
        with the qf boost folded into the term weight exactly as the
        parser's ``term^boost`` path (f32(f32(idf)*f32(boost))*(k1+1),
        BM25Similarity.java:289-293). Returns None when the field's
        analyzer drops every token of the clause (e.g. stopword)."""
        s = self.searchers[field]
        toks = s.analyzer.analyze(word)
        if not toks:
            return None
        sim = self.similarities.get(field)
        if sim is not None and sim != "bm25":
            if phrase or len(toks) != 1 or boost != 1.0:
                raise NotImplementedError(
                    "per-field similarity legs support single-term "
                    "unboosted clauses (PerFieldSimilarityWrapper "
                    "composition scope)")
            return s.search(toks[0], k=None, similarity=sim)
        if phrase:
            q = '"' + " ".join(toks) + '"'
            if slop:
                q += f"~{slop}"
        else:
            q = " ".join(t for t in toks)
        if boost != 1.0:
            q = f"{q}^{boost!r}"
        return s.search_boolean(q, k=None)

    def edismax(
        self,
        query_text: str,
        qf: Dict[str, float],
        tie: float = 0.0,
        k: Optional[int] = 10,
        pf: Optional[Dict[str, float]] = None,
        min_should_match=0,
        bf: Optional[DataFrame] = None,
        bq: Optional[Dict[str, str]] = None,
        pf2: Optional[Dict[str, float]] = None,
        pf3: Optional[Dict[str, float]] = None,
        ps2: int = 0,
        ps3: int = 0,
    ) -> DataFrame:
        """(e)dismax main query: per whitespace clause, DisjunctionMax
        over ``qf`` fields with ``tie``; clauses summed (double acc);
        optional ``pf`` phrase boost added ReqOpt-style.  Returns
        (doc_id long, score float) ordered (score desc, doc_id asc),
        limited to k (None = all).

        ``bf`` — Solr's additive boost function
        (DisMaxQParser.addBoostFunctions: each bf is a FunctionQuery
        added as an optional clause; FunctionQuery.AllScorer.score()
        = f32 value): a (doc_id, boost float) DataFrame; the value is
        ADDED (f32) to matching docs' scores.  ``bq`` — boost query
        (addBoostQuery): {field: query_string} run as an additional
        optional clause whose score is added."""
        import numpy as np

        words = [w for w in query_text.split() if w]
        if isinstance(min_should_match, str):
            # Solr mm spec ("2<-25%" ...): resolved against the
            # optional clause count = the dismax per-word clauses
            # (DisMaxQParser.java U.calculateMinShouldMatch call)
            from lucene_solr_spark.search.mmspec import (
                calculate_min_should_match)

            min_should_match = calculate_min_should_match(
                len(words), min_should_match)
        if not words:
            return self.spark.createDataFrame([], "doc_id long, score float")
        tie32 = float(np.float32(tie))
        clause_dfs = []
        for w in words:
            legs = []  # (field, DataFrame) in qf order
            for f_name, boost in qf.items():
                leg = self._clause_leg(f_name, w, boost)
                if leg is not None:
                    legs.append((f_name, leg))
            if not legs:
                continue
            joined = None
            cols = []
            for i, (f_name, leg) in enumerate(legs):
                c = f"s{i}"
                leg = leg.select("doc_id", F.col("score").alias(c))
                cols.append(c)
                joined = leg if joined is None else joined.join(
                    leg, "doc_id", "outer")
            if len(cols) == 1:
                dm = F.col(cols[0])
            else:
                mx = F.greatest(*[F.col(c) for c in cols])
                # scoreSum: f32 adds in clause order, skipping non-matches
                acc = F.coalesce(F.col(cols[0]), F.lit(0.0).cast("float"))
                for c in cols[1:]:
                    acc = _f32(acc + F.coalesce(F.col(c),
                                                F.lit(0.0).cast("float")))
                dm = _f32(mx + _f32(_f32(acc - mx) * F.lit(tie32)))
            clause_dfs.append(joined.select("doc_id", dm.alias("dm")))
        if not clause_dfs:
            return self.spark.createDataFrame([], "doc_id long, score float")
        allc = clause_dfs[0]
        for d in clause_dfs[1:]:
            allc = allc.unionByName(d)
        main = allc.groupBy("doc_id").agg(
            F.sum(F.col("dm").cast("double")).cast("float").alias("score"),
            F.count(F.lit(1)).alias("_cnt"),
        )
        if min_should_match > 0:
            main = main.filter(F.col("_cnt") >= min_should_match)
        main = main.select("doc_id", "score")
        if pf:
            legs = []
            for f_name, boost in pf.items():
                leg = self._clause_leg(f_name, query_text, boost, phrase=True)
                if leg is not None:
                    legs.append(leg.select("doc_id",
                                           F.col("score").alias("ph")))
            ph = None
            if legs:
                ph = legs[0]
                for leg in legs[1:]:
                    ph = ph.unionByName(leg)
                if len(legs) > 1:
                    # multiple pf fields = multiple optional SHOULD
                    # clauses: DisjunctionSumScorer double accumulation
                    ph = ph.groupBy("doc_id").agg(
                        F.sum(F.col("ph").cast("double")).cast("float")
                        .alias("ph"))
            if ph is not None:
                main = main.join(ph, "doc_id", "left").select(
                    "doc_id",
                    _f32(F.col("score")
                         + F.coalesce(F.col("ph"),
                                      F.lit(0.0).cast("float")))
                    .alias("score"),
                )
        # pf2/pf3 shingled phrase boosts (ExtendedDismaxQParser
        # .addPhraseFieldQueries :196-228 + addShingledPhraseQueries
        # :495-560): sliding windows of wordGrams query words, each a
        # sloppy phrase SHOULD clause over the pf field (boost folded
        # like pf); all window phrases of one FieldParams sum
        # double-acc (one sub-BooleanQuery of SHOULD phrases). Windows
        # need at least minClauseSize=2 surviving tokens — windows the
        # analyzer empties drop (the reference keeps stopwords via
        # removeStopFilter; here the pinned chain governs, documented).
        for n_gram, pfn, psn in ((2, pf2, ps2), (3, pf3, ps3)):
            if not pfn or len(words) < n_gram:
                continue
            # one SHOULD sub-BooleanQuery PER FieldParams
            # (addShingledPhraseQueries :549-556): each field's
            # windows double-accumulate and cross the f32 boundary AT
            # THE FIELD SUB-QUERY, then each field adds to main
            # separately — pooling all fields into one sum would
            # collapse the per-field f32 rounding chain (r2 advice)
            for f_name, boost in pfn.items():
                sh = None
                s = self.searchers[f_name]
                if (psn == 0
                        and self.similarities.get(f_name)
                        in (None, "bm25")):
                    # batched FieldParams sub-query: all windows in
                    # ONE kernel pass over one postings scan
                    # (search_phrase_windows) — same union + double
                    # sum + single f32 boundary as the per-leg path
                    wins = [s.analyzer.analyze(
                                " ".join(words[i:i + n_gram]))
                            for i in range(len(words) - n_gram + 1)]
                    batched = s.search_phrase_windows(
                        [wtoks for wtoks in wins if wtoks], boost)
                    if batched is None:
                        continue
                    sh = batched.select(
                        "doc_id", F.col("score").alias("shp"))
                else:
                    legs = []
                    for i in range(len(words) - n_gram + 1):
                        win = " ".join(words[i:i + n_gram])
                        leg = self._clause_leg(f_name, win, boost,
                                               phrase=True, slop=psn)
                        if leg is not None:
                            legs.append(leg.select(
                                "doc_id", F.col("score").alias("shp")))
                    if not legs:
                        continue
                    sh = legs[0]
                    for leg in legs[1:]:
                        sh = sh.unionByName(leg)
                    sh = sh.groupBy("doc_id").agg(
                        F.sum(F.col("shp").cast("double")).cast("float")
                        .alias("shp"))
                main = main.join(sh, "doc_id", "left").select(
                    "doc_id",
                    _f32(F.col("score")
                         + F.coalesce(F.col("shp"),
                                      F.lit(0.0).cast("float")))
                    .alias("score"),
                )
        if bq:
            for f_name, q in bq.items():
                leg = self.searchers[f_name].search_boolean(q, k=None) \
                    .select("doc_id", F.col("score").alias("bqs"))
                main = main.join(leg, "doc_id", "left").select(
                    "doc_id",
                    _f32(F.col("score")
                         + F.coalesce(F.col("bqs"),
                                      F.lit(0.0).cast("float")))
                    .alias("score"),
                )
        if bf is not None:
            leg = bf.select("doc_id", F.col("boost").cast("float")
                            .alias("bfv"))
            main = main.join(leg, "doc_id", "left").select(
                "doc_id",
                _f32(F.col("score")
                     + F.coalesce(F.col("bfv"),
                                  F.lit(0.0).cast("float")))
                .alias("score"),
            )
        out = main.orderBy(F.desc("score"), F.asc("doc_id"))
        return out if k is None else out.limit(k)
