"""Lucene classification module, re-expressed as Spark DataFrame plans.

Reference (lucene/classification/src/java/org/apache/lucene/classification/):

- ``SimpleNaiveBayesClassifier.java`` — train :66-76 (docsWithClassSize =
  docCount of the class field), assignClass :106-127 (iterate the class
  field's terms in sorted order, strict ``>`` keeps the earliest class on
  ties), calculateLikelihood :131-149 (per token:
  ``(hits(text:word AND class:c) + 1) / (avgUniqueTermsPerDoc * docsWithC
  + docsWithClassSize)``; hits is a DOC count, not a term-freq sum),
  getTextTermFreqForClass :152-158 (avgUniqueTermsPerDoc =
  sumDocFreq(text) / docCount(text), collection-level),
  calculatePrior :172-178 (docFreq(class=c) / docsWithClassSize).
- ``KNearestNeighborClassifier.java`` — assignClass :60-67 (MoreLikeThis
  term selection over the input text, top-k search, NO self-exclusion),
  selectClassFromNeighbors :69-95 (majority vote, score = votes / k).

Spark-first deltas (documented, semantics-preserving):

- The reference multiplies raw double probabilities (its own ``TODO:
  turn it to be in log scale``); long documents underflow to 0.0 there.
  We compute the mathematically identical **log**-likelihood
  ``sum(tf_w * ln(hits_w + 1)) - T * ln(den_c) + ln(prior_c)`` so the
  argmax is well-defined at any document length. The per-token numerator
  for a term the class never saw is ``ln(0 + 1) = 0``, so only matched
  (term, class) rows contribute to the sum — an inner join, no dense
  cross product.
- Class argmax tie-break: the reference keeps the earliest class in the
  class field's sorted term order -> ``(score desc, class asc)`` window.
- KNN majority tie-break: the reference iterates a ``HashMap`` (JVM
  iteration order, nondeterministic); we pin ``(votes desc, class asc)``.

Scale shape: training is one explode + dropDuplicates + groupBy over
(term, class) — the same shuffle profile as the index build; the model's
class table is tiny and broadcast; classification joins input tokens to
the (term, class) table hash-partitioned by term, then aggregates per
(doc, class). No driver-side loops, no per-row Python.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class NaiveBayesModel:
    """Trained model state: per-(term, class) doc counts plus the tiny
    per-class constant table (ln prior, ln denominator)."""

    def __init__(self, term_class_df: DataFrame, class_stats: DataFrame,
                 id_col: str, toks_col: str, class_col: str):
        self.term_class_df = term_class_df
        self.class_stats = class_stats
        self.id_col = id_col
        self.toks_col = toks_col
        self.class_col = class_col

    def classify(self, inputs: DataFrame) -> DataFrame:
        """Assign a class to every input row.

        ``inputs``: (id_col, toks_col array<string>) — tokenized with the
        SAME analyzer as training (SimpleNaiveBayesClassifier.tokenizeDoc
        re-analyzes with the index analyzer).

        Returns (id_col, pred_<class_col>, ll double) — one row per
        input, ll = log(prior * likelihood).
        """
        idc, cls = self.id_col, self.class_col
        tok_tf = (
            inputs.select(idc, F.explode(self.toks_col).alias("term"))
            .groupBy(idc, "term")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        matched = (
            tok_tf.join(self.term_class_df, "term")
            .groupBy(idc, cls)
            .agg(
                F.sum(
                    F.col("cnt").cast("double")
                    * F.log(F.col("dfc").cast("double") + 1.0)
                ).alias("msum")
            )
        )
        base = (
            inputs.select(
                idc, F.size(self.toks_col).cast("double").alias("tlen")
            )
            .crossJoin(F.broadcast(self.class_stats))
        )
        ll = (
            base.join(matched, [idc, cls], "left")
            .select(
                idc,
                cls,
                (
                    F.coalesce(F.col("msum"), F.lit(0.0))
                    + F.col("ln_prior")
                    - F.col("tlen") * F.col("ln_den")
                ).alias("ll"),
            )
        )
        w = Window.partitionBy(idc).orderBy(F.desc("ll"), F.asc(cls))
        return (
            ll.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(idc, F.col(cls).alias(f"pred_{cls}"), "ll")
        )


def train_naive_bayes(
    docs: DataFrame,
    id_col: str = "doc_id",
    toks_col: str = "toks",
    class_col: str = "cls",
) -> NaiveBayesModel:
    """Train per SimpleNaiveBayesClassifier.train/calculate* semantics.

    ``docs``: (id_col, toks_col array<string>, class_col string) — one
    row per training document, already analyzed.
    """
    exploded = docs.select(
        id_col, class_col, F.explode(toks_col).alias("term")
    )
    # hits(text:word AND class:c): DOC count per (term, class)
    pairs = exploded.dropDuplicates([id_col, "term"])
    term_class_df = (
        pairs.groupBy("term", class_col)
        .agg(F.count(F.lit(1)).alias("dfc"))
    )
    # collection constants (one tiny job): sumDocFreq(text) = distinct
    # (doc, term) pairs; docCount(text) = docs with >= 1 token;
    # docsWithClassSize = docs carrying the class field
    g = pairs.agg(
        F.count(F.lit(1)).alias("sum_df"),
        F.countDistinct(id_col).alias("doc_cnt"),
    ).collect()[0]
    sum_df, doc_cnt = int(g["sum_df"]), int(g["doc_cnt"])
    n_class_docs = docs.filter(F.col(class_col).isNotNull()).count()
    avg_unique = sum_df / doc_cnt if doc_cnt else 0.0
    class_stats = (
        docs.filter(F.col(class_col).isNotNull())
        .groupBy(class_col)
        .agg(F.count(F.lit(1)).alias("nc"))
        .select(
            class_col,
            F.log(F.col("nc").cast("double") / float(n_class_docs))
            .alias("ln_prior"),
            F.log(
                F.col("nc").cast("double") * float(avg_unique)
                + float(n_class_docs)
            ).alias("ln_den"),
        )
    )
    return NaiveBayesModel(term_class_df, class_stats, id_col, toks_col,
                           class_col)


def knn_classify(
    searcher,
    store: DataFrame,
    input_ids: Sequence[int],
    k: int = 10,
    text_col: str = "content",
    class_col: str = "lang",
    min_tf: int = 2,
    min_df: int = 5,
    max_terms: int = 25,
) -> DataFrame:
    """KNearestNeighborClassifier.assignClass for a batch of stored docs.

    Per input: MoreLikeThis term selection over the input's text
    (tf >= min_tf, df >= min_df, top ``max_terms`` by tf*idf with the
    deterministic (score desc, term asc) tie-break shared with
    ``IndexSearcher.more_like_this``), one BM25 OR query, top-k
    neighbors (the input doc itself is NOT excluded — the reference
    classifies raw text with no self-exclusion), majority class.

    The whole batch runs as ONE ``search_many`` job (the reference's
    shared-IndexSearcher analogue); votes and the argmax are executor-
    side joins. Returns (id, pred_<class_col>, votes int) ordered by id.

    Driver-side state is bounded by len(input_ids) * max_terms strings —
    use batches of a few thousand inputs per call at scale.
    """
    import math as _math

    import numpy as np

    F32 = np.float32
    rows = (
        store.filter(F.col("doc_id").isin(*[int(i) for i in input_ids]))
        .select("doc_id", text_col)
        .collect()
    )
    texts: Dict[int, str] = {int(r["doc_id"]): (r[text_col] or "")
                             for r in rows}
    ordered_ids = [int(i) for i in input_ids if int(i) in texts]
    analyze = searcher.analyzer.analyze
    per_doc_tf: List[Tuple[int, Dict[str, int]]] = []
    all_cand: set = set()
    for did in ordered_ids:
        tf: Dict[str, int] = {}
        for t in analyze(texts[did]):
            tf[t] = tf.get(t, 0) + 1
        cand = {t: n for t, n in tf.items() if n >= min_tf}
        per_doc_tf.append((did, cand))
        all_cand.update(cand)
    dfs = searcher._lookup_dfs(sorted(all_cand))
    max_doc = searcher.max_doc
    queries = []
    qid_to_doc: List[int] = []
    for did, cand in per_doc_tf:
        scored = []
        for t, n in cand.items():
            df_t = dfs.get(t)
            if df_t is None or df_t < min_df:
                continue
            idf_t = F32(_math.log(max_doc / (df_t + 1.0)) + 1.0)
            scored.append((float(F32(n * idf_t)), t))
        scored.sort(key=lambda st: (-st[0], st[1]))
        terms = [t for _, t in scored[:max_terms]]
        if terms:
            queries.append({"query_text": " ".join(terms), "mode": "or"})
            qid_to_doc.append(did)
    if not queries:
        return searcher.spark.createDataFrame(
            [], f"doc_id long, pred_{class_col} string, votes int"
        )
    hits = searcher.search_many(queries, k=k)
    qmap = searcher.spark.createDataFrame(
        [(qi, did) for qi, did in enumerate(qid_to_doc)],
        "query_id int, src_doc_id long",
    )
    votes = (
        hits.join(F.broadcast(qmap), "query_id")
        .join(
            store.select(F.col("doc_id").alias("nbr"), class_col),
            F.col("doc_id") == F.col("nbr"),
        )
        .groupBy("src_doc_id", class_col)
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("src_doc_id").orderBy(
        F.desc("votes"), F.asc(class_col)
    )
    return (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("src_doc_id").alias("doc_id"),
            F.col(class_col).alias(f"pred_{class_col}"),
            F.col("votes").cast("int").alias("votes"),
        )
        .orderBy("doc_id")
    )
