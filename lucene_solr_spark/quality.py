"""Relevance-quality metrics (lucene/benchmark/src/java/org/apache/
lucene/benchmark/quality/QualityStats.java, fed by a TREC-style Judge):
per-query precision@N, MRR, average precision, and recall over a ranked
result list joined to a relevance-judgment set.

Reference rules re-expressed exactly:
  - precision@n = |relevant in top n| / n (QualityStats.java:96-97);
    when n exceeds the number of returned points, the tail is padded as
    numPoints * p(numPoints) / n (:110-113 getPrecisionAt).
  - MRR = 1/rank of the FIRST relevant hit, but only when that rank is
    within the top 5; otherwise 0 (:87-89 — "first point, but only
    within 5 top scores").
  - avg precision = sum of precision at each relevant rank /
    maxGoodPoints (:93-94 pReleventSum; :121-123 getAvp), 0 when the
    query has no relevant docs.
  - recall = |relevant found| / maxGoodPoints (:99).

100 TB plan: one window (rank within query) over the results, one
aggregate per query — both hash-partitioned on query_id; judgments
join is a broadcastable semi-join per query key. No driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["quality_stats"]


def quality_stats(results: DataFrame, judgments: DataFrame,
                  precision_points=(5, 10)) -> DataFrame:
    """Per-query QualityStats.

    results: (query_id, doc_id, rank) with rank 1-based and dense per
    query (the collector's result order). judgments: (query_id,
    doc_id) relevant pairs. Returns one row per query_id:
    p_at_<n> for each requested point, mrr, avg_precision, recall,
    num_good, max_good, num_points.
    """
    j = judgments.select("query_id", "doc_id",
                         F.lit(True).alias("_rel"))
    r = (results.select("query_id", "doc_id", "rank")
         .join(j, ["query_id", "doc_id"], "left")
         .withColumn("rel", F.coalesce("_rel", F.lit(False))))
    w = (Window.partitionBy("query_id").orderBy("rank")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    r = r.withColumn("good_upto",
                     F.sum(F.col("rel").cast("long")).over(w))
    # pReleventSum as an ORDERED cumulative sum (rank 1..n), so the
    # double accumulation order is deterministic and reproducible
    # across partitionings (and matches a rank-ordered oracle)
    r = r.withColumn(
        "_prelsum_upto",
        F.sum(F.when(F.col("rel"),
                     F.col("good_upto").cast("double") / F.col("rank"))
              ).over(w))
    # per-query totals over returned points
    aggs = [
        F.max("rank").alias("num_points"),
        F.max("good_upto").alias("num_good"),
        F.max("_prelsum_upto").alias("_prelsum"),
        # first relevant rank (for the MRR top-5 rule)
        F.min(F.when(F.col("rel"), F.col("rank"))).alias("_first_rel"),
    ]
    for n in precision_points:
        aggs.append(
            F.max(F.when(F.col("rank") == n,
                         F.col("good_upto").cast("double") / n))
            .alias(f"_p{n}_exact"))
    per_q = r.groupBy("query_id").agg(*aggs)
    # max_good = |judged relevant| per query (maxGoodPoints)
    mg = judgments.groupBy("query_id").agg(
        F.count_distinct("doc_id").alias("max_good"))
    out = per_q.join(mg, "query_id", "left").na.fill({"max_good": 0})
    cols = [F.col("query_id")]
    for n in precision_points:
        # tail padding: n > numPoints -> numGood / n
        cols.append(
            F.coalesce(
                F.col(f"_p{n}_exact"),
                F.col("num_good").cast("double") / F.lit(n),
            ).alias(f"p_at_{n}"))
    cols += [
        F.when(F.col("_first_rel") <= 5,
               F.lit(1.0) / F.col("_first_rel"))
        .otherwise(F.lit(0.0)).alias("mrr"),
        F.when(F.col("max_good") > 0,
               F.coalesce(F.col("_prelsum"), F.lit(0.0))
               / F.col("max_good"))
        .otherwise(F.lit(0.0)).alias("avg_precision"),
        F.when(F.col("max_good") > 0,
               F.col("num_good").cast("double") / F.col("max_good"))
        .otherwise(F.col("num_good").cast("double")
                   / F.col("num_points")).alias("recall"),
        F.col("num_good").cast("long").alias("num_good"),
        F.col("max_good").cast("long").alias("max_good"),
        F.col("num_points").cast("long").alias("num_points"),
    ]
    return out.select(*cols)
