"""Category-association facet aggregation (lucene/facet/associations).

Reference: ``SumIntAssociationFacetsAggregator.aggregate`` and
``SumFloatAssociationFacetsAggregator.aggregate`` (lucene/facet/src/
java/org/apache/lucene/facet/associations/*.java) — over the matching
docs of a FacetsCollector run, each document contributes its per-
category association value, summed per category ordinal.

Shape notes:

- The int aggregator accumulates into an int array; we widen to long
  (Spark ``sum``), which is order-free and fully partial-aggregated —
  the scalable path (one shuffle on the category key, map-side
  combine).
- The float aggregator accumulates float32 in docID order into one
  FacetArrays (single-threaded over the collector's matching docs), so
  the result depends on the fold order. We reproduce that exactly: an
  ``array_sort(collect_list(...))`` per category + a stepwise-f32
  ``aggregate`` fold in docID order. That per-category materialization
  is the price of bit parity with the reference's sequential sum — at
  100 TB you would trade it for the order-free double sum (documented
  divergence), exactly as Lucene 5+ did when associations moved to
  taxonomy arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sum_associations(assoc: DataFrame) -> DataFrame:
    """``assoc``: (doc_id, category, int_val, float_val) — one row per
    (matching doc, category) with that doc's association values.
    Returns (category, sum_int, sum_float): long exact sum + float32
    docID-order sequential sum per category."""
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col("doc_id"), F.col("float_val")))
    )
    fold = F.aggregate(
        pairs,
        F.lit(0.0).cast("float"),
        lambda acc, x: (
            acc.cast("double") + x["float_val"].cast("double")
        ).cast("float"),
    )
    return (
        assoc.groupBy("category")
        .agg(
            F.sum(F.col("int_val").cast("long")).alias("sum_int"),
            fold.alias("sum_float"),
        )
        .select("category", "sum_int", "sum_float")
    )


DEFAULT_COMPLEMENT_THRESHOLD = 0.6
DISABLE_COMPLEMENT = float("inf")
FORCE_COMPLEMENT = 0.0


def complement_facet_counts(doc_cats: DataFrame, hits: DataFrame,
                            num_docs: int, num_hits: int,
                            totals: DataFrame = None,
                            complement_threshold: float =
                            DEFAULT_COMPLEMENT_THRESHOLD):
    """Complement facet counting (facet/complements/
    TotalFacetCounts.java + ComplementCountingAggregator.java:37-49,
    StandardFacetsAccumulator.java:77-151,250-252): when the hit set
    covers MORE than ``numDocs * complementThreshold`` of the index
    (0.6 default; 0 forces, +inf disables), count categories over the
    COMPLEMENT of the hits and subtract from the cached per-category
    totals — the aggregator literally decrements the totals array.

    Relational shape: ``totals`` is the TotalFacetCountsCache analogue
    (pass a persisted/broadcast-reused DataFrame; recomputed here when
    absent), the complement is one anti-join (cheap by construction —
    it is the SMALL side when complementing fires), and the subtract
    is a left join on the category key. At 100 TB this converts a
    90%-selectivity facet from a shuffle over 90% of the corpus into
    one over 10% of it. Returns (counts_df, used_complements)."""
    use = num_hits > num_docs * complement_threshold
    if not use:
        direct = (doc_cats.join(hits.select("doc_id"), "doc_id",
                                "semi")
                  .groupBy("category")
                  .agg(F.count(F.lit(1)).cast("long").alias("count")))
        return direct, False
    if totals is None:
        totals = (doc_cats.groupBy("category")
                  .agg(F.count(F.lit(1)).cast("long").alias("total")))
    comp = (doc_cats.join(hits.select("doc_id"), "doc_id", "anti")
            .groupBy("category")
            .agg(F.count(F.lit(1)).cast("long").alias("comp")))
    out = (totals.join(comp, "category", "left")
           .select("category",
                   (F.col("total")
                    - F.coalesce(F.col("comp"), F.lit(0)))
                   .cast("long").alias("count"))
           .filter(F.col("count") > 0))
    return out, True
