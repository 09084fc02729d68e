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
