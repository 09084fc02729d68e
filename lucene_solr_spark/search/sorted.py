"""Index-time sorting + early-terminating sorted queries.

Re-expresses `lucene/misc/src/java/org/apache/lucene/index/sorter/`:
SortingMergePolicy (segments kept sorted by a field at merge time) +
EarlyTerminatingSortingCollector (a query sorted by the SAME field
stops after k docs per segment, because segment order == sort order).

Spark shape: a sort projection of the per-doc columns, written
range-partitioned AND range-ORDERED into bucket directories
(``bucket=000..N``, total order across buckets by (field, doc_id) via
repartitionByRange + sortWithinPartitions). A top-k query in index
order then reads bucket files IN ORDER and stops as soon as k rows are
on hand — I/O proportional to k, not to the corpus. That is the
100 TB win the reference gets from early termination: the scan never
touches the 99.99% of segments that cannot contain the top-k.

The projection is a derived table like postings/norms: rebuilt from a
snapshot, never mutated in place.
"""

from __future__ import annotations

import os
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SortedIndex:
    """A persisted sort projection over per-doc values."""

    def __init__(self, spark: SparkSession, out_dir: str, field: str):
        self.spark = spark
        self.out_dir = out_dir
        self.field = field

    @classmethod
    def build(cls, searcher, field: str, out_dir: str,
              buckets: int = 16) -> "SortedIndex":
        """Materialize the sort projection: total order by
        (field, doc_id) across bucket dirs (SortingMergePolicy's
        sorted-segment invariant)."""
        df = searcher.doc_stats().select("doc_id", field)
        n = max(1, min(buckets, searcher.max_doc))
        ranged = (
            df.repartitionByRange(n, F.col(field), F.col("doc_id"))
            .sortWithinPartitions(field, "doc_id")
            .withColumn("bucket", F.spark_partition_id())
        )
        ranged.write.mode("overwrite").partitionBy("bucket") \
            .parquet(out_dir)
        return cls(searcher.spark, out_dir, field)

    def _bucket_dirs(self) -> List[str]:
        out = []
        for name in os.listdir(self.out_dir):
            if name.startswith("bucket="):
                out.append((int(name.split("=", 1)[1]),
                            os.path.join(self.out_dir, name)))
        return [p for _, p in sorted(out)]

    def top(self, k: int, ascending: bool = True) -> DataFrame:
        """Top-k in index sort order, early-terminated: bucket dirs are
        opened in sort order and reading stops once >= k rows are on
        hand (EarlyTerminatingSortingCollector.collect throws
        CollectionTerminatedException after numDocsToCollect — here the
        remaining buckets are simply never read)."""
        dirs = self._bucket_dirs()
        if not ascending:
            dirs = list(reversed(dirs))
        taken: List[str] = []
        have = 0
        for d in dirs:
            taken.append(d)
            have += self.spark.read.parquet(d).count()
            if have >= k:
                break
        if not taken:
            return self.spark.createDataFrame(
                [], f"doc_id long, {self.field} long")
        df = self.spark.read.parquet(*taken).drop("bucket")
        order = ([F.asc(self.field), F.asc("doc_id")] if ascending
                 else [F.desc(self.field), F.desc("doc_id")])
        return df.orderBy(*order).limit(k)

    def files_read_for(self, k: int, ascending: bool = True) -> int:
        """Diagnostic: how many bucket dirs a top-k touches."""
        dirs = self._bucket_dirs()
        if not ascending:
            dirs = list(reversed(dirs))
        have = 0
        for i, d in enumerate(dirs, 1):
            have += self.spark.read.parquet(d).count()
            if have >= k:
                return i
        return len(dirs)


def sort_field_order(col, reverse: bool = False,
                     missing_last=None):
    """SortField missing-value policy (Solr schema sortMissingLast/
    sortMissingFirst; solr/core/.../search/
    MissingStringLastComparatorSource.java + Sorting.getStringSortField
    — Sorting.java:34-55): returns the Catalyst sort order for one
    field.

      missing_last=True   missing docs sort LAST whether asc or desc
      missing_last=False  missing docs sort FIRST whether asc or desc
      missing_last=None   Lucene default: missing behaves as the
                          field type's null ordering (low value —
                          first on asc, last on desc)
    """
    from pyspark.sql import functions as F

    if missing_last is None:
        return F.desc(col) if reverse else F.asc(col)
    if missing_last:
        return F.desc_nulls_last(col) if reverse \
            else F.asc_nulls_last(col)
    return F.desc_nulls_first(col) if reverse \
        else F.asc_nulls_first(col)
