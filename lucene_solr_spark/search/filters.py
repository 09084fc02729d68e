"""Filter algebra (lucene/queries/src/java/org/apache/lucene/queries/
BooleanFilter.java, ChainedFilter.java): combine non-scoring doc-set
filters with AND / OR / ANDNOT / XOR.

ChainedFilter.java:44-52 defines the logic table; XOR is the one
operator the plain BooleanQuery composition can't express. Each doc
set is a narrow (doc_id) DataFrame (TermsFilter, multi-term doc sets,
range filters...), so every combinator is a single shuffle-on-doc_id
set operation — at 100 TB these are hash joins/aggregates on a long
column, broadcastable when one side is small.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chained_filter", "OPS"]


def _and(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.join(b, "doc_id", "leftsemi")


def _or(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).distinct()


def _andnot(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.join(b, "doc_id", "left_anti")


def _xor(a: DataFrame, b: DataFrame) -> DataFrame:
    # (a ∪ b) − (a ∩ b), one pass: docs appearing in exactly one side
    u = a.select("doc_id").unionByName(b.select("doc_id"))
    return (u.groupBy("doc_id").agg(F.count("*").alias("c"))
            .filter(F.col("c") == 1).select("doc_id"))


OPS = {"and": _and, "or": _or, "andnot": _andnot, "xor": _xor}


def chained_filter(doc_sets, ops) -> DataFrame:
    """Left-fold ``doc_sets`` with ``ops`` (ChainedFilter.getDocIdSet
    iteration): ops may be one name applied throughout or a list of
    len(doc_sets) - 1 names from {'and','or','andnot','xor'}. Each
    input must be a distinct (doc_id) DataFrame."""
    doc_sets = list(doc_sets)
    if not doc_sets:
        raise ValueError("need at least one doc set")
    if isinstance(ops, str):
        ops = [ops] * (len(doc_sets) - 1)
    if len(ops) != len(doc_sets) - 1:
        raise ValueError("need len(doc_sets) - 1 operators")
    acc = doc_sets[0].select("doc_id")
    for op, d in zip(ops, doc_sets[1:]):
        acc = OPS[op](acc, d.select("doc_id"))
    return acc


class EarlyTerminatingCollectorException(Exception):
    """EarlyTerminatingCollectorException (solr/search/): carries how
    many docs were collected and the last docID seen when the cap
    hit — SpellCheckComponent scales the partial count up to an
    estimated total hit count from these."""

    def __init__(self, num_collected: int, last_doc_id: int):
        super().__init__(
            f"early terminated after {num_collected} docs")
        self.num_collected = num_collected
        self.last_doc_id = last_doc_id


def collect_early_terminated(doc_ids, max_docs_to_collect: int):
    """EarlyTerminatingCollector (solr/search/EarlyTerminatingCollector
    .java:33-60): delegate collection in docID order, throwing WITH
    the capped prefix when numCollected == maxDocsToCollect. The
    relational form: the docID-ordered prefix is a pushed-down
    orderBy+limit over the matching doc set — I/O proportional to the
    cap, not the hit count (the same early-termination shape as the
    sorted-index path). Returns (collected_df, num_collected,
    last_doc_id, terminated); callers wanting the reference's control
    flow can raise EarlyTerminatingCollectorException from it."""
    from pyspark.sql import functions as F

    prefix = (doc_ids.select("doc_id").orderBy("doc_id")
              .limit(max_docs_to_collect + 1))
    rows = [r["doc_id"] for r in prefix.collect()]
    # the reference throws as soon as numCollected == maxDocsToCollect
    # (EarlyTerminatingCollector.java:55-58), so a hit set EXACTLY
    # equal to the cap is still 'terminated' — >=, not >
    terminated = len(rows) >= max_docs_to_collect
    kept = rows[:max_docs_to_collect]
    spark = doc_ids.sparkSession
    out = spark.createDataFrame(
        [(int(d),) for d in kept] or
        spark.sparkContext.emptyRDD(), "doc_id long") \
        if kept else doc_ids.filter(F.lit(False)).select("doc_id")
    return out, len(kept), (kept[-1] if kept else -1), terminated
