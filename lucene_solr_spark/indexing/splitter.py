"""Index splitters.

Reference: ``lucene/misc/src/java/org/apache/lucene/index/
PKIndexSplitter.java`` — splits one index into two by a primary-key
filter: part 1 keeps the docs the filter accepts, part 2 the rest;
both parts are full copies with the complement DELETED (the reference
wraps the reader with liveDocs = filter result and addIndexes it).
And ``MultiPassIndexSplitter.java`` — N parts, round-robin by docID
(``doc % numParts == part``) or sequential ranges with ``--seq``.

Relational re-expression: a split part is ``replicate()`` (manifest
rewrite, zero data copy — the snapshot's parquet is immutable) plus a
tombstone generation for the complement. Deleted docs stay in maxDoc
and the stats tables, matching the reference exactly: PKIndexSplitter
does NOT rewrite postings either, so both engines score split parts
with the ORIGINAL collection statistics until a forceMerge.

Scale shape: the only data written per part is the tombstone docID
list (repartition(1) parquet) — independent of corpus size in I/O
except the docID scan, which is one pushed-down column read.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from lucene_solr_spark.indexing.build import delete_docs
from lucene_solr_spark.replicator import replicate


def _live_docs(spark: SparkSession, index_dir: str):
    from lucene_solr_spark.search.executor import IndexSearcher

    return IndexSearcher(spark, index_dir)._docs


def pk_split(spark: SparkSession, src_dir: str, dst_pass: str,
             dst_fail: str, key_predicate: Column) -> None:
    """PKIndexSplitter: ``dst_pass`` keeps docs where the stored-key
    predicate holds (e.g. ``F.col("path") < lit(mid)`` — the
    TermRangeFilter shape of PKIndexSplitter.java:49-61), ``dst_fail``
    keeps the rest."""
    docs = _live_docs(spark, src_dir)
    replicate(src_dir, dst_pass)
    replicate(src_dir, dst_fail)
    delete_docs(spark, dst_pass,
                docs.filter(~key_predicate).select("doc_id"))
    delete_docs(spark, dst_fail,
                docs.filter(key_predicate).select("doc_id"))


def multipass_split(spark: SparkSession, src_dir: str,
                    dst_dirs: List[str], seq: bool = False) -> None:
    """MultiPassIndexSplitter: N parts, ``doc_id % n == i`` round-robin
    (MultiPassIndexSplitter.java:66-92) or contiguous docID ranges
    when ``seq``."""
    n = len(dst_dirs)
    docs = _live_docs(spark, src_dir)
    max_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    for i, dst in enumerate(dst_dirs):
        replicate(src_dir, dst)
        if seq:
            lo = i * max_doc // n
            hi = (i + 1) * max_doc // n
            keep = (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        else:
            keep = F.col("doc_id") % n == i
        delete_docs(spark, dst, docs.filter(~keep).select("doc_id"))
