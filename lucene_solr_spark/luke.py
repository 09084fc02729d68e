"""Luke index-introspection surface (Solr admin/LukeRequestHandler).

Re-expresses ``LukeRequestHandler.getIndexedFieldsInfo`` +
``getDetailedFieldInfo`` (solr/core/.../handler/admin/
LukeRequestHandler.java:330-378,575-621) over the engine's relational
index tables:

- ``docs``   = Terms.getDocCount(): documents with at least one indexed
  token in the field (:373).
- ``distinct`` = Terms.size(): distinct terms in the field dict (:605).
- df histogram (:598-600): per term, ``slot = 32 -
  numberOfLeadingZeros(max(0, df - 1))`` — i.e. the bit length of
  ``df - 1`` (slot 0 holds df==1, slot s holds df in (2^(s-1), 2^s]);
  the bucket array counts terms per slot.

Like the reference (codec-level stats), counts are dictionary-level —
deleted-but-unmerged docs still count. Top terms by df — the
``topTerms`` section — are the HighFreqTerms surface
(``IndexSearcher.high_freq_terms``), not duplicated here.

Everything is expressed against the (small) term_stats / doc_stats
aggregates: per-field output is a handful of one-row DataFrames plus a
groupBy over the term dict — no postings decode, no collect. At 100 TB
the term dict is the only input that grows, and the histogram is a
single partial-aggregated shuffle on a ~33-value key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hist_slot(df_col):
    # 32 - Integer.numberOfLeadingZeros(max(0, df - 1)): bit length of
    # df-1. length(bin(x)) is exact integer bit length (no float log2
    # edge cases at powers of two).
    return (
        F.when(df_col <= 1, F.lit(0))
        .otherwise(F.length(F.bin(df_col - F.lit(1))))
        .cast("long")
    )


def field_summary(searchers: dict) -> DataFrame:
    """Long-format per-field index summary: (field, metric, value).

    ``searchers`` maps field name -> IndexSearcher (each field is its
    own engine index sharing the docID space, like Lucene's per-field
    structures). Metrics: ``docs``, ``distinct``, and ``hist_<slot>``
    (zero-count slots omitted, matching the sparse NamedList the
    handler emits)."""
    out = None
    for field in sorted(searchers):
        s = searchers[field]
        ts = s.term_stats()
        fld = F.lit(field).alias("field")
        docs = (
            s.doc_stats()
            .filter(F.col("doc_len") > 0)
            .agg(F.count("*").alias("value"))
            .select(fld, F.lit("docs").alias("metric"), "value")
        )
        distinct = ts.agg(F.count("*").alias("value")).select(
            fld, F.lit("distinct").alias("metric"), "value"
        )
        hist = (
            ts.groupBy(_hist_slot(F.col("df")).alias("slot"))
            .agg(F.count("*").alias("value"))
            .select(
                fld,
                F.format_string("hist_%02d", F.col("slot")).alias("metric"),
                "value",
            )
        )
        part = docs.unionByName(distinct).unionByName(hist)
        out = part if out is None else out.unionByName(part)
    return out.orderBy("field", "metric")
