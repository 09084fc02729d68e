"""DuplicateFilter (lucene/sandbox/src/java/org/apache/lucene/sandbox/
queries/DuplicateFilter.java): a query-time filter that keeps at most
ONE document per value of a key field — the classic "one hit per url"
result filter.

Reference semantics: the keeper set is computed over the WHOLE index,
independent of the query (getDocIdSet walks the filter field's terms;
correctBits :96-117): KM_USE_FIRST_OCCURRENCE keeps the lowest docID
holding each term, KM_USE_LAST_OCCURRENCE (the default, :72) the
highest. Query results are then intersected with the keeper bitset.
PM_FULL_VALIDATION vs PM_FAST_INVALIDATION (:83) is a per-segment
speed/df trade with identical output for single-valued fields — the
relational form below has no analogous distinction.

100 TB plan: the keeper set is a hash-partitioned min/max aggregate on
(field_value) — one shuffle on the key, no window sort needed — and the
intersection is a broadcastable-or-shuffled semi-join on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["keeper_docs", "duplicate_filter"]


def keeper_docs(docs: DataFrame, field: str, keep: str = "last",
                key: str = "doc_id") -> DataFrame:
    """One keeper docID per distinct value of ``field``:
    min(docID) for keep='first' (KM_USE_FIRST_OCCURRENCE), max for
    keep='last' (KM_USE_LAST_OCCURRENCE, the reference default).
    Documents with a NULL field value carry no term in the filter
    field, so the reference never marks them — they are all kept
    (DuplicateFilter only flips bits for docs holding a term)."""
    if keep not in ("first", "last"):
        raise ValueError(keep)
    agg = F.min(key) if keep == "first" else F.max(key)
    return (docs.filter(F.col(field).isNotNull())
            .groupBy(field).agg(agg.alias(key)).select(key))


def duplicate_filter(results: DataFrame, docs: DataFrame, field: str,
                     keep: str = "last", key: str = "doc_id") -> DataFrame:
    """Intersect query ``results`` with the keeper set (plus all
    null-field docs, which the reference leaves untouched)."""
    keepers = keeper_docs(docs, field, keep=keep, key=key)
    nulls = docs.filter(F.col(field).isNull()).select(key)
    return results.join(keepers.unionByName(nulls).distinct(), key,
                        "leftsemi")
