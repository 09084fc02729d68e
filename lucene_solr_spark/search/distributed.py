"""Solr distributed-search result merge (solr/core/src/java/org/apache/
solr/handler/component/QueryComponent.java:772-870 ``mergeIds``).

The reference's distributed search fans a query out to shards, each an
independent index with its OWN collection statistics (global idf is NOT
merged — ``createDistributedIdf`` is an empty TODO,
QueryComponent.java:722-724), then merges the per-shard TopDocs on the
aggregator:

  * dedup by uniqueKey: when the same key arrives from several shards
    the FIRST shard's row wins, including its score
    (QueryComponent.java:857-868);
  * order: the sort spec (default score desc) with shard-index
    tie-break (ShardFieldSortedHitQueue / ShardDoc.java), then the
    within-shard return order (score desc, docID asc).

Spark re-expression: each shard's top-k is already a tiny DataFrame
(k rows), so the merge is a unionByName + one key-partitioned
row_number window (first-shard-wins) + a global orderBy/limit. At
1000-executor scale the input to this operator is n_shards * k rows —
driver-trivial — while the per-shard searches underneath stay fully
distributed.
"""

from __future__ import annotations

from functools import reduce
from typing import List, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_shard_topdocs(
    shards: List[DataFrame],
    key_cols: Sequence[str],
    k: int,
    score_col: str = "score",
) -> DataFrame:
    """``mergeIds``: merge per-shard top-k DataFrames (each already
    sorted/limited by its own shard-local statistics) into the global
    top-k. Adds ``shard_idx`` (position in ``shards``) to the output.

    Dedup = first-shard-wins on ``key_cols`` (QueryComponent.java:857:
    "if the doc was already retrieved from an earlier shard, skip it");
    final order = score desc, shard_idx asc, key asc.
    """
    tagged = [
        df.withColumn("shard_idx", F.lit(i)) for i, df in enumerate(shards)
    ]
    u = reduce(DataFrame.unionByName, tagged)
    w = Window.partitionBy(*key_cols).orderBy(F.asc("shard_idx"))
    dedup = (
        u.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    order = [F.desc(score_col), F.asc("shard_idx")] + [
        F.asc(c) for c in key_cols
    ]
    return dedup.orderBy(*order).limit(k)


def distributed_facet_counts(
    spark,
    shard_fns,
    limit: int,
    offset: int = 0,
    mincount: int = 1,
):
    """Distributed field faceting with the two-phase refinement
    protocol (solr/handler/component/FacetComponent.java):

      phase 1 — each shard returns its top ``initialLimit`` terms,
        where for count-sorted facets initialLimit =
        (offset + limit) * 1.5 + 10 with initialMincount 0
        (FacetComponent.java "set the initial limit higher to increase
        accuracy" overrequest rule);
      merge — counts summed per term on the aggregator;
      phase 2 (refinement) — for every candidate term inside the
        requested window, any shard that did NOT report that term in
        phase 1 receives a refinement request for its exact count
        (:105-146 "overlap facet refinement requests"); refined counts
        are added so the final window is EXACT;
      final — count desc / term asc order, mincount and offset/limit
        applied on the aggregator.

    ``shard_fns``: per shard a pair (topn, refine) — ``topn(n)`` yields
    a (term, cnt) DataFrame of the shard's top-n terms by (cnt desc,
    term asc); ``refine(terms)`` yields exact (term, cnt) rows for the
    requested terms. Facet responses are facet-sized (<= initialLimit
    rows per shard), so the aggregator-side merge is driver-trivial by
    design — identical to the reference's coordinator.

    Returns a (term, cnt) DataFrame of the final window.
    """
    if limit <= 0:
        raise ValueError("limit must be > 0 (the count-sorted path)")
    initial = int((offset + limit) * 1.5) + 10
    responses = []
    exhausted = []
    merged: dict = {}
    for topn, _refine in shard_fns:
        rows = {r["term"]: int(r["cnt"]) for r in topn(initial).collect()}
        responses.append(rows)
        # a shard that returned FEWER than initialLimit terms has no
        # further terms (initialMincount is 0), so a missing term truly
        # has count 0 there — no refinement request for that shard
        # (the reference tracks this per-shard completeness before
        # queueing refinements)
        exhausted.append(len(rows) < initial)
        for t, c in rows.items():
            merged[t] = merged.get(t, 0) + c
    candidates = sorted(merged.items(), key=lambda tc: (-tc[1], tc[0]))
    window = [t for t, _c in candidates[: offset + limit]]
    for i, (_topn, refine) in enumerate(shard_fns):
        if exhausted[i]:
            continue
        missing = [t for t in window if t not in responses[i]]
        if not missing:
            continue
        for r in refine(missing).collect():
            merged[r["term"]] = merged[r["term"]] + int(r["cnt"])
    final = sorted(merged.items(), key=lambda tc: (-tc[1], tc[0]))
    out = [(t, c) for t, c in final if c >= mincount][offset: offset + limit]
    return spark.createDataFrame(out, "term string, cnt long")
