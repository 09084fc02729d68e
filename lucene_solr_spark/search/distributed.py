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


def merge_search_groups(
    shard_groups: List[DataFrame],
    group_col: str,
    top_n: int,
    score_col: str = "head_score",
) -> DataFrame:
    """``SearchGroup.merge`` (lucene/grouping/src/java/org/apache/
    lucene/search/grouping/SearchGroup.java:332): merge the per-shard
    FIRST-pass group lists (each shard's top ``offset+topN`` groups,
    each carrying the group head's sort values) into the global top-N
    group list.

    The reference's k-way queue walk reduces relationally to: union
    the shard lists, keep each group's best sort values (best group
    sort position; on an exact sort-value tie the LOWEST shard index
    wins — SearchGroup.java:242-245 ``minShardIndex``), then order
    groups by those values with min-shard tie-break and take the top
    N. ``group_col`` asc is appended as a final determinism tie-break
    on exact float score ties (the reference leaves that order to
    queue insertion; documented divergence, unreachable for distinct
    real-valued heads).

    Group sort here is the Solr default (head score desc). Inputs are
    n_shards * (offset+topN) rows — aggregator-trivial by design, the
    per-shard first-pass underneath stays fully distributed.
    """
    tagged = [
        df.withColumn("shard_idx", F.lit(i))
        for i, df in enumerate(shard_groups)
    ]
    u = reduce(DataFrame.unionByName, tagged)
    w = Window.partitionBy(group_col).orderBy(
        F.desc(score_col), F.asc("shard_idx")
    )
    best = (
        u.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    return (
        best.orderBy(
            F.desc(score_col), F.asc("shard_idx"), F.asc(group_col)
        )
        .limit(top_n)
    )


def merge_top_groups(
    shard_docs: List[DataFrame],
    shard_group_hits: List[DataFrame],
    group_col: str,
    docs_per_group: int,
    score_col: str = "score",
) -> DataFrame:
    """``TopGroups.merge`` (lucene/grouping/.../TopGroups.java:100):
    merge the per-shard SECOND-pass results for an agreed group list.

    Per group: the shards' doc lists are merged with ``TopDocs.merge``
    semantics — order by doc sort (score desc), tie-break shard index
    asc then within-shard hit position asc (TopDocs.java merge queue)
    — and cut to ``docs_per_group``; the group's ``totalHits`` is the
    SUM of the shards' per-group hit counts (TopGroups.java:166). A
    document present on several shards (overlapping shards) is NOT
    deduplicated and is counted once per shard — the reference merge
    has no uniqueKey pass and documents totalGroupCount as an upper
    bound for exactly this reason (TopGroups.java:88-95).

    ``shard_docs[i]`` must carry ``group_col``, ``score_col`` and
    ``shard_rank`` (1-based within-shard position in that group's
    list); ``shard_group_hits[i]`` carries (group_col, hits).
    """
    tagged = [
        df.withColumn("shard_idx", F.lit(i))
        for i, df in enumerate(shard_docs)
    ]
    u = reduce(DataFrame.unionByName, tagged)
    w = Window.partitionBy(group_col).orderBy(
        F.desc(score_col), F.asc("shard_idx"), F.asc("shard_rank")
    )
    top = (
        u.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= docs_per_group)
    )
    hits = (
        reduce(DataFrame.unionByName, shard_group_hits)
        .groupBy(group_col)
        .agg(F.sum("hits").cast("long").alias("group_hits"))
    )
    return top.join(F.broadcast(hits), group_col)
