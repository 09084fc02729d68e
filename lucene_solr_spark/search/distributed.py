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
