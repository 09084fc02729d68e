"""Distributed connected components over a pair graph.

The dedup-cluster step a training-data pipeline runs AFTER near-dup
pair mining (MinHash/SimHash/embedding pairs -> groups -> keep one
representative per group). Algorithm: iterative min-label propagation
("HashToMin" family, Rastogi et al., ICDE'13) expressed as DataFrame
joins — each round every node takes the min label among itself and its
neighbors; converges in O(component diameter) rounds. Near-dup
components are overwhelmingly shallow (pairwise-similar clusters), so
in practice 2-4 rounds; ``max_iter`` bounds pathological chains.

Scale shape (100 TB): each round is one shuffle-join on dst + one
groupBy(src) partial-agg + one outer join — all key-partitioned by
doc_id, no driver-side state; the only driver action per round is the
scalar convergence count. Labels persist round-over-round and the
previous generation is unpersisted, so lineage stays O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


SMALL_GRAPH_EDGES = 200_000


def connected_components(pairs: DataFrame, a: str = "ida", b: str = "idb",
                         max_iter: int = 20,
                         small_graph_edges: int = SMALL_GRAPH_EDGES
                         ) -> DataFrame:
    """Min-label connected components of the undirected graph given as
    a pair list. Returns (doc_id, cluster_id) for every node appearing
    in ``pairs``, cluster_id = min node id in the component.

    Near-dup pair graphs are orders of magnitude smaller than the
    corpus they came from (only duplicates appear), so when the
    deduped edge list is small (<= ``small_graph_edges``) the labels
    are computed by a driver union-find on the collected edges — one
    job instead of O(diameter) join rounds (same precedent as the STC
    clusterer's metadata-only driver union-find). Above the threshold
    the distributed min-label loop below is the scale path; both
    produce identical (doc_id, min-node cluster_id) labelings."""
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(
            pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .persist()
    )
    n_edges = edges.count()
    if n_edges <= small_graph_edges:
        parent: dict = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:
                parent[x], x = r, parent[x]
            return r

        nodes = set()
        for row in edges.collect():
            s, d = int(row["src"]), int(row["dst"])
            nodes.add(s)
            nodes.add(d)
            rs, rd = find(s), find(d)
            if rs != rd:
                parent[max(rs, rd)] = min(rs, rd)
        edges.unpersist()
        out = [(n, find(n)) for n in sorted(nodes)]
        return pairs.sparkSession.createDataFrame(
            out, "doc_id long, cluster_id long")
    # localCheckpoint (eager) after every round: iterative self-joins
    # otherwise grow the logical plan exponentially and stall Catalyst
    # analysis after ~10 rounds — the checkpoint truncates lineage to
    # the materialized rows (on a cluster, a reliable checkpoint dir /
    # parquet round-trip gives the same truncation fault-tolerantly).
    labels = (
        edges.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("lab", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(labels.withColumnRenamed("doc_id", "dst"), "dst")
            .groupBy("src").agg(F.min("lab").alias("nlab"))
            .withColumnRenamed("src", "doc_id")
        )
        new_labels = (
            labels.join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("lab"),
                        F.coalesce(F.col("nlab"), F.col("lab")))
                .alias("lab"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.lab") != F.col("o.lab"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select("doc_id", F.col("lab").alias("cluster_id"))
