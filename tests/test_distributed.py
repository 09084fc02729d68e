"""merge_shard_topdocs (Solr QueryComponent.mergeIds,
solr/core/src/java/org/apache/solr/handler/component/
QueryComponent.java:772-870): first-shard-wins dedup on the uniqueKey,
(score desc, shard_idx asc, key asc) merge order, global top-k."""

from lucene_solr_spark.search.distributed import merge_shard_topdocs


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score float")


def test_merge_dedup_first_shard_wins(spark):
    # doc 7 appears in both shards with DIFFERENT scores (shard-local
    # idf); the reference keeps the FIRST shard's row — including its
    # (lower!) score — not the max (QueryComponent.java:857-868).
    s0 = _df(spark, [(7, 1.0), (3, 0.9)])
    s1 = _df(spark, [(7, 5.0), (4, 0.8)])
    out = merge_shard_topdocs([s0, s1], ["doc_id"], k=10).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(out) == 3
    assert by_id[7].score == 1.0 and by_id[7].shard_idx == 0
    # merge order: score desc -> 7(1.0), 3(0.9), 4(0.8)
    assert [r.doc_id for r in out] == [7, 3, 4]


def test_merge_order_and_tiebreak(spark):
    # equal scores: shard_idx asc breaks the tie, then key asc.
    s0 = _df(spark, [(9, 2.0), (2, 1.0)])
    s1 = _df(spark, [(5, 2.0), (1, 2.0)])
    out = merge_shard_topdocs([s0, s1], ["doc_id"], k=3).collect()
    # score 2.0 group: shard0's doc 9 first, then shard1's 1, 5 (key
    # asc); k=3 cuts doc 2.
    assert [(r.doc_id, r.shard_idx) for r in out] == [
        (9, 0), (1, 1), (5, 1)
    ]


def test_merge_k_limit_single_shard(spark):
    s0 = _df(spark, [(i, float(10 - i)) for i in range(6)])
    out = merge_shard_topdocs([s0], ["doc_id"], k=4).collect()
    assert [r.doc_id for r in out] == [0, 1, 2, 3]
