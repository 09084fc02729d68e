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


class TestDistributedFacetRefinement:
    """FacetComponent two-phase protocol: the refinement pass must fire
    for window terms a shard did not report in phase 1, and the final
    window must equal exact global counts when overrequest covers the
    candidate space."""

    @staticmethod
    def _shard(spark, counts, refine_log=None):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(list(counts.items()),
                                   "term string, cnt long")

        def topn(n):
            return df.orderBy(F.desc("cnt"), F.asc("term")).limit(n)

        def refine(terms):
            if refine_log is not None:
                refine_log.append(sorted(terms))
            return df.filter(F.col("term").isin(list(terms)))

        return (topn, refine)

    def test_refinement_fires_and_counts_exact(self, spark):
        from lucene_solr_spark.search.distributed import (
            distributed_facet_counts)

        # shard A: many distinct terms so its phase-1 top-N (limit 1 ->
        # initialLimit 11) misses 'zz'; shard B: 'zz' dominates.
        a_counts = {f"t{i:02d}": 100 - i for i in range(12)}
        a_counts["zz"] = 1          # rank 13 in A -> outside phase 1
        b_counts = {"zz": 500}
        log_a, log_b = [], []
        shards = [self._shard(spark, a_counts, log_a),
                  self._shard(spark, b_counts, log_b)]
        out = {r["term"]: r["cnt"] for r in distributed_facet_counts(
            spark, shards, limit=1).collect()}
        # exact: zz = 500 (B) + 1 (A, via refinement)
        assert out == {"zz": 501}
        assert log_a == [["zz"]]    # A was refined for zz
        assert log_b == []          # B reported zz in phase 1

    def test_no_refinement_when_covered(self, spark):
        from lucene_solr_spark.search.distributed import (
            distributed_facet_counts)

        log = []
        shards = [self._shard(spark, {"a": 5, "b": 3}, log),
                  self._shard(spark, {"a": 2, "c": 1}, log)]
        out = [(r["term"], r["cnt"]) for r in distributed_facet_counts(
            spark, shards, limit=3).collect()]
        assert out == [("a", 7), ("b", 3), ("c", 1)]
        assert log == []

    def test_mincount_and_offset(self, spark):
        from lucene_solr_spark.search.distributed import (
            distributed_facet_counts)

        shards = [self._shard(spark, {"a": 5, "b": 3, "c": 1})]
        out = [(r["term"], r["cnt"]) for r in distributed_facet_counts(
            spark, shards, limit=2, offset=1, mincount=2).collect()]
        assert out == [("b", 3)]


class TestDistributedGrouping:
    """Two-phase grouped distributed merge: SearchGroup.merge
    (lucene/grouping/.../SearchGroup.java:332) + TopGroups.merge
    (TopGroups.java:100)."""

    def _groups(self, spark, rows):
        return spark.createDataFrame(rows, "lang string, head_score float")

    def test_search_groups_best_head_min_shard_tie(self, spark):
        from lucene_solr_spark.search.distributed import merge_search_groups

        # lang 'a' heads: shard0 1.0, shard1 3.0 -> best 3.0 (shard1);
        # lang 'b' EXACT tie 2.0 on both shards -> minShardIndex wins
        # (SearchGroup.java:242-245), so shard0's row is kept.
        s0 = self._groups(spark, [("a", 1.0), ("b", 2.0)])
        s1 = self._groups(spark, [("a", 3.0), ("b", 2.0)])
        out = merge_search_groups([s0, s1], "lang", top_n=2).collect()
        assert [(r.lang, r.head_score, r.shard_idx) for r in out] == [
            ("a", 3.0, 1), ("b", 2.0, 0)
        ]

    def test_search_groups_top_n_cut(self, spark):
        from lucene_solr_spark.search.distributed import merge_search_groups

        s0 = self._groups(spark, [("a", 5.0), ("b", 4.0)])
        s1 = self._groups(spark, [("c", 4.5)])
        out = merge_search_groups([s0, s1], "lang", top_n=2).collect()
        assert [r.lang for r in out] == ["a", "c"]

    def test_top_groups_merge_no_dedup_and_hit_sum(self, spark):
        from lucene_solr_spark.search.distributed import merge_top_groups

        docs = "lang string, doc_id long, score float, shard_rank int"
        # doc 7 present on BOTH shards with shard-local scores: the
        # grouped merge has NO uniqueKey dedup (TopGroups.java merge
        # walks TopDocs only), so both rows compete.
        d0 = spark.createDataFrame([("a", 7, 2.0, 1), ("a", 3, 1.0, 2)], docs)
        d1 = spark.createDataFrame([("a", 7, 3.0, 1), ("a", 4, 2.5, 2)], docs)
        h0 = spark.createDataFrame([("a", 5)], "lang string, hits long")
        h1 = spark.createDataFrame([("a", 4)], "lang string, hits long")
        out = (
            merge_top_groups([d0, d1], [h0, h1], "lang", docs_per_group=3)
            .orderBy("rnk")
            .collect()
        )
        assert [(r.doc_id, r.shard_idx) for r in out] == [
            (7, 1), (4, 1), (7, 0)
        ]
        assert all(r.group_hits == 9 for r in out)

    def test_top_groups_shard_then_rank_tiebreak(self, spark):
        from lucene_solr_spark.search.distributed import merge_top_groups

        docs = "lang string, doc_id long, score float, shard_rank int"
        # three EXACT score ties: TopDocs.merge order is shard index
        # asc then within-shard position asc.
        d0 = spark.createDataFrame([("a", 10, 1.0, 1), ("a", 11, 1.0, 2)], docs)
        d1 = spark.createDataFrame([("a", 12, 1.0, 1)], docs)
        h0 = spark.createDataFrame([("a", 2)], "lang string, hits long")
        h1 = spark.createDataFrame([("a", 1)], "lang string, hits long")
        out = (
            merge_top_groups([d0, d1], [h0, h1], "lang", docs_per_group=3)
            .orderBy("rnk")
            .collect()
        )
        assert [(r.doc_id, r.shard_idx) for r in out] == [
            (10, 0), (11, 0), (12, 1)
        ]
