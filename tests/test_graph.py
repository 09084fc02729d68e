"""connected_components gates: exact component labeling on known
graphs, including chains long enough to need several propagation
rounds (the engine's convergence loop, not just one join)."""


def _cc(spark, pairs):
    from lucene_solr_spark.graph import connected_components

    df = spark.createDataFrame(pairs, "ida long, idb long")
    return {r.doc_id: r.cluster_id
            for r in connected_components(df).collect()}


def test_basic_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11), (5, 6), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 5: 5, 6: 5}


def test_long_chain_converges(spark):
    # a 12-node path: min label must travel the full diameter
    chain = [(i, i + 1) for i in range(30, 42)]
    got = _cc(spark, chain)
    assert got == {i: 30 for i in range(30, 43)}


def test_reversed_and_duplicate_edges(spark):
    got = _cc(spark, [(2, 1), (1, 2), (2, 3), (3, 1), (7, 7)])
    assert got[1] == got[2] == got[3] == 1
    assert got[7] == 7


def test_small_graph_fast_path_matches_distributed(spark):
    import random

    from lucene_solr_spark.graph import connected_components

    rng = random.Random(11)
    pairs = [(rng.randint(0, 200), rng.randint(0, 200)) for _ in range(180)]
    df = spark.createDataFrame(pairs, "ida long, idb long")
    fast = sorted(tuple(r) for r in connected_components(df).collect())
    dist = sorted(
        tuple(r)
        for r in connected_components(df, small_graph_edges=0).collect())
    assert fast == dist
