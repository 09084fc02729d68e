"""QualityStats gates (lucene/benchmark/.../quality/QualityStats.java):
hand-traced vectors for the precision-padding rule, the
first-relevant-within-5 MRR rule, avg precision, and recall."""

import pytest

from lucene_solr_spark.quality import quality_stats


def _run(spark, results, judgments, points=(5, 10)):
    r = spark.createDataFrame(results, "query_id string, doc_id long,"
                                       " rank long")
    j = spark.createDataFrame(judgments, "query_id string, doc_id long")
    return {row["query_id"]: row.asDict()
            for row in quality_stats(r, j, points).collect()}


def test_basic_metrics(spark):
    # q: ranks 1..6, relevant at 2, 3, 6 of maxGood 4
    res = [("q", d, i + 1) for i, d in enumerate([10, 11, 12, 13, 14, 15])]
    jud = [("q", 11), ("q", 12), ("q", 15), ("q", 99)]
    m = _run(spark, res, jud)["q"]
    assert m["p_at_5"] == pytest.approx(2 / 5)
    # padding rule: only 6 points -> p@10 = numGood / 10
    assert m["p_at_10"] == pytest.approx(3 / 10)
    assert m["mrr"] == pytest.approx(1 / 2)
    # avp = (1/2 + 2/3 + 3/6) / maxGood=4 (QualityStats:93-94,121-123)
    assert m["avg_precision"] == pytest.approx((1 / 2 + 2 / 3 + 3 / 6) / 4)
    assert m["recall"] == pytest.approx(3 / 4)
    assert (m["num_good"], m["max_good"], m["num_points"]) == (3, 4, 6)


def test_mrr_only_within_top5(spark):
    # first relevant at rank 6 -> MRR is 0 (QualityStats.java:87-89)
    res = [("q", d, i + 1) for i, d in enumerate(range(7))]
    jud = [("q", 5)]  # doc 5 sits at rank 6
    m = _run(spark, res, jud)["q"]
    assert m["mrr"] == 0.0
    assert m["avg_precision"] == pytest.approx((1 / 6) / 1)


def test_no_relevant_query(spark):
    res = [("q", d, i + 1) for i, d in enumerate(range(4))]
    jud = [("other", 0)]
    m = _run(spark, res, jud)["q"]
    assert m["mrr"] == 0.0
    assert m["avg_precision"] == 0.0
    assert m["recall"] == 0.0  # maxGood 0 -> recall = p = 0/numPoints
    assert m["num_good"] == 0 and m["max_good"] == 0


def test_exact_point_hits(spark):
    # 10 points, relevant at 1..5 -> p@5 = 1.0, p@10 = 0.5
    res = [("q", d, i + 1) for i, d in enumerate(range(10))]
    jud = [("q", d) for d in range(5)]
    m = _run(spark, res, jud)["q"]
    assert m["p_at_5"] == 1.0
    assert m["p_at_10"] == 0.5
    assert m["mrr"] == 1.0
    assert m["avg_precision"] == pytest.approx(1.0)
    assert m["recall"] == 1.0
