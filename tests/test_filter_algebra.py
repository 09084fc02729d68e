"""ChainedFilter / BooleanFilter algebra gates (lucene/queries/.../
ChainedFilter.java logic table) plus the BoostingQuery demote rule."""

import numpy as np
import pytest

from lucene_solr_spark.search.filters import chained_filter


def _sets(spark):
    a = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "doc_id long")
    b = spark.createDataFrame([(i,) for i in (3, 4, 5, 6)], "doc_id long")
    c = spark.createDataFrame([(i,) for i in (4, 6, 7)], "doc_id long")
    return a, b, c


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_pairwise_ops(spark):
    a, b, _ = _sets(spark)
    assert _ids(chained_filter([a, b], "and")) == [3, 4]
    assert _ids(chained_filter([a, b], "or")) == [1, 2, 3, 4, 5, 6]
    assert _ids(chained_filter([a, b], "andnot")) == [1, 2]
    assert _ids(chained_filter([a, b], "xor")) == [1, 2, 5, 6]


def test_chain_left_fold(spark):
    a, b, c = _sets(spark)
    # (a XOR b) AND c = {1,2,5,6} ∩ {4,6,7} = {6}
    assert _ids(chained_filter([a, b, c], ["xor", "and"])) == [6]


def test_op_arity_validation(spark):
    a, b, _ = _sets(spark)
    with pytest.raises(ValueError):
        chained_filter([a, b], ["and", "or"])
    with pytest.raises(ValueError):
        chained_filter([], "and")


def test_boosting_demote_rule(spark, built):
    """score' = f32(score * demote) iff the doc matches the context
    query; context-only docs never appear (BoostingQuery.java:48-50
    context boost 0 + coord override)."""
    from lucene_solr_spark.fixtures import PHRASE_QUERY_SET
    from lucene_solr_spark.search.executor import IndexSearcher

    index_dir, _ = built
    s = IndexSearcher(spark, index_dir)
    a, b = PHRASE_QUERY_SET[0].split()
    plain = {r["doc_id"]: np.float32(r["score"])
             for r in s.search_boolean(a, k=None).collect()}
    ctx = {r["doc_id"] for r in s.search_boolean(b, k=None).collect()}
    boosted = {r["doc_id"]: np.float32(r["score"])
               for r in s.search_boosting(a, b, 0.25, k=None).collect()}
    assert set(boosted) == set(plain)
    for d, sc in boosted.items():
        want = (np.float32(plain[d] * np.float32(0.25))
                if d in ctx else plain[d])
        assert sc.tobytes() == want.tobytes(), d


# ---------------------------------------------------------------------------
# EarlyTerminatingCollector
# ---------------------------------------------------------------------------

def test_early_terminating_collector(spark):
    """EarlyTerminatingCollector.java:33-60 — docID-order prefix,
    termination exactly at the cap, last-doc bookkeeping."""
    from lucene_solr_spark.search.filters import (
        EarlyTerminatingCollectorException,
        collect_early_terminated,
    )

    docs = spark.range(0, 50, 3).selectExpr("id as doc_id")  # 0,3,..,48
    out, n, last, term = collect_early_terminated(docs, 4)
    assert (n, last, term) == (4, 9, True)
    assert [r["doc_id"] for r in out.orderBy("doc_id").collect()] == [
        0, 3, 6, 9]
    # fewer matches than the cap: no termination
    out2, n2, last2, term2 = collect_early_terminated(
        docs.filter("doc_id < 7"), 10)
    assert (n2, last2, term2) == (3, 6, False)
    # empty set
    out3, n3, last3, term3 = collect_early_terminated(
        docs.filter("doc_id < 0"), 10)
    assert (n3, last3, term3) == (0, -1, False) and out3.count() == 0
    # the exception carries the collector state
    ex = EarlyTerminatingCollectorException(4, 9)
    assert ex.num_collected == 4 and ex.last_doc_id == 9
