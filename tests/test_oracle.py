"""Sanity of the pure-Python oracle itself: BM25 math invariants +
hand-computed micro-index golden scores (the oracle is the measuring
stick for the Spark engine, so it gets its own hand-check, in the
spirit of TestBM25Similarity / TestTermScorer)."""

import math

import numpy as np

from lucene_solr_spark.constants import B, K1
from lucene_solr_spark.functions.bm25 import avgdl, idf, norm_cache
from lucene_solr_spark.functions.smallfloat import NORM_TABLE, encode_norm
from lucene_solr_spark.oracle import OracleIndex

F32 = np.float32


def test_idf_formula():
    assert idf(1, 100) == F32(math.log(1 + (100 - 1 + 0.5) / 1.5))
    assert idf(100, 100) == F32(math.log(1 + 0.5 / 100.5))
    assert idf(1, 1) == F32(math.log(1 + 0.5 / 1.5))


def test_hand_computed_single_term_score():
    # three docs; term 'foo' in docs 0 (tf=2, len=4) and 2 (tf=1, len=2)
    docs = [
        (0, "foo foo bar baz"),
        (1, "bar baz"),
        (2, "foo qux"),
    ]
    idx = OracleIndex.build(docs)
    assert idx.max_doc == 3 and idx.sum_ttf == 8
    hits = idx.search("foo", k=10)
    # hand computation with quantized lengths
    adl = avgdl(8, 3)
    cache = norm_cache(adl, K1, B)
    w = idf(2, 3)
    wv = F32(w * F32(F32(K1) + F32(1)))

    def s(tf, length):
        nb = int(encode_norm(length))
        return F32(wv * F32(tf) / (F32(tf) + cache[nb]))

    expect = sorted(
        [(0, s(2, 4)), (2, s(1, 2))], key=lambda kv: (-float(kv[1]), kv[0])
    )
    assert [(d, float(x)) for d, x in hits] == [
        (d, float(x)) for d, x in expect
    ]


def test_tie_break_is_docid_asc():
    # identical docs -> identical scores -> docID ascending
    docs = [(i, "same tokens here") for i in range(5)]
    idx = OracleIndex.build(docs)
    hits = idx.search("tokens", k=3)
    assert [d for d, _ in hits] == [0, 1, 2]
    assert len({float(s) for _, s in hits}) == 1


def test_and_requires_all_terms():
    docs = [(0, "alpha beta"), (1, "alpha"), (2, "beta alpha gamma")]
    idx = OracleIndex.build(docs)
    got = [d for d, _ in idx.search("alpha beta", mode="and")]
    assert set(got) == {0, 2}
    assert [d for d, _ in idx.search("alpha gamma", mode="and")] == [2]
    assert idx.search("alpha delta", mode="and") == []


def test_minshouldmatch_and_not():
    docs = [(0, "p q"), (1, "p"), (2, "q r"), (3, "p q r s")]
    idx = OracleIndex.build(docs)
    mm2 = idx.search("p q r s", mode="or", min_should_match=2)
    assert set(d for d, _ in mm2) == {0, 2, 3}
    no_r = idx.search("p", exclude="r")
    assert set(d for d, _ in no_r) == {0, 1}


def test_stopword_query_matches_nothing():
    docs = [(0, "the quick fox"), (1, "the the the")]
    idx = OracleIndex.build(docs)
    assert idx.search("the") == []


def test_norm_table_is_quantized_length():
    # decode(encode(L)) rounds L onto the SmallFloat lattice
    for L in (1, 10, 100, 1000):
        nb = int(encode_norm(L))
        q = NORM_TABLE[nb]
        assert 0.5 * L <= q <= 2.0 * L  # 3-bit mantissa: within 2x
