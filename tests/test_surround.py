"""Surround query language gates (queryparser/surround/): grammar
round-trips, the slop = opDistance - 1 mapping (DistanceQuery.java:100)
duelled against direct span construction, and top-level boolean
composition semantics."""

import numpy as np
import pytest

from lucene_solr_spark.fixtures import PHRASE_QUERY_SET
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.queryparser import QueryParseError
from lucene_solr_spark.search.spans import SpanNear, SpanOr, SpanTerm
from lucene_solr_spark.search.surround import (
    SrndBool, SrndDistance, SrndPrefix, SrndTerm, SrndTrunc,
    parse_surround)


class TestGrammar:
    def test_prefix_notation(self):
        q = parse_surround("3W(alpha, bet*, OR(c, d))")
        assert q == SrndDistance(
            (SrndTerm("alpha"), SrndPrefix("bet"),
             SrndBool("or", (SrndTerm("c"), SrndTerm("d")))), 3, True)

    def test_infix_chain(self):
        q = parse_surround("a W b W c")
        assert q == SrndDistance(
            (SrndTerm("a"), SrndTerm("b"), SrndTerm("c")), 1, True)

    def test_infix_mixed_ops_rejected(self):
        with pytest.raises(QueryParseError):
            parse_surround("a W b N c")

    def test_unordered_and_trunc(self):
        q = parse_surround("5N(w?ld, x)")
        assert q == SrndDistance((SrndTrunc("w?ld"), SrndTerm("x")),
                                 5, False)

    def test_not_is_binary(self):
        with pytest.raises(QueryParseError):
            parse_surround("NOT(a, b, c)")

    def test_case_insensitive_ops_lowercased_terms(self):
        q = parse_surround("2n(Alpha, Beta)")
        assert q == SrndDistance((SrndTerm("alpha"), SrndTerm("beta")),
                                 2, False)

    def test_trailing_garbage(self):
        with pytest.raises(QueryParseError):
            parse_surround("W(a, b) c")


class TestExecution:
    def test_distance_equals_manual_span(self, spark, built):
        index_dir, _ = built
        s = IndexSearcher(spark, index_dir)
        a, b = PHRASE_QUERY_SET[0].split()
        got = s.search_surround(f"3W({a}, {b})", k=10).collect()
        want = s.search_spans(
            SpanNear((SpanTerm(a), SpanTerm(b)), 2, True), k=10).collect()
        assert [(r["doc_id"], np.float32(r["score"]).tobytes())
                for r in got] == \
               [(r["doc_id"], np.float32(r["score"]).tobytes())
                for r in want]

    def test_prefix_expansion_matches_spanor(self, spark, built):
        from pyspark.sql import functions as F

        index_dir, _ = built
        s = IndexSearcher(spark, index_dir)
        a, b = PHRASE_QUERY_SET[0].split()
        stem = a[:3]
        terms = [r["term"] for r in
                 s.expand_terms(F.col("term").startswith(stem)).collect()]
        assert len(terms) > 1
        got = s.search_surround(f"2N({stem}*, {b})", k=None).collect()
        want = s.search_spans(
            SpanNear((SpanOr(tuple(SpanTerm(t) for t in terms)),
                      SpanTerm(b)), 1, False), k=None).collect()
        assert sorted((r["doc_id"], np.float32(r["score"]).tobytes())
                      for r in got) == \
               sorted((r["doc_id"], np.float32(r["score"]).tobytes())
                      for r in want)

    def test_boolean_composition(self, spark, built):
        index_dir, _ = built
        s = IndexSearcher(spark, index_dir)
        a, b = PHRASE_QUERY_SET[0].split()
        and_docs = {r["doc_id"] for r in
                    s.search_surround(f"AND({a}, {b})", k=None).collect()}
        da = {r["doc_id"] for r in
              s.search_surround(a, k=None).collect()}
        db = {r["doc_id"] for r in
              s.search_surround(b, k=None).collect()}
        assert and_docs == (da & db)
        not_docs = {r["doc_id"] for r in
                    s.search_surround(f"NOT({a}, {b})", k=None).collect()}
        assert not_docs == (da - db)
        or_docs = {r["doc_id"] for r in
                   s.search_surround(f"OR({a}, {b})", k=None).collect()}
        assert or_docs == (da | db)

    def test_unsat_prefix_empty_and_or_survives(self, spark, built):
        index_dir, _ = built
        s = IndexSearcher(spark, index_dir)
        a, b = PHRASE_QUERY_SET[0].split()
        assert s.search_surround(f"W(zzzzqqqq*, {a})", k=10).count() == 0
        or_docs = {r["doc_id"] for r in s.search_surround(
            f"OR(zzzzqqqq*, W({a}, {b}))", k=None).collect()}
        direct = {r["doc_id"] for r in s.search_surround(
            f"W({a}, {b})", k=None).collect()}
        assert or_docs == direct
