"""XML query parser gates (queryparser/xml/CoreParser.java): every
element must execute IDENTICALLY to its native-API equivalent — the
XML layer is a front-end, never a second scoring path."""

import numpy as np
import pytest

from lucene_solr_spark.fixtures import PHRASE_QUERY_SET
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.queryparser import QueryParseError
from lucene_solr_spark.search.spans import SpanNear, SpanTerm
from lucene_solr_spark.search.xmlparser import search_xml


def _rows(df):
    return [(r["doc_id"], np.float32(r["score"]).tobytes())
            for r in df.collect()]


@pytest.fixture(scope="module")
def searcher(spark, built):
    index_dir, _ = built
    return IndexSearcher(spark, index_dir)


def test_term_query_equals_classic(searcher):
    a = PHRASE_QUERY_SET[0].split()[0]
    got = _rows(search_xml(searcher, f"<TermQuery>{a}</TermQuery>", k=10))
    want = _rows(searcher.search_boolean(a, k=10))
    assert got == want


def test_boolean_query_equals_classic(searcher):
    a, b = PHRASE_QUERY_SET[0].split()
    xml = f"""
    <BooleanQuery>
      <Clause occurs="must"><TermQuery>{a}</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>{b}</TermQuery></Clause>
    </BooleanQuery>"""
    got = _rows(search_xml(searcher, xml, k=10))
    want = _rows(searcher.search_boolean(f"+{a} {b}", k=10))
    assert got == want


def test_user_query_and_filtered(searcher):
    a, b = PHRASE_QUERY_SET[0].split()
    xml = f"""
    <FilteredQuery>
      <Query><UserQuery>{a}</UserQuery></Query>
      <Filter><TermsFilter>{b}</TermsFilter></Filter>
    </FilteredQuery>"""
    got = {d for d, _ in _rows(search_xml(searcher, xml, k=None))}
    scored = {r["doc_id"] for r in
              searcher.search_boolean(a, k=None).collect()}
    flt = {r["doc_id"] for r in
           searcher.terms_filter_docs([b]).collect()}
    assert got == (scored & flt)


def test_span_near_equals_native(searcher):
    a, b = PHRASE_QUERY_SET[0].split()
    xml = f"""
    <SpanNear slop="2" inOrder="true">
      <SpanTerm>{a}</SpanTerm><SpanTerm>{b}</SpanTerm>
    </SpanNear>"""
    got = _rows(search_xml(searcher, xml, k=10))
    want = _rows(searcher.search_spans(
        SpanNear((SpanTerm(a), SpanTerm(b)), 2, True), k=10))
    assert got == want


def test_constant_score_and_matchall(searcher):
    a = PHRASE_QUERY_SET[0].split()[0]
    xml = f"""<ConstantScoreQuery boost="2.5">
        <TermsFilter>{a}</TermsFilter></ConstantScoreQuery>"""
    rows = search_xml(searcher, xml, k=None).collect()
    assert rows and all(r["score"] == 2.5 for r in rows)
    n = search_xml(searcher, "<MatchAllDocsQuery/>", k=None).count()
    assert n == searcher.max_doc


def test_boosting_query_equals_native(searcher):
    a, b = PHRASE_QUERY_SET[0].split()
    xml = f"""
    <BoostingQuery boost="0.25">
      <Query><TermQuery>{a}</TermQuery></Query>
      <BoostQuery><TermQuery>{b}</TermQuery></BoostQuery>
    </BoostingQuery>"""
    got = _rows(search_xml(searcher, xml, k=None))
    want = _rows(searcher.search_boosting(a, b, 0.25, k=None))
    assert got == want


def test_errors(searcher):
    with pytest.raises(QueryParseError):
        search_xml(searcher, "<NopeQuery/>")
    with pytest.raises(QueryParseError):
        search_xml(searcher, "not xml at all <")
    with pytest.raises(QueryParseError):
        search_xml(searcher, "<BooleanQuery><TermQuery>x</TermQuery>"
                             "</BooleanQuery>")
