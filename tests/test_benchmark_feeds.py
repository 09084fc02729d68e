"""Benchmark content-source parsers (lucene/benchmark byTask/feeds):
LineDocSource, TrecContentSource+FBIS, EnwikiContentSource."""

import pytest

from lucene_solr_spark.sources.benchmark_feeds import (
    FIELDS_HEADER_INDICATOR,
    enwiki_pages,
    line_doc_source,
    parse_line_doc,
    strip_tags,
    trec_fbis_parse,
    trec_records,
)


def test_simple_line_parser():
    d = parse_line_doc("My Title\t2012-01-01\tbody text here")
    assert d == {"title": "My Title", "date": "2012-01-01",
                 "body": "body text here"}
    with pytest.raises(ValueError, match="title::date"):
        parse_line_doc("no separators at all")
    with pytest.raises(ValueError, match="date::body"):
        parse_line_doc("title\tonly one")
    with pytest.raises(ValueError, match="too many"):
        parse_line_doc("t\td\tb\textra")


def test_header_line_parser():
    lines = [
        FIELDS_HEADER_INDICATOR + "\tname\ttitle\tdate\tbody\tkarma",
        "n1\tt1\td1\tb1\tk1",
        "n2\tt2\td2\tb2\tk2",
    ]
    out = line_doc_source(lines)
    assert out[0] == {"name": "n1", "title": "t1", "date": "d1",
                      "body": "b1", "karma": "k1"}
    with pytest.raises(ValueError, match="4 fields instead of 5"):
        line_doc_source([lines[0], "a\tb\tc\td"])
    # no header line -> simple parser
    assert line_doc_source(["t\td\tb"]) == [
        {"title": "t", "date": "d", "body": "b"}]


TREC = """junk before
<DOC>
<DOCNO> FBIS3-0001 </DOCNO>
<HEADER>
<DATE1>  1 March 1994  </DATE1>
<TI>  Some title here </TI>
</HEADER>
Body line one <b>tagged</b>
body line two
</DOC>
<DOC>
<DOCNO>FBIS3-0002</DOCNO>
no header here <i>at all</i>
</DOC>
"""


def test_trec_record_boundaries_and_name():
    recs = trec_records(TREC, iteration=0)
    assert [n for n, _b in recs] == ["FBIS3-0001_0", "FBIS3-0002_0"]
    assert "Body line one" in recs[0][1]
    assert "</DOC>" not in recs[0][1]
    # startsWith protocol: a mid-line tag does not delimit
    recs2 = trec_records("<DOC>\n<DOCNO>X</DOCNO>\nsay <DOC> inline\n"
                         "</DOC>\n")
    assert recs2[0][0] == "X_0" and "inline" in recs2[0][1]


def test_trec_fbis_parse():
    recs = trec_records(TREC)
    d = trec_fbis_parse(*recs[0])
    assert d["date"] == "1 March 1994"
    assert d["title"] == "Some title here"
    assert "tagged" in d["body"] and "<b>" not in d["body"]
    assert "DATE1" not in d["body"]          # header skipped via mark
    d2 = trec_fbis_parse(*recs[1])
    assert d2["date"] is None and d2["title"] is None
    assert "no header here  at all" in d2["body"]


def test_strip_tags():
    assert strip_tags("a<b>c</b>d") == "a c d"


ENWIKI = """<mediawiki>
 <page>
  <title>Alpha</title>
  <id>17</id>
  <revision>
   <timestamp>2004-03-15T04:12:09Z</timestamp>
   <text>alpha body\twith tab
and newline</text>
  </revision>
 </page>
 <page>
  <title>Image:Logo</title>
  <id>18</id>
  <revision>
   <timestamp>2004-03-15T04:12:09Z</timestamp>
   <text>ignored</text>
  </revision>
 </page>
</mediawiki>"""


def test_enwiki_pages():
    pages = enwiki_pages(ENWIKI)
    assert len(pages) == 1
    p = pages[0]
    assert p["title"] == "Alpha" and p["id"] == "17"
    # the reference's time() rewrite
    assert p["date"] == "15-MAR-2004 04:12:09.000"
    assert p["body"] == "alpha body with tab and newline"
    # keepImages keeps the Image: page
    assert len(enwiki_pages(ENWIKI, keep_images=True)) == 2
