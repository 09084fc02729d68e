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


def test_trec_gov2_parse():
    from lucene_solr_spark.sources.benchmark_feeds import trec_gov2_parse

    buf = ("<DOCHDR>\nHTTP/1.0 200 OK\n"
           "Date: Tue, 09 Dec 2003 22:39:08 GMT\nContent-Length: 10\n"
           "</DOCHDR>\n<html><b>hi</b> there</html>")
    d = trec_gov2_parse("G_0", buf)
    assert d["date"] == "Tue, 09 Dec 2003 22:39:08 GMT"
    assert "hi  there" in d["body"] and "<b>" not in d["body"]
    assert "Content-Length" not in d["body"]    # header skipped
    # no DOCHDR: whole record is the html payload, date None
    d2 = trec_gov2_parse("G_1", "<html>x</html>")
    assert d2["date"] is None and d2["body"].strip() == "x"


def test_trec_latimes_parse():
    from lucene_solr_spark.sources.benchmark_feeds import (
        trec_latimes_parse)

    buf = ("<DATE><P>December 9, 1991, Monday, Home Edition</P></DATE>\n"
           "<HEADLINE><P>Big News;</P></HEADLINE>\nbody here")
    d = trec_latimes_parse("L_0", buf)
    # 'day,' noise: truncated right after the day-name (keeps 'day')
    assert d["date"] == "December 9, 1991, Monday"
    assert d["title"] == "Big News;"
    # SUBJECT wins over HEADLINE when both exist
    buf2 = ("<SUBJECT><P>Subj</P></SUBJECT><HEADLINE><P>H</P>"
            "</HEADLINE>")
    assert trec_latimes_parse("L", buf2)["title"] == "Subj"


def test_trec_ft_and_fr94_parse():
    from lucene_solr_spark.sources.benchmark_feeds import (
        trec_fr94_parse, trec_ft_parse)

    d = trec_ft_parse("F", "<DATE>940102</DATE>"
                           "<HEADLINE>FT Head</HEADLINE>text")
    assert d["date"] == "940102" and d["title"] == "FT Head"
    # FR94: date only inside TEXT, noise prefixes skipped, body from
    # past <TEXT>
    d2 = trec_fr94_parse(
        "R", "pre <TEXT>stuff <DATE> DATE: 02/02/94</DATE> tail</TEXT>")
    assert d2["date"] == "02/02/94"
    assert "pre" not in d2["body"] and "stuff" in d2["body"]
    assert d2["title"] is None


def test_trec_path_type_dispatch():
    from lucene_solr_spark.sources.benchmark_feeds import (
        trec_parse_by_path, trec_path_type)

    assert trec_path_type("/data/trec/FBIS/FB396001") == "FBIS"
    assert trec_path_type("/data/trec/LATIMES/file") == "LATIMES"
    assert trec_path_type("/somewhere/else") == "GOV2"   # default
    d = trec_parse_by_path(
        "N", "<HEADER><DATE1> 1 March 1994 </DATE1></HEADER>b",
        "/trec/fbis/f1")
    assert d["date"] == "1 March 1994"
