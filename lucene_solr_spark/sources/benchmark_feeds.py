"""Benchmark content sources — the corpus-feed parsers of
``lucene/benchmark/src/java/org/apache/lucene/benchmark/byTask/feeds``
re-expressed as pure line/blob parsers (the distributed shape is one
Arrow pass over a lines/blob column; at 100 TB each dump file is a
row or a split, never a driver loop).

* LineDocSource (LineDocSource.java:60-160 + WriteLineDocTask.SEP):
  TAB-separated ``title<TAB>date<TAB>body`` lines via
  SimpleLineParser — missing separators or a FOURTH separator throw
  with the reference's messages; a first line starting with
  ``FIELDS_HEADER_INDICATOR###<TAB>`` switches to HeaderLineParser,
  whose header names map positions onto name/title/date/body with
  everything else a property column, and whose field count must
  match the header exactly.

* TrecContentSource (TrecContentSource.java:60-280) + TrecFBISParser:
  records delimited by LINES starting with ``<DOC>`` / ``</DOC>``
  (startsWith, not containment — a mid-line tag does not delimit);
  the docname is the ``<DOCNO>``...``</DOCNO>`` slice of the first
  DOCNO-starting line, trimmed, suffixed ``_<iteration>``; the body
  is every line between DOCNO and the terminator. The FBIS parse
  (TrecFBISParser.java:38-66): DATE1/TI extracted only inside the
  ``<HEADER>`` block, body = everything after ``</HEADER>`` with
  ``<[^>]*>`` tags replaced by spaces (stripTags).

* EnwikiContentSource (EnwikiContentSource.java:95-280): page
  records carrying title / id / timestamp / text; pages with no text
  or with an ``Image:``-prefixed title are skipped unless keepImages;
  TABs in title/date and TAB/NL in body become spaces; the timestamp
  rewrites ``yyyy-MM-ddTHH:mm:ssZ`` to ``dd-MON-yyyy HH:mm:ss.000``
  (the time() conversion, months JAN..DEC). The XML walk rides the
  gated XPathRecordReader.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

__all__ = ["parse_line_doc", "line_doc_source", "trec_records",
           "trec_fbis_parse", "enwiki_pages"]

SEP = "\t"
FIELDS_HEADER_INDICATOR = "FIELDS_HEADER_INDICATOR###"


def parse_line_doc(line: str) -> Dict[str, str]:
    """SimpleLineParser.parseLine (:66-85)."""
    k2 = line.find(SEP)
    if k2 < 0:
        raise ValueError(f"line: [{line}] is in an invalid format "
                         "(missing: separator title::date)!")
    title = line[:k2]
    k1 = k2 + 1
    k2 = line.find(SEP, k1)
    if k2 < 0:
        raise ValueError(f"line: [{line}] is in an invalid format "
                         "(missing: separator date::body)!")
    date = line[k1:k2]
    k1 = k2 + 1
    if line.find(SEP, k1) >= 0:
        raise ValueError(f"line: [{line}] is in an invalid format "
                         "(too many separators)!")
    return {"title": title, "date": date, "body": line[k1:]}


def _parse_header_line(header: List[str], line: str) -> Dict[str, str]:
    """HeaderLineParser.parseLine (:107-125): strict field count."""
    parts = line.split(SEP)
    if len(parts) != len(header):
        raise ValueError(
            f"input line has invalid format: {len(parts)} fields "
            f"instead of {len(header)} :: [{line}]")
    return dict(zip(header, parts))


def line_doc_source(lines: List[str]) -> List[Dict[str, str]]:
    """LineDocSource.getNextDocData (:200-240): the header-indicator
    first line selects the parser; empty lines are not special (the
    simple parser throws on them like the reference)."""
    out = []
    header: Optional[List[str]] = None
    start = 0
    if lines and lines[0].startswith(FIELDS_HEADER_INDICATOR + SEP):
        header = lines[0].split(SEP)[1:]
        start = 1
    for line in lines[start:]:
        if header is None:
            out.append(parse_line_doc(line))
        else:
            out.append(_parse_header_line(header, line))
    return out


def trec_records(text: str, iteration: int = 0):
    """TrecContentSource.getNextDocData (:240-270) over read()'s
    line-startsWith protocol: skip to a '<DOC>' line, collect the
    DOCNO line (name = the tag slice, trimmed, + '_<iteration>'),
    then collect every line until a '</DOC>' line as the raw docBuf.
    Returns (name, docbuf) pairs."""
    lines = text.splitlines()
    i = 0
    n = len(lines)
    out = []
    while True:
        while i < n and not lines[i].startswith("<DOC>"):
            i += 1
        if i >= n:
            return out
        i += 1
        while i < n and not lines[i].startswith("<DOCNO>"):
            i += 1
        if i >= n:
            return out
        docno_line = lines[i]
        end = docno_line.index("</DOCNO>", len("<DOCNO>"))
        name = docno_line[len("<DOCNO>"):end].strip() + f"_{iteration}"
        i += 1
        buf: List[str] = []
        while i < n and not lines[i].startswith("</DOC>"):
            buf.append(lines[i])
            i += 1
        out.append((name, "\n".join(buf)))


def _extract(buf: str, start_tag: str, end_tag: str,
             max_pos: int) -> Optional[str]:
    """TrecDocParser.extract (:66-88), noise-prefix-free form."""
    k1 = buf.find(start_tag)
    if k1 >= 0 and (max_pos < 0 or k1 < max_pos):
        k1 += len(start_tag)
        k2 = buf.find(end_tag, k1)
        if k2 >= 0 and (max_pos < 0 or k2 < max_pos):
            return buf[k1:k2].strip()
    return None


def strip_tags(buf: str) -> str:
    """TrecDocParser.stripTags (:56-62): every <...> tag -> space."""
    return re.sub(r"<[^>]*>", " ", buf)


def trec_fbis_parse(name: str, docbuf: str) -> Dict[str, Optional[str]]:
    """TrecFBISParser.parse (:38-66): DATE1/TI only inside the HEADER
    block; body strips tags from just past </HEADER> (mark stays 0
    when there is no header — the whole record is body)."""
    mark = 0
    date = title = None
    h1 = docbuf.find("<HEADER>")
    if h1 >= 0:
        h2 = docbuf.find("</HEADER>", h1)
        mark = h2 + len("</HEADER>")
        date = _extract(docbuf, "<DATE1>", "</DATE1>", h2)
        title = _extract(docbuf, "<TI>", "</TI>", h2)
    return {"name": name, "date": date, "title": title,
            "body": strip_tags(docbuf[mark:])}


_MONTHS = ["JAN", "FEB", "MAR", "APR", "MAY", "JUN", "JUL", "AUG",
           "SEP", "OCT", "NOV", "DEC"]


def _enwiki_time(original: str) -> str:
    """EnwikiContentSource time() (:101-114)."""
    return (original[8:10] + "-" + _MONTHS[int(original[5:7]) - 1]
            + "-" + original[0:4] + " " + original[11:19] + ".000")


def enwiki_pages(xml_text: str, keep_images: bool = False):
    """EnwikiContentSource page extraction (:120-140): title/
    timestamp/text/id per page, Image:-titled pages skipped unless
    keepImages, no-text pages skipped, TAB/NL normalization."""
    from lucene_solr_spark.sources.xpathreader import XPathRecordReader

    rr = XPathRecordReader("/mediawiki/page")
    rr.add_field("title", "/mediawiki/page/title")
    rr.add_field("id", "/mediawiki/page/id")
    rr.add_field("ts", "/mediawiki/page/revision/timestamp")
    rr.add_field("text", "/mediawiki/page/revision/text")
    out = []
    for rec in rr.get_all_records(xml_text):
        title = rec.get("title") or ""
        body = rec.get("text")
        if body is None:
            continue
        if not keep_images and title.startswith("Image:"):
            continue
        out.append({
            "title": title.replace("\t", " "),
            "date": _enwiki_time(rec["ts"]).replace("\t", " ")
            if rec.get("ts") else None,
            "body": re.sub(r"[\t\n]", " ", body),
            "id": rec.get("id"),
        })
    return out


# ---------------------------------------------------------------------------
# The full TREC parser family (TrecDocParser subclasses)
# ---------------------------------------------------------------------------

def _extract_noisy(buf: str, start_tag: str, end_tag: str,
                   max_pos: int, noise_prefixes) -> Optional[str]:
    """TrecDocParser.extract (:112-129) WITH noise prefixes: each
    listed prefix found inside the tag range advances the start past
    it (sequential, last one wins)."""
    k1 = buf.find(start_tag)
    if k1 >= 0 and (max_pos < 0 or k1 < max_pos):
        k1 += len(start_tag)
        k2 = buf.find(end_tag, k1)
        if k2 >= 0 and (max_pos < 0 or k2 < max_pos):
            if noise_prefixes:
                for noise in noise_prefixes:
                    k1a = buf.find(noise, k1)
                    if 0 <= k1a < k2:
                        k1 = k1a + len(noise)
            return buf[k1:k2].strip()
    return None


def trec_gov2_parse(name: str, docbuf: str) -> Dict[str, Optional[str]]:
    """TrecGov2Parser (:29-49): 'Date: ' extracted inside the
    DOCHDR block; everything past </DOCHDR> is the HTML payload
    (handed to the HTML parser — here the gated html_text chain's
    scalar twin via strip_tags for the body)."""
    date = None
    start = 0
    h1 = docbuf.find("<DOCHDR>")
    if h1 >= 0:
        h2 = docbuf.find("</DOCHDR>", h1)
        date = _extract_noisy(docbuf, "Date: ", "\n", h2, None)
        start = h2 + len("</DOCHDR>")
    html = docbuf[start:]
    return {"name": name, "date": date, "title": None,
            "body": strip_tags(html)}


def trec_latimes_parse(name: str, docbuf: str) -> Dict[str, Optional[str]]:
    """TrecLATimesParser (:28-55): DATE truncated after 'day,' (+3
    chars, keeping the day number), tags stripped; title = SUBJECT
    else HEADLINE, tag-stripped and trimmed; whole record is body."""
    date = _extract_noisy(docbuf, "<DATE>", "</DATE>", -1, None)
    if date is not None:
        d2a = date.find("day,")
        if d2a > 0:
            date = date[:d2a + 3]
        date = strip_tags(date).strip()
    title = _extract_noisy(docbuf, "<SUBJECT>", "</SUBJECT>", -1, None)
    if title is None:
        title = _extract_noisy(docbuf, "<HEADLINE>", "</HEADLINE>",
                               -1, None)
    if title is not None:
        title = strip_tags(title).strip()
    return {"name": name, "date": date, "title": title,
            "body": strip_tags(docbuf)}


def trec_ft_parse(name: str, docbuf: str) -> Dict[str, Optional[str]]:
    """TrecFTParser (:28-48): plain DATE + HEADLINE extraction over
    the whole record."""
    date = _extract_noisy(docbuf, "<DATE>", "</DATE>", -1, None)
    title = _extract_noisy(docbuf, "<HEADLINE>", "</HEADLINE>", -1,
                           None)
    return {"name": name, "date": date, "title": title,
            "body": strip_tags(docbuf)}


_FR94_NOISE = ["DATE:", "date:", "t.c."]


def trec_fr94_parse(name: str, docbuf: str) -> Dict[str, Optional[str]]:
    """TrecFR94Parser (:28-52): DATE only inside the TEXT block with
    the DATE:/date:/t.c. noise prefixes skipped; body starts past
    <TEXT> (mark = h1 + len), tag-stripped; no title."""
    date = None
    mark = 0
    h1 = docbuf.find("<TEXT>")
    if h1 >= 0:
        h2 = docbuf.find("</TEXT>", h1)
        mark = h1 + len("<TEXT>")
        date = _extract_noisy(docbuf, "<DATE>", "</DATE>", h2,
                              _FR94_NOISE)
        if date is not None:
            date = strip_tags(date).strip()
    return {"name": name, "date": date, "title": None,
            "body": strip_tags(docbuf[mark:])}


_PATH_TYPE_PARSERS = {
    "GOV2": trec_gov2_parse,
    "FBIS": trec_fbis_parse,
    "FT": trec_ft_parse,
    "FR94": trec_fr94_parse,
    "LATIMES": trec_latimes_parse,
}


def trec_path_type(path: str, max_walk: int = 10) -> str:
    """TrecDocParser.pathType (:58-68): walk up at most
    MAX_PATH_LENGTH ancestors looking for a known path-type name
    (upper-cased); default GOV2."""
    import os

    f = path
    for _ in range(max_walk - 1):
        if not f:
            break
        name = os.path.basename(f).upper()
        if name in _PATH_TYPE_PARSERS:
            return name
        parent = os.path.dirname(f)
        if parent == f:
            break
        f = parent
    return "GOV2"


def trec_parse_by_path(name: str, docbuf: str, path: str):
    """TrecParserByPath: dispatch on the record file's path type."""
    return _PATH_TYPE_PARSERS[trec_path_type(path)](name, docbuf)
