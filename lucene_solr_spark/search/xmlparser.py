"""XML query parser (lucene/queryparser/src/java/org/apache/lucene/
queryparser/xml/CoreParser.java + builders/): compile the reference's
XML query elements onto the SAME Clause / Span ASTs the classic parser
produces, so every leaf executes through the gated kernels (no second
scoring path).

Element coverage (builders/ file per element):

  <TermQuery fieldName=...>text</TermQuery>     TermQueryBuilder
  <BooleanQuery><Clause occurs="must|should|mustNot">...</Clause>...
                                                BooleanQueryBuilder
  <UserQuery>classic syntax</UserQuery>         UserInputQueryBuilder
  <MatchAllDocsQuery/>                          MatchAllDocsQueryBuilder
  <SpanTerm>t</SpanTerm> / <SpanNear slop inOrder> / <SpanOr> /
  <SpanOrTerms>a b c</SpanOrTerms> / <SpanNot incl excl> /
  <SpanFirst end>                               Span*Builder
  <TermsFilter>a b c</TermsFilter>              TermsFilterBuilder
  <RangeFilter fieldName lowerTerm upperTerm
               includeLower includeUpper>       RangeFilterBuilder
  <FilteredQuery><Query/><Filter/></FilteredQuery>
                                                FilteredQueryBuilder
  <ConstantScoreQuery boost?><Filter/></ConstantScoreQuery>
                                                ConstantScoreQueryBuilder
  <BoostingQuery boost><Query/><BoostQuery/></BoostingQuery>
                                                BoostingQueryBuilder
  <FuzzyLikeThisQuery><Field fieldName>text</Field></FuzzyLikeThisQuery>
                                                FuzzyLikeThisQueryBuilder
  <DuplicateFilter fieldName keepMode>          DuplicateFilterBuilder

Not built (documented): CachedFilter (a cache wrapper — Spark's
persisted scan is the cache), NumericRangeQuery/Filter elements (the
numeric path exists as Clause(field=...) ranges; XML wiring of those
attributes is the same RangeFilter shape), LikeThisQuery (MLT exists as
``more_like_this``; its XML wiring is mechanical), BoostingTermQuery
(payload scoring exists as payload_term_query).

Execution: query elements return (kind='scored', DataFrame) or
compile to Clause/Span ASTs; filter elements return doc-set
DataFrames intersected via semi-joins — FilteredQuery semantics
(search/FilteredQuery.java: filter never touches scores).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.search import spans as SP
from lucene_solr_spark.search.queryparser import Clause, QueryParseError

__all__ = ["search_xml"]


def _bool(attr: Optional[str], default: bool) -> bool:
    if attr is None:
        return default
    return attr.strip().lower() == "true"


class _XmlCompiler:
    def __init__(self, searcher):
        self.s = searcher

    # -- span elements -> spans.py AST ----------------------------------
    def span(self, el: ET.Element):
        tag = el.tag
        if tag == "SpanTerm":
            return SP.SpanTerm((el.text or "").strip())
        if tag == "SpanOrTerms":
            # analyzed term stream ORed (SpanOrTermsBuilder)
            terms = self.s.analyzer.analyze((el.text or "").strip())
            if not terms:
                raise QueryParseError("SpanOrTerms analyzed to nothing")
            subs = tuple(SP.SpanTerm(t) for t in dict.fromkeys(terms))
            return subs[0] if len(subs) == 1 else SP.SpanOr(subs)
        if tag == "SpanOr":
            return SP.SpanOr(tuple(self.span(c) for c in el))
        if tag == "SpanNear":
            return SP.SpanNear(
                tuple(self.span(c) for c in el),
                slop=int(el.get("slop", "0")),
                in_order=_bool(el.get("inOrder"), True))
        if tag == "SpanNot":
            incl = el.find("Include")
            excl = el.find("Exclude")
            if incl is None or excl is None:
                raise QueryParseError("SpanNot needs Include + Exclude")
            return SP.SpanNot(self.span(incl[0]), self.span(excl[0]))
        if tag == "SpanFirst":
            return SP.SpanFirst(self.span(el[0]),
                                end=int(el.get("end", "1")))
        raise QueryParseError(f"unknown span element <{tag}>")

    # -- filter elements -> doc-set DataFrame ----------------------------
    def filter_docs(self, el: ET.Element) -> DataFrame:
        tag = el.tag
        if tag == "TermsFilter":
            terms = self.s.analyzer.analyze((el.text or "").strip())
            return self.s.terms_filter_docs(terms)
        if tag == "RangeFilter":
            lo, hi = el.get("lowerTerm"), el.get("upperTerm")
            inc_lo = _bool(el.get("includeLower"), True)
            inc_hi = _bool(el.get("includeUpper"), True)
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (F.col("term") >= lo if inc_lo
                               else F.col("term") > lo)
            if hi is not None:
                cond = cond & (F.col("term") <= hi if inc_hi
                               else F.col("term") < hi)
            return self.s.match_docs(cond)
        if tag == "DuplicateFilter":
            from lucene_solr_spark.search.dupfilter import keeper_docs

            field = el.get("fieldName")
            keep = ("first" if el.get("keepMode", "last").lower()
                    in ("first", "km_use_first_occurrence")
                    else "last")
            return keeper_docs(
                self.s._docs.select("doc_id", field), field, keep=keep)
        raise QueryParseError(f"unknown filter element <{tag}>")

    # -- query elements -> scored DataFrame ------------------------------
    def query(self, el: ET.Element, k=None) -> DataFrame:
        tag = el.tag
        if tag == "TermQuery":
            boost = float(el.get("boost", "1.0"))
            terms = self.s.analyzer.analyze((el.text or "").strip())
            if len(terms) != 1:
                raise QueryParseError(
                    f"TermQuery must analyze to one term: {el.text!r}")
            return self.s.search_clauses(
                [Clause(occur="should", kind="term", text=terms[0],
                        terms=[terms[0]], boost=boost)], k=k)
        if tag == "UserQuery":
            return self.s.search_boolean((el.text or "").strip(), k=k)
        if tag == "MatchAllDocsQuery":
            return self.s.match_all_docs().select(
                "doc_id", F.lit(1.0).cast("float").alias("score"))
        if tag == "BooleanQuery":
            clauses = []
            for c in el:
                if c.tag != "Clause":
                    raise QueryParseError("BooleanQuery children must "
                                          "be <Clause>")
                occurs = c.get("occurs", "should")
                occur = {"must": "must", "should": "should",
                         "mustNot": "not"}.get(occurs)
                if occur is None:
                    raise QueryParseError(f"bad occurs={occurs!r}")
                sub = c[0]
                if sub.tag == "TermQuery":
                    terms = self.s.analyzer.analyze(
                        (sub.text or "").strip())
                    if len(terms) != 1:
                        raise QueryParseError("bad TermQuery in Clause")
                    clauses.append(Clause(
                        occur=occur, kind="term", text=terms[0],
                        terms=[terms[0]],
                        boost=float(sub.get("boost", "1.0"))))
                else:
                    raise QueryParseError(
                        "only TermQuery clauses compile to the native "
                        f"boolean (got <{sub.tag}>)")
            return self.s.search_clauses(clauses, k=k)
        if tag == "FilteredQuery":
            q = el.find("Query")
            f = el.find("Filter")
            if q is None or f is None:
                raise QueryParseError("FilteredQuery needs Query+Filter")
            scored = self.query(q[0], k=None)
            docs = self.filter_docs(f[0])
            out = scored.join(docs.select("doc_id"), "doc_id", "leftsemi") \
                .orderBy(F.desc("score"), F.asc("doc_id"))
            return out if k is None else out.limit(k)
        if tag == "ConstantScoreQuery":
            boost = float(el.get("boost", "1.0"))
            docs = self.filter_docs(el[0])
            out = docs.select(
                "doc_id", F.lit(boost).cast("float").alias("score")
            ).orderBy("doc_id")
            return out if k is None else out.limit(k)
        if tag == "BoostingQuery":
            boost = float(el.get("boost", "0.01"))
            q = el.find("Query")
            bq = el.find("BoostQuery")
            if q is None or bq is None:
                raise QueryParseError(
                    "BoostingQuery needs Query+BoostQuery")
            match_scored = self.query(q[0], k=None)
            ctx = self.query(bq[0], k=None).select(
                "doc_id", F.lit(True).alias("_ctx"))
            import numpy as np
            out = (match_scored.join(ctx, "doc_id", "left")
                   .select("doc_id", F.when(
                       F.col("_ctx").isNotNull(),
                       (F.col("score").cast("float")
                        * F.lit(float(np.float32(boost))).cast("float"))
                       .cast("float")).otherwise(
                           F.col("score").cast("float")).alias("score"))
                   .orderBy(F.desc("score"), F.asc("doc_id")))
            return out if k is None else out.limit(k)
        if tag == "FuzzyLikeThisQuery":
            fields = el.findall("Field")
            if len(fields) != 1:
                raise QueryParseError(
                    "single-field FuzzyLikeThisQuery only")
            f = fields[0]
            return self.s.fuzzy_like_this(
                (f.text or "").strip(),
                min_sim=float(el.get("minSimilarity", "0.5")),
                prefix_len=int(el.get("prefixLength", "0")),
                max_num_terms=int(el.get("maxNumTerms", "50")), k=k)
        if tag in ("SpanTerm", "SpanOr", "SpanOrTerms", "SpanNear",
                   "SpanNot", "SpanFirst"):
            return self.s.search_spans(self.span(el), k=k)
        raise QueryParseError(f"unknown query element <{tag}>")


def search_xml(searcher, xml_string: str, k: Optional[int] = 10) -> DataFrame:
    """CoreParser.parse: compile the XML query and execute top-k."""
    try:
        root = ET.fromstring(xml_string)
    except ET.ParseError as e:
        raise QueryParseError(f"bad query XML: {e}")
    return _XmlCompiler(searcher).query(root, k=k)
