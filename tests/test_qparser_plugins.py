"""QParser local-params grammar + plugin dispatch gates
(solr/search/QueryParsing.parseLocalParams, QParser.getParser,
QParserPlugin.standardPlugins)."""

import pytest

from lucene_solr_spark.search.qparser_plugins import (
    get_parser, parse_local_params, solr_query)
from lucene_solr_spark.search.queryparser import QueryParseError


def test_no_local_params_passthrough():
    lp, rest = parse_local_params("plain query")
    assert lp is None and rest == "plain query"


def test_bare_word_is_type():
    lp, rest = parse_local_params("{!func}log(x)")
    assert lp["type"] == "func"
    assert lp["v"] == "log(x)"
    assert rest == ""


def test_kv_quoted_and_unquoted():
    lp, _ = parse_local_params(
        "{!prefix f=content sep='a b' d=\"x\\\"y\"}im")
    assert lp["type"] == "prefix"
    assert lp["f"] == "content"
    assert lp["sep"] == "a b"
    assert lp["d"] == 'x"y'
    assert lp["v"] == "im"


def test_v_param_overrides_rest():
    # QParser.getParser:94-103 — explicit v wins, remainder ignored
    lp, rest = parse_local_params("{!term f=lang v=py}ignored-not-v")
    assert lp["v"] == "py"
    assert rest == "ignored-not-v"


def test_dollar_deref():
    lp, _ = parse_local_params(
        "{!query v=$qq}", params={"qq": "{!prefix}s"})
    assert lp["v"] == "{!prefix}s"
    # missing param -> None (SolrParams.get returns null)
    lp2, _ = parse_local_params("{!term f=$missing}x", params={})
    assert lp2["f"] is None


def test_missing_close_brace_raises():
    with pytest.raises(QueryParseError):
        parse_local_params("{!term f=content")


def test_get_parser_default_type():
    ptype, lp, v = get_parser("hello world")
    assert ptype == "lucene" and v == "hello world" and lp == {}
    ptype2, _, v2 = get_parser("{!maxscore tie=0.1}a b")
    assert ptype2 == "maxscore" and v2 == "a b"


def _searcher(spark, built):
    from lucene_solr_spark.search.executor import IndexSearcher

    index_dir, _oracle = built
    return IndexSearcher(spark, index_dir)


def test_dispatch_term_equals_analyzed_search(spark, built):
    s = _searcher(spark, built)
    via = solr_query(s, "{!term f=content}common_util", k=5).collect()
    direct = s.search("common_util", k=5).collect()
    assert [(r.doc_id, r.score) for r in via] == \
        [(r.doc_id, r.score) for r in direct]


def test_dispatch_field_phrase(spark, built):
    s = _searcher(spark, built)
    via = solr_query(s, "{!field f=content}seven hundred", k=5).collect()
    direct = s.search_phrase("seven hundred", k=5).collect()
    assert [(r.doc_id, r.score) for r in via] == \
        [(r.doc_id, r.score) for r in direct]


def test_dispatch_metadata_term_docset(spark, built):
    s = _searcher(spark, built)
    rows = solr_query(s, "{!term f=lang}py").collect()
    langs = {r.lang for r in
             s._docs.join(
                 solr_query(s, "{!term f=lang}py"), "doc_id"
             ).select("lang").distinct().collect()}
    assert rows and langs == {"py"}


def test_dispatch_maxscore_matches_dismax(spark, built):
    s = _searcher(spark, built)
    via = solr_query(s, "{!maxscore tie=0.25}common_util seven",
                     k=5).collect()
    direct = s.search_dismax("common_util seven", k=5,
                             tie=0.25).collect()
    assert [(r.doc_id, r.score) for r in via] == \
        [(r.doc_id, r.score) for r in direct]
    with pytest.raises(QueryParseError, match="maxscore"):
        solr_query(s, "{!maxscore}+required optional", k=5)


def test_dispatch_switch_and_nested_query(spark, built):
    s = _searcher(spark, built)
    prm = {"nq": "{!switch case.a='{!prefix}comm' default=zz}a"}
    via = solr_query(s, "{!query v=$nq}", params=prm).collect()
    direct = solr_query(s, "{!prefix}comm").collect()
    assert [r.doc_id for r in via] == [r.doc_id for r in direct]
    with pytest.raises(QueryParseError, match="switch"):
        solr_query(s, "{!switch case.a=x}b")


def test_unknown_parser_raises(spark, built):
    s = _searcher(spark, built)
    with pytest.raises(QueryParseError, match="unknown query parser"):
        solr_query(s, "{!nosuch}x")


def test_fst_bucketed_completion(spark, built):
    # FSTCompletionLookup: equal-count buckets over the weight-sorted
    # dict; ties share their run's first-line bucket; exact first
    s = _searcher(spark, built)
    out = s.complete_bucketed("comm", n=10, buckets=10)
    rows = out.collect()
    assert rows
    # bucket must be a deterministic function of weight: same weight
    # -> same bucket across the candidate set
    ranked = s.complete_bucketed("a", n=500, buckets=10).collect()
    by_w = {}
    for r in ranked:
        by_w.setdefault(r.weight, set()).add(r.bucket)
    assert all(len(v) == 1 for v in by_w.values())
    # order: bucket desc then term asc (after the exact-first slot)
    seq = [(r.bucket, r.term) for r in rows]
    assert seq == sorted(seq, key=lambda t: (-t[0], t[1]))


def test_dist_sqedist_ms_functions(spark):
    import math

    from pyspark.sql import functions as F
    from lucene_solr_spark.functions.funcparser import (
        parse_function_query)

    d = spark.createDataFrame([(3.0, 4.0)], "x double, y double")
    fields = {"x": F.col("x"), "y": F.col("y")}
    r = d.select(
        parse_function_query("dist(2,x,y,0,0)", fields).alias("d2"),
        parse_function_query("dist(1,x,y,0,0)", fields).alias("d1"),
        parse_function_query("sqedist(x,y,0,0)", fields).alias("sq"),
    ).collect()[0]
    assert abs(r["d2"] - 5.0) < 1e-12     # euclidean 3-4-5
    assert r["d1"] == 7.0                 # manhattan
    assert r["sq"] == 25.0
    import pytest
    from lucene_solr_spark.search.queryparser import QueryParseError
    with pytest.raises(QueryParseError):
        parse_function_query("dist(2,x,y,0)", fields)  # odd sources


# ---------------------------------------------------------------------------
# ExtendableQueryParser (lucene/queryparser/ext/): extension registry
# keyed per Extensions.add; '<field>:<key>:<term>' and '<key>:<term>'
# dispatch (Extensions.splitExtensionField), clause built by the
# extension itself (ParserExtension.parse).
# ---------------------------------------------------------------------------

def test_ext_parser_dispatch():
    from lucene_solr_spark.search.queryparser import (
        Clause, QueryParseError, parse_query, register_parser_extension,
    )

    # built-in 'raw': bypasses the chain — 'The' stays 'The' (classic
    # would stop-drop it)
    got = parse_query("content:raw:The")
    assert len(got) == 1 and got[0].kind == "term"
    assert got[0].terms == ["The"]
    # default-field form
    got = parse_query("raw:The")
    assert got[0].terms == ["The"]
    # occur modifier applies to the extension clause
    got = parse_query("-raw:The merge")
    assert got[0].occur == "not" and got[0].terms == ["The"]
    # custom extension
    def echo2(field, term):
        return Clause(occur="should", kind="term", text=term,
                      terms=[term + term])
    register_parser_extension("echo2", echo2)
    got = parse_query("content:echo2:ab")
    assert got[0].terms == ["abab"]
    # unknown field without a registered key still raises
    import pytest as _pt
    with _pt.raises(QueryParseError):
        parse_query("nosuchfield:foo")
    # unregistered key after a valid field is a plain term payload
    got = parse_query("content:plain")
    assert got and got[0].kind == "term"


def test_ext_parser_raw_search(spark, built):
    """raw: extension end-to-end through search_boolean: the exact
    lowercase form scores identically to the classic parse; the cased
    form bypasses the chain, misses the lowercased index, and returns
    nothing."""
    from lucene_solr_spark.search.executor import IndexSearcher

    index_dir, oracle = built
    s = IndexSearcher(spark, index_dir)
    raw = s.search_boolean("raw:common_util", k=10).collect()
    classic = s.search_boolean("common_util", k=10).collect()
    assert [(r.doc_id, r.score) for r in raw] == \
        [(r.doc_id, r.score) for r in classic] and raw
    assert s.search_boolean("raw:Common_Util", k=10).count() == 0


def test_analyzing_suggester_semantics(spark):
    """AnalyzingSuggester: lookup on the ANALYZED form, surface form
    returned; stopword-only surfaces unreachable; exactFirst outranks
    higher weights; weight desc + surface asc ties."""
    from lucene_solr_spark.search.suggesters import analyzing_suggest

    dic = spark.createDataFrame(
        [("the merge", 3), ("merge batch", 9), ("merge apply", 9),
         ("merged rows", 50), ("a the", 99), ("scan table", 7)],
        "surface string, weight long")
    got = [(r.surface, r.weight) for r in
           analyzing_suggest(dic, "merge", n=4).collect()]
    # 'the merge' analyzes to exactly 'merge' -> exactFirst wins over
    # weight-50 'merged rows'; 'a the' (all stopwords) is unreachable
    assert got == [("the merge", 3), ("merged rows", 50),
                   ("merge apply", 9), ("merge batch", 9)]
    # exact_first off: pure weight order
    got2 = [r.surface for r in
            analyzing_suggest(dic, "merge", n=2,
                              exact_first=False).collect()]
    assert got2 == ["merged rows", "merge apply"]


def test_return_fields_fl(spark):
    """SolrReturnFields fl compiler: fields, alias:rename, copy when
    also bare-requested, glob, score pseudo-field, function entries,
    all-fields, empty-fl."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.search.returnfields import solr_return_fields

    df = spark.createDataFrame(
        [(1, "r1", "py", 10, 0.5)],
        "doc_id long, repo string, lang string, doc_len long, score float")

    out = solr_return_fields(df, "doc_id,who:repo,score")
    assert out.columns == ["doc_id", "who", "score"]
    r = out.first()
    assert (r["who"], float(r["score"])) == ("r1", 0.5)

    # copy: source requested bare AND renamed -> both come back
    out = solr_return_fields(df, "repo who:repo")
    assert out.columns == ["repo", "who"]

    # glob + star + empty
    assert solr_return_fields(df, "doc_*").columns == ["doc_id", "doc_len"]
    assert solr_return_fields(df, "*").columns == \
        ["doc_id", "repo", "lang", "doc_len"]
    assert solr_return_fields(df, None).columns == \
        ["doc_id", "repo", "lang", "doc_len"]

    # function entry with alias; commas inside parens don't split
    out = solr_return_fields(df, "doc_id,dl2:product(doc_len,2)")
    assert out.columns == ["doc_id", "dl2"]
    assert out.first()["dl2"] == 20.0

    import pytest as _pt
    with _pt.raises(ValueError):
        solr_return_fields(df, "doc_id,++bad")
