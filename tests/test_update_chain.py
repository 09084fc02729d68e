"""Update-processor chain gates (solr/update/processor/): per-factory
semantics on hand-built docs, chain ordering, and the RegexpBoost
multiply rule."""

from pyspark.sql import functions as F

from lucene_solr_spark import update_chain as U


def _df(spark):
    rows = [
        (0, "  hello world  ", ["a", "b", "a", "", "c", "b"], None),
        (1, "", ["", ""], "x"),
        (2, "abcdefghij", [], "y"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, s string, tags array<string>, opt string")


def test_trim_truncate_length(spark):
    d = _df(spark)
    out = U.update_chain(d, [
        U.trim_fields("s"),
        U.truncate_fields(5, "s"),
        U.field_length("s", dst="slen"),
    ])
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["s"] == "hello"
    assert rows[0]["slen"] == 5
    assert rows[2]["s"] == "abcde"


def test_remove_blank_uniq_count_concat(spark):
    d = _df(spark)
    out = U.update_chain(d, [
        U.remove_blank("tags"),
        U.uniq_values("tags"),
        U.count_values("tags", dst="n"),
        U.concat_values("tags", "|", dst="joined"),
    ])
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["tags"] == ["a", "b", "c"]  # first-occurrence order
    assert rows[0]["n"] == 3
    assert rows[0]["joined"] == "a|b|c"
    assert rows[1]["tags"] == [] and rows[1]["n"] == 0
    assert rows[2]["joined"] == ""


def test_remove_blank_scalar_and_default(spark):
    d = _df(spark)
    out = U.update_chain(d, [
        U.remove_blank("s"),
        U.default_value("s", "(empty)"),
        U.default_value("opt", "zz"),
    ])
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["s"] == "(empty)"   # blank -> NULL -> default
    assert rows[0]["opt"] == "zz"      # NULL filled
    assert rows[1]["opt"] == "x"       # present kept


def test_clone_then_mutate_keeps_source(spark):
    d = _df(spark)
    out = U.update_chain(d, [
        U.clone_field("s", "s2"),
        U.truncate_fields(3, "s2"),
    ])
    r0 = out.filter(F.col("doc_id") == 0).collect()[0]
    assert r0["s"] == "  hello world  " and r0["s2"] == "  h"


def test_regexp_boost_multiplies(spark):
    d = _df(spark)
    out = U.update_chain(d, [
        U.regexp_boost("opt", "^x$", 2.0),
        U.regexp_boost("opt", "^[xy]$", 3.0),
    ])
    rows = {r["doc_id"]: r["boost"] for r in out.collect()}
    assert rows[1] == 6.0   # both patterns matched: 1*2*3
    assert rows[2] == 3.0   # second only
    assert rows[0] == 1.0   # NULL field: no match


def test_field_value_subset_and_misc(spark):
    from lucene_solr_spark.update_chain import (
        first_value, html_strip_field, ignore_field, last_value,
        max_value, min_value, regex_replace_field, timestamp_field,
        update_chain, uuid_field,
    )

    df = spark.createDataFrame(
        [(1, [3, 1, 2], "<p>Hi &amp; <b>bye</b></p>", "abcabc")],
        "id int, vals array<int>, html string, txt string")
    out = update_chain(df, [first_value("vals")]).first()
    assert out["vals"] == 3
    assert update_chain(df, [last_value("vals")]).first()["vals"] == 2
    assert update_chain(df, [min_value("vals")]).first()["vals"] == 1
    assert update_chain(df, [max_value("vals")]).first()["vals"] == 3
    assert "html" not in update_chain(df, [ignore_field("html")]).columns
    assert update_chain(df, [html_strip_field("html")]).first()["html"] \
        == "Hi & bye"
    assert update_chain(
        df, [regex_replace_field("txt", "abc", "x")]).first()["txt"] == "xx"
    ts = update_chain(
        df, [timestamp_field("created", "2024-02-01 00:00:00")]).first()
    assert str(ts["created"]) == "2024-02-01 00:00:00"
    # deterministic uuid: same input -> same uuid, valid v5-ish shape
    u1 = update_chain(df, [uuid_field("uid", ["id", "txt"])]).first()["uid"]
    u2 = update_chain(df, [uuid_field("uid", ["id", "txt"])]).first()["uid"]
    assert u1 == u2 and len(u1) == 36 and u1[14] == "5"


def test_url_classify_rules(spark):
    from lucene_solr_spark.update_chain import update_chain, url_classify

    rows = [
        (1, "http://example.com/"),                   # top + landing
        (2, "http://example.com/a/index.html"),       # landing, 1 level
        (3, "http://example.com/a/b/page.html"),      # deep, 2 levels
        (4, "http://example.com/?q=1"),               # query kills both
        (5, "http://example.com/a/welcome.php"),      # landing
        (6, "http://example.com"),                    # empty path: top
    ]
    df = spark.createDataFrame(rows, "id int, url string")
    got = {r["id"]: r for r in
           update_chain(df, [url_classify()]).collect()}
    # (levels, toplevel, landingpage)
    # levels counts every '/' left after suffix removal + trailing
    # strip — including the leading one (URLClassifyProcessor.java:
    # 169-178: "/a/b/page.html" -> 3, "/a/index.html" -> "/a" -> 1)
    want = {1: (0, 1, 1), 2: (1, 0, 1), 3: (3, 0, 0),
            4: (0, 0, 0), 5: (1, 0, 1), 6: (0, 1, 0)}
    for i, (lv, tp, lp) in want.items():
        r = got[i]
        assert (r["url_levels"], r["url_toplevel"],
                r["url_landingpage"]) == (lv, tp, lp), (i, r)
    assert got[2]["url_canonical"] == "http://example.com/a/"
    assert got[1]["url_canonical"] == "http://example.com/"
    assert got[3]["url_canonical"] == rows[2][1]
    assert got[1]["url_domain"] == "example.com"
    assert got[2]["url_length"] == len(rows[1][1])
