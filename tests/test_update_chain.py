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
