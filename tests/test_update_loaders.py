"""JSON/XML update loader unit semantics (JsonLoader.java /
XMLLoader.java): command dispatch, extended field values, the
REVERSED repeated-key merge (JSON) vs document-order append (XML),
delete form fan-out, entity unescape, boost defaults."""

from pyspark.sql import functions as F

from lucene_solr_spark.sources.jsonloader import json_update_loader
from lucene_solr_spark.sources.xmlloader import (
    unescape_xml, xml_update_loader)


def test_json_commands_and_extended_values(spark):
    rows = [
        (1, '{"add": {"doc": {"id": "d1", "wc": {"boost": 1.5, '
            '"value": 42}, "ar": ["x","y"]}, "boost": 2.0, '
            '"overwrite": false, "commitWithin": 100}}'),
        (2, '{"id": "d2", "wc": 7, "ar": ["z"]}'),  # bare doc add
        (3, '{"delete": ["i1", "i2", 33]}'),
        (4, '{"delete": {"query": "lang:en"}}'),
        (5, '{"delete": "solo"}'),
        (6, '{"commit": {"waitSearcher": true}}'),
    ]
    df = spark.createDataFrame(rows, ["rid", "payload"])
    out = json_update_loader(
        df, {"id": "string", "wc": "long", "ar": "string"},
        id_cols=["rid"], multivalued=["ar"])
    got = {r["rid"]: r for r in out.collect() if r["rid"] in (1, 2, 6)}
    assert got[1]["cmd"] == "add" and got[1]["wc"] == 42
    assert abs(got[1]["wc_boost"] - 1.5) < 1e-6
    assert got[1]["doc_boost"] == 2.0 and got[1]["overwrite"] is False
    assert got[1]["commit_within"] == 100 and got[1]["ar"] == ["x", "y"]
    assert got[2]["cmd"] == "add" and got[2]["wc"] == 7
    assert got[2]["wc_boost"] == 1.0 and got[2]["overwrite"] is True
    assert got[6]["cmd"] == "commit"
    # delete fan-out: array explodes (numerics stringified via
    # getString), map and scalar forms single-row
    dels = sorted(r["delete_id"] for r in out.collect()
                  if r["rid"] == 3)
    assert dels == ["33", "i1", "i2"]
    q = [r for r in out.collect() if r["rid"] == 4][0]
    assert q["delete_query"] == "lang:en" and q["delete_id"] is None
    assert [r["delete_id"] for r in out.collect()
            if r["rid"] == 5] == ["solo"]


def test_json_repeated_key_merge_reversed(spark):
    # parseDoc put-then-addValue: newest occurrence leads (:413-426)
    df = spark.createDataFrame(
        [(1, '{"add":{"doc":{"id":"d","tag":"a","tag":"b",'
             '"tag":"c"}}}')], ["rid", "payload"])
    out = json_update_loader(df, {"tag": "string"},
                             id_cols=["rid"], repeated_keys=["tag"])
    assert out.collect()[0]["tag"] == ["c", "b", "a"]


def test_xml_doc_fields_and_deletes(spark):
    rows = [
        (1, '<add overwrite="false" commitWithin="5">'
            '<doc boost="2.0"><field name="id">D1</field>'
            '<field name="lang" boost="1.5">en</field>'
            '<field name="tag">a</field>'
            '<field name="tag">b&amp;c</field>'
            '<field name="nul" null="true">zzz</field>'
            '<field name="wc">42</field></doc></add>'),
        (2, '<delete><id>D7</id><id>D8</id></delete>'),
        (3, '<delete><query>lang:en</query></delete>'),
        (4, '<add><doc><field name="id">D5</field>'
            '<field name="cnt" update="inc">3</field></doc></add>'),
    ]
    df = spark.createDataFrame(rows, ["rid", "payload"])
    out = xml_update_loader(
        df, {"id": "string", "lang": "string", "tag": "string",
             "nul": "string", "wc": "long", "cnt": "long"},
        id_cols=["rid"], multivalued=["tag"])
    rowz = out.collect()
    r1 = [r for r in rowz if r["rid"] == 1][0]
    # document-order multivalue (addField :426) + entity unescape
    assert r1["tag"] == ["a", "b&c"]
    assert r1["nul"] is None and r1["wc"] == 42
    assert abs(r1["lang_boost"] - 1.5) < 1e-6
    assert r1["doc_boost"] == 2.0 and r1["overwrite"] is False
    assert r1["commit_within"] == 5
    assert sorted(r["delete_id"] for r in rowz
                  if r["rid"] == 2) == ["D7", "D8"]
    assert [r["delete_query"] for r in rowz
            if r["rid"] == 3] == ["lang:en"]
    # update="..." elements are atomic-update routed, not plain values
    r4 = [r for r in rowz if r["rid"] == 4][0]
    assert r4["cnt"] is None


def test_xml_unescape_entities(spark):
    df = spark.createDataFrame(
        [("&lt;a&gt; &amp;&quot;&apos;",)], ["s"])
    assert df.select(
        unescape_xml(F.col("s")).alias("u")
    ).collect()[0]["u"] == '<a> &"\''
