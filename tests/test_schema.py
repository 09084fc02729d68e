"""IndexSchema gates (solr/schema/IndexSchema.java, CopyField.java):
dynamic pattern kinds, longest-first resolution, copyField value
order + maxChars, glob-to-glob substitution, undefined-field throw."""

import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.schema import IndexSchema, SchemaError


def test_dynamic_resolution_longest_first():
    sch = IndexSchema(
        fields={"id": "string"},
        dynamic_fields={"*_t": "text", "*_point_t": "point",
                        "attr_*": "string"},
    )
    assert sch.field_type("id") == "string"
    assert sch.field_type("body_t") == "text"
    # longer pattern wins (DynamicReplacement.compareTo)
    assert sch.field_type("geo_point_t") == "point"
    assert sch.field_type("attr_color") == "string"
    with pytest.raises(SchemaError):
        sch.field_type("nope")
    with pytest.raises(SchemaError):
        IndexSchema(fields={}, copy_fields=[("a", "b", -1)])


def test_copyfield_order_maxchars_and_own_value(spark):
    sch = IndexSchema(
        fields={"a": "text", "b": "text", "all": "text"},
        copy_fields=[("a", "all"), ("b", "all", 3)],
    )
    d = spark.createDataFrame(
        [(1, "alpha", "bravo", "own")],
        "id long, a string, b string, all string")
    r = sch.apply_copy_fields(d).collect()[0]
    # own value first, then copies in rule order; b limited to 3 chars
    assert r["all"] == ["own", "alpha", "bra"]


def test_copyfield_glob_subst_and_null_skip(spark):
    sch = IndexSchema(
        fields={},
        dynamic_fields={"*_s": "string", "attr_*": "string"},
        copy_fields=[("*_s", "attr_*")],
    )
    d = spark.createDataFrame(
        [(1, "x", None)], "id long, c_s string, d_s string")
    r = sch.apply_copy_fields(d).collect()[0]
    assert r["attr_c"] == ["x"]
    assert r["attr_d"] == []          # NULL source = absent doc field


def test_copyfield_unknown_dest_raises(spark):
    sch = IndexSchema(fields={"a": "text"},
                      copy_fields=[("a", "nowhere")])
    d = spark.createDataFrame([(1, "v")], "id long, a string")
    with pytest.raises(SchemaError, match="destination"):
        sch.apply_copy_fields(d)
