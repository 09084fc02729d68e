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


# ---------------------------------------------------------------------------
# schema.xml parsing (IndexSchema.readSchema)
# ---------------------------------------------------------------------------

SCHEMA_XML = """<schema name="test" version="1.5">
 <types><fieldType name="string"/><fieldType name="text"/></types>
 <fields>
  <field name="id" type="string" required="true"/>
  <field name="title" type="text"/>
  <field name="all" type="text" multiValued="true"/>
  <dynamicField name="*_s" type="string"/>
 </fields>
 <uniqueKey>id</uniqueKey>
 <defaultSearchField>title</defaultSearchField>
 <solrQueryParser defaultOperator="AND"/>
 <similarity class="solr.BM25SimilarityFactory"/>
 <copyField source="title" dest="all" maxChars="100"/>
 <copyField source="*_s" dest="all"/>
</schema>"""


def test_parse_schema_xml_happy_path():
    from lucene_solr_spark.schema import parse_schema_xml

    s = parse_schema_xml(SCHEMA_XML)
    assert s.name == "test" and s.version == 1.5
    assert s.unique_key == "id"
    assert s.default_search_field == "title"
    assert s.default_operator == "AND"
    assert s.similarity_class == "solr.BM25SimilarityFactory"
    assert s.fields == {"id": "string", "title": "text", "all": "text"}
    assert s.copy_fields == [("title", "all", 100), ("*_s", "all", 0)]
    assert s.field_type("foo_s") == "string"
    assert s.field_meta["id"]["required"] == "true"


def test_parse_schema_xml_rule_violations():
    """readSchema/loadFields/registerCopyField throw rules."""
    import pytest

    from lucene_solr_spark.schema import SchemaError, parse_schema_xml

    with pytest.raises(SchemaError, match="Duplicate field"):
        parse_schema_xml("""<schema><fields>
          <field name="a" type="t"/><field name="a" type="t"/>
          </fields></schema>""")
    with pytest.raises(SchemaError, match="leading or a trailing"):
        parse_schema_xml("""<schema><fields>
          <dynamicField name="a*b" type="t"/></fields></schema>""")
    with pytest.raises(SchemaError, match="Unknown fieldType"):
        parse_schema_xml("""<schema>
          <types><fieldType name="t"/></types>
          <fields><field name="a" type="nope"/></fields></schema>""")
    with pytest.raises(SchemaError, match="can not be the dest"):
        parse_schema_xml("""<schema><fields>
          <field name="id" type="t"/><field name="b" type="t"/>
          </fields><uniqueKey>id</uniqueKey>
          <copyField source="b" dest="id"/></schema>""")
    with pytest.raises(SchemaError, match="default value"):
        parse_schema_xml("""<schema><fields>
          <field name="id" type="t" default="x"/></fields>
          <uniqueKey>id</uniqueKey></schema>""")
    with pytest.raises(SchemaError, match="multivalued"):
        parse_schema_xml("""<schema><fields>
          <field name="id" type="t" multiValued="true"/></fields>
          <uniqueKey>id</uniqueKey></schema>""")
    with pytest.raises(SchemaError, match="invalid glob"):
        parse_schema_xml("""<schema><fields>
          <field name="a" type="t"/><field name="b" type="t"/>
          </fields><copyField source="a*b" dest="b"/></schema>""")
    with pytest.raises(SchemaError, match="not defined"):
        parse_schema_xml("""<schema><fields>
          <field name="a" type="t"/></fields>
          <defaultSearchField>zzz</defaultSearchField></schema>""")
    # unparsable maxChars -> whole field copied (warn path)
    s = parse_schema_xml("""<schema><fields>
      <field name="a" type="t"/><field name="b" type="t"/>
      </fields><copyField source="a" dest="b" maxChars="xx"/>
      </schema>""")
    assert s.copy_fields == [("a", "b", 0)]


def test_parsed_schema_applies_copy_fields(spark):
    """The XML-parsed schema drives the SAME gated copyField
    application as the programmatic form."""
    from lucene_solr_spark.schema import parse_schema_xml

    s = parse_schema_xml(SCHEMA_XML)
    df = spark.createDataFrame(
        [("1", "hello world", "sv")], "id string, title string, x_s string")
    out = s.apply_copy_fields(df).collect()[0]
    assert out["all"] == ["hello world", "sv"]
