"""Solr Cell gates (sources/extract.py vs solr/contrib/extraction
ExtractingRequestHandler semantics): content/title extraction,
script+style+comment removal, entity unescape, fmap rename, uprefix
for unmapped metadata, literal.* constants, unknown-type stub
contract, and the no-Python-row-path plan guarantee."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.sources.extract import extract, register_extractor

_HTML = (
    '<html><head><title> My  Page </title>'
    '<meta name="author" content="ada">'
    '<style>body { color: red; }</style></head>'
    '<body><h1>Head</h1><p>one &amp; two &lt;three&gt;</p>'
    '<script>if (a < b) { alert("x"); }</script>'
    '<!-- secret comment -->tail</body></html>'
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame([(1, _HTML)], "id long, raw string")


class TestHtmlExtractor:
    def test_content_and_title(self, spark, df):
        row = extract(df, "raw", "text/html").collect()[0]
        assert row["title"] == "My Page"
        # script/style/comment bodies gone, entities unescaped,
        # whitespace collapsed; head-level text (title) stays in
        # content, matching SolrContentHandler's catchAllBuilder
        # which accumulates every character event
        assert row["content"] == "My Page Head one & two <three> tail"

    def test_fmap_uprefix_literal_meta(self, spark, df):
        out = extract(
            df, "raw", "text/html",
            literals={"stream_source": "upload"},
            fmap={"title": "doc_title"},
            meta_fields=["author"], uprefix="attr_")
        row = out.collect()[0]
        assert row["doc_title"] == "My Page"
        assert row["attr_author"] == "ada"
        assert row["stream_source"] == "upload"
        assert "title" not in out.columns

    def test_plain_text(self, spark):
        d = spark.createDataFrame([(" a \n b  c ",)], "raw string")
        assert extract(d, "raw", "text/plain").collect()[0]["content"] \
            == "a b c"

    def test_unknown_type_raises_stub_contract(self, spark, df):
        with pytest.raises(NotImplementedError, match="register_extractor"):
            extract(df, "raw", "application/pdf")

    def test_register_extractor_hook(self, spark, df):
        @register_extractor("text/x-upper")
        def _up(col):
            return {"content": F.upper(col)}
        row = extract(df.select(F.lit("ab").alias("raw")), "raw",
                      "text/x-upper").collect()[0]
        assert row["content"] == "AB"

    def test_plan_all_codegen_no_python(self, spark, df):
        plan = extract(df, "raw", "text/html") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
