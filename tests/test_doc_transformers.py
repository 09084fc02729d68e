"""fl augmenters ([docid]/[shard]/[value]/[explain]/[elevated]/
[excluded]) — TransformerFactory.defaultFactories (:20-26),
SolrReturnFields.add augmenter branch (:246-269),
BaseEditorialTransformer (:49-60), ValueAugmenterFactory (:45-59)."""

import pytest

from lucene_solr_spark.search.returnfields import solr_return_fields


@pytest.fixture(scope="module")
def hits(spark):
    return spark.createDataFrame(
        [(0, "a.py", 1.5), (1, "b.py", 1.0), (2, "c.py", 0.5)],
        "doc_id long, path string, score double")


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_docid_augmenter(hits):
    out = solr_return_fields(hits, "path,[docid]")
    assert out.columns == ["path", "[docid]"]
    assert rows(out.orderBy("[docid]")) == [
        ("a.py", 0), ("b.py", 1), ("c.py", 2)]


def test_docid_alias_and_shard(hits):
    out = solr_return_fields(
        hits, "id:[docid],which:[shard]",
        augmenter_context={"shard": "shard-07"})
    assert out.columns == ["id", "which"]
    assert rows(out.orderBy("id"))[0] == (0, "shard-07")
    # no context -> empty shard string
    out2 = solr_return_fields(hits, "[shard]")
    assert rows(out2)[0] == ("",)


def test_value_augmenter_typing():
    """getObjectFrom: int/double/float coercion; bad parse throws;
    untyped stays a string."""
    import pyspark.sql.types as T

    from lucene_solr_spark.session import get_spark

    spark = get_spark(cpus=2)
    df = spark.createDataFrame([(0, 1.0)], "doc_id long, score double")
    out = solr_return_fields(df, "n:[value v=42 t=int],s:[value v=42]")
    assert [f.dataType for f in out.schema.fields] == [
        T.LongType(), T.StringType()] or [
        f.dataType.simpleString() for f in out.schema.fields] == [
        "int", "string"]
    assert rows(out) == [(42, "42")]
    with pytest.raises(ValueError, match="Unable to parse"):
        solr_return_fields(df, "n:[value v=abc t=int]")
    with pytest.raises(ValueError, match="missing a value"):
        solr_return_fields(df, "n:[value]")


def test_editorial_markers(hits):
    """Membership of the uniqueKey in the marked set; no set ->
    FALSE for every doc (the reference's no-marking branch)."""
    ctx = {"elevated_ids": {1}, "key_col": "doc_id"}
    out = solr_return_fields(hits, "[docid],[elevated],[excluded]",
                             augmenter_context=ctx)
    assert rows(out.orderBy("[docid]")) == [
        (0, False, False), (1, True, False), (2, False, False)]


def test_explain_augmenter_join(hits, spark):
    exp = spark.createDataFrame(
        [(0, "0.5 = tf"), (2, "1.5 = idf")],
        "doc_id long, explanation string")
    out = solr_return_fields(
        hits, "[docid],why:[explain]",
        augmenter_context={"explain_df": exp})
    assert rows(out.orderBy("[docid]")) == [
        (0, "0.5 = tf"), (1, None), (2, "1.5 = idf")]
    with pytest.raises(ValueError, match="Unknown Explain Style"):
        solr_return_fields(hits, "[explain style=bogus]",
                           augmenter_context={"explain_df": exp})
    with pytest.raises(ValueError, match="explain_df"):
        solr_return_fields(hits, "[explain]")


def test_unknown_augmenter_raises(hits):
    with pytest.raises(ValueError, match="unknown transformer"):
        solr_return_fields(hits, "[bogus]")
