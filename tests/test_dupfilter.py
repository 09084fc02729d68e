"""DuplicateFilter gates (lucene/sandbox/.../queries/
DuplicateFilter.java): keeper-set semantics for both keep modes, the
query-independence of the keeper set, and NULL-field passthrough."""

from pyspark.sql import functions as F

from lucene_solr_spark.search.dupfilter import duplicate_filter, keeper_docs


def _docs(spark):
    rows = [
        (0, "a"), (1, "a"), (2, "b"), (3, None), (4, "b"), (5, None),
        (6, "c"),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_keeper_first_and_last(spark):
    d = _docs(spark)
    first = {r["doc_id"] for r in
             keeper_docs(d, "url", keep="first").collect()}
    last = {r["doc_id"] for r in
            keeper_docs(d, "url", keep="last").collect()}
    assert first == {0, 2, 6}
    assert last == {1, 4, 6}


def test_filter_keeps_nulls_and_intersects(spark):
    """Docs with no term in the filter field are never invalidated
    (correctBits only flips bits for docs holding a term) — NULL-field
    docs pass through; keeper set is computed over ALL docs, so a hit
    that is not its group's keeper drops even if it is the only hit
    in its group."""
    d = _docs(spark)
    results = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (5, 5.0)],
        "doc_id long, score double")
    out = {r["doc_id"] for r in
           duplicate_filter(results, d, "url", keep="first").collect()}
    # 1 dropped (keeper of 'a' is 0, even though 0 isn't a hit);
    # 2 kept (keeper of 'b'); 3 and 5 kept (NULL field)
    assert out == {2, 3, 5}


def test_filter_last_exact(spark):
    d = _docs(spark)
    results = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (5, 5.0)],
        "doc_id long, score double")
    out = {r["doc_id"] for r in
           duplicate_filter(results, d, "url", keep="last").collect()}
    assert out == {1, 3, 5}
