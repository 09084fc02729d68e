"""MemoryIndex-style percolation (memory.percolate_predicate): the
compiled Catalyst predicate must agree with brute-force Python matching
over the same token lists (BooleanQuery semantics: all MUST, no NOT,
>= mm SHOULD)."""

import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.memory import percolate_predicate

DOCS = [
    (0, ["table", "window", "stream", "join"]),
    (1, ["table", "stream"]),
    (2, ["window", "table"]),
    (3, ["scan", "merge"]),
    (4, ["tablet", "windows"]),
    (5, []),
]


def _run(spark, query, mm=0):
    df = spark.createDataFrame(DOCS, "doc_id long, toks array<string>")
    out = df.select(
        "doc_id",
        percolate_predicate(query, F.col("toks"), mm=mm).alias("m"),
    ).collect()
    return {r["doc_id"] for r in out if r["m"]}


def test_must_clauses(spark):
    assert _run(spark, "+table +window") == {0, 2}


def test_must_not(spark):
    assert _run(spark, "+table -stream") == {2}


def test_pure_should_needs_one(spark):
    assert _run(spark, "scan stream") == {0, 1, 3}


def test_min_should_match(spark):
    assert _run(spark, "table window stream", mm=2) == {0, 1, 2}


def test_prefix_and_wildcard(spark):
    assert _run(spark, "tab*") == {0, 1, 2, 4}
    assert _run(spark, "wind?w") == {0, 2}


def test_regexp(spark):
    assert _run(spark, "/w.*s/") == {4}


def test_term_range(spark):
    # [scan TO table] inclusive: scan, stream, table (not tablet)
    assert _run(spark, "[scan TO table]") == {0, 1, 2, 3}


def test_phrase_rejected(spark):
    with pytest.raises(NotImplementedError):
        _run(spark, '"table window"')
