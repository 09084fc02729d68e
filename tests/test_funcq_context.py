"""FunctionQParser extensions: quoted-string literals, raw-arg
functions (termfreq/idf/literal style parseArg/parseTerm callers),
vector(), top() no-op — plus the ScaleFloatFunction f32 chain on a
tiny frame (ValueSourceParser.java:102-141,161-169 semantics)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.funcparser import parse_function_query
from lucene_solr_spark.search.queryparser import QueryParseError


def test_string_literal_token(spark):
    col = parse_function_query("literal('a b,c')", {}, {
        "literal": _raw(lambda v: F.lit(v))})
    row = spark.range(1).select(col.alias("v")).first()
    assert row.v == "a b,c"


def _raw(fn):
    fn.raw_args = True
    return fn


def test_raw_args_pass_names_unresolved(spark):
    seen = {}

    def tf(field, term):
        seen["args"] = (field, term)
        return F.lit(1.0)

    parse_function_query("tf(text,merge)", {}, {"tf": _raw(tf)})
    assert seen["args"] == ("text", "merge")
    parse_function_query("tf(text,'two words')", {}, {"tf": _raw(tf)})
    assert seen["args"] == ("text", "two words")


def test_vector_and_top(spark):
    ex = {"vector": lambda *c: F.array(*c), "top": lambda x: x}
    col = parse_function_query("top(vector(1,2,3))", {}, ex)
    assert spark.range(1).select(col.alias("v")).first().v == [1, 2, 3]


def test_raw_missing_paren_raises():
    with pytest.raises(QueryParseError):
        parse_function_query("tf(text,merge", {}, {
            "tf": _raw(lambda f, t: F.lit(0.0))})


def test_scale_float_chain(spark):
    """ScaleFloatFunction: (v - min)*(hi-lo)/(max-min) + lo in f32
    steps; span 0 -> scale 0 -> everything maps to lo."""
    from lucene_solr_spark.functions.valuesource import FunctionContext

    class _FakeSearcher:
        max_doc = 4
        sum_ttf = 0

    ctx = FunctionContext.__new__(FunctionContext)
    ctx._joins = []
    ctx._scales = []
    ctx._n = 0
    df = spark.createDataFrame(
        [(0, 2.0), (1, 10.0), (2, 6.0), (3, float("nan"))],
        "doc_id long, v double")
    ctx._scales.append((F.col("v"), F.lit(0.0).cast("float"),
                        F.lit(1.0).cast("float"), "out"))
    got = {r.doc_id: r.out for r in ctx.apply(df).collect()}
    # min=2 max=10 (NaN skipped), scale=1/8
    assert got[0] == pytest.approx(0.0)
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(np.float32(4.0) * np.float32(0.125))
    # NaN input -> NaN output (only the pre-pass skips non-finites)
    assert math.isnan(got[3])


def test_scale_constant_column_maps_to_lo(spark):
    from lucene_solr_spark.functions.valuesource import FunctionContext

    ctx = FunctionContext.__new__(FunctionContext)
    ctx._joins = []
    ctx._scales = [(F.col("v"), F.lit(3.0).cast("float"),
                    F.lit(7.0).cast("float"), "out")]
    df = spark.createDataFrame([(0, 5.0), (1, 5.0)],
                               "doc_id long, v double")
    vals = {r.doc_id: r.out for r in ctx.apply(df).collect()}
    assert vals == {0: pytest.approx(3.0), 1: pytest.approx(3.0)}
