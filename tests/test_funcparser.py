"""FunctionQParser gates (solr/search/FunctionQParser.java +
ValueSourceParser.java): grammar, Solr argument orders, the log-is-
base-10 rule, boolean functions, and error paths."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.funcparser import parse_function_query
from lucene_solr_spark.search.queryparser import QueryParseError


def _eval(spark, expr, **fields):
    df = spark.createDataFrame(
        [tuple(fields.values())],
        ", ".join(f"{k} double" for k in fields))
    col = parse_function_query(
        expr, fields={k: F.col(k) for k in fields})
    return df.select(col.alias("v")).collect()[0]["v"]


def test_arithmetic_and_nesting(spark):
    v = _eval(spark, "sum(recip(x,1,5,1),product(0.5,sqrt(x)))", x=4.0)
    assert v == 5 / 5 + 0.5 * 2.0


def test_solr_arg_orders(spark):
    assert _eval(spark, "linear(x,2,3)", x=10.0) == 23.0       # m*x+c
    assert _eval(spark, "recip(x,1,2,3)", x=7.0) == 2 / 10     # a/(mx+b)
    assert _eval(spark, "map(x,0,5,99)", x=3.0) == 99.0
    assert _eval(spark, "map(x,0,5,99)", x=7.0) == 7.0         # no default
    assert _eval(spark, "map(x,0,5,99,-1)", x=7.0) == -1.0
    assert _eval(spark, "sub(x,1)", x=4.0) == 3.0
    assert _eval(spark, "mod(x,3)", x=7.0) == 1.0


def test_log_is_base10_ln_natural(spark):
    assert _eval(spark, "log(x)", x=100.0) == 2.0
    assert _eval(spark, "ln(x)", x=math.e) == pytest.approx(1.0)


def test_constants_and_multiarg_minmax(spark):
    assert _eval(spark, "product(pi,2)", x=0.0) == math.pi * 2
    assert _eval(spark, "max(x,3,7)", x=5.0) == 7.0
    assert _eval(spark, "min(x,3,7)", x=5.0) == 3.0


def test_boolean_functions(spark):
    assert _eval(spark, "if(exists(x),1,0)", x=1.0) == 1
    assert _eval(spark, "if(and(true,not(false)),10,20)", x=0.0) == 10
    assert _eval(spark, "if(xor(true,true),1,2)", x=0.0) == 2


def test_field_syntax_and_errors(spark):
    assert _eval(spark, "field(x)", x=42.0) == 42.0
    with pytest.raises(QueryParseError):
        _eval(spark, "nope(x)", x=1.0)
    with pytest.raises(QueryParseError):
        _eval(spark, "sum(x", x=1.0)
    with pytest.raises(QueryParseError):
        _eval(spark, "x y", x=1.0)
    with pytest.raises(QueryParseError):
        _eval(spark, "linear(x,2)", x=1.0)  # wrong arity


def test_extra_context_functions(spark):
    df = spark.createDataFrame([(2.0,)], "x double")
    col = parse_function_query(
        "product(boostv,x)", fields={"x": F.col("x")},
        extra={"boostv": F.lit(10.0)})
    assert df.select(col.alias("v")).collect()[0]["v"] == 20.0


class TestStrDist:
    """strdist backends (spell/JaroWinklerDistance.java,
    LevensteinDistance.java, NGramDistance.java) — Lucene's own unit
    vectors (TestJaroWinklerDistance / TestLevenshteinDistance /
    TestNGramDistance values)."""

    def test_jaro_winkler_vectors(self):
        import numpy as np

        from lucene_solr_spark.functions.strdist import jaro_winkler

        # TestJaroWinklerDistance.java: al/al=1, martha/marhta≈0.961,
        # jones/johnson≈0.832, abcvwxyz/cabvwxyz≈0.958,
        # dwayne/duane≈0.84, dixon/dicksonx≈0.813, fvie/ten=0
        assert jaro_winkler("al", "al") == np.float32(1.0)
        assert abs(jaro_winkler("martha", "marhta") - 0.9611) < 1e-3
        assert abs(jaro_winkler("jones", "johnson") - 0.8323) < 1e-3
        assert abs(jaro_winkler("dwayne", "duane") - 0.84) < 1e-2
        assert abs(jaro_winkler("dixon", "dicksonx") - 0.8133) < 1e-3
        assert jaro_winkler("fvie", "ten") == np.float32(0.0)

    def test_levenstein_vectors(self):
        import numpy as np

        from lucene_solr_spark.functions.strdist import (
            levenstein_similarity as lev)

        assert lev("al", "al") == np.float32(1.0)
        # Java float chain: 1.0f - (float)2/6 (NOT the double value)
        assert lev("martha", "marhta") == \
            np.float32(1.0) - np.float32(2) / np.float32(6)
        assert lev("", "") == np.float32(1.0)
        assert lev("a", "") == np.float32(0.0)

    def test_lucene_levenshtein_vectors(self):
        import numpy as np

        from lucene_solr_spark.functions.strdist import (
            lucene_levenshtein_similarity as llev)

        # LuceneLevenshteinDistance.java: parallel edits — 'ab' vs
        # 'bca' distance 3 (class javadoc) -> 1 - 3/2; transposition
        # is ONE primitive edit; scale by MIN length (not max)
        assert llev("ab", "bca") == np.float32(-0.5)
        assert llev("ab", "ba") == np.float32(0.5)
        assert llev("kitten", "sitten") == \
            np.float32(1.0) - np.float32(1) / np.float32(6)
        # the :70-77 quirk: empty vs nonempty returns max(n, m) RAW
        assert llev("", "abc") == np.float32(3.0)
        assert llev("", "") == np.float32(0.0)
        assert llev("merge", "merge") == np.float32(1.0)

    def test_ngram_vectors(self):
        import numpy as np

        from lucene_solr_spark.functions.strdist import ngram_similarity

        assert ngram_similarity("al", "al") == np.float32(1.0)
        # short-string path: positional char matches / maxLen
        assert ngram_similarity("a", "ab") == np.float32(0.5)
        assert ngram_similarity("", "") == np.float32(1.0)
        assert ngram_similarity("", "x") == np.float32(0.0)
        # symmetric-ish sanity + range
        v = ngram_similarity("martha", "marhta")
        assert 0.0 < float(v) < 1.0


class TestStrdistFunction:
    """strdist(...) through the function-query parser
    (ValueSourceParser.java:361-385 registration)."""

    def test_strdist_backends_and_literals(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from lucene_solr_spark.functions.funcparser import (
            parse_function_query)
        from lucene_solr_spark.functions.strdist import (
            jaro_winkler, levenstein_similarity, ngram_similarity,
            strdist_function)

        df = spark.createDataFrame(
            [("merge", "marge"), ("sort", "merge")], "a string, b string")
        fields = {"a": F.col("a"), "b": F.col("b")}
        extra = {"strdist": strdist_function(fields)}
        out = df.select(
            parse_function_query("strdist(a, b, jw)", fields,
                                 extra=extra).alias("jw"),
            parse_function_query("strdist(a, 'merge', edit)", fields,
                                 extra=extra).alias("ed"),
            parse_function_query("strdist(a, b, ngram, 3)", fields,
                                 extra=extra).alias("ng"),
        ).collect()
        for r, (x, y) in zip(out, [("merge", "marge"),
                                   ("sort", "merge")]):
            assert np.float32(r["jw"]) == jaro_winkler(x, y)
            assert np.float32(r["ed"]) == levenstein_similarity(
                x, "merge")
            assert np.float32(r["ng"]) == ngram_similarity(x, y, 3)

    def test_strdist_backend_case_insensitive(self, spark):
        """jw/edit/ngram match case-insensitively
        (ValueSourceParser.java:370-374 equalsIgnoreCase)."""
        import numpy as np
        from pyspark.sql import functions as F

        from lucene_solr_spark.functions.funcparser import (
            parse_function_query)
        from lucene_solr_spark.functions.strdist import (
            jaro_winkler, strdist_function)

        df = spark.createDataFrame([("merge", "marge")],
                                   "a string, b string")
        fields = {"a": F.col("a"), "b": F.col("b")}
        extra = {"strdist": strdist_function(fields)}
        out = df.select(
            parse_function_query("strdist(a, b, JW)", fields,
                                 extra=extra).alias("jw"),
            parse_function_query("strdist(a, b, Edit)", fields,
                                 extra=extra).alias("ed"),
        ).collect()[0]
        assert np.float32(out["jw"]) == jaro_winkler("merge", "marge")
        assert out["ed"] is not None

    def test_strdist_unknown_backend(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from lucene_solr_spark.functions.funcparser import (
            parse_function_query)
        from lucene_solr_spark.functions.strdist import strdist_function

        fields = {"a": F.col("a")}
        with pytest.raises(ValueError, match="unknown StringDistance"):
            parse_function_query(
                "strdist(a, a, bogus)", fields,
                extra={"strdist": strdist_function(fields)})
