"""ExternalFileField gates (sources/external_file.py vs
FileFloatSource.getFloats:270-314): last-delimiter split, malformed
float skip-keep-default, last-wins override, def_val fill, broadcast
join application."""

from lucene_solr_spark.sources.external_file import (
    file_float_source,
    parse_external_file,
)


def _write(tmp_path, body):
    p = tmp_path / "eff.txt"
    p.write_text(body)
    return str(p)


class TestParse:
    def test_reference_line_rules(self, tmp_path):
        p = _write(tmp_path, "a=1.5\n"
                             "b=bogus\n"          # malformed: skip
                             "no_delim_line\n"    # no '=': skip
                             "c=2\n"
                             "c=3\n"              # last wins
                             "k=v=4.25\n"         # LAST '=' splits
                             "d=2.5e-1\n")
        vals = parse_external_file(p)
        assert vals == {"a": 1.5, "c": 3.0, "k=v": 4.25, "d": 0.25}

    def test_custom_delimiter(self, tmp_path):
        p = _write(tmp_path, "x:7.5\n")
        assert parse_external_file(p, delimiter=":") == {"x": 7.5}


class TestApply:
    def test_join_and_default(self, spark, tmp_path):
        p = _write(tmp_path, "a=2.0\n")
        df = spark.createDataFrame([("a",), ("zz",)], "k string")
        keyed, apply = file_float_source(spark, p, "k", def_val=1.0)
        got = {r["k"]: r["eff_value"] for r in apply(df).collect()}
        assert got == {"a": 2.0, "zz": 1.0}

    def test_broadcast_no_shuffle_of_fact_side(self, spark, tmp_path):
        from pyspark.sql import functions as F
        p = _write(tmp_path, "a=2.0\n")
        df = spark.range(100).withColumn(
            "k", F.concat(F.lit("s"), (F.col("id") % 5).cast("string")))
        _, apply = file_float_source(spark, p, "k", def_val=0.5)
        plan = apply(df)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
