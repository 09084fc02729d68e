"""DataImportHandler gates (sources/dih.py vs solr/contrib/
dataimporthandler semantics): transformer compilation (template /
regex extract / regex replaceWith null-on-no-match / splitBy /
date format), child-entity multivalued fold, delta-import filter."""

import datetime

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.sources.dih import (
    ChildEntity,
    DIHField,
    RootEntity,
    full_import,
)


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("dih")
    parents = spark.createDataFrame(
        [
            (1, "alice", "5-LOW", "a,b,c",
             datetime.datetime(2020, 1, 1)),
            (2, "bob", "1-URGENT", "x",
             datetime.datetime(2021, 6, 15)),
            (3, "carol", "nopriority", "",
             datetime.datetime(2022, 3, 3)),
        ],
        "id long, name string, prio string, tags string, mtime timestamp",
    )
    children = spark.createDataFrame(
        [(1, 30), (1, 10), (1, 20), (2, 5)],
        "pid long, v int",
    )
    parents.write.mode("overwrite").parquet(str(base / "p.parquet"))
    children.write.mode("overwrite").parquet(str(base / "c.parquet"))
    return str(base / "p.parquet"), str(base / "c.parquet")


def _root(ppath, cpath, delta=None):
    return RootEntity(
        name="e",
        path=ppath,
        pk="id",
        delta_column=delta,
        fields=[
            DIHField("label", template="${e.name}#${e.id}"),
            DIHField("code", src="prio", regex=r"^(\d)-"),
            DIHField("pname", src="prio", regex=r"^\d-",
                     replace_with=""),
            DIHField("tag_list", src="tags", split_by=","),
            DIHField("day", src="mtime", date_format="yyyy-MM-dd"),
        ],
        children=[
            ChildEntity("kid", cpath, "id", "pid",
                        DIHField("vals", src="v", cast="string")),
        ],
    )


class TestTransformers:
    def test_full_import(self, spark, tables):
        ppath, cpath = tables
        rows = {r["id"]: r for r in
                full_import(spark, _root(ppath, cpath)).collect()}
        assert rows[1]["label"] == "alice#1"
        assert rows[1]["code"] == "1" or rows[1]["code"] == "5"
        assert rows[1]["code"] == "5"
        assert rows[1]["pname"] == "LOW"
        assert rows[1]["tag_list"] == ["a", "b", "c"]
        assert rows[1]["day"] == "2020-01-01"
        # child fold: sorted multivalue + count
        assert rows[1]["vals"] == ["10", "20", "30"]
        assert rows[1]["kid_count"] == 3
        assert rows[2]["vals"] == ["5"] and rows[2]["kid_count"] == 1
        # parent with no children: count 0, null multivalue
        assert rows[3]["kid_count"] == 0 and rows[3]["vals"] is None

    def test_regex_no_match_is_null(self, spark, tables):
        ppath, cpath = tables
        rows = {r["id"]: r for r in
                full_import(spark, _root(ppath, cpath)).collect()}
        # RegexTransformer returns null (not '') when find() fails
        assert rows[3]["code"] is None
        assert rows[3]["pname"] is None

    def test_delta_import(self, spark, tables):
        ppath, cpath = tables
        root = _root(ppath, cpath, delta="mtime")
        out = full_import(spark, root,
                          last_index_time=datetime.datetime(2021, 1, 1))
        assert sorted(r["id"] for r in out.collect()) == [2, 3]

    def test_plan_is_one_join_no_python(self, spark, tables):
        ppath, cpath = tables
        plan = full_import(spark, _root(ppath, cpath)) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
