"""CSV update-loader gates (handler/loader/CSVLoaderBase.java): quoted
separators, escape-disables-encapsulator, split->trim->map order,
empty-drop vs keepEmpty, skip, literals."""

from lucene_solr_spark.sources.csvloader import csv_loader


def _lines(spark, rows):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(rows)], "rid long, line string")


def test_quoted_separator_and_trim_map(spark):
    d = _lines(spark, ['a,"x, y ",en', 'b,plain,de'])
    out = csv_loader(
        d, ["k", "val", "lang"], id_cols=["rid"],
        trim=["val"], maps={"lang": [("en", "english")]},
    ).orderBy("rid").collect()
    assert out[0]["val"] == "x, y"      # comma survives quotes; trimmed
    assert out[0]["lang"] == "english"
    assert out[1]["lang"] == "de"       # map is exact-match only


def test_escape_disables_encapsulator(spark):
    d = _lines(spark, ['a,x\\,y,"q"'])
    out = csv_loader(
        d, ["k", "val", "q"], id_cols=["rid"], escape="\\",
    ).collect()[0]
    assert out["val"] == "x,y"
    assert out["q"] == '"q"'            # quotes now literal


def test_split_trim_map_order_and_empty(spark):
    d = _lines(spark, ["a,en; de ;;en"])
    out = csv_loader(
        d, ["k", "langs"], id_cols=["rid"],
        split=["langs"], split_sep={"langs": ";"}, trim=["langs"],
        maps={"langs": [("en", "english")]},
    ).collect()[0]
    # split -> trim (' de ' -> 'de') -> map (en -> english), empty
    # sub-values dropped by the default adder
    assert out["langs"] == ["english", "de", "english"]
    kept = csv_loader(
        d, ["k", "langs"], id_cols=["rid"],
        split=["langs"], split_sep={"langs": ";"}, trim=["langs"],
        keep_empty=["langs"],
    ).collect()[0]
    assert kept["langs"] == ["en", "de", "", "en"]


def test_skip_literal_and_scalar_empty(spark):
    d = _lines(spark, ["a,,z"])
    out = csv_loader(
        d, ["k", "mid", "z"], id_cols=["rid"], skip=["z"],
        literals={"batch": "b9"},
    )
    assert "z" not in out.columns
    r = out.collect()[0]
    assert r["mid"] is None             # empty scalar dropped -> NULL
    assert r["batch"] == "b9"
