"""Atomic-update op-merge gates (DistributedUpdateProcessor.
getUpdatedDocument, solr/core/.../DistributedUpdateProcessor.java:
685-766): set/add/inc fold order, typed inc branches, missing-old-value
inc-degrades-to-set, create-by-default, and the idField rejection."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.atomic import apply_atomic_updates


def _old(spark):
    rows = [
        ("r", "a", "c", "en", "alpha beta", 10, 1.5),
        ("r", "b", "c", "de", "gamma", None, None),
        ("r", "untouched", "c", "fr", "delta", 7, 0.5),
    ]
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "content string, n long, x double",
    )


def _upd(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, seq int, "
        "field string, op string, value string",
    )


def _merged(spark, rows):
    out = apply_atomic_updates(
        _old(spark), _upd(spark, rows),
        numeric_fields={"n": "long", "x": "double"},
    )
    return {r["path"]: r.asDict() for r in out.collect()}


def test_set_add_inc_fold(spark):
    m = _merged(spark, [
        ("r", "a", "c", 0, "lang", "set", "xx"),
        ("r", "a", "c", 1, "content", "add", "tail1"),
        ("r", "a", "c", 2, "content", "add", "tail2"),
        ("r", "a", "c", 3, "n", "inc", "5"),
        ("r", "a", "c", 4, "x", "inc", "0.25"),
    ])
    assert set(m) == {"a"}  # only updated docs returned
    assert m["a"]["lang"] == "xx"
    # add ops apply in seq order (SolrInputDocument field order)
    assert m["a"]["content"] == "alpha beta tail1 tail2"
    assert m["a"]["n"] == 15          # typed long inc
    assert m["a"]["x"] == 1.75        # typed double inc


def test_inc_missing_old_value_degrades_to_set(spark):
    # :723-724 — numericField == null -> setField(fieldVal)
    m = _merged(spark, [("r", "b", "c", 0, "n", "inc", "3")])
    assert m["b"]["n"] == 3


def test_add_on_null_and_multiple_ops_same_field(spark):
    m = _merged(spark, [
        ("r", "b", "c", 0, "n", "inc", "2"),
        ("r", "b", "c", 1, "n", "inc", "40"),
        ("r", "b", "c", 2, "content", "set", "reset"),
        ("r", "b", "c", 3, "content", "add", "plus"),
    ])
    assert m["b"]["n"] == 42          # inc chains fold left-to-right
    assert m["b"]["content"] == "reset plus"  # set then add


def test_create_by_default(spark):
    # :693-696 — no old doc and no version demanded -> fresh doc
    m = _merged(spark, [
        ("r", "newdoc", "c", 0, "lang", "set", "zz"),
        ("r", "newdoc", "c", 1, "content", "add", "born"),
    ])
    assert m["newdoc"]["lang"] == "zz"
    assert m["newdoc"]["content"] == "born"  # add on empty doc = value
    assert m["newdoc"]["n"] is None          # unmentioned fields null


def test_id_field_update_rejected(spark):
    # :752-754 — "Invalid update of id field"
    with pytest.raises(ValueError, match="id field"):
        apply_atomic_updates(
            _old(spark),
            _upd(spark, [("r", "a", "c", 0, "path", "set", "evil")]),
        )
