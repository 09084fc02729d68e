"""BBox spatial gates (lucene/spatial/bbox/ + query/SpatialOperation):
hand-traced rectangle relations and the AreaSimilarity score formula."""

import math

import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.search.spatial_bbox import (area_similarity,
                                                   bbox_predicate)

Q = (0.0, 10.0, 0.0, 10.0)  # query rect, area 100


def _rects(spark):
    rows = [
        # doc, minx, maxx, miny, maxy
        (0, 2.0, 4.0, 2.0, 4.0),      # within (area 4, fully inside)
        (1, -5.0, 15.0, -5.0, 15.0),  # contains the query
        (2, 8.0, 12.0, 8.0, 12.0),    # partial overlap (2x2)
        (3, 20.0, 30.0, 0.0, 5.0),    # disjoint
        (4, 10.0, 12.0, 0.0, 5.0),    # touching edge (w == 0)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, minx double, maxx double, miny double,"
              " maxy double")


def _cols():
    return [F.col(c) for c in ("minx", "maxx", "miny", "maxy")]


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_predicates(spark):
    r = _rects(spark)
    assert _ids(r.filter(bbox_predicate("within", *_cols(), Q))) == [0]
    assert _ids(r.filter(bbox_predicate("contains", *_cols(), Q))) == [1]
    assert _ids(r.filter(bbox_predicate("disjoint", *_cols(), Q))) == [3]
    # intersects = NOT disjoint: the touching rect (shared edge) is
    # NOT disjoint by the strict-inequality rule
    assert _ids(r.filter(
        bbox_predicate("intersects", *_cols(), Q))) == [0, 1, 2, 4]


def test_area_similarity_values(spark):
    r = _rects(spark)
    got = {row["doc_id"]: row["s"] for row in r.select(
        "doc_id", area_similarity(*_cols(), Q).alias("s")).collect()}
    # within: ia=4, qr=4/100, tr=4/4=1 -> (0.04)^2 * sqrt(1)
    assert got[0] == pytest.approx(0.04 ** 2, rel=0, abs=0)
    # contains: ia=100, qr=1, tr=100/400 -> 1 * sqrt(0.25) = 0.5
    assert got[1] == 0.5
    # partial: ia=4, qr=0.04, tr=4/16=0.25 -> 0.0016 * 0.5
    assert got[2] == pytest.approx((4 / 100.0) ** 2 * math.sqrt(0.25))
    # disjoint and touching-edge score 0
    assert got[3] == 0.0 and got[4] == 0.0


def test_nondefault_power_falls_back_to_pow(spark):
    r = _rects(spark)
    got = {row["doc_id"]: row["s"] for row in r.select(
        "doc_id",
        area_similarity(*_cols(), Q, query_power=1.5,
                        target_power=1.0).alias("s")).collect()}
    assert got[1] == pytest.approx(1.0 ** 1.5 * 0.25)
