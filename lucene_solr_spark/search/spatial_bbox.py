"""BBox spatial strategy (lucene/spatial/src/java/org/apache/lucene/
spatial/bbox/BBoxStrategy.java + query/SpatialOperation.java):
rectangle-vs-rectangle predicates and the AreaSimilarity overlap
score.

Coordinates are planar doubles (the same documented divergence as the
geodist entry: no dateline wrap / curvature — pure IEEE arithmetic,
bit-identical across engines and fused into the scan). The reference's
dateline branches (AreaSimilarity.java:99-130) therefore collapse to
the simple-overlap case (:131-137).

AreaSimilarity.score (:84-150, defaults queryPower=2.0,
targetPower=0.5 from :74):
    height = min(q.maxy, t.maxy) - max(q.miny, t.miny)
    width  = min(q.maxx, t.maxx) - max(q.minx, t.minx)
    score  = (w*h/queryArea)^queryPower * (w*h/targetArea)^targetPower
             when w > 0 and h > 0 and both areas > 0, else 0.

100 TB plan: every predicate/score is whole-stage-codegen column math
over four doubles — composes with the parquet scan, prunable when the
rect columns carry min/max statistics.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["bbox_predicate", "area_similarity"]

Rect = Tuple[float, float, float, float]  # (minx, maxx, miny, maxy)


def bbox_predicate(op: str, minx: Column, maxx: Column, miny: Column,
                   maxy: Column, q: Rect) -> Column:
    """SpatialOperation predicates (query/SpatialOperation.java):
    'intersects' | 'within' (target inside query) | 'contains'
    (target contains query) | 'disjoint'."""
    qminx, qmaxx, qminy, qmaxy = (float(v) for v in q)
    disjoint = ((minx > qmaxx) | (maxx < qminx)
                | (miny > qmaxy) | (maxy < qminy))
    if op == "disjoint":
        return disjoint
    if op == "intersects":
        return ~disjoint
    if op == "within":
        return ((minx >= qminx) & (maxx <= qmaxx)
                & (miny >= qminy) & (maxy <= qmaxy))
    if op == "contains":
        return ((minx <= qminx) & (maxx >= qmaxx)
                & (miny <= qminy) & (maxy >= qmaxy))
    raise ValueError(op)


def area_similarity(minx: Column, maxx: Column, miny: Column,
                    maxy: Column, q: Rect, query_power: float = 2.0,
                    target_power: float = 0.5) -> Column:
    """AreaSimilarity.score as a double Column (see module doc)."""
    qminx, qmaxx, qminy, qmaxy = (float(v) for v in q)
    query_area = (qmaxx - qminx) * (qmaxy - qminy)
    target_area = (maxx - minx) * (maxy - miny)
    w = F.least(F.lit(qmaxx), maxx) - F.greatest(F.lit(qminx), minx)
    h = F.least(F.lit(qmaxy), maxy) - F.greatest(F.lit(qminy), miny)
    ia = w * h

    def _pow(x: Column, p: float) -> Column:
        # Math.pow is not guaranteed identically rounded across libms;
        # the default powers (2.0 query / 0.5 target, AreaSimilarity
        # :74) are exact IEEE ops, so use x*x / sqrt for engine-vs-
        # oracle bit-parity and fall back to pow otherwise.
        if p == 1.0:
            return x
        if p == 2.0:
            return x * x
        if p == 0.5:
            return F.sqrt(x)
        return F.pow(x, F.lit(float(p)))

    score = (_pow(ia / F.lit(query_area), float(query_power))
             * _pow(ia / target_area, float(target_power)))
    ok = ((w > 0) & (h > 0) & (target_area > 0)
          & F.lit(query_area > 0))
    return F.when(ok, score).otherwise(F.lit(0.0))
