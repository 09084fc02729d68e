"""DrillSideways faceting (lucene/facet/src/java/org/apache/lucene/
facet/search/DrillSideways.java; scorer DrillSidewaysScorer.java).

A DrillDownQuery is a base query plus per-dimension drill-down filters
(DrillDownQuery.java: base MUST + one clause per dim). Drill-sideways
counting keeps a drilled dimension from disappearing after the user
drills into it: for each drilled dim d, facet counts over docs matching
``base AND every other dim's filter`` — i.e. docs that are a "near
miss" on d only are still counted under d's alternative values
(DrillSidewaysScorer.java's collectNearMiss path), while non-drilled
dims are counted over the full hit set (the plain FacetsCollector on
the hits).

Spark shape: ONE projection of the joined (base ⋈ dims) rows with a
precomputed boolean flag per drill-down filter, cached, then one small
aggregation per requested dimension over it (the reference likewise
allocates one FacetsCollector per drill-down plus one, DrillSideways
class javadoc). Each aggregation is a groupBy on a low-cardinality dim
value — partial (map-side) aggregation makes the shuffle tiny at any
corpus size, and the flag projection is whole-stage-codegen column
math, no UDFs.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def drill_sideways(
    doc_dims: DataFrame,
    base: DataFrame,
    drilldown: Dict[str, Column],
    facet_dims: Optional[List[str]] = None,
) -> DataFrame:
    """Compute drill-down + drill-sideways counts.

    doc_dims: (doc_id, <dim columns>) attribute surface.
    base: doc_id set matching the base query (scores irrelevant for
      counting — FacetsCollector keeps only the doc bitset).
    drilldown: dim name -> boolean Column over doc_dims (the dim's
      drill-down filter, e.g. ``F.col('lang') == 'en'``).
    facet_dims: dims to return counts for (default: the drilled dims).

    Returns (dim, value, cnt): for a drilled dim, counts over
    base ∧ (all OTHER drill-downs); for a non-drilled dim, counts over
    base ∧ (ALL drill-downs) — exactly DrillSideways.search()'s
    drillSidewaysCollectors vs drillDownCollector split.
    """
    facet_dims = list(facet_dims or drilldown.keys())
    flags = [
        cond.alias(f"__flag_{d}") for d, cond in drilldown.items()
    ]
    m = (
        doc_dims.join(base.select("doc_id").distinct(), "doc_id")
        .select("doc_id", *facet_dims, *flags)
    )
    parts = []
    for dim in facet_dims:
        cond = None
        for d in drilldown:
            if d == dim:
                continue  # sideways: relax ONLY this dim's filter
            c = F.col(f"__flag_{d}")
            cond = c if cond is None else (cond & c)
        sel = m if cond is None else m.where(cond)
        parts.append(
            sel.groupBy(F.col(dim).alias("value"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.lit(dim).alias("dim"), "value", "cnt")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("dim", "value")
