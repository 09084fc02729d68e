"""DrillSideways gates (lucene/facet/.../search/DrillSideways.java):
hand-built doc/dim table where the near-miss split is fully traced.

Docs (all in the base set except 9):
  id lang source
  0  en   A      full match
  1  en   B      near-miss on source only -> counted in source facet
  2  fr   A      near-miss on lang only   -> counted in lang facet
  3  fr   B      misses both              -> counted nowhere
  9  en   A      NOT in base              -> counted nowhere
Drill-down: lang='en' AND source='A'.
"""

from pyspark.sql import functions as F

from lucene_solr_spark.search.drillsideways import drill_sideways


def _rows(spark):
    dims = spark.createDataFrame(
        [(0, "en", "A"), (1, "en", "B"), (2, "fr", "A"), (3, "fr", "B"),
         (9, "en", "A")],
        "doc_id long, lang string, source string")
    base = spark.createDataFrame([(0,), (1,), (2,), (3,)], "doc_id long")
    return dims, base


def test_near_miss_counting(spark):
    dims, base = _rows(spark)
    out = drill_sideways(
        dims, base,
        {"lang": F.col("lang") == "en", "source": F.col("source") == "A"},
    ).collect()
    got = {(r["dim"], r["value"]): r["cnt"] for r in out}
    # lang facet: source='A' docs in base -> {0: en, 2: fr}
    assert got[("lang", "en")] == 1 and got[("lang", "fr")] == 1
    # source facet: lang='en' docs in base -> {0: A, 1: B}
    assert got[("source", "A")] == 1 and got[("source", "B")] == 1
    # doc 3 (misses both) and doc 9 (not in base) appear nowhere
    assert sum(got.values()) == 4


def test_non_drilled_dim_counts_full_hits(spark):
    dims, base = _rows(spark)
    dims = dims.withColumn(
        "size", F.when(F.col("doc_id") % 2 == 0, "big").otherwise("small"))
    out = drill_sideways(
        dims, base,
        {"lang": F.col("lang") == "en", "source": F.col("source") == "A"},
        facet_dims=["lang", "source", "size"],
    ).collect()
    got = {(r["dim"], r["value"]): r["cnt"] for r in out}
    # non-drilled dim: ALL drill-downs apply -> only doc 0 survives
    assert got[("size", "big")] == 1 and ("size", "small") not in got


def test_single_dim_degenerates_to_plain_facet(spark):
    dims, base = _rows(spark)
    out = drill_sideways(
        dims, base, {"lang": F.col("lang") == "en"},
    ).collect()
    got = {(r["dim"], r["value"]): r["cnt"] for r in out}
    # relaxing the only filter = facet over the raw base hits
    assert got[("lang", "en")] == 2 and got[("lang", "fr")] == 2


# ---------------------------------------------------------------------------
# Complement facet counting (facet/complements)
# ---------------------------------------------------------------------------

def test_complement_counts_equal_direct(spark):
    """The reference invariant: complement-path counts == direct
    counts (TestTotalFacetCounts); the 0.6 threshold / force /
    disable rules (StandardFacetsAccumulator.java:77-99,250-252)."""
    from lucene_solr_spark.facets import (
        DISABLE_COMPLEMENT,
        FORCE_COMPLEMENT,
        complement_facet_counts,
    )

    cats = spark.createDataFrame(
        [(d, c) for d in range(20)
         for c in (["even"] if d % 2 == 0 else ["odd"])
         + (["small"] if d < 5 else [])],
        "doc_id long, category string")
    hits = spark.createDataFrame(
        [(d,) for d in range(16)], "doc_id long")  # 16/20 = 0.8 > 0.6

    out, used = complement_facet_counts(cats, hits, 20, 16)
    assert used is True
    got = {r["category"]: r["count"] for r in out.collect()}
    assert got == {"even": 8, "odd": 8, "small": 5}

    # under the threshold: direct path
    small_hits = spark.createDataFrame(
        [(d,) for d in range(4)], "doc_id long")
    out2, used2 = complement_facet_counts(cats, small_hits, 20, 4)
    assert used2 is False
    got2 = {r["category"]: r["count"] for r in out2.collect()}
    assert got2 == {"even": 2, "odd": 2, "small": 4}

    # force / disable override the ratio
    _o3, used3 = complement_facet_counts(
        cats, small_hits, 20, 4, complement_threshold=FORCE_COMPLEMENT)
    assert used3 is True
    _o4, used4 = complement_facet_counts(
        cats, hits, 20, 16, complement_threshold=DISABLE_COMPLEMENT)
    assert used4 is False
    # zero-count categories drop (the counter array's untouched-0 rows)
    out5, _ = complement_facet_counts(
        cats, hits.filter("doc_id % 2 = 0"), 20, 8,
        complement_threshold=FORCE_COMPLEMENT)
    got5 = {r["category"]: r["count"] for r in out5.collect()}
    assert "odd" not in got5 and got5["even"] == 8
