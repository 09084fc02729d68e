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
