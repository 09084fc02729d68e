"""Driver contract for the spark-graft builder (PySpark target).

entry / queries / oracle_sql delegate to
``lucene_solr_spark.driver_entry`` — the adapter that maps the driver's
``documents``/``embeddings`` testdata onto the engine's corpus shape,
builds a cached index (segment build -> salted merge -> snapshot
commit), and pairs every engine query with a bit-exact DuckDB oracle
(float32 BM25 math incl. SmallFloat norm quantization re-derived in
SQL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lucene_solr_spark import driver_entry as _de


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _de.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_de.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_de.ORACLES)
