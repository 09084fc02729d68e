"""ExternalFileField / FileFloatSource re-expression (solr/core/.../
schema/ExternalFileField.java + search/function/FileFloatSource.java
:242-314): a sidecar text file of ``key<delim>floatval`` lines supplies
a per-document float usable as a sort key or boost, keyed by a document
field, reloadable without reindexing.

Reference parse rules kept exactly (FileFloatSource.getFloats):
- split on the LAST delimiter occurrence (line.lastIndexOf, :281);
  lines without the delimiter are skipped,
- unparseable floats skip the line, leaving the default (:288-298),
- later lines OVERRIDE earlier ones for the same key (sequential
  vals[doc]=fval, :310-312),
- keys absent from the corpus are ignored; docs absent from the file
  take ``def_val`` (:242-243).

Spark shape: the sidecar is tiny relative to the corpus (the reference
materializes it as one float[maxDoc] per core in RAM), so it parses on
the driver and applies as a BROADCAST join against the key field — no
shuffle of the 100 TB side.  Java Float.parseFloat trailing 'f'/'d'
suffixes are a documented non-goal (plain decimal/scientific forms
only)."""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_external_file(path: str, delimiter: str = "=") -> Dict[str, float]:
    """Driver-side parse, reference rule for reference rule."""
    vals: Dict[str, float] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            delim_index = line.rfind(delimiter)
            if delim_index < 0:
                continue
            key = line[:delim_index]
            raw = line[delim_index + 1:]
            try:
                fval = float(raw)
            except ValueError:
                continue  # leave value as default (:297)
            vals[key] = fval  # last occurrence wins (:310)
    return vals


def file_float_source(spark: SparkSession, path: str, key_field: str,
                      def_val: float = 0.0,
                      delimiter: str = "=",
                      out_col: str = "eff_value"):
    """Returns (keyed_df, apply) where keyed_df is the parsed sidecar
    as a 2-column DataFrame and apply(df) left-broadcast-joins it onto
    ``df[key_field]``, filling ``def_val`` for absent keys."""
    vals = parse_external_file(path, delimiter)
    keyed = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(vals.items())],
        f"{key_field} string, {out_col} float")

    def apply(df: DataFrame) -> DataFrame:
        return (df.join(F.broadcast(keyed), key_field, "left")
                  .withColumn(out_col,
                              F.coalesce(F.col(out_col),
                                         F.lit(float(def_val))
                                         .cast("float"))))

    return keyed, apply
