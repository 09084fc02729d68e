"""Solr update-request processor chain (solr/core/src/java/org/apache/
solr/update/processor/): the index-time field-mutation pipeline
(UpdateRequestProcessorChain.java runs processors in declaration
order; FieldMutatingUpdateProcessor.java is the per-field base).

Each processor here is a DataFrame -> DataFrame transform over the
document batch; ``update_chain`` composes them in order. Multivalued
fields are array columns. Per-factory semantics (file names under
update/processor/):

  trim_fields           TrimFieldUpdateProcessorFactory (String.trim)
  truncate_fields       TruncateFieldUpdateProcessorFactory (maxLength
                        prefix; only CharSequence values)
  field_length          FieldLengthUpdateProcessorFactory (replace a
                        string value with its length)
  count_values          CountFieldValuesUpdateProcessorFactory
                        (replace the multivalue with its count)
  concat_values         ConcatFieldUpdateProcessorFactory (join the
                        multivalue with a delimiter, default ", ")
  uniq_values           UniqFieldsUpdateProcessorFactory (drop dup
                        values, FIRST occurrence order kept)
  remove_blank          RemoveBlankFieldUpdateProcessorFactory (drop
                        zero-length strings; a scalar field becomes
                        NULL, a multivalue loses the blank entries)
  default_value         DefaultValueUpdateProcessorFactory (fill a
                        missing/NULL field with a constant)
  clone_field           CloneFieldUpdateProcessorFactory (copy source
                        to dest before later mutations)
  regexp_boost          RegexpBoostProcessor.java (multiply the boost
                        field by ``boost`` when the input field matches
                        the pattern; boost column created at 1.0 when
                        absent)

100 TB plan: every processor is pure column math (trim/substr/array
ops in whole-stage codegen) — the chain fuses into one projection over
the ingest scan, no shuffle, no UDF.
"""

from __future__ import annotations

from typing import Callable, Iterable, List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "update_chain", "trim_fields", "truncate_fields", "field_length",
    "count_values", "concat_values", "uniq_values", "remove_blank",
    "default_value", "clone_field", "regexp_boost",
]

Processor = Callable[[DataFrame], DataFrame]


def update_chain(df: DataFrame, processors: Iterable[Processor]) -> DataFrame:
    for p in processors:
        df = p(df)
    return df


def trim_fields(*cols: str) -> Processor:
    def p(df):
        for c in cols:
            df = df.withColumn(c, F.trim(F.col(c)))
        return df
    return p


def truncate_fields(max_len: int, *cols: str) -> Processor:
    def p(df):
        for c in cols:
            df = df.withColumn(c, F.substring(F.col(c), 1, int(max_len)))
        return df
    return p


def field_length(src: str, dst: str = None) -> Processor:
    def p(df):
        return df.withColumn(dst or src, F.length(F.col(src)))
    return p


def count_values(src: str, dst: str = None) -> Processor:
    def p(df):
        return df.withColumn(dst or src, F.size(F.col(src)))
    return p


def concat_values(src: str, delimiter: str = ", ",
                  dst: str = None) -> Processor:
    def p(df):
        return df.withColumn(dst or src,
                             F.array_join(F.col(src), delimiter))
    return p


def uniq_values(src: str) -> Processor:
    # first-occurrence order (UniqFieldsUpdateProcessorFactory uses a
    # LinkedHashSet): left fold appending unseen values
    def p(df):
        return df.withColumn(src, F.expr(f"""
aggregate({src}, CAST(array() AS array<string>),
  (acc, x) -> IF(array_contains(acc, x), acc, array_append(acc, x)))
"""))
    return p


def remove_blank(*cols: str) -> Processor:
    def p(df):
        for c in cols:
            dt = dict(df.dtypes)[c]
            if dt.startswith("array"):
                df = df.withColumn(
                    c, F.filter(F.col(c), lambda x: F.length(x) != 0))
            else:
                df = df.withColumn(
                    c, F.when(F.length(F.col(c)) == 0,
                              F.lit(None)).otherwise(F.col(c)))
        return df
    return p


def default_value(col: str, value) -> Processor:
    def p(df):
        return df.withColumn(col, F.coalesce(F.col(col), F.lit(value)))
    return p


def clone_field(src: str, dst: str) -> Processor:
    def p(df):
        return df.withColumn(dst, F.col(src))
    return p


def regexp_boost(input_col: str, pattern: str, boost: float,
                 boost_col: str = "boost") -> Processor:
    def p(df):
        if boost_col not in df.columns:
            df = df.withColumn(boost_col, F.lit(1.0))
        return df.withColumn(
            boost_col,
            F.when(F.col(input_col).rlike(pattern),
                   F.col(boost_col) * F.lit(float(boost)))
            .otherwise(F.col(boost_col)))
    return p
