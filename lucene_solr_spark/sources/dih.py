"""DataImportHandler re-expression (solr/contrib/dataimporthandler/
src/java/org/apache/solr/handler/dataimport/: DataImporter.java,
DocBuilder.java, EntityProcessor hierarchy, RegexTransformer.java,
TemplateTransformer.java, DateFormatTransformer.java).

Reference model: a data-config declares a tree of ENTITIES (root
entity = one Solr document per row; child entities = per-parent
sub-queries whose columns become multivalued fields), each with FIELD
mappings run through a transformer chain. full-import rebuilds
everything; delta-import selects rows changed since last_index_time.

Spark shape — the whole config compiles to ONE declarative DataFrame
plan, no per-row driver loop (the reference's DocBuilder iterates
JDBC cursors row-by-row; here every entity is a scan and every child
entity is a join):
- root entity       -> spark.read.<format>(path) [+ delta filter]
- child entity      -> groupBy(join key).agg(sorted collect_list)
                       then LEFT JOIN to the parent (DIH emits
                       multivalued fields; sort order is this port's
                       documented determinism addition — DocBuilder
                       preserves cursor order, which a distributed
                       shuffle cannot)
- RegexTransformer  -> regexp_extract (regex=) / regexp_replace
                       (regex= + replaceWith=) / split (splitBy=)
- TemplateTransformer -> concat of literals and ${entity.column} refs
- DateFormatTransformer -> date_format / to_timestamp
At 100 TB the child join is a plain shuffle hash join on the fk (or a
broadcast when the dimension side is small); delta-import becomes a
partition-pruned predicate when the table is date-partitioned.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_TEMPLATE_VAR = re.compile(r"\$\{([^}]+)\}")


@dataclass
class DIHField:
    """One <field .../> mapping. column = target name; src = source
    column (sourceColName, defaults to column); exactly one transform
    attribute may be set, mirroring RegexTransformer.process's
    splitBy > replaceWith > groupNames/extract precedence
    (RegexTransformer.java:118-128)."""
    column: str
    src: Optional[str] = None
    template: Optional[str] = None
    regex: Optional[str] = None
    replace_with: Optional[str] = None
    split_by: Optional[str] = None
    date_format: Optional[str] = None
    cast: Optional[str] = None

    def compile(self) -> Column:
        src = self.src or self.column
        if self.template is not None:
            parts: List[Column] = []
            pos = 0
            for m in _TEMPLATE_VAR.finditer(self.template):
                if m.start() > pos:
                    parts.append(F.lit(self.template[pos:m.start()]))
                ref = m.group(1).split(".")[-1]  # ${entity.col} -> col
                parts.append(F.col(ref).cast("string"))
                pos = m.end()
            if pos < len(self.template):
                parts.append(F.lit(self.template[pos:]))
            out: Column = F.concat(*parts) if parts else F.lit("")
        elif self.split_by is not None:
            out = F.split(F.col(src), self.split_by)
        elif self.replace_with is not None:
            # m.find() ? m.replaceAll : null (RegexTransformer:125)
            out = F.when(
                F.col(src).rlike(self.regex),
                F.regexp_replace(F.col(src), self.regex,
                                 self.replace_with))
        elif self.regex is not None:
            # single-group extraction (readfromRegExp, 1 group case)
            ex = F.regexp_extract(F.col(src), self.regex, 1)
            out = F.when(ex != "", ex)  # no match -> null, not ''
        elif self.date_format is not None:
            out = F.date_format(F.col(src), self.date_format)
        else:
            out = F.col(src)
        if self.cast:
            out = out.cast(self.cast)
        return out.alias(self.column)


@dataclass
class ChildEntity:
    """A sub-entity: per-parent rows folded into multivalued columns.
    value_field becomes array<string> sorted for determinism;
    aggregates (count) mirror the common rollup usage."""
    name: str
    path: str
    parent_key: str
    child_key: str
    value_field: DIHField = None  # type: ignore[assignment]
    fmt: str = "parquet"


@dataclass
class RootEntity:
    name: str
    path: str
    pk: str
    fields: List[DIHField] = dc_field(default_factory=list)
    children: List[ChildEntity] = dc_field(default_factory=list)
    delta_column: Optional[str] = None
    fmt: str = "parquet"


def _read(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    return spark.read.format(fmt).load(path)


def full_import(spark: SparkSession, root: RootEntity,
                last_index_time=None) -> DataFrame:
    """Compile the entity tree to a DataFrame. With last_index_time
    set and a delta_column declared, only changed rows import
    (delta-import semantics, DocBuilder.collectDelta — expressed as a
    plain pushdown predicate instead of a pk round-trip)."""
    df = _read(spark, root.path, root.fmt)
    if last_index_time is not None and root.delta_column:
        df = df.filter(F.col(root.delta_column) > F.lit(last_index_time))
    cols = [f.compile() for f in root.fields]
    out = df.select(F.col(root.pk), *cols)
    for ch in root.children:
        child = _read(spark, ch.path, ch.fmt)
        vf = ch.value_field
        agg = (
            child.select(F.col(ch.child_key).alias("__k"),
                         vf.compile())
            .groupBy("__k")
            .agg(
                F.sort_array(F.collect_list(vf.column))
                 .alias(vf.column),
                F.count(F.lit(1)).alias(f"{ch.name}_count"),
            )
        )
        out = out.join(agg, out[root.pk] == agg["__k"], "left") \
                 .drop("__k")
        out = out.withColumn(
            f"{ch.name}_count",
            F.coalesce(F.col(f"{ch.name}_count"), F.lit(0)))
    return out
