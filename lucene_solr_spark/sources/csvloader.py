"""Solr CSV update loader (solr/core/src/java/org/apache/solr/handler/
loader/CSVLoaderBase.java; CSVLoader subclass reads the header line):
the CSV ingest surface re-expressed over a DataFrame of raw lines.

Semantics mirrored:

  - line parse: separator / encapsulator / escape (CSVStrategy defaults
    ',' '"' escape-DISABLED, :173-196) — delegated to Spark's native
    ``from_csv`` (the univocity parser plays commons-csv; both honor
    quote + escape chars), one codegen expression per line;
  - per-field adder chain applied **split -> trim -> map** (built in
    reverse at :256-286);
  - ``f.<field>.split=true``: the value re-splits into a multivalue on
    the field's own separator (:274-285; sub-value encapsulation is a
    documented scope cut — plain split here);
  - ``f.<field>.map=from:to``: EXACT value match replaced
    (FieldMapperSingle :260-268), applied per element on split fields;
  - ``f.<field>.trim=true``: String.trim (:270-272);
  - empty values are DROPPED unless ``f.<field>.empty=true``
    (FieldAdder vs FieldAdderEmpty :245-246,254): a scalar becomes
    NULL, a multivalue loses its empty entries;
  - ``skip``: listed fields are parsed but never added (:250-251);
  - ``literal.<name>=value``: constant column (:288-296).

100 TB: the whole loader is one projection over the line scan —
from_csv + array ops in whole-stage codegen, no UDF, no shuffle.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["csv_loader"]


def csv_loader(
    lines: DataFrame,
    fieldnames: Sequence[str],
    line_col: str = "line",
    id_cols: Sequence[str] = (),
    separator: str = ",",
    encapsulator: Optional[str] = '"',
    escape: Optional[str] = None,
    skip: Iterable[str] = (),
    trim: Iterable[str] = (),
    split: Iterable[str] = (),
    split_sep: Optional[Dict[str, str]] = None,
    maps: Optional[Dict[str, List[Tuple[str, str]]]] = None,
    keep_empty: Iterable[str] = (),
    literals: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """Parse ``lines[line_col]`` into per-field columns. ``id_cols``
    pass through untouched (the caller's rowid surface)."""
    skip = set(skip)
    trim = set(trim)
    split = set(split)
    keep_empty = set(keep_empty)
    split_sep = split_sep or {}
    maps = maps or {}

    if escape:
        # setting escape disables the encapsulator in the reference
        # (CSVLoaderBase:185-193), and commons-csv's escape works
        # ANYWHERE in the value (univocity's only inside quotes), so
        # the escape mode parses via a lookbehind split + unescape —
        # still pure codegen. Double-escape before a real separator is
        # the documented edge this regex does not resolve.
        import re as _re

        esc = _re.escape(escape)
        arr = F.split(F.col(line_col),
                      f"(?<!{esc}){_re.escape(separator)}")
        parsed = lines.select(
            *[F.col(c) for c in id_cols],
            F.struct(*[
                F.regexp_replace(F.element_at(arr, i + 1),
                                 esc + "(.)", "$1").alias(f)
                for i, f in enumerate(fieldnames)
            ]).alias("_r"),
        )
    else:
        schema = ", ".join(f"`{f}` string" for f in fieldnames)
        opts = {"sep": separator,
                "quote": encapsulator if encapsulator else chr(0),
                "escape": chr(0)}
        parsed = lines.select(
            *[F.col(c) for c in id_cols],
            F.from_csv(F.col(line_col), schema, opts).alias("_r"),
        )

    cols = [F.col(c) for c in id_cols]
    for f in fieldnames:
        if not f or f in skip:
            continue
        v = F.col(f"_r.{f}")
        # order: split -> trim -> map -> (empty-drop) add
        if f in split:
            sep = split_sep.get(f, ",")
            arr = F.split(v, "\\s+" if sep == " " else
                          "[" + sep.replace("]", "\\]") + "]")
            if f in trim:
                arr = F.transform(arr, lambda x: F.trim(x))
            def _mapper(frm, to):
                # single-arg lambda (extra defaulted params would make
                # Spark bind it as an (elem, idx) lambda)
                return lambda x: F.when(x == frm, F.lit(to)).otherwise(x)

            for frm, to in maps.get(f, []):
                arr = F.transform(arr, _mapper(frm, to))
            if f not in keep_empty:
                arr = F.filter(arr, lambda x: F.length(x) > 0)
            cols.append(arr.alias(f))
        else:
            if f in trim:
                v = F.trim(v)
            for frm, to in maps.get(f, []):
                v = F.when(v == frm, F.lit(to)).otherwise(v)
            if f not in keep_empty:
                v = F.when(F.length(v) == 0, F.lit(None)).otherwise(v)
            cols.append(v.alias(f))
    for name, value in (literals or {}).items():
        cols.append(F.lit(value).alias(name))
    return parsed.select(*cols)
