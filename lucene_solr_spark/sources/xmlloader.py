"""Solr XML update loader (solr/core/src/java/org/apache/solr/
handler/loader/XMLLoader.java): the classic ``/update`` XML command
surface re-expressed over a DataFrame of payload strings — one command
document per row.

Semantics mirrored (file:line = XMLLoader.java):

  - commands (:207-290 processUpdate): ``<add>`` (attrs ``overwrite``
    default true, ``commitWithin`` default -1, :224-241), ``<delete>``
    with any number of ``<id>`` / ``<query>`` children (:287-355),
    ``<commit/>`` / ``<optimize/>`` / ``<rollback/>``;
  - ``<doc boost="...">`` document boost (:366-377);
  - ``<field name=.. boost=.. null=.. update=..>text</field>``
    (:431-459): per-field boost (default 1.0, reset after every field
    :427-428), ``null="true"`` → null value, repeated names append in
    DOCUMENT ORDER (``addField``, :426 — unlike JsonLoader's reversed
    put-then-addValue merge) with boosts MULTIPLYING across
    occurrences (SolrInputField.addValue :86-105);
  - XML entity unescape on field text (the stream parser's CHARACTERS
    events arrive decoded, :389-394).

``update=`` atomic-update attributes route to the atomic surface
(``lucene_solr_spark.atomic``); this loader exposes the parsed
``update_op`` per field element for that handoff.

100 TB plan: one codegen projection per payload row — ``regexp_*`` +
higher-order array functions (filter/transform/aggregate), no UDF, no
shuffle; delete-id fan-out is a single ``explode``.
"""

from __future__ import annotations

from typing import Dict, Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["xml_update_loader", "unescape_xml"]

_FIELD_ELEM = r'<field\b[^>]*>[^<]*</field>'


def unescape_xml(c: Column) -> Column:
    """Decode the five predefined XML entities (amp last so ``&amp;lt;``
    round-trips like a stream parser's two-pass decode would not — the
    reference decodes once; order matters only for double-escapes,
    which the single-pass stream never produces)."""
    c = F.regexp_replace(c, "&lt;", "<")
    c = F.regexp_replace(c, "&gt;", ">")
    c = F.regexp_replace(c, "&quot;", '"')
    c = F.regexp_replace(c, "&apos;", "'")
    return F.regexp_replace(c, "&amp;", "&")


def _attr(e: Column, name: str) -> Column:
    got = F.regexp_extract(e, f'{name}="([^"]*)"', 1)
    return F.when(got == "", F.lit(None).cast("string")).otherwise(got)


def xml_update_loader(
    payloads: DataFrame,
    fields: Dict[str, str],
    payload_col: str = "payload",
    id_cols: Sequence[str] = (),
    multivalued: Iterable[str] = (),
) -> DataFrame:
    """Parse one XML update command per row into typed columns.

    ``fields`` maps field name -> Spark cast type. ``multivalued``
    fields collect repeated ``<field>`` occurrences in document order;
    scalars take the FIRST occurrence (addField on a fresh doc).
    Output: ``id_cols…, cmd, <field cols>, <field>_boost, doc_boost,
    overwrite, commit_within, delete_id (exploded), delete_query``.
    """
    multivalued = set(multivalued)
    p = F.col(payload_col)

    cmd = F.regexp_extract(
        p, r"^\s*<(add|delete|commit|optimize|rollback)\b", 1
    ).alias("cmd")

    add_tag = F.regexp_extract(p, r"(<add\b[^>]*>)", 1)
    doc_tag = F.regexp_extract(p, r"(<doc\b[^>]*>)", 1)
    add_meta = [
        F.coalesce(_attr(doc_tag, "boost").cast("float"),
                   F.lit(1.0).cast("float")).alias("doc_boost"),
        F.coalesce(_attr(add_tag, "overwrite").cast("boolean"),
                   F.lit(True)).alias("overwrite"),
        F.coalesce(_attr(add_tag, "commitWithin").cast("int"),
                   F.lit(-1)).alias("commit_within"),
    ]

    # every <field ...>text</field> element, document order, parsed to
    # a struct once and shared by all per-field projections
    elems = F.transform(
        F.regexp_extract_all(p, F.lit(f"({_FIELD_ELEM})"), F.lit(1)),
        lambda e: F.struct(
            F.regexp_extract(e, 'name="([^"]*)"', 1).alias("name"),
            F.coalesce(_attr(e, "boost").cast("float"),
                       F.lit(1.0).cast("float")).alias("boost"),
            (_attr(e, "null") == "true").alias("isnull"),
            _attr(e, "update").alias("update_op"),
            unescape_xml(F.regexp_extract(e, r">([^<]*)<", 1))
            .alias("text"),
        ),
    )

    field_cols = []
    for name, typ in fields.items():
        mine = F.filter(elems, lambda e: (e["name"] == F.lit(name))
                        & e["update_op"].isNull())
        vals = F.transform(
            mine, lambda e: F.when(e["isnull"], F.lit(None))
            .otherwise(e["text"]).cast(typ))
        if name in multivalued:
            field_cols.append(vals.alias(name))
        else:
            field_cols.append(F.try_element_at(vals, F.lit(1)).alias(name))
        # addValue accumulates the PRODUCT of all occurrence boosts
        field_cols.append(F.aggregate(
            mine, F.lit(1.0).cast("float"),
            lambda acc, e: acc * e["boost"]).alias(f"{name}_boost"))

    d_ids = F.regexp_extract_all(p, F.lit(r"<id>([^<]*)</id>"),
                                 F.lit(1))
    d_query = F.try_element_at(
        F.regexp_extract_all(p, F.lit(r"<query>([^<]*)</query>"),
                             F.lit(1)), F.lit(1))

    out = payloads.select(
        *[F.col(c) for c in id_cols], cmd, *field_cols, *add_meta,
        d_ids.alias("_delete_ids"),
        unescape_xml(d_query).alias("delete_query"))
    out = out.withColumn(
        "delete_id",
        F.explode_outer(
            F.when(F.size("_delete_ids") > 0, F.col("_delete_ids"))
            .otherwise(F.array(F.lit(None).cast("string"))))
    ).drop("_delete_ids")
    return out.withColumn("delete_id", unescape_xml(F.col("delete_id")))
