"""Solr JSON update loader (solr/core/src/java/org/apache/solr/
handler/loader/JsonLoader.java): the ``/update/json`` command surface
re-expressed over a DataFrame of payload strings — one update command
per row (the reference streams a sequence of events off one request
body; a DataFrame row is the distributed unit of that stream).

Semantics mirrored (file:line = JsonLoader.java):

  - command dispatch (:109-177): ``{"add": {...}}``, ``{"delete":
    ...}``, ``{"commit": {...}}``, ``{"optimize": {...}}``,
    ``{"rollback": {}}``; a bare ``{...}`` object is an add doc (the
    ``handleAdds`` array-element shape, :380-394);
  - add options (:316-378 parseAdd): ``doc``, ``boost`` (default 1.0),
    ``overwrite`` (default true), ``commitWithin`` (default -1);
  - extended field values (:451-500): ``{"boost": b, "value": v}``
    sets the field boost; plain scalars get boost 1.0 (:447);
  - array field values (:517-550) → multivalued, order preserved;
  - REPEATED doc keys (:413-426 parseDoc + SolrInputField.addValue):
    ``{"tag":"a","tag":"b","tag":"c"}`` merges to the multivalue
    ``[c,b,a]`` — each later occurrence is put() first and the
    displaced earlier value appended after it, so occurrence order is
    REVERSED and flattened (boosts multiply, addValue :86-105);
  - delete forms (:181-198): ``"id"`` string, ``["id1","id2"]``
    array, ``{"id": x}`` map, ``{"query": q}`` map (:242-293);
    numeric/boolean ids stringify via getString (:201-218).

100 TB plan: every shape compiles to one codegen projection over the
payload scan — ``get_json_object`` / ``from_json`` / ``regexp_*`` are
all JVM expressions; no UDF, no shuffle, no driver parsing. Delete
fan-out (the only row-multiplying form) is a single ``explode``.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["json_update_loader", "json_delete_commands"]

_CMDS = ("add", "delete", "commit", "optimize", "rollback")


def _doc_json(payload: Column) -> Column:
    """The doc object for an add-shaped payload: ``$.add.doc`` when
    wrapped (parseAdd :337-359), else the bare object itself
    (handleAdds element, :380-394)."""
    wrapped = F.get_json_object(payload, "$.add.doc")
    return F.coalesce(wrapped, payload)


def json_update_loader(
    payloads: DataFrame,
    fields: Dict[str, str],
    payload_col: str = "payload",
    id_cols: Sequence[str] = (),
    multivalued: Iterable[str] = (),
    repeated_keys: Iterable[str] = (),
) -> DataFrame:
    """Parse one JSON update command per row into typed columns.

    ``fields`` maps field name -> Spark cast type for add docs.
    ``multivalued`` fields parse JSON arrays to ``array<type>``.
    ``repeated_keys`` fields apply the parseDoc repeated-key merge
    (reversed occurrence order, :413-426).

    Output: ``id_cols…, cmd, <field cols>, <field>_boost for extended
    fields, doc_boost, overwrite, commit_within, delete_id,
    delete_query`` — delete array payloads explode to one row per id.
    """
    multivalued = set(multivalued)
    repeated_keys = set(repeated_keys)
    p = F.col(payload_col)

    is_cmd = {c: F.get_json_object(p, f"$.{c}").isNotNull()
              for c in _CMDS}
    cmd = (
        F.when(is_cmd["add"], F.lit("add"))
        .when(is_cmd["delete"], F.lit("delete"))
        .when(is_cmd["commit"], F.lit("commit"))
        .when(is_cmd["optimize"], F.lit("optimize"))
        .when(is_cmd["rollback"], F.lit("rollback"))
        .otherwise(F.lit("add"))  # bare doc object (:116-118)
        .alias("cmd")
    )

    doc = _doc_json(p)
    field_cols = []
    for name, typ in fields.items():
        if name in repeated_keys:
            # parseDoc repeated-key quirk: extract every occurrence
            # of "name":<scalar> in source order, then REVERSE —
            # put()-then-addValue(prev) makes the newest value lead.
            pat = (r'\"%s\"\s*:\s*(\"[^\"]*\"|[-0-9.truefalsnu]+)'
                   % name)
            occ = F.regexp_extract_all(p, F.lit(pat), F.lit(1))
            # strip quotes off string occurrences, newest first
            vals = F.reverse(F.transform(
                occ, lambda v: F.regexp_replace(v, '^"|"$', "")))
            field_cols.append(vals.cast(f"array<{typ}>").alias(name))
            continue
        raw = F.get_json_object(doc, f"$.{name}")
        ext_val = F.get_json_object(doc, f"$.{name}.value")
        ext_boost = F.get_json_object(doc, f"$.{name}.boost")
        val = F.coalesce(ext_val, raw)
        if name in multivalued:
            field_cols.append(
                F.from_json(val, f"array<{typ}>").alias(name))
        else:
            field_cols.append(val.cast(typ).alias(name))
        field_cols.append(
            F.coalesce(ext_boost.cast("float"), F.lit(1.0).cast("float"))
            .alias(f"{name}_boost"))

    add_meta = [
        F.coalesce(F.get_json_object(p, "$.add.boost").cast("float"),
                   F.lit(1.0).cast("float")).alias("doc_boost"),
        F.coalesce(F.get_json_object(p, "$.add.overwrite")
                   .cast("boolean"), F.lit(True)).alias("overwrite"),
        F.coalesce(F.get_json_object(p, "$.add.commitWithin")
                   .cast("int"), F.lit(-1)).alias("commit_within"),
    ]

    # delete forms: string | array | {"id":..} | {"query":..}
    draw = F.get_json_object(p, "$.delete")
    d_id_map = F.get_json_object(p, "$.delete.id")
    d_query = F.get_json_object(p, "$.delete.query")
    is_arr = draw.startswith("[")
    is_obj = draw.startswith("{")
    # array → one row per id (handleDeleteArray :233-240); scalar and
    # map stay single-row. getString stringifies numerics/booleans.
    d_ids = (
        F.when(is_arr, F.from_json(draw, "array<string>"))
        .when(is_obj & d_id_map.isNotNull(), F.array(d_id_map))
        .when(is_obj, F.array().cast("array<string>"))
        .when(draw.isNotNull(), F.array(draw))
        .otherwise(F.array().cast("array<string>"))
    )

    out = payloads.select(
        *[F.col(c) for c in id_cols], cmd, *field_cols, *add_meta,
        d_ids.alias("_delete_ids"), d_query.alias("delete_query"))
    out = out.withColumn(
        "delete_id",
        F.explode_outer(F.when(F.size("_delete_ids") > 0,
                               F.col("_delete_ids"))
                        .otherwise(F.array(F.lit(None).cast("string"))))
    ).drop("_delete_ids")
    return out


def json_delete_commands(loaded: DataFrame) -> DataFrame:
    """Just the delete commands (id-form rows exploded)."""
    return loaded.where(F.col("cmd") == "delete")
