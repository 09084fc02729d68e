"""Solr IndexSchema surface: declared fields, dynamic-field patterns,
and copyField rules (solr/core/src/java/org/apache/solr/schema/
IndexSchema.java; CopyField.java).

Semantics mirrored:

  - dynamic patterns are one-glob: ``*x`` endsWith, ``x*`` startsWith,
    else exact (IndexSchema.DynamicPattern.createPattern :935-939);
    resolution tries the declared field first, then dynamic patterns
    sorted LONGEST regex first (DynamicReplacement.compareTo :989-991);
    unresolvable names raise, like schema.getField's SolrException;
  - copyField appends the (length-limited) source value to the
    destination field's value list, in rule-registration order, after
    any value the document itself supplied for the destination
    (registerCopyField :766+; CopyField.getLimitedValue: maxChars 0 =
    unlimited, else substring :57-60);
  - glob-to-glob copy rules substitute the matched remainder into the
    destination pattern (DynamicCopy.getTargetFieldName via
    DynamicPattern.subst :949).

Spark shape: the whole schema application is one projection —
destination fields become array<string> columns (Lucene multivalued
fields ARE ordered value lists; an indexed text destination is the
space-join of that list, which is how the per-field index builder
consumes it). No UDF, no shuffle.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["IndexSchema", "SchemaError"]


class SchemaError(ValueError):
    """schema.getField's 'undefined field' SolrException analogue."""


class _Pattern:
    def __init__(self, regex: str):
        self.regex = regex
        if regex.startswith("*"):
            self.kind, self.fixed = "ends", regex[1:]
        elif regex.endswith("*"):
            self.kind, self.fixed = "starts", regex[:-1]
        else:
            self.kind, self.fixed = "eq", regex

    def matches(self, name: str) -> bool:
        if self.kind == "ends":
            return name.endswith(self.fixed)
        if self.kind == "starts":
            return name.startswith(self.fixed)
        return name == self.fixed

    def remainder(self, name: str) -> str:
        if self.kind == "ends":
            return name[: len(name) - len(self.fixed)]
        if self.kind == "starts":
            return name[len(self.fixed):]
        return ""

    def subst(self, replacement: str) -> str:
        if self.kind == "ends":
            return replacement + self.fixed
        if self.kind == "starts":
            return self.fixed + replacement
        return self.fixed


class IndexSchema:
    """``fields``: name -> type name. ``dynamic_fields``: pattern ->
    type name. ``copy_fields``: (source, dest[, maxChars]) tuples;
    source and dest may be dynamic patterns."""

    def __init__(
        self,
        fields: Dict[str, str],
        dynamic_fields: Optional[Dict[str, str]] = None,
        copy_fields: Sequence[Tuple] = (),
        unique_key: Optional[str] = None,
    ):
        self.fields = dict(fields)
        dyn = list((dynamic_fields or {}).items())
        # longest regex first (DynamicReplacement.compareTo)
        dyn.sort(key=lambda kv: -len(kv[0]))
        self.dynamic = [(_Pattern(p), t) for p, t in dyn]
        self.copy_fields: List[Tuple[str, str, int]] = []
        for rule in copy_fields:
            src, dst = rule[0], rule[1]
            max_chars = int(rule[2]) if len(rule) > 2 else 0
            if max_chars < 0:
                raise SchemaError("maxChars can't be negative")
            self.copy_fields.append((src, dst, max_chars))
        self.unique_key = unique_key
        if unique_key is not None:
            self.field_type(unique_key)

    def field_type(self, name: str) -> str:
        """getField: declared name, else longest-first dynamic match,
        else SchemaError (IndexSchema.getField throws)."""
        if name in self.fields:
            return self.fields[name]
        for pat, t in self.dynamic:
            if pat.matches(name):
                return t
        raise SchemaError(f"undefined field: {name!r}")

    def has_field(self, name: str) -> bool:
        try:
            self.field_type(name)
            return True
        except SchemaError:
            return False

    def _limited(self, col, max_chars: int):
        # CopyField.getLimitedValue: maxChars 0 = unlimited
        return col if max_chars == 0 else F.substring(col, 1, max_chars)

    def apply_copy_fields(self, df: DataFrame) -> DataFrame:
        """One projection adding every copy destination as an
        array<string> column: the document's own destination value
        first (when the column exists), then copies in rule order.
        NULL sources contribute nothing (an absent doc field)."""
        dests: Dict[str, list] = {}
        for src, dst, mc in self.copy_fields:
            src_pat = _Pattern(src)
            src_cols = ([src] if src_pat.kind == "eq"
                        else [c for c in df.columns
                              if src_pat.matches(c)])
            dst_pat = _Pattern(dst)
            for sc in src_cols:
                if sc not in df.columns:
                    continue
                if dst_pat.kind == "eq":
                    target = dst
                else:
                    target = dst_pat.subst(src_pat.remainder(sc))
                if not self.has_field(target):
                    raise SchemaError(
                        f"copyField destination {target!r} is not in "
                        "the schema")
                dests.setdefault(target, []).append(
                    self._limited(F.col(sc).cast("string"), mc))
        out = df
        for target, copies in dests.items():
            parts = []
            if target in df.columns:
                parts.append(F.col(target).cast("string"))
            parts.extend(copies)
            arr = F.array_compact(F.array(*parts))
            out = out.withColumn(target, arr)
        return out
