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


def parse_schema_xml(xml_text: str) -> "IndexSchema":
    """schema.xml -> IndexSchema (IndexSchema.readSchema :424-560,
    loadFields :624-700, loadCopyFields :560-600, registerCopyField
    :779-830). Rules kept:

    - /schema@name (missing -> warning-only, name None) and @version
      (default 1.0);
    - <field>/<dynamicField> under <fields>: name+type required,
      duplicate <field> names throw, dynamicField names must carry
      EXACTLY one asterisk at the start or end (isValidFieldGlob
      :718-725) else throw; required/default attrs tracked;
    - <copyField source dest maxChars>: unparsable maxChars copies
      the whole field (warn path), a copyField dest equal to the
      uniqueKey throws, a source/dest containing '*' that is not a
      valid glob throws;
    - <uniqueKey>: must resolve to a field; a default value on it
      throws, multiValued="true" on it throws;
    - <defaultSearchField>: must be a defined field else throw;
    - <solrQueryParser defaultOperator>, <similarity class> carried
      through as strings (the similarity name plugs the gated
      functions/similarity.py registry).

    FieldType definitions (<types>) are plugin instantiation in the
    reference; here the type NAME is the schema-level contract (the
    IndexSchema row's documented stance) and the listed type names
    are accepted as declared."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml_text)
    if root.tag != "schema":
        raise SchemaError("root element must be <schema>")
    name = root.get("name")
    version = float(root.get("version", "1.0"))
    declared_types = {t.get("name")
                     for t in root.iter()
                     if t.tag in ("fieldType", "fieldtype")}

    def _valid_glob(n: str) -> bool:
        return ((n.startswith("*") or n.endswith("*"))
                and n.count("*") == 1)

    fields: dict = {}
    dynamic: dict = {}
    meta: dict = {}
    for node in root.iter():
        if node.tag not in ("field", "dynamicField"):
            continue
        fname = node.get("name")
        ftype = node.get("type")
        if fname is None or ftype is None:
            raise SchemaError("field definition needs name and type")
        if declared_types and ftype not in declared_types:
            raise SchemaError(
                f"Unknown fieldType '{ftype}' specified on field "
                f"{fname}")
        args = {k: v for k, v in node.attrib.items()
                if k not in ("name", "type")}
        if node.tag == "field":
            if fname in fields:
                raise SchemaError(
                    f"[schema.xml] Duplicate field definition for "
                    f"'{fname}'")
            fields[fname] = ftype
            meta[fname] = args
        else:
            if not _valid_glob(fname):
                raise SchemaError(
                    f"Dynamic field name '{fname}' should have either "
                    "a leading or a trailing asterisk, and no others.")
            if fname in dynamic:
                raise SchemaError(
                    f"[schema.xml] Duplicate DynamicField definition "
                    f"for '{fname}'")
            dynamic[fname] = ftype
            meta[fname] = args

    uk_el = root.find("uniqueKey")
    unique_key = uk_el.text.strip() if uk_el is not None else None
    if unique_key is not None:
        if unique_key not in fields:
            raise SchemaError(f"unknown field '{unique_key}'")
        uk_meta = meta.get(unique_key, {})
        if uk_meta.get("default") is not None:
            raise SchemaError(
                f"uniqueKey field ({unique_key}) can not be "
                "configured with a default value")
        if uk_meta.get("multiValued", "").lower() == "true":
            raise SchemaError(
                f"uniqueKey field ({unique_key}) can not be "
                "configured to be multivalued")

    copy_rules = []
    for cf in root.iter("copyField"):
        src, dst = cf.get("source"), cf.get("dest")
        if src is None or dst is None:
            raise SchemaError("copyField definition needs source/dest")
        mc = cf.get("maxChars")
        try:
            max_chars = int(mc) if mc is not None else 0
        except ValueError:
            # warn path: the whole field will be copied
            max_chars = 0
        for label, v in (("source", src), ("dest", dst)):
            if "*" in v and not _valid_glob(v):
                raise SchemaError(
                    f"copyField {label} :'{v}' is an invalid glob: "
                    "either it contains more than one asterisk, or "
                    "the asterisk occurs neither at the start nor at "
                    "the end.")
        if unique_key is not None and dst == unique_key:
            raise SchemaError(
                f"uniqueKey field ({unique_key}) can not be the dest "
                f"of a copyField (source={src})")
        copy_rules.append((src, dst, max_chars))

    schema = IndexSchema(fields, dynamic, copy_rules,
                         unique_key=unique_key)
    schema.name = name
    schema.version = version
    schema.field_meta = meta
    dsf = root.find("defaultSearchField")
    schema.default_search_field = (dsf.text.strip()
                                   if dsf is not None else None)
    if (schema.default_search_field is not None
            and schema.default_search_field not in fields):
        raise SchemaError(
            f"default search field '{schema.default_search_field}' "
            "not defined or not indexed")
    qp = root.find("solrQueryParser")
    schema.default_operator = (qp.get("defaultOperator")
                               if qp is not None else None)
    sim = root.find("similarity")
    schema.similarity_class = (sim.get("class")
                               if sim is not None else None)
    return schema
