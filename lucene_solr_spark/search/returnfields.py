"""Solr return-field (``fl=``) compiler — SolrReturnFields
(solr/core/src/java/org/apache/solr/search/SolrReturnFields.java):
the response projection language. Supported per the reference parse
(parseFieldList/add :101-250):

  * ``*``                 all stored fields (wantsAllFields)
  * ``name``              a field (java-identifier-ish + ``.``/``-``)
  * ``alias:name``        RenameFieldTransformer; becomes a COPY when
                          the source was also requested bare (:118-131)
  * ``glob*``             field-name glob (getGlobbedId path)
  * ``score``             the score pseudo-field (ScoreAugmenter)
  * ``alias:func(...)``   function query / ``func(...)`` bare — the
                          FunctionQParser value source, keyed by the
                          alias or the source text (augmenters path)

  * ``[augmenter a=1 b=x]`` / ``key:[augmenter ...]`` — doc
    transformers (add :246-269: localParams grammar with ``[`` ``]``
    delimiters, ``[foo]`` short for type=foo, display name defaults
    to ``[name]``): the default TransformerFactory registry
    (response/transform/TransformerFactory.java:20-26 — explain,
    value, docid, shard) plus the QueryElevationComponent markers
    (ElevatedMarkerFactory / ExcludedMarkerFactory over
    BaseEditorialTransformer.java:49-60 — boolean membership of the
    uniqueKey in the elevated/excluded id set; no set => FALSE for
    every doc). ``[value]`` applies ValueAugmenterFactory
    .getObjectFrom type coercion (:45-59, int/double/float/date,
    parse failure throws); ``[explain]`` joins a per-doc explanation
    column (style nl/text/html validated per getStyle :54-63);
    ``[shard]`` is the request-context shard id.

Entries separate on commas and/or whitespace. Documented scope cut:
the fl='' legacy ``*,score`` rewrite.

Spark-first: the whole fl compiles to ONE select() — renames are
aliases, functions are Catalyst columns via funcparser, the projection
prunes the scan."""

from __future__ import annotations

import fnmatch
import re
from typing import Dict, Optional

from pyspark.sql import DataFrame, functions as F

_SIMPLE = re.compile(r"[A-Za-z_$][\w.\-$]*")


def _split_entries(fl: str):
    """Comma/whitespace-separated top-level entries; parens nest (a
    function argument list may contain commas and spaces)."""
    out, buf, depth = [], [], 0
    for ch in fl:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if depth == 0 and (ch == "," or ch.isspace()):
            if buf:
                out.append("".join(buf))
                buf = []
        else:
            buf.append(ch)
    if buf:
        out.append("".join(buf))
    return out


_EXPLAIN_STYLES = ("nl", "text", "html")


def _augmenter_column(name, args, df, score_col, context):
    """One registered transformer -> a Column (or ('join', df, col)
    for [explain]). Mirrors the default factory registry."""
    context = context or {}
    if name == "docid":
        # DocIdAugmenter (:36-55): the internal docID; emitted only
        # when docid >= 0 — doc_id is the engine's docID space
        return F.when(F.col("doc_id") >= 0, F.col("doc_id"))
    if name == "shard":
        # ShardAugmenterFactory: the request context's shard id
        return F.lit(context.get("shard", ""))
    if name == "value":
        v = args.get("v") or None
        if v is None:
            raise ValueError(
                "ValueAugmenter is missing a value -- should be "
                "defined in solrconfig or inline")
        t = args.get("t")
        try:
            if t == "int":
                return F.lit(int(v))
            if t == "double":
                return F.lit(float(v))
            if t == "float":
                return F.lit(float(v)).cast("float")
            if t == "date":
                import datetime as _dt

                return F.lit(_dt.datetime.strptime(
                    v, "%Y-%m-%dT%H:%M:%SZ"))
        except ValueError as ex:
            raise ValueError(f"Unable to parse {t}={v}") from ex
        return F.lit(v)
    if name == "explain":
        style = args.get("style", "nl")
        if style not in _EXPLAIN_STYLES:
            raise ValueError(f"Unknown Explain Style: {style}")
        exp = context.get("explain_df")
        if exp is None:
            raise ValueError(
                "[explain] needs an explain_df in augmenter_context "
                "(doc_id + explanation column)")
        col = [c for c in exp.columns if c != "doc_id"][0]
        return ("join", exp, col)
    if name in ("elevated", "excluded"):
        # BaseEditorialTransformer.transform (:49-60): membership of
        # the uniqueKey in the marked id set; empty/missing set =>
        # FALSE for every doc
        ids = context.get(f"{name}_ids") or []
        keycol = context.get("key_col", "doc_id")
        if not ids:
            return F.lit(False)
        return F.col(keycol).isin(list(ids))
    raise ValueError(f"unknown transformer: {name!r}")


def solr_return_fields(
    df: DataFrame,
    fl: Optional[str],
    score_col: str = "score",
    function_fields: Optional[Dict[str, F.Column]] = None,
    augmenter_context: Optional[dict] = None,
) -> DataFrame:
    """Project ``df`` (a hydrated result: stored fields + the score
    column) per the fl spec. Column order follows the fl entry order
    (globs expand in df column order)."""
    stored = [c for c in df.columns if c != score_col]
    if fl is None or not fl.strip():
        return df.select(*stored)  # wantsAllFields, no score

    entries = _split_entries(fl)
    bare_requested = {e for e in entries if _SIMPLE.fullmatch(e)}
    cols = []
    joins = []
    seen = set()

    def emit(col, name):
        if name not in seen:
            seen.add(name)
            cols.append(col.alias(name))

    for e in entries:
        if e == "*":
            for c in stored:
                emit(F.col(c), c)
            continue
        if e == "score":
            emit(F.col(score_col), "score")
            continue
        m = re.match(r"^([A-Za-z_$][\w.\-$]*):(.*)$", e)
        key, body = (m.group(1), m.group(2)) if m else (None, e)
        if body.startswith("[") and body.endswith("]"):
            # augmenter: [name a=1 ...] == localParams with [] (:246-257)
            from lucene_solr_spark.search.qparser_plugins import (
                parse_local_params,
            )

            lp, _rest = parse_local_params("{!" + body[1:-1] + "}")
            name = lp.pop("type")
            lp.pop("v", None) if name != "value" else None
            disp = key if key is not None else f"[{name}]"
            col = _augmenter_column(name, lp, df, score_col,
                                    augmenter_context)
            if isinstance(col, tuple):
                _tag, exp_df, exp_col = col
                joins.append((exp_df, exp_col, disp))
                if disp not in seen:
                    seen.add(disp)
                    cols.append(("__join__", disp))
            else:
                emit(col, disp)
            continue
        if _SIMPLE.fullmatch(body):
            # field or rename; rename keeps the source too when it was
            # ALSO requested bare (copy semantics, :118-131)
            emit(F.col(body), key or body)
            continue
        if "(" in body:
            from lucene_solr_spark.functions.funcparser import (
                parse_function_query,
            )

            fields = function_fields or {
                c: F.col(c) for c in df.columns}
            emit(parse_function_query(body, fields), key or body)
            continue
        if "*" in body or "?" in body:
            for c in stored:
                if fnmatch.fnmatchcase(c, body):
                    emit(F.col(c), c)
            continue
        raise ValueError(f"unparsable fl entry: {e!r}")

    # copy semantics already hold: a bare request of a renamed source
    # emitted it under its own name above
    del bare_requested
    if joins:
        # [explain]: one broadcast-able left join per explanation
        # source; every other augmenter stays in the single select
        for exp_df, exp_col, disp in joins:
            df = df.join(
                exp_df.select("doc_id",
                              F.col(exp_col).alias(f"__aug_{disp}")),
                "doc_id", "left")
        cols = [F.col(f"__aug_{c[1]}").alias(c[1])
                if isinstance(c, tuple) else c for c in cols]
    return df.select(*cols)
