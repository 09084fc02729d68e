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

Entries separate on commas and/or whitespace. Documented scope cuts:
``[transformer]`` doc-transformers other than score (e.g. ``[docid]``
— docID is a first-class column here anyway) and the fl='' legacy
``*,score`` rewrite.

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
        if ch == "(":
            depth += 1
        elif ch == ")":
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


def solr_return_fields(
    df: DataFrame,
    fl: Optional[str],
    score_col: str = "score",
    function_fields: Optional[Dict[str, F.Column]] = None,
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
    return df.select(*cols)
