"""Solr QParser plugin registry + local-params syntax — the
``{!type param=val ...}value`` request surface that fronts every Solr
query (solr/core/src/java/org/apache/solr/search/QParserPlugin.java
standardPlugins :28-47; QParser.getParser :81-126;
QueryParsing.parseLocalParams :103-171).

``parse_local_params`` is a faithful port of the grammar:

  - ``{!`` opens, ``}`` closes; inside, ``id=val`` pairs;
  - a bare word is shorthand for ``type=<word>`` (``{!func}...``);
  - values: unquoted (ends at whitespace/``}``, no escapes), or
    single-/double-quoted via StrParser.getQuotedString (backslash
    escapes);
  - ``=$name`` dereferences the request-params map AFTER reading the
    value (QueryParsing.java:139-157);
  - ``v`` inside the braces overrides the remainder-of-string value
    (QParser.getParser:94-103).

``solr_query`` then dispatches to the engine kernel matching the
reference plugin:

  lucene        LuceneQParserPlugin -> classic parse + boolean kernels
                (mm local param = minShouldMatch)
  term / raw    Term/RawQParserPlugin -> UN-analyzed exact term; on the
                content field a scored TermQuery, on a metadata field
                a constant-score docs-table equality (metadata fields
                are docvalue columns here — StringField parity note in
                the dispatch docstring)
  field         FieldQParserPlugin -> value analyzed by the index
                chain; one token = TermQuery, several = PhraseQuery
                (FieldQParserPlugin.java:40-46)
  prefix        PrefixQParserPlugin -> constant-score prefix doc set
  frange        FunctionRangeQParserPlugin -> ValueSourceRangeFilter
                over a parsed function query (l/u/incl/incu params)
  join          JoinQParserPlugin -> JoinUtil from/to semi-join
  boost         BoostQParserPlugin -> sub-query scores * b=<func>
  surround      SurroundQParserPlugin -> span distance grammar
  query         NestedQParserPlugin -> re-dispatch the resolved value
                (typically ``v=$param``)
  switch        SwitchQParserPlugin -> case/case.<val>/default param
                selection, then re-dispatch the chosen string
  maxscore      MaxScoreQParserPlugin -> SHOULD clauses fold by max
                (+ tie * rest) instead of sum (MaxScoreQParser.java:
                55-84); required clauses would pass through as normal
                boolean clauses — this engine supports the pure-SHOULD
                (+ prohibited) shape and raises on MUST, documented

dismax/edismax dispatch through MultiFieldSearcher.edismax when a
multifield searcher is supplied (DisMax/ExtendedDismaxQParserPlugin);
geofilt/bbox have dedicated modules (search/spatial_bbox.py,
geodist in driver_entry) and are not routed here.

100 TB: the dispatcher is driver-side string work; every branch lands
in an already-gated distributed kernel.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.search.queryparser import (
    Clause, QueryParseError, parse_query)

__all__ = ["parse_local_params", "get_parser", "solr_query"]

LOCALPARAM_START = "{!"
LOCALPARAM_END = "}"
DEFAULT_QTYPE = "lucene"


def _get_quoted(txt: str, pos: int) -> Tuple[str, int]:
    """StrParser.getQuotedString (QueryParsing.java:391-442 subset):
    matching ' or " delimiter, backslash escapes pass the next char
    through (plus the standard \\n \\t \\r \\b \\f)."""
    delim = txt[pos]
    pos += 1
    out = []
    esc = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f"}
    while pos < len(txt):
        ch = txt[pos]
        if ch == delim:
            return "".join(out), pos + 1
        if ch == "\\":
            pos += 1
            if pos >= len(txt):
                break
            nxt = txt[pos]
            out.append(esc.get(nxt, nxt))
            pos += 1
            continue
        out.append(ch)
        pos += 1
    raise QueryParseError(f"unterminated quoted string in {txt!r}")


def parse_local_params(
    txt: str, params: Optional[dict] = None,
) -> Tuple[Optional[Dict[str, str]], str]:
    """Parse a leading ``{!...}`` block. Returns (localParams, rest);
    (None, txt) when the string does not start with ``{!``
    (QueryParsing.getLocalParams :204-212). The returned dict always
    carries ``type`` (default 'lucene') and ``v`` (explicit v= wins
    over the remainder, QParser.getParser:94-103)."""
    if txt is None or not txt.startswith(LOCALPARAM_START):
        return None, txt
    pos = len(LOCALPARAM_START)
    target: Dict[str, str] = {}
    n = len(txt)
    while True:
        while pos < n and txt[pos].isspace():
            pos += 1
        if pos >= n:
            raise QueryParseError(
                f"Missing '}}' parsing local params {txt!r}")
        if txt[pos] == LOCALPARAM_END:
            pos += 1
            break
        # getId: java identifier-ish run (letters/digits/._-$ subset
        # used by Solr param names)
        start_id = pos
        while pos < n and (txt[pos].isalnum() or txt[pos] in "._-"):
            pos += 1
        ident = txt[start_id:pos]
        if not ident:
            raise QueryParseError(
                f"Expected ending character '{LOCALPARAM_END}' "
                f"parsing local params {txt!r}")
        if pos < n and txt[pos] == "=":
            pos += 1
            deref = False
            if pos < n and txt[pos] == "$":
                pos += 1
                deref = True
            if pos < n and txt[pos] in "\"'":
                val, pos = _get_quoted(txt, pos)
            else:
                vstart = pos
                while pos < n and txt[pos] != LOCALPARAM_END \
                        and not txt[pos].isspace():
                    pos += 1
                if pos >= n:
                    raise QueryParseError(
                        f"Missing end to unquoted value starting at "
                        f"{vstart} str={txt!r}")
                val = txt[vstart:pos]
            if deref:
                val = (params or {}).get(val)
        else:
            # bare word => {!func} === {!type=func}
            val, ident = ident, "type"
        target[ident] = val
    rest = txt[pos:]
    if target.get("v") is None:
        target["v"] = rest
        rest = ""
    target.setdefault("type", DEFAULT_QTYPE)
    return target, rest


def get_parser(
    qstr: str, params: Optional[dict] = None,
    default_type: str = DEFAULT_QTYPE,
) -> Tuple[str, Dict[str, str], str]:
    """QParser.getParser resolution: returns (type, localParams,
    value). Without local params the whole string is the value."""
    local, _rest = parse_local_params(qstr, params)
    if local is None:
        return default_type, {}, qstr
    return local.get("type") or default_type, local, local.get("v") or ""


def _content_field(lp: dict) -> bool:
    f = lp.get("f")
    return f is None or f in ("content", "text")


def solr_query(
    searcher,
    qstr: str,
    params: Optional[dict] = None,
    k: Optional[int] = 10,
    default_type: str = DEFAULT_QTYPE,
    multifield=None,
    plugins: Optional[Dict[str, Callable]] = None,
) -> DataFrame:
    """Dispatch a Solr q/fq string through the plugin registry. Scored
    parsers return (doc_id, score); filter parsers (prefix, frange,
    term/raw on metadata fields, join) return constant-score doc sets
    (doc_id only) — the fq shape."""
    ptype, lp, v = get_parser(qstr, params, default_type)
    if plugins and ptype in plugins:
        return plugins[ptype](searcher, v, lp, params or {}, k)

    if ptype == "lucene":
        ast = parse_query(v, analyzer=searcher.analyzer)
        return searcher.search_clauses(
            ast, k=k, min_should_match=int(lp.get("mm", 0) or 0))

    if ptype in ("term", "raw"):
        # TermQParserPlugin.java:44-49 (readableToIndexed, no
        # analysis) / RawQParserPlugin.java:40-43 (verbatim bytes) —
        # identical here: schemaless strings need no type conversion
        if _content_field(lp):
            c = Clause(occur="should", kind="term", text=v, terms=[v])
            return searcher.search_clauses([c], k=k)
        col = lp["f"]
        return searcher._live(
            searcher._docs.filter(F.col(col) == v).select("doc_id")
        ).orderBy("doc_id")

    if ptype == "field":
        # FieldQParserPlugin.java:40-46: analyze; phrase when several
        # tokens survive
        toks = searcher.analyzer.analyze(v)
        if not _content_field(lp):
            col = lp["f"]
            return searcher._live(
                searcher._docs.filter(F.col(col) == v).select("doc_id")
            ).orderBy("doc_id")
        if len(toks) <= 1:
            text = toks[0] if toks else v
            c = Clause(occur="should", kind="term", text=text,
                       terms=list(toks))
            return searcher.search_clauses([c], k=k)
        return searcher.search_phrase(v, k=k)

    if ptype == "prefix":
        # PrefixQParserPlugin.java:38-42 -> PrefixQuery
        # (CONSTANT_SCORE rewrite): doc set
        if _content_field(lp):
            return (searcher.match_docs(F.col("term").startswith(v))
                    .orderBy("doc_id"))
        col = lp["f"]
        return searcher._live(
            searcher._docs.filter(F.col(col).startswith(v))
            .select("doc_id")
        ).orderBy("doc_id")

    if ptype == "frange":
        from lucene_solr_spark.functions.funcparser import (
            parse_function_query)
        from lucene_solr_spark.functions.valuesource import (
            function_range)
        stats = searcher.doc_stats()
        col = parse_function_query(
            v, fields={"doc_len": F.col("doc_len"),
                       "norm_byte": F.col("norm_byte")})
        def _b(s, dflt):
            x = lp.get(s)
            return dflt if x is None else x.lower() == "true"
        return function_range(
            stats, col,
            lower=float(lp["l"]) if lp.get("l") is not None else None,
            upper=float(lp["u"]) if lp.get("u") is not None else None,
            include_lower=_b("incl", True),
            include_upper=_b("incu", True),
        )

    if ptype == "join":
        return searcher.join_query(v, lp["from"], lp["to"]) \
            .orderBy("doc_id")

    if ptype == "boost":
        from lucene_solr_spark.functions.funcparser import (
            parse_function_query)
        from lucene_solr_spark.functions.valuesource import (
            boosted_search)
        col = parse_function_query(
            lp["b"], fields={"doc_len": F.col("doc_len"),
                             "norm_byte": F.col("norm_byte")})
        return boosted_search(searcher, v, col, searcher.doc_stats(),
                              k=k)

    if ptype == "surround":
        return searcher.search_surround(v, k=k)

    if ptype == "query":
        # NestedQParserPlugin: the resolved v (usually $param) is a
        # full qparser string again
        return solr_query(searcher, v, params, k=k,
                          default_type=default_type,
                          multifield=multifield, plugins=plugins)

    if ptype == "switch":
        # SwitchQParserPlugin.java:115-142: trimmed value selects
        # case.<val>; empty selects 'case'; no match -> 'default'
        sel = (v or "").strip()
        key = "case" if sel == "" else f"case.{sel}"
        target = lp.get(key, lp.get("default"))
        if target is None:
            raise QueryParseError(
                f"No match in switch for {sel!r} and no default")
        return solr_query(searcher, target, params, k=k,
                          default_type=default_type,
                          multifield=multifield, plugins=plugins)

    if ptype == "maxscore":
        tie = float(lp.get("tie", 0.0) or 0.0)
        ast = parse_query(v, analyzer=searcher.analyzer)
        if any(c.occur == "must" for c in ast):
            raise QueryParseError(
                "maxscore with required clauses is not supported by "
                "this engine (SHOULD max-fold + prohibited only)")
        exclude = " ".join(
            t for c in ast if c.occur == "not" for t in c.terms)
        keep = " ".join(
            t for c in ast if c.occur == "should" for t in c.terms)
        return searcher.search(keep, k=k, mode="dismax", tie=tie,
                               exclude=exclude)

    if ptype in ("dismax", "edismax"):
        if multifield is None:
            raise QueryParseError(
                f"{ptype} dispatch needs a MultiFieldSearcher")

        def _boosted_fields(s: str) -> Dict[str, float]:
            # DisMaxQParser qf syntax: "title^5 body" (SolrPluginUtils
            # .parseFieldBoosts)
            out: Dict[str, float] = {}
            for part in s.split():
                if "^" in part:
                    fld, b = part.split("^", 1)
                    out[fld] = float(b)
                else:
                    out[part] = 1.0
            return out

        kw = {"qf": _boosted_fields(lp.get("qf", ""))}
        if lp.get("pf"):
            kw["pf"] = _boosted_fields(lp["pf"])
        if lp.get("tie"):
            kw["tie"] = float(lp["tie"])
        if lp.get("mm"):
            kw["min_should_match"] = lp["mm"]
        return multifield.edismax(v, k=k, **kw)

    raise QueryParseError(f"unknown query parser: {ptype!r}")
