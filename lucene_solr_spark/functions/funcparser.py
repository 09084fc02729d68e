"""Solr function-query string parser (solr/core/src/java/org/apache/
solr/search/FunctionQParser.java + ValueSourceParser.java): parse
``"sum(recip(doc_len,1,5,1),product(0.5,sqrt(doc_len)))"`` into a
Catalyst Column over per-doc value columns.

Supported functions (ValueSourceParser.java registrations, same
argument orders):
  sum, sub, product (alias mul), div, mod, abs, pow, sqrt,
  log (base 10, :435-440), ln (:441-446), exp,
  linear(x,m,c) = m*x+c, recip(x,m,a,b) = a/(m*x+b),
  map(x,min,max,target[,default]) (RangeMapFloatFunction),
  min, max (multi-arg), if(cond,a,b), def(a,b), exists(x),
  not/and/or/xor (boolean), true, false, pi, e,
  field(name) (explicit field syntax :386-394).

Everything else the reference registers (ord/rord, tf/idf/docfreq,
query(...), scale, geodist, strdist, ms) needs index or session
context; callers inject those through ``extra`` as ready Columns or
callables — the parser itself stays context-free.

Literals: ints/floats (sign included). A bare identifier is a field
reference resolved through ``fields``.

100 TB plan: the output is a pure Column — whole-stage codegen, fused
with whatever scan/join the caller owns; the parser runs once on the
driver.
"""

from __future__ import annotations

import math
import re
from typing import Callable, Dict, List, Optional, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from lucene_solr_spark.search.queryparser import QueryParseError

__all__ = ["parse_function_query"]

_TOKEN = re.compile(r"""\s*(?:
      (?P<num>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
    | (?P<name>[A-Za-z_][A-Za-z0-9_.]*)
    | (?P<punct>[(),])
)""", re.VERBOSE)


def _unquote(t: str) -> str:
    return re.sub(r"\\(.)", r"\1", t[1:-1])


def _nary(f):
    def g(*args):
        if len(args) < 2:
            raise QueryParseError("needs >= 2 args")
        out = args[0]
        for a in args[1:]:
            out = f(out, a)
        return out
    return g


def _split_vectors(cols):
    """dist/sqedist argument convention (ValueSourceParser
    DistanceFunction parsing): the value sources split evenly into the
    two points."""
    if len(cols) < 2 or len(cols) % 2:
        raise QueryParseError("dist needs an even number of sources")
    n = len(cols) // 2
    return list(zip(cols[:n], cols[n:]))


def _ms(*args):
    """ms() value source (ValueSourceParser.java "ms"): ms(a) = epoch
    millis of a; ms(a,b) = a - b in millis. The 0-arg request-time
    form needs a NOW binding — pass one via ``extra`` (the driver
    contract pins repeatable plans, so there is no implicit clock)."""
    if len(args) == 1:
        return F.unix_millis(args[0].cast("timestamp"))
    if len(args) == 2:
        return (F.unix_millis(args[0].cast("timestamp"))
                - F.unix_millis(args[1].cast("timestamp")))
    raise QueryParseError("ms() takes 1 or 2 date args here")


_FUNCS: Dict[str, Callable] = {
    "sum": _nary(lambda a, b: a + b),
    "sub": lambda a, b: a - b,
    "ms": _ms,
    # Minkowski distance family (ValueSourceParser "dist"/"sqedist",
    # function/distance/*.java): power as the first source
    "dist": lambda p, *cols: F.pow(
        sum((F.abs(a - b) ** p
             for a, b in _split_vectors(cols)),
            F.lit(0.0)),
        F.lit(1.0) / p),
    "sqedist": lambda *cols: sum(
        ((a - b) * (a - b) for a, b in _split_vectors(cols)),
        F.lit(0.0)),
    "product": _nary(lambda a, b: a * b),
    "mul": _nary(lambda a, b: a * b),
    "div": lambda a, b: a / b,
    "mod": lambda a, b: a % b,
    "abs": F.abs,
    "pow": F.pow,
    "sqrt": F.sqrt,
    "log": F.log10,     # Solr log is base 10 (ValueSourceParser:435)
    "ln": F.log,
    "exp": F.exp,
    "linear": lambda x, m, c: m * x + c,
    "recip": lambda x, m, a, b: a / (m * x + b),
    "map": lambda x, mn, mx, tgt, dflt=None: F.when(
        (x >= mn) & (x <= mx), tgt
    ).otherwise(x if dflt is None else dflt),
    "min": _nary(lambda a, b: F.least(a, b)),
    "max": _nary(lambda a, b: F.greatest(a, b)),
    "if": lambda c, a, b: F.when(c.cast("boolean"), a).otherwise(b),
    "def": lambda a, b: F.coalesce(a, b),
    "exists": lambda x: x.isNotNull(),
    "not": lambda c: ~c.cast("boolean"),
    "and": _nary(lambda a, b: a.cast("boolean") & b.cast("boolean")),
    "or": _nary(lambda a, b: a.cast("boolean") | b.cast("boolean")),
    "xor": _nary(lambda a, b: a.cast("boolean") != b.cast("boolean")),
}

_CONSTS = {
    "true": lambda: F.lit(True),
    "false": lambda: F.lit(False),
    "pi": lambda: F.lit(math.pi),
    "e": lambda: F.lit(math.e),
}


def parse_function_query(
    s: str,
    fields: Dict[str, Column],
    extra: Optional[Dict[str, Union[Column, Callable]]] = None,
) -> Column:
    """Parse a Solr function-query string into a Column. ``fields``
    resolves bare identifiers and ``field(name)``; ``extra`` adds
    context-bound functions (value = Column for zero-arg, callable for
    n-arg)."""
    toks: List[str] = []
    kinds: List[str] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip():
                raise QueryParseError(f"bad function query at: {s[pos:]!r}")
            break
        pos = m.end()
        for kind in ("num", "str", "name", "punct"):
            v = m.group(kind)
            if v is not None:
                toks.append(v)
                kinds.append(kind)
                break
    i = 0

    def peek():
        return toks[i] if i < len(toks) else None

    def parse_expr() -> Column:
        nonlocal i
        if i >= len(toks):
            raise QueryParseError("unexpected end of function query")
        t, k = toks[i], kinds[i]
        i += 1
        if k == "num":
            return F.lit(int(t)) if re.fullmatch(r"[+-]?\d+", t) \
                else F.lit(float(t))
        if k == "str":
            return F.lit(_unquote(t))
        if k == "punct":
            raise QueryParseError(f"unexpected {t!r}")
        name = t
        if peek() == "(":
            i += 1
            # raw-arg functions (FunctionQParser parseArg/parseTerm
            # callers like termfreq/docfreq/idf/literal): arguments are
            # bare words or quoted strings passed through UNRESOLVED —
            # a field or term name, not a value source
            fn = extra.get(name) if extra else None
            if fn is not None and getattr(fn, "raw_args", False):
                raw: List[str] = []
                while peek() != ")":
                    if i >= len(toks):
                        raise QueryParseError(
                            f"missing ')' in {name}(...)")
                    tt, kk = toks[i], kinds[i]
                    i += 1
                    if kk == "punct":
                        if tt != ",":
                            raise QueryParseError(
                                f"unexpected {tt!r} in {name}(...)")
                        continue
                    # raw_args == "tagged": the builder receives
                    # (text, was_quoted) so a quoted literal stays a
                    # literal even when a field shares its name (the
                    # reference keeps LiteralValueSource distinct
                    # from field refs); raw_args == True keeps the
                    # legacy plain-string slot
                    if getattr(fn, "raw_args") == "tagged":
                        raw.append((_unquote(tt), True) if kk == "str"
                                   else (tt, False))
                    else:
                        raw.append(_unquote(tt) if kk == "str" else tt)
                i += 1
                return fn(*raw)
            args: List[Column] = []
            if peek() != ")":
                args.append(parse_expr())
                while peek() == ",":
                    i += 1
                    args.append(parse_expr())
            if peek() != ")":
                raise QueryParseError(f"missing ')' in {name}(...)")
            i += 1
            if name == "field":
                if len(args) != 1:
                    raise QueryParseError("field(name) takes one arg")
                # arg was parsed as a field-ref Column already
                return args[0]
            if extra and name in extra and callable(extra[name]):
                return extra[name](*args)
            if name in _FUNCS:
                try:
                    return _FUNCS[name](*args)
                except TypeError:
                    raise QueryParseError(
                        f"wrong arg count for {name}(...)")
            raise QueryParseError(f"unknown function {name!r}")
        if extra and name in extra and not callable(extra[name]):
            return extra[name]
        if name in _CONSTS:
            return _CONSTS[name]()
        if name in fields:
            return fields[name]
        raise QueryParseError(f"unknown field/function {name!r}")

    out = parse_expr()
    if i != len(toks):
        raise QueryParseError(f"trailing input: {toks[i]!r}")
    return out
