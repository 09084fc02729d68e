"""Solr date math (ref solr/core/src/java/org/apache/solr/util/
DateMathParser.java) re-expressed for the Spark engine: parse strings
like ``NOW/DAY-7DAYS`` or ``2024-01-05T00:00:00Z+3DAYS/HOUR`` into
timezone-naive UTC datetimes usable as Catalyst timestamp literals.

Semantics matched to the reference:

- anchor: ``NOW`` (caller-supplied for determinism) or an ISO-8601
  instant ending in ``Z`` (DateField canonical form); Solr separates
  the anchor from the math at the ``Z`` (DateField.java parseMath
  split) — everything after is math ops.
- ``/UNIT``   round DOWN to unit start (DateMathParser.round:174-210)
- ``+N UNIT`` / ``-N UNIT`` calendar add (DateMathParser.add:159-166)
- units per CALENDAR_UNITS (DateMathParser.java:117-152):
  YEAR[S] MONTH[S] DAY[S]/DATE HOUR[S] MINUTE[S] SECOND[S]
  MILLI[S]/MILLISECOND[S]. WEEK is consciously unsupported (reference
  comment :122-128).
- ops chain left-to-right; unknown unit / malformed op raises
  ``DateMathParseError`` (reference throws ParseException).
"""

from __future__ import annotations

import calendar as _cal
import re
from datetime import datetime, timedelta

__all__ = ["parse_date_math", "DateMathParseError"]


class DateMathParseError(ValueError):
    pass


# unit name -> canonical unit (DateMathParser.makeUnitsMap)
_UNITS = {}
for _names, _u in [
    (("YEAR", "YEARS"), "year"),
    (("MONTH", "MONTHS"), "month"),
    (("DAY", "DAYS", "DATE"), "day"),
    (("HOUR", "HOURS"), "hour"),
    (("MINUTE", "MINUTES"), "minute"),
    (("SECOND", "SECONDS"), "second"),
    (("MILLI", "MILLIS", "MILLISECOND", "MILLISECONDS"), "milli"),
]:
    for _n in _names:
        _UNITS[_n] = _u

_ISO = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(?:\.(\d{1,3}))?Z"
)
_OP = re.compile(r"([+\-/])([A-Z]+|\d+[A-Z]+)")


def _round_down(dt: datetime, unit: str) -> datetime:
    # DateMathParser.round: clear all fields below the unit
    if unit == "year":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0,
                          microsecond=0)
    if unit == "month":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "day":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "hour":
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "minute":
        return dt.replace(second=0, microsecond=0)
    if unit == "second":
        return dt.replace(microsecond=0)
    if unit == "milli":
        return dt.replace(microsecond=(dt.microsecond // 1000) * 1000)
    raise DateMathParseError(f"unknown unit {unit!r}")


def _add(dt: datetime, n: int, unit: str) -> datetime:
    # Calendar.add semantics: month/year adds clamp the day-of-month
    # (Jan 31 + 1MONTH = Feb 28/29), smaller units are exact deltas
    if unit == "year":
        return _add(dt, 12 * n, "month")
    if unit == "month":
        m0 = dt.year * 12 + (dt.month - 1) + n
        y, m = divmod(m0, 12)
        day = min(dt.day, _cal.monthrange(y, m + 1)[1])
        return dt.replace(year=y, month=m + 1, day=day)
    delta = {
        "day": timedelta(days=n),
        "hour": timedelta(hours=n),
        "minute": timedelta(minutes=n),
        "second": timedelta(seconds=n),
        "milli": timedelta(milliseconds=n),
    }.get(unit)
    if delta is None:
        raise DateMathParseError(f"unknown unit {unit!r}")
    return dt + delta


def parse_date_math(expr: str, now: datetime) -> datetime:
    """Evaluate a Solr date-math string against the supplied ``now``
    (the reference's NOW comes from the request context so repeated
    uses agree — DateMathParser.java:73-77; here the caller pins it,
    which also keeps query plans deterministic)."""
    expr = expr.strip()
    if expr.startswith("NOW"):
        base, math = now, expr[3:]
    else:
        m = _ISO.match(expr)
        if not m:
            raise DateMathParseError(
                f"bad date-math anchor (want NOW or ISO-8601 ...Z): {expr!r}"
            )
        frac = (m.group(7) or "").ljust(3, "0")
        base = datetime(
            *(int(m.group(i)) for i in range(1, 7)),
            microsecond=int(frac) * 1000,
        )
        math = expr[m.end():]
    pos = 0
    dt = base
    while pos < len(math):
        m = _OP.match(math, pos)
        if not m:
            raise DateMathParseError(
                f"malformed date math at {math[pos:]!r} in {expr!r}"
            )
        op, arg = m.group(1), m.group(2)
        if op == "/":
            unit = _UNITS.get(arg)
            if unit is None:
                raise DateMathParseError(f"unknown unit {arg!r} in {expr!r}")
            dt = _round_down(dt, unit)
        else:
            nm = re.match(r"(\d+)([A-Z]+)$", arg)
            if not nm:
                raise DateMathParseError(
                    f"expected <n><UNIT> after {op!r} in {expr!r}"
                )
            unit = _UNITS.get(nm.group(2))
            if unit is None:
                raise DateMathParseError(
                    f"unknown unit {nm.group(2)!r} in {expr!r}"
                )
            n = int(nm.group(1))
            dt = _add(dt, n if op == "+" else -n, unit)
        pos = m.end()
    return dt
