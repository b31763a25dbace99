"""Solr date math: `NOW/DAY-7DAYS`-style expressions -> UTC datetimes.

Role of the reference's DateMathParser
(solr/core/src/java/org/apache/solr/util/DateMathParser.java: the unit
table CALENDAR_UNITS at lines 153-169; `NOW` handling at 242; rounding
via round(), adds via add()). Solr evaluates date math ONCE per request
against a pinned NOW (SolrRequestInfo.getNOW), so the faithful Spark
shape is DRIVER-SIDE evaluation to a concrete datetime literal: range
predicates and facet bounds built from it fold into the plan as
timestamp literals and reach the parquet scan as pushed-down filters —
no per-row date arithmetic anywhere.

Syntax: `NOW` or an ISO-8601 instant ending in `Z`, followed by any
sequence of operations:
    /UNIT     round DOWN to the unit (UTC, like Solr's default TZ)
    +N UNIT   add N units (calendar-aware for MONTH/YEAR, day clamped)
    -N UNIT   subtract N units
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

#: unit name -> canonical unit (DateMathParser.makeUnitsMap)
UNITS = {}
for _canon, _names in {
    "year": ("YEAR", "YEARS"),
    "month": ("MONTH", "MONTHS"),
    "day": ("DAY", "DAYS", "DATE"),
    "hour": ("HOUR", "HOURS"),
    "minute": ("MINUTE", "MINUTES"),
    "second": ("SECOND", "SECONDS"),
    "milli": ("MILLI", "MILLIS", "MILLISECOND", "MILLISECONDS"),
}.items():
    for _n in _names:
        UNITS[_n] = _canon

_OP = re.compile(r"([+\-/])(\d*)([A-Z]+)")

_FIXED = {
    "day": timedelta(days=1),
    "hour": timedelta(hours=1),
    "minute": timedelta(minutes=1),
    "second": timedelta(seconds=1),
    "milli": timedelta(milliseconds=1),
}


class DateMathError(ValueError):
    pass


def _add_months(dt: datetime, n: int) -> datetime:
    """Calendar-aware month add with day-of-month clamping (the
    ChronoUnit.MONTHS behavior: Jan 31 + 1 MONTH = Feb 28/29)."""
    import calendar

    y = dt.year + (dt.month - 1 + n) // 12
    m = (dt.month - 1 + n) % 12 + 1
    d = min(dt.day, calendar.monthrange(y, m)[1])
    return dt.replace(year=y, month=m, day=d)


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "year":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
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
        return dt.replace(microsecond=dt.microsecond // 1000 * 1000)
    raise DateMathError(f"cannot round to {unit}")


def _parse_instant(s: str) -> datetime:
    iso = s[:-1] if s.endswith("Z") else s
    try:
        dt = datetime.fromisoformat(iso)
    except ValueError as e:
        raise DateMathError(f"bad date literal {s!r}") from e
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


def datemath(expr: str, now: datetime | None = None) -> datetime:
    """Evaluate a Solr date-math expression to a UTC datetime.

    `now` pins NOW (tests/gates MUST pin it for determinism — the
    analogue of the NOW request param every distributed Solr query
    carries so all shards agree, CommonParams.NOW)."""
    expr = expr.strip()
    if expr.startswith("NOW"):
        base = now if now is not None else datetime.now(timezone.utc)
        math = expr[3:]
    else:
        # literal instant runs through the first math operator; Solr
        # splits at '/' only for rounding but +/- also applies
        m = re.search(r"(?<=Z)[+\-/]", expr)
        if m:
            base, math = _parse_instant(expr[: m.start()]), expr[m.start():]
        else:
            base, math = _parse_instant(expr), ""
    if base.tzinfo is None:
        base = base.replace(tzinfo=timezone.utc)
    return apply_math(base, math)


def apply_math(base: datetime, math: str) -> datetime:
    """Apply a bare math suffix ('/DAY-7DAYS', '+1MONTH', ...) to a
    datetime — also the gap-stepping primitive date_range_facet uses."""
    pos = 0
    while pos < len(math):
        m = _OP.match(math, pos)
        if not m:
            raise DateMathError(f"bad date math at {math[pos:]!r}")
        op, num, unit_name = m.groups()
        unit = UNITS.get(unit_name)
        if unit is None:
            raise DateMathError(f"unknown unit {unit_name!r}")
        if op == "/":
            if num:
                raise DateMathError(f"rounding takes no count ({math!r})")
            base = _round_down(base, unit)
        else:
            n = int(num) if num else 1
            if op == "-":
                n = -n
            if unit == "month":
                base = _add_months(base, n)
            elif unit == "year":
                base = _add_months(base, 12 * n)
            else:
                base = base + _FIXED[unit] * n
        pos = m.end()
    return base


def gap_delta(gap: str) -> timedelta | None:
    """The fixed timedelta of a gap like '+7DAYS', or None when the gap
    involves calendar units (MONTH/YEAR) or rounding — callers use the
    fixed form for pure-arithmetic bucketing."""
    pos, total = 0, timedelta(0)
    while pos < len(gap):
        m = _OP.match(gap, pos)
        if not m:
            raise DateMathError(f"bad gap {gap!r}")
        op, num, unit_name = m.groups()
        unit = UNITS.get(unit_name)
        if unit is None:
            raise DateMathError(f"unknown unit {unit_name!r}")
        if op == "/" or unit in ("month", "year"):
            return None
        n = int(num) if num else 1
        total += _FIXED[unit] * (n if op == "+" else -n)
        pos = m.end()
    return total


def datemath_naive(expr: str, now: datetime | None = None) -> datetime:
    """datemath() stripped to a tz-naive UTC datetime — what Spark's
    session-UTC TimestampType literals and DuckDB TIMESTAMP want."""
    return datemath(expr, now).replace(tzinfo=None)
