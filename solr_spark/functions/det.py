"""Deterministic numeric aggregation helpers.

Float sums depend on addition order, which differs between Spark's
partial/final aggregation and any single-node oracle. For results that
must hash-compare exactly against a DuckDB oracle, big-sum aggregates go
through exact DECIMAL arithmetic (order-independent), are cast back to
double (deterministic nearest-double), and round to a fixed number of
decimals. Both the Spark and SQL forms are generated here so the two
sides share one definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,6)"
ROUND = 4


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent sum of a double column, rounded to 4 decimals."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double"), ROUND).alias(alias)


def dsum_sql(expr: str) -> str:
    return f"round(cast(sum(cast(({expr}) as DECIMAL(30,6))) as DOUBLE), {ROUND})"


def davg(col: Column | str, alias: str) -> Column:
    """avg = exact decimal sum -> double, / count — deterministic."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1)).cast("double"), ROUND
    ).alias(alias)


def davg_sql(expr: str) -> str:
    return (
        f"round(cast(sum(cast(({expr}) as DECIMAL(30,6))) as DOUBLE)"
        f" / count(*)::DOUBLE, {ROUND})"
    )


def dstddev(col: Column | str, alias: str) -> Column:
    """Sample stddev from exact decimal sum/sumsq components."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    s = F.sum(c.cast(DEC)).cast("double")
    s2 = F.sum((c * c).cast(DEC)).cast("double")
    n = F.count(F.lit(1)).cast("double")
    return F.round(F.sqrt((s2 - s * s / n) / (n - F.lit(1.0))), ROUND).alias(alias)


def dstddev_sql(expr: str) -> str:
    s = f"cast(sum(cast(({expr}) as DECIMAL(30,6))) as DOUBLE)"
    s2 = f"cast(sum(cast((({expr}) * ({expr})) as DECIMAL(30,6))) as DOUBLE)"
    n = "count(*)::DOUBLE"
    return f"round(sqrt(({s2} - {s} * {s} / {n}) / ({n} - 1.0)), {ROUND})"


def r4(col: Column | str, alias: str | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    c = F.round(c.cast("double"), ROUND)
    return c.alias(alias) if alias else c
