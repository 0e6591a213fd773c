"""Exact-arithmetic aggregation helpers.

Why: Spark executes aggregations as partial (map-side) + final combines
whose order is nondeterministic across runs and differs from any
single-threaded oracle. Double addition is not associative, so
``SUM(double)`` is not reproducible at the last ulp. Casting each
addend to ``DECIMAL(38, s)`` first makes the sum exact and associative:
any summation order — Spark's partial aggregate tree or DuckDB's
sequential scan — yields the same decimal, and casting that decimal to
double is deterministic. This matters at 100 TB exactly as much as in
tests: it is what makes results stable across cluster re-runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"
DEC_HI = "decimal(38,12)"  # for unit-scale values (cosines, ratios)


def dsum(col: Column | str, scale: str = DEC) -> Column:
    """Exact sum of a double column; returns double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double")


def davg(col: Column | str, scale: str = DEC) -> Column:
    """Exact-sum average of a double column; returns double.

    Defined as ``CAST(exact_sum AS DOUBLE) / COUNT(col)`` so both
    engines divide identical doubles by identical bigints.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double") / F.count(c)


def oracle_dsum(expr: str, scale: str = "DECIMAL(38,6)") -> str:
    """DuckDB-SQL twin of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS {scale})) AS DOUBLE)"


def oracle_davg(expr: str, scale: str = "DECIMAL(38,6)") -> str:
    """DuckDB-SQL twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST(({expr}) AS {scale})) AS DOUBLE) / COUNT({expr})"
    )
