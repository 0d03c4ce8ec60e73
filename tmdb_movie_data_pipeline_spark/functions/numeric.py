"""Numeric expression helpers — cross-engine bit-exact aggregation.

Floating-point sums are order-dependent: Spark's parallel partial aggregates
and a single-threaded oracle sum in different orders, so raw double
aggregates differ in final ULPs, and *rounding cannot fix that* — when the
true value sits exactly on a rounding boundary (systematic for money-like
data: avg of 8 two-decimal values = x.xxx75), the noise decides the side.

The engine therefore aggregates on **quantized integers**:

    q(x)   = CAST(ROUND(x * scale) AS BIGINT)      -- per-row, deterministic:
                                                    -- one IEEE multiply of the
                                                    -- same double in both
                                                    -- engines; both round
                                                    -- half-away-from-zero
    sum(x) ≈ CAST(SUM(q(x)) AS DOUBLE) / scale      -- integer sum is exact and
    avg(x) ≈ (CAST(SUM(q(x)) AS DOUBLE)             -- order-independent;
              / CAST(COUNT(x) AS DOUBLE)) / scale   -- division/cast are
                                                    -- IEEE-deterministic

so every derived double is bit-identical across engines and across runs —
no tolerance, no rounding dance. Single-value outputs (min/max/picked rows)
are already identical doubles and may be rounded freely.

Scale choice bounds: |x|·scale·rows must stay under 2^63. The defaults
(100 for money, 1e6 for unit-range ratios) leave ≥3 orders of magnitude of
headroom at sf100; a petabyte deployment switches the sum to DECIMAL(38,0)
(Spark and modern warehouses both sum decimals exactly) — same operator
shape, wider accumulator.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY_SCALE = 100  # 2-decimal money
PRICE_SCALE = 10_000  # money products (price×rate)
UNIT_SCALE = 1_000_000  # unit-range ratios / raw doubles

__all__ = [
    "MONEY_SCALE",
    "PRICE_SCALE",
    "UNIT_SCALE",
    "quantize",
    "qsum",
    "qavg",
    "qsum_over",
    "qavg_over",
    "qsum_sql",
    "qavg_sql",
    "round2",
    "round4",
    "round6",
    "safe_div",
]


def quantize(c: Column, scale: int) -> Column:
    return F.round(c * F.lit(scale), 0).cast("long")


def qsum(c: Column, scale: int) -> Column:
    """Order-independent sum: exact integer aggregate → one IEEE division."""
    return F.sum(quantize(c, scale)).cast("double") / F.lit(float(scale))


def qavg(c: Column, scale: int) -> Column:
    return (
        F.sum(quantize(c, scale)).cast("double") / F.count(c).cast("double")
    ) / F.lit(float(scale))


def qsum_over(c: Column, scale: int, window) -> Column:
    return F.sum(quantize(c, scale)).over(window).cast("double") / F.lit(float(scale))


def qavg_over(c: Column, scale: int, window) -> Column:
    return (
        F.sum(quantize(c, scale)).over(window).cast("double")
        / F.count(c).over(window).cast("double")
    ) / F.lit(float(scale))


def qsum_sql(expr: str, scale: int) -> str:
    """DuckDB oracle twin of ``qsum`` — identical operation order. The expr
    is parenthesized before ``* scale`` so additive expressions quantize as
    a whole (for multiplicative chains the parens don't change the
    left-assoc parse tree, so prior oracles are bit-identical)."""
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {scale}) AS BIGINT)) AS DOUBLE)"
        f" / CAST({scale} AS DOUBLE)"
    )


def qavg_sql(expr: str, scale: int) -> str:
    return (
        f"(CAST(SUM(CAST(ROUND(({expr}) * {scale}) AS BIGINT)) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE)) / CAST({scale} AS DOUBLE)"
    )


# -- single-value rounding (safe: both engines see the identical double) -----


def round2(c: Column) -> Column:
    return F.round(c, 2)


def round4(c: Column) -> Column:
    return F.round(c, 4)


def round6(c: Column) -> Column:
    return F.round(c, 6)


def safe_div(num: Column, den: Column) -> Column:
    return num / F.nullif(den, F.lit(0))
