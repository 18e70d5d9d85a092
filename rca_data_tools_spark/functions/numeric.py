"""Deterministic numeric aggregation helpers.

Floating-point sums depend on addition order, which differs between engines
and between runs at different parallelism (partial aggregation re-orders the
operands). For every aggregate the engine exposes for oracle comparison we
round each addend to a fixed scale and sum as DECIMAL — exact integer
arithmetic, identical regardless of partitioning — then cast the final result
back to double. Per-row double arithmetic (products, differences) is IEEE-754
and bit-identical across engines, so rounding the per-row result is stable.

At 100 TB this costs nothing extra: decimal partial aggregation is still
map-side combinable and whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Default scale: 6 decimal digits — products of up-to-three 2-decimal factors
# are exactly representable, so both engines round to the identical value
# (double error ~1e-9 is far inside the 5e-7 half-spacing), while leaving
# 22 integral digits of headroom in DECIMAL(28, s) partial sums.
DEFAULT_SCALE = 6


def dsum(col: Column | str, scale: int = DEFAULT_SCALE) -> Column:
    """Order-insensitive sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c, scale).cast(f"decimal(28,{scale})")).cast("double")


def davg(col: Column | str, scale: int = DEFAULT_SCALE) -> Column:
    """Order-insensitive mean: exact decimal sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def dsum_sql(expr: str, scale: int = DEFAULT_SCALE) -> str:
    """The ANSI-SQL mirror of :func:`dsum` (used to build oracle queries)."""
    return f"CAST(SUM(CAST(ROUND({expr}, {scale}) AS DECIMAL(28,{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = DEFAULT_SCALE) -> str:
    return f"({dsum_sql(expr, scale)} / COUNT({expr}))"


def dstddev_terms(col: Column | str, scale: int = DEFAULT_SCALE) -> tuple[Column, Column, Column]:
    """Deterministic building blocks for sample stddev: (n, Σx, Σx²).

    Callers combine them as ``sqrt((Σx² - n·mean²) / (n-1))`` in double —
    the same expression tree must be used on the oracle side so the IEEE
    operations match exactly.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c)
    sx = dsum(c, scale)
    sxx = dsum(c * c, 2 * scale)
    return n, sx, sxx
