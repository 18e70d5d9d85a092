"""Data-layout clustering for multi-dimensional pruning: Z-order (Morton)
keys interleave the bits of two binned dimensions so that sorting or
range-bucketing by ONE key keeps BOTH dimensions locally bounded — the
lakehouse clustering trick (Delta OPTIMIZE ZORDER, Iceberg sort orders)
that turns parquet min/max footer stats into effective file skipping for
queries that filter on either (or both) dimensions.

At 100 TB this is a write-time decision: cluster each partition's files by
the Z-key (one repartitionByRange + sortWithinPartitions) and a reader
filtering on time AND instrument prunes most files from the footer stats
alone. Everything here is pure integer Column arithmetic — bit shifts and
adds in whole-stage codegen, replayable in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 8) -> Column:
    """Morton interleave of two ``bits``-bit binned values (a's bit i lands
    at position 2i+1, b's at 2i). Non-overlapping shifted bits are summed —
    identical to bitwise OR, and `+` parses the same in every SQL engine."""
    k = F.lit(0).cast("long")
    for i in range(bits):
        k = k + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        k = k + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
    return k


def zorder_key_sql(a: str, b: str, bits: int = 8) -> str:
    """The same interleave as a SQL expression string (DuckDB/ANSI)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def bin_to(col: Column, lo: Column, hi: Column, bits: int = 8) -> Column:
    """Range-bin a value into [0, 2^bits) given inclusive lo/hi bounds."""
    return F.floor(
        (col - lo) * float(1 << bits) / (hi - lo + F.lit(1))
    ).cast("long")
