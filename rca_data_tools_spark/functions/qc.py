"""QC flag machinery.

Re-expresses the reference's QC decode/encode semantics as pure Column
expressions (JVM-side, codegen'd — no UDFs):

- OOI bitmask QC: ``*_qc_executed`` / ``*_qc_results`` are uint8 bitmasks,
  bit i set = test i executed / passed
  (reference: rca_data_tools/qaqc/dashboard.py:2031-2061 ``retrieve_qc``).
- QARTOD positional digit strings: ``*_qartod_executed`` is a string with one
  flag digit per test in a declared order, e.g. "13" = test1 pass,
  test2 suspect (reference: rca_data_tools/qaqc/utils.py:20-33
  ``coerce_qartod_executed_to_int``; encode:
  rca_data_tools/advanced_qaqc/calculateFunctions.py:19-46).
- Summary rollup: row-wise max of all flag columns with floor 1
  (reference: rca_data_tools/qaqc/dashboard.py:2061).

QARTOD flag levels: 1=pass, 2=not_evaluated, 3=suspect, 4=fail, 9=missing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FLAG_PASS, FLAG_NOT_EVAL, FLAG_SUSPECT, FLAG_FAIL, FLAG_MISSING = 1, 2, 3, 4, 9


def bit_flag(mask: Column | str, bit: int) -> Column:
    """Extract bit ``bit`` of an integer bitmask column (0 or 1)."""
    c = F.col(mask) if isinstance(mask, str) else mask
    return F.shiftright(c.cast("int"), bit).bitwiseAND(F.lit(1))


def decode_bitmask(df: DataFrame, mask_col: str, test_names: Sequence[str]) -> DataFrame:
    """Expand a QC bitmask into one 0/1 column per test (bit i -> name i)."""
    for i, name in enumerate(test_names):
        df = df.withColumn(name, bit_flag(mask_col, i))
    return df


def qc_test_flags(executed: Column | str, results: Column | str, bit: int) -> Column:
    """QARTOD-style flag for one bitmask test: 1 pass, 4 fail, 2 not executed."""
    ex, res = bit_flag(executed, bit), bit_flag(results, bit)
    return (
        F.when(ex == 0, F.lit(FLAG_NOT_EVAL))
        .when(res == 1, F.lit(FLAG_PASS))
        .otherwise(F.lit(FLAG_FAIL))
    )


def encode_positional_flags(flags: Sequence[Column]) -> Column:
    """Combine per-test flag columns into a positional digit string.

    Mirrors the Σ flagᵢ·10^(n−1−i) encoding of
    rca_data_tools/advanced_qaqc/calculateFunctions.py:19-46 but builds the
    string directly — same result, no bigint overflow for many tests.
    """
    return F.concat(*[f.cast("int").cast("string") for f in flags])


def decode_positional_flags(col: Column | str, n_tests: int, prefix: str = "test") -> list[tuple[str, Column]]:
    """Split a positional digit string into (name, int flag column) pairs.

    Position i (1-based substring) corresponds to the i-th entry of the
    dataset's ``tests_executed`` ordering contract
    (reference: rca_data_tools/qaqc/utils.py:25-29).
    """
    c = F.col(col) if isinstance(col, str) else col
    return [(f"{prefix}{i + 1}", F.substring(c, i + 1, 1).cast("int")) for i in range(n_tests)]


def rollup_flags(*flags: Column, floor: int = FLAG_PASS) -> Column:
    """Summary flag = row-wise max of test flags with a floor of 1 (pass).

    FLAG_MISSING (9) dominates, as in the reference's ``flags.max(axis=1,
    initial=1)`` (rca_data_tools/qaqc/dashboard.py:2061).
    """
    return F.greatest(F.lit(floor), *[f.cast("int") for f in flags])


def span_flag(value: Column, sus_lo: Column, sus_hi: Column, fail_lo: Column, fail_hi: Column) -> Column:
    """Gross-range test: 4 outside fail span, 3 outside suspect span, else 1.

    NULL value -> 9 (missing). Mirrors rca_data_tools/qaqc/calculate.py:100-115.
    """
    return (
        F.when(value.isNull(), F.lit(FLAG_MISSING))
        .when((value < fail_lo) | (value > fail_hi), F.lit(FLAG_FAIL))
        .when((value < sus_lo) | (value > sus_hi), F.lit(FLAG_SUSPECT))
        .otherwise(F.lit(FLAG_PASS))
    )
