"""Vector math over ArrayType(Float/Double) embedding columns.

Everything is built from F.zip_with / F.aggregate so the arithmetic runs in
the JVM (no Python). For very hot paths a Pandas-UDF variant is provided —
Arrow-batched numpy beats per-element codegen once vectors are wide and rows
are many; benchmark before choosing.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def euclidean(a: Column, b: Column) -> Column:
    diff = F.zip_with(a, b, lambda x, y: x - y)
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x))


def array_mean(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x) / F.size(a)


def array_stddev(a: Column, sample: bool = True) -> Column:
    """Per-row stddev of an array column (reference: PHSEN signal.std(axis=1),
    rca_data_tools/advanced_qaqc/calculateFunctions.py:937-947)."""
    n = F.size(a)
    mean = array_mean(a)
    ss = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + (x - mean) * (x - mean))
    denom = (n - F.lit(1)) if sample else n
    return F.sqrt(ss / denom)


def k_of_n_above(a: Column, threshold: float) -> Column:
    """Count of array elements above a threshold (reference: ADCP k-of-n beam
    tests, rca_data_tools/advanced_qaqc/calculateFunctions.py:153-171)."""
    return F.size(F.filter(a, lambda x: x > F.lit(threshold)))


@F.pandas_udf(T.DoubleType())
def cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine for wide vectors; numpy does the inner loop."""
    import numpy as np

    av = np.stack(a.to_numpy())
    bv = np.stack(b.to_numpy())
    num = (av * bv).sum(axis=1)
    den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
    return pd.Series(num / den)


def array_pop_std_exact(a: Column) -> Column:
    """Population std via sqrt(E[x^2] - E[x]^2) for integer-valued arrays.

    Both partial sums are integer-exact in doubles (< 2^53), so any engine
    computes bit-identical results regardless of its fold order — the form
    the DuckDB oracles replay. For float arrays prefer array_stddev (the
    two-pass form is numerically safer there)."""
    n = F.size(a).cast("double")
    s = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x)
    ss = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    mean = s / n
    return F.sqrt(ss / n - mean * mean)
