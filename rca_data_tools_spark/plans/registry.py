"""Config-driven calculation registry.

Mirrors the reference's declarative UDF system (rca_data_tools/qaqc/params/
calculateCalls.csv declares function + inputs + outputs; qaqc/utils.py:327-358
builds the function registry via importlib; qaqc/plots.py:50-110 executes and
attaches outputs as new columns) — but compiled to Spark Column expressions,
so a config row becomes part of the Catalyst plan instead of a Python call.

Three kernel classes, in preference order (SURVEY §2.10):
- ``column``: pure Column-expression builders (flaggers, converters) —
  whole-stage codegen, zero Python.
- ``pandas``: element-wise math via Arrow-batched pandas UDF.
- ``grouped``: per-group applyInPandas (multi-output products, per-row
  linear algebra like the nitrate least-squares fit).

A spec is data (dict / CSV row), not code: `{name, kernel, inputs, outputs,
params}`. ``CalcRegistry.apply`` resolves kernels by name and attaches the
outputs, exactly the reference's gather-call-attach loop.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class CalcSpec:
    """One declarative calculation (≙ one calculateCalls.csv row)."""

    name: str
    kernel: str  # registered kernel key
    inputs: list[str]  # input column names, in kernel order
    outputs: list[str]  # output column names produced
    params: dict = field(default_factory=dict)  # kwargs for the kernel


class CalcRegistry:
    """Kernel registry + executor for declarative calculation specs."""

    def __init__(self) -> None:
        self._column_kernels: dict[str, Callable[..., dict[str, Column]]] = {}
        self._grouped_kernels: dict[str, Callable[..., DataFrame]] = {}

    def register_column(self, key: str):
        def deco(fn):
            self._column_kernels[key] = fn
            return fn

        return deco

    def register_grouped(self, key: str):
        def deco(fn):
            self._grouped_kernels[key] = fn
            return fn

        return deco

    def apply(self, df: DataFrame, specs: list[CalcSpec]) -> DataFrame:
        """Attach every spec's outputs. Column kernels extend the projection
        (one Catalyst plan, no barriers); grouped kernels re-shape via
        applyInPandas and must come last in a spec list."""
        for spec in specs:
            if spec.kernel in self._column_kernels:
                cols = self._column_kernels[spec.kernel](
                    *[F.col(c) for c in spec.inputs], **spec.params
                )
                if isinstance(cols, Column):
                    cols = {spec.outputs[0]: cols}
                for out in spec.outputs:
                    df = df.withColumn(out, cols[out])
            elif spec.kernel in self._grouped_kernels:
                df = self._grouped_kernels[spec.kernel](df, spec)
            else:
                raise KeyError(f"unknown kernel {spec.kernel!r} for calc {spec.name!r}")
        return df


REGISTRY = CalcRegistry()


# --- column kernels: the reference's flagger/converter families ------------
# (advanced_qaqc/calculateFunctions.py — re-expressed as Column math)


@REGISTRY.register_column("range_flag")
def range_flag(value: Column, *, lo: float, hi: float, flag: int = 3) -> Column:
    """Generic span flagger (flor/velpt/pco2w-style *_advanced_flags):
    outside [lo, hi] -> flag, inside -> 1, null -> 9."""
    return (
        F.when(value.isNull(), F.lit(9))
        .when((value < lo) | (value > hi), F.lit(flag))
        .otherwise(F.lit(1))
    )


@REGISTRY.register_column("step_flag")
def step_flag(value: Column, prev: Column, *, threshold: float) -> Column:
    """Step test against a pre-computed lag column (pump-failure detection,
    calculateFunctions.py:861-870)."""
    return F.when(prev.isNull(), F.lit(1)).when(
        F.abs(value - prev) > threshold, F.lit(3)
    ).otherwise(F.lit(1))


@REGISTRY.register_column("linear_convert")
def linear_convert(raw: Column, *, scale: float, offset: float) -> Column:
    """counts -> engineering units: raw * scale + offset
    (opt_pressure, calculateFunctions.py:616)."""
    return raw * scale + offset


@REGISTRY.register_column("log_convert")
def log_convert(raw: Column, *, coeff: float = 1.0) -> Column:
    """Log-domain conversion (absorbance-style, calculateFunctions.py:433)."""
    return F.when(raw > 0, F.log10(raw) * coeff)


@REGISTRY.register_column("polynomial")
def polynomial(x: Column, *, coeffs: list[float]) -> Column:
    """Horner-form polynomial (thermistor conversions use 4th order,
    calculateFunctions.py:436-438). Horner in both engines -> same doubles."""
    acc: Column = F.lit(float(coeffs[0]))
    for c in coeffs[1:]:
        acc = acc * x + F.lit(float(c))
    return acc


@REGISTRY.register_column("combine_flags")
def combine_flags(*flags: Column) -> Column:
    """Positional digit-string rollup of prior flag columns
    (calculateFunctions.py:19-46)."""
    return F.concat(*[f.cast("int").cast("string") for f in flags])


# --- grouped kernels: per-group least-squares (nutnr_plant2023-shaped) -----


@REGISTRY.register_grouped("linear_fit")
def linear_fit(df: DataFrame, spec: CalcSpec) -> DataFrame:
    """Per-group degree-1 least squares as PURE Column aggregation — one
    map-side-combinable shuffle, no Python, closed-form covariance solution:

        slope = (n*Σxy - Σx*Σy) / (n*Σx² - (Σx)²)
        intercept = (Σy - slope*Σx) / n
        rmse = sqrt((Σy² - 2a·Σxy + a²Σx² - 2b·Σy + 2ab·Σx + b²n) / n)

    All five sums go through the engine's deterministic decimal summation
    (functions/numeric.dsum), so when x and y are decimal-quantized inputs
    (e.g. millihour-resolution time, 2-decimal readings) the result is
    bit-identical across engines and partitionings — the property the DuckDB
    oracle relies on. This is the preferred fit kernel at scale: the numpy
    ``poly_fit`` kernel below shuffles whole groups through applyInPandas,
    this one ships only 5 partial aggregates per group.

    Reference shape: calculateFunctions.py:267-468 (per-group fit, scalar
    coefficient outputs).
    """
    from rca_data_tools_spark.functions.numeric import dsum

    group_cols: list[str] = spec.params["group_cols"]
    scale: int = spec.params.get("scale", 6)
    x_col, y_col = spec.inputs
    x, y = F.col(x_col), F.col(y_col)
    s = (
        df.where(x.isNotNull() & y.isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            dsum(x, scale).alias("sx"),
            dsum(y, scale).alias("sy"),
            dsum(x * y, scale).alias("sxy"),
            dsum(x * x, scale).alias("sxx"),
            dsum(y * y, scale).alias("syy"),
        )
    )
    nd = F.col("n_points").cast("double")
    sx, sy, sxy, sxx, syy = (F.col(c) for c in ("sx", "sy", "sxy", "sxx", "syy"))
    slope = ((nd * sxy - sx * sy) / (nd * sxx - sx * sx)).alias("slope")
    s = s.withColumn("slope", slope)
    a = F.col("slope")
    s = s.withColumn("intercept", (sy - a * sx) / nd)
    b = F.col("intercept")
    ss_res = (
        syy - F.lit(2.0) * a * sxy + a * a * sxx
        - F.lit(2.0) * b * sy + F.lit(2.0) * a * b * sx + b * b * nd
    )
    s = s.withColumn("rmse", F.sqrt(F.greatest(ss_res, F.lit(0.0)) / nd))
    return s.select(*group_cols, "slope", "intercept", "rmse", "n_points")


@REGISTRY.register_grouped("poly_fit")
def poly_fit(df: DataFrame, spec: CalcSpec) -> DataFrame:
    """Per-group polynomial least-squares fit via numpy pinv — the shape of
    the reference's nitrate spectral fit (calculateFunctions.py:267-468:
    per-row pinv over wavelength-windowed spectra, multi-column output).

    Grouped by ``params['group_cols']``; fits y ~ poly(x, deg) per group and
    returns (group, coefficients array, rmse). applyInPandas keeps each
    group's solve in one Arrow batch; groups parallelize across executors.
    """
    import numpy as np
    import pandas as pd

    group_cols: list[str] = spec.params["group_cols"]
    deg: int = spec.params.get("deg", 1)
    x_col, y_col = spec.inputs
    coef_cols = [f"coef_{i}" for i in range(deg + 1)]  # descending powers
    out_schema = ", ".join(
        [f"{c} {t}" for c, t in df.select(*group_cols).dtypes]
        + [f"{c} double" for c in coef_cols]
        + ["rmse double", "n_points bigint"]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].to_numpy(dtype=np.float64)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        mask = ~(np.isnan(x) | np.isnan(y))
        x, y = x[mask], y[mask]
        head = pdf.iloc[[0]][group_cols].reset_index(drop=True)
        if len(x) <= deg:
            return head.assign(
                **{c: float("nan") for c in coef_cols}, rmse=float("nan"), n_points=len(x)
            )
        vand = np.vander(x, deg + 1)
        coef = np.linalg.pinv(vand) @ y
        resid = y - vand @ coef
        rmse = float(np.sqrt(np.mean(resid**2)))
        return head.assign(
            **{c: float(coef[i]) for i, c in enumerate(coef_cols)}, rmse=rmse, n_points=len(x)
        )

    return df.groupBy(*group_cols).applyInPandas(kernel, schema=out_schema)


# --- declarative loading (≙ calculateCalls.csv / siteCalculations.csv) -----

def parse_kwargs(raw: str | None) -> dict:
    """Parse 'a=1.5,b=foo' kwarg strings (the calculateCalls.csv kwargs cell,
    reference: qaqc/utils.py:312-324): numbers become float/int, bare words
    stay strings."""
    out: dict = {}
    if raw is None or str(raw).strip() in ("", "nan"):
        return out
    for part in str(raw).split(","):
        k, _, v = part.partition("=")
        v = v.strip()
        try:
            out[k.strip()] = int(v)
        except ValueError:
            try:
                out[k.strip()] = float(v)
            except ValueError:
                out[k.strip()] = v
    return out


def load_calc_specs_csv(spark, path: str) -> list[CalcSpec]:
    """calculateCalls.csv rows -> CalcSpec list (reference loader:
    qaqc/utils.py:327-340; '|'-separated inputs/outputs, optional kwargs).
    The config is data: changing a calculation never touches code."""
    rows = (
        spark.read.option("header", "true").csv(path).collect()
    )
    specs = []
    for r in rows:
        specs.append(
            CalcSpec(
                name=r["calculation"].strip(),
                kernel=r["function_key"].strip(),
                inputs=[x.strip() for x in (r["inputs"] or "").split("|") if x.strip()],
                outputs=[x.strip() for x in (r["returnParam"] or "").split("|") if x.strip()],
                params=parse_kwargs(r["kwargs"]),
            )
        )
    return specs


def load_site_bindings_csv(spark, path: str, during_harvest: bool | None = None) -> dict[str, list[str]]:
    """siteCalculations.csv -> {stream: [calculation, ...]} with the
    runDuringHarvest phase filter (reference: qaqc/utils.py:342-350)."""
    rows = spark.read.option("header", "true").csv(path).collect()
    out: dict[str, list[str]] = {}
    for r in rows:
        if during_harvest is not None and str(r["runDuringHarvest"]).lower() != str(during_harvest).lower():
            continue
        out[r["stream"]] = [c.strip() for c in r["calculations"].split("|") if c.strip()]
    return out


@REGISTRY.register_column("constant_flag")
def constant_flag(value: Column, *, flag: int = 1) -> Column:
    """Constant test array (reference: pco2_test_function — xr.full_like(x, 1),
    calculateFunctions.py:799-807): a placeholder QC variable shaped like its
    input, all-pass by default."""
    return F.when(value.isNotNull() | value.isNull(), F.lit(flag))
