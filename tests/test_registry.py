"""Calculation-registry checks: spec compilation, kernel dispatch, and the
grouped least-squares kernel against numpy.polyfit."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rca_data_tools_spark.operators.interpolate import profile_regrid
from rca_data_tools_spark.plans.registry import REGISTRY, CalcSpec
from rca_data_tools_spark.sources.readers import load_table
from tests.conftest import SF_CORRECTNESS


def test_column_kernels_compose(spark):
    df = spark.createDataFrame([(1, 5.0), (2, None), (3, 500.0)], "id int, v double")
    specs = [
        CalcSpec("r", "range_flag", ["v"], ["rf"], {"lo": 1.0, "hi": 400.0}),
        CalcSpec("c", "linear_convert", ["v"], ["volts"], {"scale": 2.0, "offset": 1.0}),
        CalcSpec("p", "polynomial", ["volts"], ["poly"], {"coeffs": [1.0, 0.0]}),
    ]
    rows = {r.id: r for r in REGISTRY.apply(df, specs).collect()}
    assert rows[1].rf == 1 and rows[2].rf == 9 and rows[3].rf == 3
    assert rows[1].volts == 11.0 and rows[1].poly == 11.0
    assert rows[2].volts is None


def test_unknown_kernel_raises(spark):
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(KeyError, match="nope"):
        REGISTRY.apply(df, [CalcSpec("x", "nope", [], ["y"])])


def test_poly_fit_matches_numpy(spark):
    e = load_table(spark, SF_CORRECTNESS, "events").withColumn(
        "t_hours", (F.unix_millis("ts") - F.lit(1704067200000)) / 3600000.0
    )
    spec = CalcSpec("fit", "poly_fit", ["t_hours", "value"], [], {"group_cols": ["user_id"], "deg": 1})
    got = {r.user_id: r for r in REGISTRY.apply(e, [spec]).collect()}
    pdf = e.select("user_id", "t_hours", "value").toPandas()
    for uid, grp in pdf.groupby("user_id"):
        coef = np.polyfit(grp.t_hours.to_numpy(), grp.value.to_numpy(), 1)
        np.testing.assert_allclose([got[uid].coef_0, got[uid].coef_1], coef, rtol=1e-6)
        assert got[uid].n_points == len(grp)


def test_linear_fit_matches_numpy(spark):
    """The Column-only closed-form kernel agrees with numpy.polyfit on
    decimal-quantized inputs (its documented contract)."""
    e = load_table(spark, SF_CORRECTNESS, "events").withColumn(
        "t_hours",
        F.floor((F.unix_millis("ts") - F.lit(1704067200000)) / F.lit(3600.0)) / F.lit(1000.0),
    )
    spec = CalcSpec("fit", "linear_fit", ["t_hours", "value"], [], {"group_cols": ["user_id"]})
    got = {r.user_id: r for r in REGISTRY.apply(e, [spec]).collect()}
    pdf = e.select("user_id", "t_hours", "value").toPandas()
    for uid, grp in list(pdf.groupby("user_id"))[:20]:
        x, y = grp.t_hours.to_numpy(), grp.value.to_numpy()
        coef = np.polyfit(x, y, 1)
        np.testing.assert_allclose([got[uid].slope, got[uid].intercept], coef, rtol=1e-6)
        rmse = float(np.sqrt(np.mean((y - np.polyval(coef, x)) ** 2)))
        np.testing.assert_allclose(got[uid].rmse, rmse, rtol=1e-5)
        assert got[uid].n_points == len(grp)


def test_profile_regrid_matches_numpy(spark):
    e = load_table(spark, SF_CORRECTNESS, "events").filter(F.col("user_id") < 5).select(
        "user_id",
        ((F.unix_millis("ts") % 86400000) / 3600000.0).alias("hour"),
        "value",
        F.to_date("ts").alias("day"),
    )
    grid = [float(h) for h in range(24)]
    out = profile_regrid(e, ["user_id", "day"], "hour", "value", grid).toPandas()
    src = e.toPandas()
    grp = src[(src.user_id == 0)].sort_values("hour")
    day = grp.day.iloc[0]
    sel = out[(out.user_id == 0) & (out.day == day)].sort_values("hour")
    gsrc = grp[grp.day == day].sort_values("hour")
    expect = np.interp(grid, gsrc.hour.to_numpy(), gsrc.value.to_numpy(), left=np.nan, right=np.nan)
    np.testing.assert_allclose(sel.value.to_numpy(), expect, rtol=1e-9, equal_nan=True)


def test_calc_specs_load_from_csv_and_run(spark, tmp_path):
    """calculateCalls.csv-shaped config drives the registry end-to-end:
    load specs from CSV, apply to a frame, outputs appear (the declarative
    contract — config is data, not code)."""
    csv = tmp_path / "calculateCalls.csv"
    csv.write_text(
        "calculation,function_key,inputs,kwargs,returnParam\n"
        "volts,linear_convert,value,scale=0.01,volts\n"
        "range,range_flag,value,lo=1.0,flag\n"
    )
    from rca_data_tools_spark.plans.registry import REGISTRY, load_calc_specs_csv, parse_kwargs

    specs = load_calc_specs_csv(spark, str(csv))
    assert [s.name for s in specs] == ["volts", "range"]
    assert specs[0].params == {"scale": 0.01}
    assert parse_kwargs("a=2,b=1.5,c=x") == {"a": 2, "b": 1.5, "c": "x"}

    df = spark.createDataFrame([(100.0,), (None,)], "value double")
    # fill kernel-required kwargs not in the csv row
    specs[0].params.setdefault("offset", 0.0)
    specs[1].params.setdefault("hi", 400.0)
    out = REGISTRY.apply(df, specs).collect()
    by_val = {r.value: r for r in out}
    assert abs(by_val[100.0].volts - 1.0) < 1e-12
    assert by_val[None].flag == 9


def test_site_bindings_phase_filter(spark, tmp_path):
    csv = tmp_path / "siteCalculations.csv"
    csv.write_text(
        "stream,calculations,runDuringHarvest\n"
        "streamA,volts|range,True\n"
        "streamB,range,False\n"
    )
    from rca_data_tools_spark.plans.registry import load_site_bindings_csv

    assert load_site_bindings_csv(spark, str(csv)) == {
        "streamA": ["volts", "range"],
        "streamB": ["range"],
    }
    assert load_site_bindings_csv(spark, str(csv), during_harvest=True) == {
        "streamA": ["volts", "range"]
    }


def test_constant_flag_and_resolve_all(spark):
    from rca_data_tools_spark.catalog import resolve_all
    from rca_data_tools_spark.plans.registry import REGISTRY, CalcSpec

    df = spark.createDataFrame([(1.0,), (None,)], "pco2 double")
    out = REGISTRY.apply(df, [CalcSpec("t", "constant_flag", ["pco2"], ["test_var"])])
    assert [r.test_var for r in out.collect()] == [1, 1]

    d2 = spark.createDataFrame([(1.0, 2.0)], "pco2_a double, pco2_b double")
    cols = resolve_all(d2, ["pco2_a", "pco2_b", "pco2_missing"])
    assert len(cols) == 2
