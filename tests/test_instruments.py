"""Golden-value tests for the concrete instrument flaggers (semantics pinned
against hand-computed expectations from the reference's mask definitions,
advanced_qaqc/calculateFunctions.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rca_data_tools_spark.functions.instruments import (
    flor_advanced_flags,
    opt_internal_temp,
    ph_advanced_flags,
    velpt_advanced_flags,
)


def test_velpt_flag_positions(spark):
    # pitch 25 -> suspect only; roll 35 -> suspect+failed; sound 1500 ok; pressure -1 fail
    df = spark.createDataFrame(
        [(25.0, 35.0, 1500.0, -1.0), (0.0, 0.0, 1200.0, 5.0)],
        "pitch double, roll double, ss double, press double",
    )
    out = df.select(
        velpt_advanced_flags(F.col("pitch"), F.col("roll"), F.col("ss"), F.col("press")).alias("f")
    ).collect()
    assert out[0].f == "313313"
    assert out[1].f == "111131"


def test_flor_cdom_optional(spark):
    df = spark.createDataFrame([(100.0, 5000.0)], "beta double, chl double")
    two = df.select(flor_advanced_flags(F.col("beta"), F.col("chl")).alias("f")).first().f
    three = df.select(
        flor_advanced_flags(F.col("beta"), F.col("chl"), F.lit(0.0)).alias("f")
    ).first().f
    assert two == "13"  # chl over max fails
    assert three == "133"  # cdom == 0 fails


def test_null_measurement_passes(spark):
    # NaN comparisons are False in the reference -> NULL passes here
    df = spark.createDataFrame([(None, 100.0, 1500.0, 5.0)], "pitch double, roll double, ss double, press double")
    f = df.select(
        velpt_advanced_flags(F.col("pitch"), F.col("roll"), F.col("ss"), F.col("press")).alias("f")
    ).first().f
    assert f == "113311"


def test_ph_flags_flat_matrix(spark):
    # constant light matrix -> std 0 -> flat tests fail, erratic passes;
    # value 2000 is within all span limits
    light = [2000] * 92
    refl = [2000] * 16
    df = spark.createDataFrame([(light, refl)], "light array<int>, refl array<int>")
    f = df.select(ph_advanced_flags(F.col("light"), F.col("refl")).alias("f")).first().f
    assert f == "131113"


def test_opt_internal_temp_known_point(spark):
    # traw at half scale: volts=2.5, res=10000*2.5/2.016; check against a
    # python evaluation of the same formula
    import math

    traw = 65535.0 / 2
    volts = 5.0 * traw / 65535.0
    res = 10000.0 * volts / (4.516 - volts)
    lr = math.log(res)
    expected = 1.0 / (0.00093135 + 0.000221631 * lr + 0.000000125741 * lr**3) - 273.15
    df = spark.createDataFrame([(traw,)], "traw double")
    got = df.select(opt_internal_temp(F.col("traw")).alias("t")).first().t
    assert abs(got - expected) < 1e-9
