"""Roundtrip tests for the distributed HDF5 writer: the engine's own
native HDF5 parser (golden-verified against real libhdf5 files) must
recover values, dtypes, symbol-table structure, and scalar attributes
exactly; the distributed scan face (netcdf_table) routes by signature;
refusals are loud."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset
from rca_data_tools_spark.sources.hdf5_sink import write_hdf5
from rca_data_tools_spark.sources.netcdf import netcdf_table


def _frame(spark, n=1000):
    return spark.range(n).select(
        F.col("id").alias("idx"),
        (F.col("id").cast("double") / 8.0).alias("value"),
        (F.col("id") % 7).cast("int").alias("code"),
        (F.col("id") + 9_007_199_254_740_993).alias("big"),  # > 2^53
        F.timestamp_seconds(1700000000 + F.col("id") * 30).alias("ts"),
    )


def test_roundtrip_values_dtypes_and_slabs(spark, tmp_path):
    p = str(tmp_path / "w.h5")
    n = write_hdf5(
        _frame(spark, 1000), p, "idx", ["value", "code", "big", "ts"],
        rows_per_task=128,  # 8 parallel slab tasks
    )
    assert n == 1000
    with open(p, "rb") as f:
        assert f.read(8) == b"\x89HDF\r\n\x1a\n"
    h5 = H5File(p)
    assert sorted(h5.datasets) == ["big", "code", "ts", "value"]
    v = read_dataset(h5, "value")
    assert v.dtype == np.dtype("<f8")
    np.testing.assert_allclose(v, np.arange(1000) / 8.0)
    c = read_dataset(h5, "code")
    assert c.dtype == np.dtype("<i4")
    np.testing.assert_array_equal(c, np.arange(1000) % 7)
    b = read_dataset(h5, "big")
    assert b.dtype == np.dtype("<i8")
    assert b[-1] == 9_007_199_254_740_993 + 999  # int64 identity above 2^53
    t = read_dataset(h5, "ts")
    assert t[3] == (1700000000 + 3 * 30) * 1_000_000_000  # epoch-ns


def test_distributed_scan_routes_by_signature(spark, tmp_path):
    p = str(tmp_path / "scan.h5")
    write_hdf5(_frame(spark, 500), p, "idx", ["value", "ts"], rows_per_task=200)
    df = netcdf_table(spark, p, ["value", "ts"])
    got = df.orderBy("idx").collect()
    assert len(got) == 500
    np.testing.assert_allclose([r["value"] for r in got], np.arange(500) / 8.0)


def test_scalar_attrs_roundtrip(spark, tmp_path):
    p = str(tmp_path / "a.h5")
    write_hdf5(
        _frame(spark, 64), p, "idx", ["value"],
        attrs={"value": {"scale_factor": 0.5, "add_offset": 2.0}},
    )
    h5 = H5File(p)
    assert h5.datasets["value"].attrs == {"scale_factor": 0.5, "add_offset": 2.0}


def test_many_columns_span_multiple_snods(spark, tmp_path):
    # 11 columns > the 8-entry SNOD capacity -> 2 symbol nodes under the
    # root B-tree; every name must still resolve
    cols = [f"c{i:02d}" for i in range(11)]
    df = spark.range(100).select(
        F.col("id").alias("idx"),
        *[(F.col("id") * (i + 1)).cast("double").alias(c) for i, c in enumerate(cols)],
    )
    p = str(tmp_path / "m.h5")
    write_hdf5(df, p, "idx", cols)
    h5 = H5File(p)
    assert sorted(h5.datasets) == cols
    for i, c in enumerate(cols):
        np.testing.assert_allclose(read_dataset(h5, c), np.arange(100) * (i + 1))


def test_refusals(spark, tmp_path):
    df = _frame(spark, 8)
    strings = df.select("idx", F.lit("s").alias("s"))
    with pytest.raises(NotImplementedError, match="numeric"):
        write_hdf5(strings, str(tmp_path / "x.h5"), "idx", ["s"])
    with pytest.raises(ValueError, match="empty"):
        write_hdf5(df.filter("idx < 0"), str(tmp_path / "y.h5"), "idx", ["value"])
    with pytest.raises(ValueError, match="not in DataFrame"):
        write_hdf5(df, str(tmp_path / "z.h5"), "idx", ["nope"])
    # NULL in an integer column refuses loudly
    nulled = df.select(
        "idx", F.when(F.col("idx") == 3, None).otherwise(F.col("code")).alias("code")
    )
    with pytest.raises(Exception, match="NULL"):
        write_hdf5(nulled, str(tmp_path / "n.h5"), "idx", ["code"])
