"""Roundtrip tests for the distributed classic-NetCDF writer: the engine's
own CDF reader must recover values, dtypes, and CF attrs exactly; CDF-5 is
chosen automatically when int64 forces it; refusals are loud."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from rca_data_tools_spark.sources.netcdf import netcdf_table, read_header
from rca_data_tools_spark.sources.netcdf_sink import write_cdf


def _frame(spark, n=1000):
    return spark.range(n).select(
        F.col("id").alias("idx"),
        (F.col("id").cast("double") / 8.0).alias("value"),
        (F.col("id") % 7).cast("int").alias("code"),
        F.timestamp_seconds(1700000000 + F.col("id") * 30).alias("ts"),
    )


def test_cdf5_roundtrip_with_int64(spark, tmp_path):
    p = str(tmp_path / "w5.nc")
    n = write_cdf(_frame(spark, 1000), p, "idx", ["value", "code", "ts"], rows_per_task=128)
    assert n == 1000
    with open(p, "rb") as f:
        assert f.read(4) == b"CDF\x05"  # ts int64 forces CDF-5
    hdr = read_header(p)
    assert hdr["dims"] == [("row", 1000)]
    assert set(hdr["variables"]) == {"value", "code", "ts"}

    got = netcdf_table(spark, p, ["value", "code", "ts"]).orderBy("idx").collect()
    assert len(got) == 1000
    np.testing.assert_allclose([r["value"] for r in got], np.arange(1000) / 8.0)
    assert [r["code"] for r in got][:8] == [0, 1, 2, 3, 4, 5, 6, 0]
    # epoch-ns int64 exact (bigint column after the round-6 precision fix)
    assert got[13]["ts"] == (1700000000 + 13 * 30) * 1_000_000_000


def test_cdf2_when_no_int64(spark, tmp_path):
    p = str(tmp_path / "w2.nc")
    d = spark.range(100).select(
        F.col("id").alias("idx"),
        F.col("id").cast("double").alias("v"),
        (F.col("id") * 3).cast("int").alias("k"),
    )
    write_cdf(d, p, "idx", ["v", "k"], rows_per_task=32)
    with open(p, "rb") as f:
        assert f.read(4) == b"CDF\x02"
    got = netcdf_table(spark, p, ["v", "k"]).orderBy("idx").collect()
    np.testing.assert_allclose([r["v"] for r in got], np.arange(100.0))
    assert [r["k"] for r in got] == [i * 3 for i in range(100)]


def test_cf_attrs_roundtrip_through_packing(spark, tmp_path):
    """Declared scale/offset attrs written by the sink drive the reader's
    CF unpacking: store packed int16, read back physical floats."""
    p = str(tmp_path / "packed.nc")
    d = spark.range(50).select(
        F.col("id").alias("idx"), (F.col("id") * 10).cast("smallint").alias("t_packed")
    )
    write_cdf(
        d, p, "idx", ["t_packed"],
        attrs={"t_packed": {"scale_factor": 0.5, "add_offset": 100.0}},
    )
    got = netcdf_table(spark, p, ["t_packed"]).orderBy("idx").collect()
    assert got[0]["t_packed"] == pytest.approx(100.0)
    assert got[7]["t_packed"] == pytest.approx(7 * 10 * 0.5 + 100.0)


def test_refusals(spark, tmp_path):
    d = spark.createDataFrame([(0, "x")], "idx long, s string")
    with pytest.raises(NotImplementedError, match="numeric/timestamp"):
        write_cdf(d, str(tmp_path / "s.nc"), "idx", ["s"])
    sparse = spark.range(10).filter("id != 3").select(
        F.col("id").alias("idx"), F.col("id").cast("double").alias("v")
    )
    with pytest.raises(Exception, match="dense"):
        write_cdf(sparse, str(tmp_path / "g.nc"), "idx", ["v"], rows_per_task=4)


def test_roundtrip_over_http(spark, tmp_path):
    from tests.test_bytes_io import _serve

    p = str(tmp_path / "h.nc")
    write_cdf(_frame(spark, 200), p, "idx", ["value"], rows_per_task=64)
    srv, base = _serve(str(tmp_path))
    try:
        got = [
            r["value"]
            for r in netcdf_table(spark, f"{base}/h.nc", ["value"]).orderBy("idx").collect()
        ]
        np.testing.assert_allclose(got, np.arange(200) / 8.0)
    finally:
        srv.shutdown()
