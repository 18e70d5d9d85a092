"""Roundtrip tests for the distributed Zarr v2 writer: the engine's own
reader (and by construction zarr-python/xarray) must recover exactly what
was written — values, dtypes, edge-chunk truncation, CF attrs, time
pruning over the written store, and the HTTP read path."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from rca_data_tools_spark.sources.zarr import time_row_range, zarr_table
from rca_data_tools_spark.sources.zarr_sink import write_zarr_v2


def _frame(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("idx"),
        (F.col("id") * 2).alias("user_id"),
        (F.col("id").cast("double") / 4.0).alias("value"),
        F.timestamp_seconds(1700000000 + F.col("id") * 60).alias("ts"),
    )


def test_roundtrip_values_and_edge_chunk(spark, tmp_path):
    root = str(tmp_path / "w.zarr")
    n = write_zarr_v2(_frame(spark, 100), root, "idx", ["user_id", "value", "ts"], chunk_rows=16)
    assert n == 100
    # 100 rows / 16-row chunks -> 7 chunk files, last one padded internally
    names = os.listdir(os.path.join(root, "value"))
    assert ".zarray" in names
    assert sorted(f for f in names if not f.startswith(".")) == [str(i) for i in range(7)]

    got = zarr_table(spark, root, ["user_id", "value", "ts"]).orderBy("idx").collect()
    assert len(got) == 100  # edge padding is NOT visible to the reader
    np.testing.assert_array_equal([r["user_id"] for r in got], np.arange(100) * 2)
    np.testing.assert_allclose([r["value"] for r in got], np.arange(100) / 4.0)
    # timestamps stored as epoch-ns int64
    assert got[3]["ts"] == (1700000000 + 3 * 60) * 1_000_000_000


def test_written_store_prunes_by_time(spark, tmp_path):
    root = str(tmp_path / "t.zarr")
    write_zarr_v2(_frame(spark, 128), root, "idx", ["ts", "value"], chunk_rows=16)
    lo = (1700000000 + 40 * 60) * 1_000_000_000
    hi = (1700000000 + 80 * 60) * 1_000_000_000
    assert time_row_range(root, "ts", lo, hi) == (40, 80)
    rows = zarr_table(
        spark, root, ["ts", "value"], time_var="ts", time_range=(lo, hi)
    ).collect()
    assert len(rows) == 40


def test_consolidated_metadata_and_attrs(spark, tmp_path):
    root = str(tmp_path / "a.zarr")
    write_zarr_v2(
        _frame(spark, 20), root, "idx", ["value"], chunk_rows=8,
        attrs={"value": {"units": "m s-1", "scale_factor": 1.0}},
    )
    meta = json.load(open(os.path.join(root, ".zmetadata")))
    assert meta["metadata"]["value/.zarray"]["shape"] == [20]
    assert meta["metadata"]["value/.zattrs"]["units"] == "m s-1"
    assert json.load(open(os.path.join(root, ".zgroup"))) == {"zarr_format": 2}


def test_refusals(spark, tmp_path):
    root = str(tmp_path / "r.zarr")
    d = spark.createDataFrame([(0, "a"), (1, "b")], "idx long, s string")
    with pytest.raises(NotImplementedError, match="numeric/timestamp"):
        write_zarr_v2(d, root, "idx", ["s"])
    # non-dense index refuses loudly (gap at 5)
    sparse = spark.range(10).filter("id != 5").select(
        F.col("id").alias("idx"), F.col("id").cast("double").alias("v")
    )
    with pytest.raises(Exception, match="dense"):
        write_zarr_v2(sparse, str(tmp_path / "s.zarr"), "idx", ["v"], chunk_rows=4)
    # integer NULLs refuse loudly
    nulls = spark.createDataFrame([(0, 1), (1, None)], "idx long, k long")
    with pytest.raises(Exception, match="NULL"):
        write_zarr_v2(nulls, str(tmp_path / "n.zarr"), "idx", ["k"], chunk_rows=4)


def test_roundtrip_over_http(spark, tmp_path):
    from tests.test_bytes_io import _serve

    root_dir = str(tmp_path)
    write_zarr_v2(_frame(spark, 50), os.path.join(root_dir, "h.zarr"), "idx", ["value"], chunk_rows=16)
    srv, base = _serve(root_dir)
    try:
        got = [
            r["value"]
            for r in zarr_table(spark, f"{base}/h.zarr", ["value"]).orderBy("idx").collect()
        ]
        np.testing.assert_allclose(got, np.arange(50) / 4.0)
    finally:
        srv.shutdown()


def test_int64_precision_survives_roundtrip(spark, tmp_path):
    """Regression for the round-6 find: the scans used to coerce every
    numeric to float64, silently corrupting int64 payloads above 2^53
    (epoch-ns timestamps were off by hundreds of ns). Integer variables
    with no CF attrs must come back as bigint, bit-exact."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "p.zarr")
    big = 1_706_659_032_194_062_137  # NOT representable in float64
    d = spark.createDataFrame(
        [(i, big + i) for i in range(10)], "idx long, t long"
    )
    write_zarr_v2(d, root, "idx", ["t"], chunk_rows=4)
    got = zarr_table(spark, root, ["t"])
    assert dict(got.dtypes)["t"] == "bigint"
    vals = [r["t"] for r in got.orderBy("idx").collect()]
    assert vals == [big + i for i in range(10)]


def test_2d_array_column_roundtrip(spark, tmp_path):
    """array<double> columns write as (n, k) 2-D variables (one chunk across
    dim 1, '<cid>.0' keys — the layout the reader's 2-D path expects) and
    read back as array columns; ragged arrays refuse loudly."""
    root = str(tmp_path / "m.zarr")
    d = spark.range(40).select(
        F.col("id").alias("idx"),
        F.array(
            F.col("id").cast("double"),
            (F.col("id") * 2).cast("double"),
            (F.col("id") * 3).cast("double"),
        ).alias("spec"),
        F.col("id").cast("double").alias("v"),
    )
    write_zarr_v2(d, root, "idx", ["spec", "v"], chunk_rows=16)
    assert os.path.exists(os.path.join(root, "spec", "0.0"))
    got = zarr_table(spark, root, ["spec", "v"]).orderBy("idx").collect()
    assert len(got) == 40
    np.testing.assert_allclose(got[7]["spec"], [7.0, 14.0, 21.0])
    np.testing.assert_allclose(got[39]["spec"], [39.0, 78.0, 117.0])

    ragged = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0])], "idx long, a array<double>"
    )
    with pytest.raises(Exception, match="ragged"):
        write_zarr_v2(ragged, str(tmp_path / "r.zarr"), "idx", ["a"], chunk_rows=4)
