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


# ---------------------------------------------------------------- zarr v3


def test_v3_plain_roundtrip(spark, tmp_path):
    from rca_data_tools_spark.sources.zarr_sink import write_zarr_v3

    root = str(tmp_path / "v3.zarr")
    n = write_zarr_v3(
        _frame(spark, 100), root, "idx", ["user_id", "value", "ts"], chunk_rows=16
    )
    assert n == 100
    # v3 layout: array doc per var, chunks under c/<i>, group doc with
    # consolidated metadata at the root
    doc = json.load(open(os.path.join(root, "value", "zarr.json")))
    assert doc["zarr_format"] == 3 and doc["node_type"] == "array"
    assert doc["chunk_grid"]["configuration"]["chunk_shape"] == [16]
    assert [c["name"] for c in doc["codecs"]] == ["bytes", "gzip"]
    assert sorted(os.listdir(os.path.join(root, "value", "c"))) == sorted(
        str(i) for i in range(7)
    )
    group = json.load(open(os.path.join(root, "zarr.json")))
    assert "value" in group["consolidated_metadata"]["metadata"]

    got = zarr_table(spark, root, ["user_id", "value", "ts"]).orderBy("idx").collect()
    assert len(got) == 100
    np.testing.assert_array_equal([r["user_id"] for r in got], np.arange(100) * 2)
    np.testing.assert_allclose([r["value"] for r in got], np.arange(100) / 4.0)
    assert got[3]["ts"] == (1700000000 + 3 * 60) * 1_000_000_000


def test_v3_sharded_roundtrip_and_missing_inner_chunks(spark, tmp_path):
    from rca_data_tools_spark.sources.zarr_sink import write_zarr_v3

    root = str(tmp_path / "s3.zarr")
    # 77 rows, 32-row shards of 10-row inner chunks: the edge shard holds
    # rows 64..76 -> inner chunks 0 (10), 1 (3 + pad), 2/3 MISSING
    write_zarr_v3(
        _frame(spark, 77), root, "idx", ["user_id", "value"],
        chunk_rows=32, inner_rows=10,
    )
    doc = json.load(open(os.path.join(root, "value", "zarr.json")))
    assert doc["codecs"][0]["name"] == "sharding_indexed"
    conf = doc["codecs"][0]["configuration"]
    assert conf["chunk_shape"] == [10]
    assert {c["name"] for c in conf["index_codecs"]} == {"bytes", "crc32c"}

    # the edge shard's trailing index entries must be the MISSING sentinel
    raw = open(os.path.join(root, "value", "c", "2"), "rb").read()
    idx = np.frombuffer(raw[-(4 * 16 + 4):-4], dtype="<u8").reshape(4, 2)
    assert (idx[2] == 0xFFFFFFFFFFFFFFFF).all()
    assert (idx[3] == 0xFFFFFFFFFFFFFFFF).all()

    got = zarr_table(spark, root, ["user_id", "value"]).orderBy("idx").collect()
    assert len(got) == 77
    np.testing.assert_array_equal([r["user_id"] for r in got], np.arange(77) * 2)
    np.testing.assert_allclose([r["value"] for r in got], np.arange(77) / 4.0)


def test_v3_shard_index_crc_is_verified(spark, tmp_path):
    from rca_data_tools_spark.sources.zarr_sink import write_zarr_v3

    root = str(tmp_path / "c3.zarr")
    write_zarr_v3(_frame(spark, 64), root, "idx", ["value"], chunk_rows=32, inner_rows=8)
    path = os.path.join(root, "value", "c", "0")
    blob = bytearray(open(path, "rb").read())
    blob[-1] ^= 0xFF  # corrupt the index crc32c
    open(path, "wb").write(bytes(blob))
    with pytest.raises(Exception, match="crc32c"):
        zarr_table(spark, root, ["value"]).collect()


def test_v3_int64_identity_and_2d(spark, tmp_path):
    from rca_data_tools_spark.sources.zarr_sink import write_zarr_v3

    big = 9_007_199_254_740_993  # 2^53 + 1: float64 cannot hold it
    df = spark.range(40).select(
        F.col("id").alias("idx"),
        (F.col("id") + big).alias("big"),
        F.array(
            F.col("id").cast("double"), (F.col("id") * 2).cast("double")
        ).alias("vec"),
    )
    root = str(tmp_path / "i3.zarr")
    write_zarr_v3(df, root, "idx", ["big", "vec"], chunk_rows=16, inner_rows=4)
    back = zarr_table(spark, root, ["big", "vec"])
    assert dict(back.dtypes)["big"] == "bigint"
    got = back.orderBy("idx").collect()
    assert got[-1]["big"] == big + 39
    np.testing.assert_allclose(got[-1]["vec"], [39.0, 78.0])


def test_v3_refusals(spark, tmp_path):
    from rca_data_tools_spark.sources.zarr_sink import write_zarr_v3

    df = _frame(spark, 8)
    with pytest.raises(ValueError, match="inner_rows"):
        write_zarr_v3(df, str(tmp_path / "x"), "idx", ["value"], chunk_rows=8, inner_rows=9)
    strings = df.select("idx", F.lit("s").alias("s"))
    with pytest.raises(NotImplementedError, match="string"):
        write_zarr_v3(strings, str(tmp_path / "y"), "idx", ["s"])
    empty = df.filter("idx < 0")
    with pytest.raises(ValueError, match="empty"):
        write_zarr_v3(empty, str(tmp_path / "z"), "idx", ["value"])
