"""Sink-layer tests: overwrite-partition semantics, anti-entropy
reconciliation, index sink, catalog name resolution."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rca_data_tools_spark.catalog import qc_companion_columns, resolve_or_coalesce, resolve_variable
from rca_data_tools_spark.sources.sinks import (
    file_listing,
    reconcile_outputs,
    stale_outputs,
    write_index_json,
    write_partitioned,
)


def test_overwrite_partition_only_touches_written_partitions(spark, tmp_path):
    out = str(tmp_path / "part_out")
    df1 = spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)], "id int, site string, v double")
    write_partitioned(df1, out, ["site"])
    # regenerate only site=a with new data; site=b must survive
    df2 = spark.createDataFrame([(3, "a", 30.0)], "id int, site string, v double")
    write_partitioned(df2, out, ["site"])
    back = spark.read.parquet(out)
    rows = {(r.site, r.id) for r in back.collect()}
    assert rows == {("a", 3), ("b", 2)}


def test_stale_output_reconciliation(spark, tmp_path):
    out = tmp_path / "files"
    out.mkdir()
    for name in ["keep.png", "stale.png", "also_stale.svg"]:
        (out / name).write_text("x")
    produced = spark.createDataFrame([("keep.png",)], "key string")
    deleted = reconcile_outputs(spark, str(out), produced)
    assert deleted == ["also_stale.svg", "stale.png"]
    assert os.listdir(out) == ["keep.png"]


def test_file_listing_and_index_sink(spark, tmp_path):
    base = tmp_path / "plots"
    base.mkdir()
    (base / "a.png").write_text("aa")
    (base / "b.svg").write_text("b")
    (base / "c.txt").write_text("c")
    listing = file_listing(spark, str(base), extensions=(".png", ".svg"))
    assert {r.key for r in listing.collect()} == {"a.png", "b.svg"}
    idx = str(tmp_path / "index")
    write_index_json(listing.orderBy("key"), idx)
    back = spark.read.json(idx)
    assert back.count() == 2


def test_catalog_resolution(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, 1, "13")],
        "seawater_pressure double, pressure_depth double, "
        "pco2_qc_executed int, pco2_qartod_results string",
    )
    col = resolve_variable(df, ["int_ctd_pressure", "seawater_pressure", "pressure_depth"])
    assert col is not None and "seawater_pressure" in str(col)
    assert resolve_variable(df, ["nope", "nada"]) is None
    co = resolve_or_coalesce(df, ["seawater_pressure", "pressure_depth"])
    assert "coalesce" in str(co).lower()
    assert qc_companion_columns(df, "pco2") == ["pco2_qc_executed", "pco2_qartod_results"]
