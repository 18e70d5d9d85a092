"""GOLDEN-FILE validation of the native HDF5 reader: the reference repo
ships real NetCDF-4 files written out-of-band by the actual
libnetcdf/libhdf5 stack (tests/toy_data/*.nc, read by the reference with
xarray in test_plotProfilesScatter.py). Parsing them exercises REAL
superblocks, object headers, symbol tables, B-trees, and heaps as libhdf5
lays them out — closing the spec-circularity the round-3 advisor flagged
for the hand-built fixtures. Value-level checks pin the decoded arrays to
the documented data model (1900-epoch monotonic time, dbar pressure
ranges, the QARTOD flag alphabet) and to each other (shared variables
across the two independently-written files must decode bit-identically).

Skipped cleanly when the reference checkout is absent (standalone repo)."""

from __future__ import annotations

import os

import numpy as np
import pytest

_TOY = "/root/reference/tests/toy_data"
_PARAM = os.path.join(_TOY, "PCO2WA101_paramData.nc")
_FLAG = os.path.join(_TOY, "PCO2WA101_overlayData_flag.nc")

needs_golden = pytest.mark.skipif(
    not (os.path.exists(_PARAM) and os.path.exists(_FLAG)),
    reason="reference toy_data golden files not present",
)


@needs_golden
def test_golden_metadata_parse():
    from rca_data_tools_spark.sources.hdf5 import H5File

    h5 = H5File(_PARAM)
    assert set(h5.datasets) == {"time", "pco2_seawater", "int_ctd_pressure"}
    for ds in h5.datasets.values():
        assert ds.shape == (64725,)
        assert ds.dtype == np.dtype("float64")

    h5b = H5File(_FLAG)
    assert set(h5b.datasets) == {
        "time", "pco2_seawater", "int_ctd_pressure",
        "pco2_seawater_qartod_executed_climatology_test",
        "pco2_seawater_qartod_executed_gross_range_test",
        "pco2_seawater_qartod_results",
        "pco2_seawater_qc_executed",
        "pco2_seawater_qc_results",
    }
    assert h5b.datasets["pco2_seawater_qartod_results"].dtype == np.dtype("uint8")
    assert h5b.datasets[
        "pco2_seawater_qartod_executed_gross_range_test"
    ].dtype == np.dtype("int64")


@needs_golden
def test_golden_values_fit_the_documented_model():
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    h5 = H5File(_PARAM)
    t = read_dataset(h5, "time")
    # xarray writes seconds since 1900; the deployment is mid-2010s
    assert 3.0e9 < t.min() < t.max() < 4.2e9
    assert np.all(np.diff(t) >= 0)  # monotonic per-instrument time
    p = read_dataset(h5, "int_ctd_pressure")
    assert 0.0 < np.nanmin(p) and np.nanmax(p) < 500.0  # profiler dbar range
    assert len(t) == len(p) == 64725

    h5b = H5File(_FLAG)
    flags = read_dataset(h5b, "pco2_seawater_qartod_results")
    assert set(np.unique(flags)) <= {1, 2, 3, 4, 9}  # the QARTOD alphabet
    execd = read_dataset(h5b, "pco2_seawater_qc_executed")
    assert set(np.unique(execd)) == {29}  # constant qc-executed bitmask


@needs_golden
def test_golden_cross_file_consistency():
    """The two files were written independently by the reference pipeline;
    their shared variables must decode bit-identically through the native
    parser — any structural misread would break this."""
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    a, b = H5File(_PARAM), H5File(_FLAG)
    for name in ("time", "pco2_seawater", "int_ctd_pressure"):
        assert np.array_equal(
            read_dataset(a, name), read_dataset(b, name), equal_nan=True
        ), name


@needs_golden
def test_golden_distributed_scan(spark):
    from rca_data_tools_spark.sources.netcdf import netcdf_table

    df = netcdf_table(
        spark, _FLAG,
        ["time", "pco2_seawater", "pco2_seawater_qartod_results"],
        records_per_task=20000,
    )
    from pyspark.sql import functions as F

    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("time").alias("t0"),
        F.max("time").alias("t1"),
        F.countDistinct("pco2_seawater_qartod_results").alias("nflags"),
    ).collect()[0]
    assert agg["n"] == 64725
    assert 3.0e9 < agg["t0"] < agg["t1"] < 4.2e9
    assert agg["nflags"] == 5


@needs_golden
def test_golden_qartod_flag_reproduction(spark):
    """END-TO-END QC parity with the reference pipeline's REAL output: the
    golden file stores the gross-range flags OOI's QARTOD run produced for
    this deployment. The spans are pinned by the data itself — the stored
    flags bound fail/suspect limits to fail [200, 1000] / suspect
    [205, 1000] (single flag-3 at 204.31, flag-1 range [208.11, 999.99],
    flag-4 from 1000.023 up and 196.55 down, exactly-1000 upper bound both
    spans) — and the engine's gross_range_flags must then reproduce ALL
    64,725 stored flags bit-for-bit, missing-sentinel -> 9 included. The
    stored summary column must equal the engine's rollup (row-wise max) of
    the stored gross-range and climatology tests."""
    from pyspark.sql import functions as F

    from rca_data_tools_spark.operators.flagging import gross_range_flags
    from rca_data_tools_spark.functions.qc import rollup_flags
    from rca_data_tools_spark.sources.netcdf import netcdf_table

    df = netcdf_table(
        spark, _FLAG,
        [
            "pco2_seawater",
            "pco2_seawater_qartod_executed_gross_range_test",
            "pco2_seawater_qartod_executed_climatology_test",
            "pco2_seawater_qartod_results",
        ],
        records_per_task=20000,
    ).select(
        F.when(F.col("pco2_seawater") == -9999999.0, None)
        .otherwise(F.col("pco2_seawater"))
        .alias("value"),
        F.col("pco2_seawater_qartod_executed_gross_range_test").cast("int").alias("stored_gross"),
        F.col("pco2_seawater_qartod_executed_climatology_test").cast("int").alias("stored_clim"),
        F.col("pco2_seawater_qartod_results").cast("int").alias("stored_summary"),
        F.lit("PCO2WA101").alias("site"),
    )
    dim = spark.createDataFrame(
        [("PCO2WA101", 200.0, 1000.0, 205.0, 1000.0)],
        "site string, fail_lo double, fail_hi double, sus_lo double, sus_hi double",
    )
    flagged = gross_range_flags(df, dim, "value", ["site"])
    mism = flagged.filter(F.col("gross_range_flag") != F.col("stored_gross")).count()
    assert mism == 0, f"{mism} of 64725 gross-range flags differ from the reference pipeline's"

    roll_mism = flagged.filter(
        rollup_flags(F.col("stored_gross"), F.col("stored_clim"))
        != F.col("stored_summary")
    ).count()
    assert roll_mism == 0, f"{roll_mism} summary rollups differ"


@needs_golden
def test_golden_multi_file_collection_scan(spark):
    """netcdf_dataset_table over BOTH real files as one provenance-tagged
    collection — the per-deployment directory layout, on actual libhdf5
    output."""
    from pyspark.sql import functions as F

    from rca_data_tools_spark.sources.netcdf import netcdf_dataset_table

    df = netcdf_dataset_table(
        spark, [_PARAM, _FLAG],
        ["time", "pco2_seawater", "int_ctd_pressure"],
        records_per_task=20000,
    )
    per_file = {
        r["file_id"]: r["n"]
        for r in df.groupBy("file_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_file == {0: 64725, 1: 64725}
    # the shared variables agree across provenance (checksum both sides)
    sums = (
        df.groupBy("file_id")
        .agg(F.sum(F.round("int_ctd_pressure", 6).cast("decimal(28,6)")).alias("s"))
        .collect()
    )
    assert sums[0]["s"] == sums[1]["s"]


@needs_golden
def test_golden_netcdf_to_parquet_ingest(spark, tmp_path):
    """Real-archive ingest end-to-end: the golden deployment converts to
    the engine's canonical Parquet with a proper timestamp axis (xarray's
    1900-epoch seconds), and the re-read table joins the time machinery —
    the mid-2025 deployment window must come out of the ts column."""
    from pyspark.sql import functions as F

    from rca_data_tools_spark.sources.netcdf import netcdf_to_parquet

    out = str(tmp_path / "pco2.parquet")
    df = netcdf_to_parquet(
        spark, _PARAM, ["pco2_seawater", "int_ctd_pressure"],
        out, time_var="time",
    )
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("t0"),
        F.max("ts").alias("t1"),
    ).collect()[0]
    assert agg["n"] == 64725
    assert str(agg["t0"]).startswith("2014")  # deployment-era archive start
    assert str(agg["t1"]).startswith("2025")  # through the current window
    assert df.filter(F.col("ts").isNull()).count() == 0


@needs_golden
def test_golden_time_row_range_matches_numpy():
    """The time-slice bisect must agree with numpy searchsorted over the
    REAL libhdf5-written time coordinate (64,725 rows) at a spread of
    slice positions, including out-of-range and degenerate slices."""
    import numpy as np

    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset
    from rca_data_tools_spark.sources.netcdf import h5_time_row_range

    t = read_dataset(H5File(_PARAM), "time")
    assert (np.diff(t) >= 0).all()
    qs = np.quantile(t, [0.0, 0.1, 0.25, 0.5, 0.9, 1.0])
    cases = [
        (qs[1], qs[4]), (qs[0], qs[5]), (qs[2], qs[3]),
        (t[0] - 10, t[0]), (t[-1] + 1, t[-1] + 2), (qs[3], qs[3]),
    ]
    for lo, hi in cases:
        got = h5_time_row_range(_PARAM, "time", lo, hi)
        want_lo = int(np.searchsorted(t, lo, side="left"))
        want_hi = max(want_lo, int(np.searchsorted(t, hi, side="left")))
        assert got == (want_lo, want_hi), (lo, hi, got, (want_lo, want_hi))


# --- latest-format golden (v4 chunk indexes: EA, v2 B-tree, FA, single) ----
#
# The hand-built fixtures in tests/test_hdf5_v2.py model libhdf5 1.10+'s
# chunk-index layouts from the spec alone; a real-library file closes the
# same spec-circularity the toy_data files close for the earliest format.
# Generated OUT-OF-BAND (this container has no h5py by design) with:
#     python tools/make_golden_latest_format.py tests/golden/latest_format.h5
# and skipped cleanly until that file is dropped in.

_LATEST = os.path.join(os.path.dirname(__file__), "golden", "latest_format.h5")

needs_latest = pytest.mark.skipif(
    not os.path.exists(_LATEST),
    reason="latest-format golden file not present "
    "(generate with tools/make_golden_latest_format.py where h5py exists)",
)


@needs_latest
def test_golden_latest_format_chunk_indexes():
    """Every v4 chunk-index kind as REAL libhdf5 wrote it: the Extensible
    Array (1 unlimited dim), the v2 B-tree (2 unlimited dims), the Fixed
    Array, and the Single Chunk index all decode to the generator's
    deterministic patterns bit-for-bit."""
    from rca_data_tools_spark.sources.hdf5 import H5File, read_dataset

    h5 = H5File(_LATEST)
    np.testing.assert_array_equal(
        read_dataset(h5, "ea"), np.arange(1000, dtype="<f8") * 0.5
    )
    np.testing.assert_array_equal(
        read_dataset(h5, "btree2"),
        np.arange(300, dtype="<i4").reshape(30, 10),
    )
    np.testing.assert_array_equal(
        read_dataset(h5, "fa"), np.arange(500, dtype="<f8") ** 2
    )
    np.testing.assert_array_equal(
        read_dataset(h5, "single"), np.arange(32, dtype="<i8")
    )
