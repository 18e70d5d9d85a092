"""The operational CLI surface: list / query / qaqc / index wiring."""

from __future__ import annotations

import os

from rca_data_tools_spark.__main__ import main
from tests.conftest import SF_SMOKE


def test_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "q1_pricing_summary" in out and len(out) > 100


def test_query_unknown(capsys):
    assert main(["query", "nope"]) == 2


def test_query_and_qaqc_and_index(spark, tmp_path, capsys):
    assert main(["query", "a15_percentiles", "--sf-dir", SF_SMOKE, "--limit", "3"]) == 0
    out_dir = str(tmp_path / "out")
    assert (
        main(
            ["qaqc", "--sf-dir", SF_SMOKE, "--window-end", "2024-01-20 00:00:00",
             "--threshold", "50", "--out-dir", out_dir]
        )
        == 0
    )
    assert "rows:" in capsys.readouterr().out
    assert main(["index", "--out-dir", out_dir]) == 0
    assert any("SUCCESS" in f or f.endswith(".json") for f in os.listdir(out_dir))


def test_qaqc_with_compute_exceptions_and_degraded_status(tmp_path, capsys):
    """CLI parity with the reference's launch surface: --compute-exceptions
    routes the job onto the hinted tier (printed), and --status-url with a
    dead endpoint degrades to UNAVAILABLE instead of failing the run."""
    exc = tmp_path / "compute_exceptions.yaml"
    exc.write_text('SITE01:\n  "week": "8vcpu_60gb"\n')
    assert (
        main(
            ["qaqc", "--sf-dir", SF_SMOKE, "--window-end", "2024-01-20 00:00:00",
             "--threshold", "50",
             "--compute-exceptions", str(exc),
             "--status-url", "http://127.0.0.1:9/api/status"]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "compute tier: 8vcpu_60gb" in out
    assert "rows:" in out


def test_to_zarr_then_convert_back(tmp_path, capsys):
    """CLI write-read loop: to-zarr produces a store that convert-zarr can
    round back into parquet with the same row count."""
    store = str(tmp_path / "ev.zarr")
    assert (
        main(["to-zarr", "events", store, "--sf-dir", SF_SMOKE,
              "--columns", "ts", "user_id", "value",
              "--order-by", "ts", "event_id", "--chunk-rows", "512"])
        == 0
    )
    assert "rows:" in capsys.readouterr().out
    out_pq = str(tmp_path / "back")
    assert main(["convert-zarr", store, out_pq, "--variables", "ts", "user_id", "value"]) == 0
    assert "rows:" in capsys.readouterr().out


def test_to_netcdf_then_convert_back(tmp_path, capsys):
    nc = str(tmp_path / "ev.nc")
    assert (
        main(["to-netcdf", "events", nc, "--sf-dir", SF_SMOKE,
              "--columns", "ts", "value", "--order-by", "ts", "event_id"])
        == 0
    )
    assert "rows:" in capsys.readouterr().out
    out_pq = str(tmp_path / "back")
    assert main(["convert-nc", nc, out_pq, "--variables", "ts", "value"]) == 0
    assert "rows:" in capsys.readouterr().out
