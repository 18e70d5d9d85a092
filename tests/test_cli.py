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
