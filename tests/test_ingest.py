"""S9/S10 ingest shims: camera-index HTML parse and HITL sheet cleanup
(reference: qaqc/visual_data.py:40-83, qaqc/notes.py:52-63)."""

from __future__ import annotations

import datetime as dt

from rca_data_tools_spark.sources.ingest import (
    ingest_camera_index,
    ingest_hitl_sheets,
    parse_camera_index,
    parse_size_mb,
)

LISTING = """
<html><body><pre>
<a href="/rawdata/CAMDSB103/">Parent Directory</a>                        -
<a href="CAMDSB103_20240105T000000.jpg">CAMDSB103_20240105T000000.jpg</a> 2024-01-05 00:01  1.2M
<a href="CAMDSB103_20240105T010000.jpg">CAMDSB103_20240105T010000.jpg</a> 2024-01-05 01:01  340K
<a href="CAMDSB103_20240105T020000.jpg">CAMDSB103_20240105T020000.jpg</a> 2024-01-05 02:01  bogus
<a href="CAMDSB103_20240105T030000.jpg">CAMDSB103_20240105T030000.jpg</a> 2024-01-05 03:01
<a href="notes.txt">notes.txt</a> 2024-01-05 04:00  1K
</pre></body></html>
"""

CAMHD_LISTING = """
<a href="/rawdata/CAMHDA301/">Parent Directory</a>  -
<a href="CAMHDA301_video.mp4">CAMHDA301_video.mp4</a> 2024-01-05 00:01  2.1G
<a href="CAMHDA301_video.mp4.md5">CAMHDA301_video.mp4.md5</a> 2024-01-05 00:01  33
<a href="CAMHDA301_still.jpg">CAMHDA301_still.jpg</a> 2024-01-05 00:02  900K
"""


def test_parse_size_mb():
    assert abs(parse_size_mb("1.2M") - 1.2e6 / 1048576) < 1e-9
    assert abs(parse_size_mb("340K") - 340e3 / 1048576) < 1e-9
    assert abs(parse_size_mb("2 MiB") - 2.0) < 1e-9
    assert abs(parse_size_mb("512") - 512 / 1048576) < 1e-12
    assert parse_size_mb("bogus") is None
    assert parse_size_mb(None) is None


def test_parse_camera_index_rows():
    rows = parse_camera_index(LISTING, "https://cam/CAMDSB103/", "2024/01/05/")
    # parent-directory anchor skipped; non-CAM href (notes.txt) never matches
    assert [r["img_name"] for r in rows] == [
        f"CAMDSB103_20240105T0{h}0000.jpg" for h in range(4)
    ]
    assert rows[0]["size"] == "1.2M"
    assert rows[3]["size"] is None  # no third token in trailing text
    assert all(r["date_taken"] == dt.datetime(2024, 1, 5) for r in rows)


def test_parse_camera_index_camhd_skips_sidecars():
    rows = parse_camera_index(CAMHD_LISTING, "https://cam/CAMHDA301/", "2024/01/05/")
    assert [r["img_name"] for r in rows] == ["CAMHDA301_still.jpg"]


def test_ingest_camera_index_statuses(spark):
    pages = spark.createDataFrame(
        [
            ("https://cam/CAMDSB103/", "2024/01/05/", LISTING),
            ("https://cam/CAMHDA301/", "2024/01/06/", CAMHD_LISTING),
        ],
        "base_url string, str_date string, html string",
    )
    out = ingest_camera_index(spark, pages, img_size_cutoff_mb=0.5).collect()
    by_name = {r["img_name"]: r for r in out}
    assert len(out) == 5
    assert by_name["CAMDSB103_20240105T000000.jpg"]["image_status"] == "not_blank"
    assert by_name["CAMDSB103_20240105T010000.jpg"]["image_status"] == "possibly_blank"
    # unparseable / absent sizes -> NaN semantics -> not_blank (reference)
    assert by_name["CAMDSB103_20240105T020000.jpg"]["image_status"] == "not_blank"
    assert by_name["CAMDSB103_20240105T020000.jpg"]["size_mb"] is None
    assert by_name["CAMHDA301_still.jpg"]["date_taken"] == dt.datetime(2024, 1, 6)
    # A1/A2 shape: group-count by (day, status) works directly on the output
    from pyspark.sql import functions as F

    counts = (
        ingest_camera_index(spark, pages, img_size_cutoff_mb=0.5)
        .groupBy(F.to_date("date_taken").alias("day"), "image_status")
        .count()
        .collect()
    )
    assert sum(r["count"] for r in counts) == 5


def test_ingest_hitl_sheets(spark):
    sheets = {
        "Stage1": [
            {"Instrument": "CTDBPN106", "Note": "ok, fine", "Unnamed: 3": "x"},
            {"Instrument": "ADCPTE101", "Note": "drift 0,5 db", "Unnamed: 3": "y"},
        ],
        "Stage2": [{"Instrument": "PHSEND102", "Note": None}],
    }
    out = ingest_hitl_sheets(spark, sheets)
    rows = {(r["sheet"], r["field"], r["record_idx"]): r["value"] for r in out.collect()}
    assert rows[("Stage1", "Note", 0)] == "ok. fine"  # comma→dot cleanup
    assert rows[("Stage1", "Note", 1)] == "drift 0.5 db"
    assert ("Stage1", "Unnamed: 3", 0) not in rows  # Unnamed columns dropped
    assert ("Stage2", "Note", 0) not in rows  # nulls dropped
    assert rows[("Stage2", "Instrument", 0)] == "PHSEND102"


def test_ingest_hitl_sheets_skips_missing_keys(spark):
    """Heterogeneous records (a key absent from some dicts) surface as pandas
    NaN after the DataFrame build — they must be skipped like None, never
    emitted as the literal string 'nan'."""
    sheets = {
        "Stage1": [
            {"Instrument": "CTDBPN106", "Note": "ok"},
            {"Instrument": "ADCPTE101"},  # no Note key -> NaN cell
        ]
    }
    out = ingest_hitl_sheets(spark, sheets)
    rows = {(r["sheet"], r["field"], r["record_idx"]): r["value"] for r in out.collect()}
    assert ("Stage1", "Note", 1) not in rows
    assert rows[("Stage1", "Note", 0)] == "ok"
    assert rows[("Stage1", "Instrument", 1)] == "ADCPTE101"


def test_status_ingest_degrades_to_empty_on_dead_endpoint(spark):
    """The S8 degrade contract (reference qaqc/dashboard.py:290-302): a dead
    status API yields an EMPTY well-typed frame, never an exception — and
    the overlay then backfills 'UNAVAILABLE' at every site."""
    from rca_data_tools_spark.sources.ingest import (
        STATUS_UNAVAILABLE,
        ingest_status_json,
        status_overlay,
    )

    # port 9 (discard) with a connect that can't succeed; must not raise
    dead = ingest_status_json(spark, "http://127.0.0.1:9/api/status", timeout=0.5)
    assert dead.columns == ["site", "status"]
    assert dead.count() == 0

    base = spark.createDataFrame([("SITE01", 1.0), ("SITE02", 2.0)], "site string, v double")
    got = {r.site: r.status for r in status_overlay(base, dead).collect()}
    assert got == {"SITE01": STATUS_UNAVAILABLE, "SITE02": STATUS_UNAVAILABLE}


def test_status_ingest_parses_live_feed_and_overlays(spark):
    """Happy path over a live localhost socket: dict-shaped JSON feed parses
    to the lookup dim; overlay hits use the feed value, misses fall back."""
    import http.server
    import json
    import threading

    from rca_data_tools_spark.sources.ingest import ingest_status_json, status_overlay

    payload = json.dumps({"SITE01": "OPERATIONAL", "SITE03": "OFFLINE"}).encode()

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/api/status"
        dim = ingest_status_json(spark, url)
        assert {(r.site, r.status) for r in dim.collect()} == {
            ("SITE01", "OPERATIONAL"),
            ("SITE03", "OFFLINE"),
        }
        base = spark.createDataFrame([("SITE01",), ("SITE02",)], "site string")
        got = {r.site: r.status for r in status_overlay(base, dim).collect()}
        assert got == {"SITE01": "OPERATIONAL", "SITE02": "UNAVAILABLE"}
    finally:
        srv.shutdown()


def test_qaqc_job_with_status_overlay(spark):
    """pipeline.run_qaqc_job(status_dim=...) carries the overlay through the
    whole job — with an empty (degraded) dim the job still completes and
    every row reads UNAVAILABLE."""
    from rca_data_tools_spark.pipeline import QAQCJobSpec, run_qaqc_job
    from rca_data_tools_spark.sources.ingest import ingest_status_json
    from tests.conftest import SF_SMOKE

    spec = QAQCJobSpec(
        site="SITE01", span="week", table="events", key_col="user_id",
        ts_col="ts", value_col="value", window_end="2024-01-20 00:00:00",
        threshold=40,
    )
    dim = spark.createDataFrame(
        [(u, 0.0, 400.0, 10.0, 300.0) for u in range(150)],
        "user_id long, fail_lo double, fail_hi double, sus_lo double, sus_hi double",
    )
    degraded = ingest_status_json(spark, "http://127.0.0.1:9/x", timeout=0.5)
    out = run_qaqc_job(spark, SF_SMOKE, spec, dim, status_dim=degraded)
    rows = out.collect()
    assert rows and all(r.status == "UNAVAILABLE" for r in rows)
