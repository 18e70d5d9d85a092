"""End-to-end lifecycle test: one (site, span) QA/QC job from windowed scan
through flagging and decimation to the overwrite-partition sink, mirroring
the reference's qaqc_pipeline flow (SURVEY §3.1)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rca_data_tools_spark.pipeline import QAQCJobSpec, run_qaqc_job, span_window
from tests.conftest import SF_SMOKE


def _spec(span: str, threshold: int = 40) -> QAQCJobSpec:
    return QAQCJobSpec(
        site="SITE01",
        span=span,
        table="events",
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        window_end="2024-01-20 00:00:00",
        threshold=threshold,
    )


def _dim(spark):
    # one gross-range row per user bucket: users < 75 get a tight span
    rows = [(u, 0.0, 400.0, 10.0, 300.0) for u in range(150)]
    return spark.createDataFrame(
        rows, "user_id long, fail_lo double, fail_hi double, sus_lo double, sus_hi double"
    )


def test_span_window_resolution():
    assert span_window(_spec("week")) == ("2024-01-13 00:00:00", "2024-01-20 00:00:00")
    assert span_window(_spec("day"))[0] == "2024-01-19 00:00:00"
    lo, hi = span_window(_spec("deploy"), deploy_start="2024-01-10 00:00:00")
    assert lo == "2023-12-26 00:00:00" and hi == "2024-01-20 00:00:00"


def test_job_end_to_end_with_sink(spark, tmp_path):
    out_dir = str(tmp_path / "qaqc_out")
    spec = _spec("week")
    out = run_qaqc_job(spark, SF_SMOKE, spec, _dim(spark), out_dir=out_dir)
    rows = out.collect()
    assert rows, "job produced no rows"
    # window respected
    lo, hi = span_window(spec)
    for r in rows:
        assert lo <= r.ts.strftime("%Y-%m-%d %H:%M:%S") < hi
    # decimation bound: at most `threshold` rows per series
    per_key = {}
    for r in rows:
        per_key[r.user_id] = per_key.get(r.user_id, 0) + 1
    assert max(per_key.values()) <= spec.threshold
    # flags present and in the QARTOD alphabet
    assert {r.gross_range_flag for r in rows} <= {1, 3, 4, 9}
    # sink wrote the (site, span) partition
    assert os.path.isdir(os.path.join(out_dir, "site=SITE01", "span=week"))

    # re-running the same window must overwrite, not duplicate
    run_qaqc_job(spark, SF_SMOKE, spec, _dim(spark), out_dir=out_dir)
    written = spark.read.parquet(out_dir)
    assert written.count() == len(rows)

    # a different span lands in its own partition, leaving week intact
    run_qaqc_job(spark, SF_SMOKE, _spec("day"), _dim(spark), out_dir=out_dir)
    spans = {r.span for r in spark.read.parquet(out_dir).select("span").distinct().collect()}
    assert spans == {"week", "day"}


def test_flag_values_match_direct_computation(spark):
    spec = _spec("week", threshold=10_000)  # no decimation: compare full window
    out = run_qaqc_job(spark, SF_SMOKE, spec, _dim(spark)).select(
        "user_id", "ts", "value", "gross_range_flag"
    )
    lo, hi = span_window(spec)
    from rca_data_tools_spark.sources.readers import load_table

    e = load_table(spark, SF_SMOKE, "events", time_filters={"ts": (lo, hi)})
    expect = e.select(
        "user_id",
        "ts",
        "value",
        F.when(F.col("value").isNull(), 9)
        .when((F.col("value") < 0.0) | (F.col("value") > 400.0), 4)
        .when((F.col("value") < 10.0) | (F.col("value") > 300.0), 3)
        .otherwise(1)
        .alias("gross_range_flag"),
    )
    assert out.exceptAll(expect).count() == 0 and expect.exceptAll(out).count() == 0


def test_empty_window_yields_typed_empty_result(spark, tmp_path):
    """The 'No Data Available' path (reference: qaqc/dashboard.py:657-662,
    1427-1432): a window with no samples must produce an empty but
    correctly-typed frame — and the sink must still write the partition
    structure without error."""
    spec = QAQCJobSpec(
        site="SITE01",
        span="week",
        table="events",
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        window_end="1990-01-01 00:00:00",  # far before any data
        threshold=50,
    )
    out_dir = str(tmp_path / "empty_out")
    out = run_qaqc_job(spark, SF_SMOKE, spec, _dim(spark), out_dir=out_dir)
    assert out.count() == 0
    names = dict(out.dtypes)
    assert names["gross_range_flag"] == "int"
    assert names["rollup_flag"] == "int"
    assert names["value"] == "double"
    # decimation, flagging and the sink all tolerated the empty frame
    assert os.path.isdir(out_dir)


def test_compute_exception_routing_matches_reference_rule():
    """The routing rule of qaqc/pipeline.py:151-168: exception hit -> named
    tier, miss (site unknown, or span not listed for the site) -> default."""
    from rca_data_tools_spark.pipeline import (
        DEFAULT_COMPUTE_TIER,
        load_compute_exceptions,
        resolve_compute_tier,
    )

    exc = load_compute_exceptions(
        {"SITE01": {"year": "8vcpu_60gb", "month": "4vcpu_30gb"}}
    )
    assert resolve_compute_tier("SITE01", "year", exc) == "8vcpu_60gb"
    assert resolve_compute_tier("SITE01", "month", exc) == "4vcpu_30gb"
    assert resolve_compute_tier("SITE01", "day", exc) == DEFAULT_COMPUTE_TIER
    assert resolve_compute_tier("SITE99", "year", exc) == DEFAULT_COMPUTE_TIER
    assert resolve_compute_tier("SITE01", "year", None) == DEFAULT_COMPUTE_TIER


def test_compute_exceptions_yaml_roundtrip(tmp_path):
    from rca_data_tools_spark.pipeline import load_compute_exceptions

    p = tmp_path / "compute_exceptions.yaml"
    p.write_text('SITE01:\n  "365": "8vcpu_60gb"\n  "30": "8vcpu_60gb"\n')
    exc = load_compute_exceptions(str(p))
    assert exc == {"SITE01": {"365": "8vcpu_60gb", "30": "8vcpu_60gb"}}


def test_hinted_job_runs_with_hinted_conf(spark, tmp_path):
    """A (site, span) that hits the exception catalog must plan against the
    tier's SQLConf — and the hint must not leak into the caller's session
    or into sibling (unhinted) jobs."""
    from rca_data_tools_spark.pipeline import (
        COMPUTE_TIER_CONF,
        run_qaqc_job,
        session_for_tier,
    )

    spec = _spec("week")
    spec.compute_exceptions = {"SITE01": {"week": "8vcpu_60gb"}}
    assert spec.compute_tier == "8vcpu_60gb"

    before = spark.conf.get("spark.sql.shuffle.partitions")
    hinted = session_for_tier(spark, spec.compute_tier)
    assert hinted is not spark
    want = COMPUTE_TIER_CONF["8vcpu_60gb"]["spark.sql.shuffle.partitions"]
    assert hinted.conf.get("spark.sql.shuffle.partitions") == want
    # isolation: the caller's session conf is untouched
    assert spark.conf.get("spark.sql.shuffle.partitions") == before

    # a shuffle planned on the hinted session uses the tier's partition
    # count (AQE disabled for the probe so the static count is visible)
    probe = hinted.range(1000).withColumn("k", F.col("id") % 7)
    hinted.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        agg_plan = probe.groupBy("k").count()._jdf.queryExecution().executedPlan().toString()
    finally:
        hinted.conf.set("spark.sql.adaptive.enabled", "true")
    assert f"hashpartitioning(k#" in agg_plan and f", {want})" in agg_plan, agg_plan

    # the hinted job itself executes end-to-end
    out = run_qaqc_job(spark, SF_SMOKE, spec, _dim(spark))
    assert out.count() > 0

    # default-tier spec on the same session is untouched by the sibling hint
    plain = _spec("week")
    assert plain.compute_tier == "2vcpu_16gb"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
