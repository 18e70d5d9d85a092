"""Per-(site, span) QA/QC job lifecycle — the engine's equivalent of the
reference's main entry point.

Reference lifecycle (SURVEY §3.1; rca_data_tools/qaqc/pipeline.py:36-170,
plots.py:113-435): resolve the site row from the config catalog, validate the
span, compute the time window (fixed spans 1/7/30/365 days or ±15 d around
the latest deployment — constants.py:26-32, dashboard.py:559-573), then scan
-> prune -> decode QC -> flag -> decimate -> render/sink, with an
anti-entropy pass deleting stale outputs.

Here the same lifecycle is one declarative plan per job: the window lands on
the scan as a pushed filter (partition pruning on a date-partitioned layout),
config rows become broadcast dims, and the sink is a dynamic
overwrite-partition write keyed by (site, span) — the at-scale form of
"regenerate this window's outputs". Prefect/ECS fan-out (pipeline.py:137-192)
maps to submitting one job per (site, span); inside a Spark app they are just
independent plans that can run concurrently on the same session.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rca_data_tools_spark.operators.decimate import lttb
from rca_data_tools_spark.operators.flagging import gross_range_flags
from rca_data_tools_spark.functions.qc import rollup_flags
from rca_data_tools_spark.sources.readers import load_table
from rca_data_tools_spark.sources.sinks import write_partitioned

# Reference span set (qaqc/constants.py:26-32): plot-window length in days;
# "deploy" is ±15 days around the most recent deployment start.
SPAN_DAYS = {"day": 1, "week": 7, "month": 30, "year": 365}
DEPLOY_HALF_WINDOW_DAYS = 15
# Reference decimation default (qaqc/pipeline.py:41): points per series
# above which LTTB kicks in.
DEFAULT_THRESHOLD = 5_000_000

# --- per-(site, span) resource-hint catalog -------------------------------
#
# The reference routes known-heavy (site, span) jobs to bigger ECS task
# definitions: COMPUTE_EXCEPTIONS (qaqc/constants.py:126, loaded from
# params/compute_exceptions.yaml, schema `{site: {span: tier_name}}` with
# span keys as strings of days, e.g. "365") is consulted at launch
# (qaqc/pipeline.py:151-168) and picks a Prefect deployment named after an
# ECS cpu/memory tier (prefect.yaml:18-113: 2vcpu_16gb default, 4vcpu_30gb,
# 8vcpu_60gb, 16vcpu_80gb...16vcpu_104gb). The Spark analog of "run this
# job on a bigger task" is a per-job SQLConf: shuffle-partition count and
# scan-split size scale with the tier's cpu, the broadcast budget with its
# memory. `spark.newSession()` gives an isolated SQLConf over the shared
# SparkContext, so a hinted job's conf never leaks into sibling jobs.

COMPUTE_TIER_CONF: dict[str, dict[str, str]] = {
    # tier name (reference prefect.yaml work-pool deployments) -> SQLConf.
    # shuffle partitions ~ 8x tier vcpus (2-4 waves on a task of that
    # size); maxPartitionBytes grows with memory so scans make fewer,
    # larger splits when there is RAM to hold them; the broadcast
    # threshold grows with executor memory.
    "2vcpu_16gb": {
        "spark.sql.shuffle.partitions": "16",
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.sql.autoBroadcastJoinThreshold": "10485760",
    },
    "4vcpu_30gb": {
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.sql.autoBroadcastJoinThreshold": "20971520",
    },
    "8vcpu_60gb": {
        "spark.sql.shuffle.partitions": "64",
        "spark.sql.files.maxPartitionBytes": "268435456",
        "spark.sql.autoBroadcastJoinThreshold": "41943040",
    },
    "16vcpu_104gb": {
        "spark.sql.shuffle.partitions": "128",
        "spark.sql.files.maxPartitionBytes": "268435456",
        "spark.sql.autoBroadcastJoinThreshold": "67108864",
    },
}
DEFAULT_COMPUTE_TIER = "2vcpu_16gb"


def load_compute_exceptions(src) -> dict[str, dict[str, str]]:
    """Load a `{site: {span: tier}}` exception catalog. ``src`` is a dict
    (already parsed), or a path to a YAML/JSON file matching the
    reference's params/compute_exceptions.yaml schema. Span keys are kept
    as strings (the reference uses day-count strings; this engine also
    accepts its named spans)."""
    if isinstance(src, dict):
        return {s: {str(k): v for k, v in spans.items()} for s, spans in src.items()}
    text = open(src).read()
    try:
        import yaml

        parsed = yaml.safe_load(text)
    except ImportError:  # pragma: no cover - yaml ships with this env
        import json

        parsed = json.loads(text)
    return load_compute_exceptions(parsed or {})


def resolve_compute_tier(
    site: str, span: str, exceptions: dict[str, dict[str, str]] | None
) -> str:
    """The reference's routing rule verbatim (qaqc/pipeline.py:151-168):
    exception hit -> that tier's deployment, miss -> the 2vcpu_16gb
    default."""
    if exceptions and site in exceptions and str(span) in exceptions[site]:
        return exceptions[site][str(span)]
    return DEFAULT_COMPUTE_TIER


def session_for_tier(spark: SparkSession, tier: str) -> SparkSession:
    """Return a session whose SQLConf carries the tier's hints. The default
    tier reuses the caller's session untouched; a hinted tier gets
    `spark.newSession()` — same SparkContext (no new JVM/executors, the
    local analog of 'same cluster, bigger task definition'), isolated conf."""
    if tier == DEFAULT_COMPUTE_TIER:
        return spark
    conf = COMPUTE_TIER_CONF.get(tier)
    if conf is None:
        raise ValueError(
            f"unknown compute tier {tier!r}; known: {sorted(COMPUTE_TIER_CONF)}"
        )
    hinted = spark.newSession()
    for k, v in conf.items():
        hinted.conf.set(k, v)
    return hinted


@dataclass
class QAQCJobSpec:
    """One (site, span) job — the engine's `flow_parameters`
    (reference: qaqc/pipeline.py:119-134)."""

    site: str  # instrument / series identity, e.g. a refDes
    span: str  # 'day' | 'week' | 'month' | 'year' | 'deploy'
    table: str  # fact table name in the sf_dir
    key_col: str  # series key column (site at scale; user_id in the corpus)
    ts_col: str
    value_col: str
    window_end: str  # anchor timestamp "YYYY-MM-DD HH:MM:SS" (now() in prod)
    threshold: int = DEFAULT_THRESHOLD
    extra_cols: list[str] = field(default_factory=list)
    # Per-(site, span) resource hints — the reference's COMPUTE_EXCEPTIONS
    # catalog (params/compute_exceptions.yaml, schema {site: {span: tier}};
    # routing rule qaqc/pipeline.py:151-168). None = every job on the
    # default tier. Known tiers mirror prefect.yaml's ECS deployments and
    # map to SQLConf in COMPUTE_TIER_CONF.
    compute_exceptions: dict[str, dict[str, str]] | None = None

    @property
    def compute_tier(self) -> str:
        return resolve_compute_tier(self.site, self.span, self.compute_exceptions)


def span_window(spec: QAQCJobSpec, deploy_start: str | None = None) -> tuple[str, str]:
    """Resolve the job's [start, end) window. Fixed spans count back from the
    anchor; 'deploy' brackets the latest deployment start ±15 d
    (reference: qaqc/dashboard.py:559-573)."""
    import datetime as dt

    end = dt.datetime.fromisoformat(spec.window_end)
    if spec.span == "deploy":
        if deploy_start is None:
            raise ValueError("deploy span needs the latest deployment start")
        anchor = dt.datetime.fromisoformat(deploy_start)
        lo = anchor - dt.timedelta(days=DEPLOY_HALF_WINDOW_DAYS)
        hi = min(anchor + dt.timedelta(days=DEPLOY_HALF_WINDOW_DAYS), end)
    else:
        days = SPAN_DAYS[spec.span]
        lo, hi = end - dt.timedelta(days=days), end
    fmt = "%Y-%m-%d %H:%M:%S"
    return lo.strftime(fmt), hi.strftime(fmt)


def latest_deploy_start(deployments: DataFrame, site: str) -> str | None:
    """Most recent deployment start for a site (reference: desc-sorted
    history, top-1 — qaqc/dashboard.py:242-246,563)."""
    row = (
        deployments.filter(F.col("site") == site)
        .orderBy(F.col("start").desc())
        .limit(1)
        .collect()
    )
    return None if not row else row[0]["start"].strftime("%Y-%m-%d %H:%M:%S")


def run_qaqc_job(
    spark: SparkSession,
    sf_dir: str,
    spec: QAQCJobSpec,
    gross_range_dim: DataFrame,
    out_dir: str | None = None,
    deploy_start: str | None = None,
    status_dim: DataFrame | None = None,
) -> DataFrame:
    """Execute one job: windowed scan (pushed-down bounds) -> gross-range
    flags (broadcast dim) -> summary rollup -> LTTB decimation -> optional
    partitioned sink.

    Returns the decimated, flagged frame; when ``out_dir`` is given it is
    also written with dynamic partition overwrite under (site, span), so
    re-running a window replaces exactly that window's output — the
    reference's regenerate-and-delete-stale contract (qaqc/plots.py:467-511)
    without an explicit delete pass.

    When the spec carries a compute-exception catalog and this (site, span)
    hits it, the whole job plans against a tier-hinted `spark.newSession()`
    — the reference's route-to-a-bigger-ECS-task move, expressed as per-job
    SQLConf over the shared SparkContext."""
    spark = session_for_tier(spark, spec.compute_tier)
    lo, hi = span_window(spec, deploy_start)
    facts = load_table(
        spark, sf_dir, spec.table,
        time_filters={spec.ts_col: (lo, hi)},
        partition_time_col=spec.ts_col,
    )
    facts = facts.select(spec.key_col, spec.ts_col, spec.value_col, *spec.extra_cols)

    flagged = gross_range_flags(
        facts, gross_range_dim, value_col=spec.value_col, join_keys=[spec.key_col]
    )
    flagged = flagged.withColumn("rollup_flag", rollup_flags(F.col("gross_range_flag")))

    decimated = lttb(
        flagged,
        key_cols=[spec.key_col],
        ts_col=spec.ts_col,
        value_col=spec.value_col,
        threshold=spec.threshold,
    )

    out = decimated.withColumn("site", F.lit(spec.site)).withColumn("span", F.lit(spec.span))
    if status_dim is not None:
        # operational-status overlay (S8): broadcast left join; an empty dim
        # (the degrade-to-empty contract of sources/ingest.ingest_status_json)
        # or a miss yields 'UNAVAILABLE', never a failure.
        from rca_data_tools_spark.sources.ingest import status_overlay

        out = status_overlay(out, status_dim)
    if out_dir is not None:
        write_partitioned(out, out_dir, ["site", "span"])
    return out


def run_site_spans(
    spark: SparkSession,
    sf_dir: str,
    specs: list[QAQCJobSpec],
    gross_range_dim: DataFrame,
    out_dir: str | None = None,
) -> dict[str, DataFrame]:
    """The fan-out loop (reference: one Prefect flow-run per site x span,
    qaqc/pipeline.py:172-192, staggered 10 s for ECS; here each job is an
    independent lazy plan — submit them on one session and the scheduler
    interleaves stages, no stagger needed)."""
    return {
        f"{s.site}/{s.span}": run_qaqc_job(spark, sf_dir, s, gross_range_dim, out_dir)
        for s in specs
    }
