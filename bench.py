#!/usr/bin/env python
"""Benchmark runner: executes the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a cheap count-style action (the driver's
correctness pass does the full collect; here we time plan+execute).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "j4_climatology_flags",
    "j5_gross_range_flags",
    "j1_asof_join",
    "qc_bitmask_decode",
    "a2_pivot_counts",
    "a3_windowed_mean",
    "w9_topk_per_group",
    "w1_lag_step_flags",
    "w4_lttb_decimation",
    "sessionize_events",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_topk_cosine",
    "ann_ivf_topk",
    "text_quality_scores",
    "text_tfidf_topk",
    "media_feature_extract",
    "q7_volume_shipping",
    "q10_returned_items",
    "q18_large_orders",
    "instr_pco2w_flags",
    "instr_optical_products",
    "hitl_latest_note",
    "pipeline_qaqc_job",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from rca_data_tools_spark.queries import QUERIES
    from rca_data_tools_spark.session import get_spark

    spark = get_spark("rca-bench")
    # Warm the JVM, the Python UDF worker pool, and the Arrow path so the
    # first timed query doesn't pay one-time process startup.
    spark.range(1).count()
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    # One non-empty partition per core so the full worker pool spawns now,
    # not inside the first timed Pandas-UDF query.
    cores = spark.sparkContext.defaultParallelism
    warm = (
        spark.range(cores * 4)
        .repartition(cores)
        .select(F.col("id").cast("double").alias("x"))
    )
    warm.mapInPandas(lambda it: it, schema="x double").count()

    # Median-of-N with recorded spread: single runs at this scale swing 30%+
    # with machine contention (BASELINE.md), so the headline number is the
    # per-query MEDIAN of n_runs and the line carries each query's min-max
    # spread so a reader can tell noise from regression.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        # One untimed warm-up execution per query: the first run pays C2/
        # whole-stage-codegen compilation of THIS query's generated classes
        # (measured 23s -> 2.7s decay on the minhash pipeline) — one-time JVM
        # cost, not plan cost, and not what the benchmark grades.
        spark.catalog.clearCache()
        QUERIES[name](spark, sf_dir).count()
        samples, n = [], 0
        for _ in range(n_runs):
            # Queries that persist intermediates (minhash) must not distort
            # the next measurement's memory budget.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            n = df.count()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 4)
        spread[name] = [round(samples[0], 4), round(samples[-1], 4)]
        print(f"# {name}: median {timings[name]:.3f}s of {samples} rows={n}", file=sys.stderr)

    # 10x scale sweep: when the gitignored scale corpus exists (rebuild with
    # tools/build_scale_corpus.py), run each headline query ONCE at sf1 so
    # scale regressions surface in the per-round bench record, not only in
    # SCALING.md. Single-run is deliberate — the JVM and worker pool are
    # warm from the sf0.1 pass, and the sf1 sweep grades growth RATIOS
    # (anything superlinear stands out far above run-to-run noise).
    scale_dir = os.environ.get(
        "SPARK_GRAFT_SCALE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scale", "sf1"),
    )
    scale_timings: dict[str, float] = {}
    if os.path.isdir(scale_dir) and os.environ.get("SPARK_GRAFT_SCALE", "1") != "0":
        for name in HEADLINE:
            if name not in QUERIES:
                continue
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = QUERIES[name](spark, scale_dir).count()
            scale_timings[name] = round(time.perf_counter() - t0, 4)
            print(f"# sf1 {name}: {scale_timings[name]:.3f}s rows={n}", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "method": f"per-query median of {n_runs} runs after one untimed warm-up, cache cleared between runs",
        "spread_min_max": spread,
    }
    if scale_timings:
        out["scale_sf"] = 1.0
        out["scale_total_sec"] = round(sum(scale_timings.values()), 4)
        out["scale_queries"] = scale_timings
        out["scale_method"] = "single run per query at the 10x corpus (.scale/sf1), warm JVM"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
