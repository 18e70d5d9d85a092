"""Physical-plan assertions: the scale claims (pushdown, pruning, broadcast,
no accidental cartesian products) verified against the optimizer's output,
not just asserted in comments."""

from __future__ import annotations

import re

import pytest

from rca_data_tools_spark.queries import QUERIES
from tests.conftest import SF_CORRECTNESS


def plan_of(spark, name: str) -> str:
    # Cold plans only: queries with persisted fragments (e.g. the MinHash
    # pipeline) otherwise plan against InMemoryTableScan when an earlier test
    # already ran them, shifting Exchange counts run-order-dependently.
    # The dedup pair-list size guard is pinned to 'force' (broadcast, no
    # count job) so plan construction stays action-free — an executed count
    # materializes caches and the formatted explain then double-prints the
    # cache-build exchanges (AQE Initial+Final), corrupting the budget
    # counts. The guard's shuffle fallback has its own equivalence test
    # (tests/test_dedup.py::test_verify_shuffle_fallback_matches_broadcast).
    from rca_data_tools_spark.operators.dedup import PAIR_LIMIT_CONF

    spark.catalog.clearCache()
    prev = spark.conf.get(PAIR_LIMIT_CONF, "")
    spark.conf.set(PAIR_LIMIT_CONF, "force")
    try:
        df = QUERIES[name](spark, SF_CORRECTNESS)
        return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    finally:
        if prev:
            spark.conf.set(PAIR_LIMIT_CONF, prev)
        else:
            spark.conf.unset(PAIR_LIMIT_CONF)


def test_time_filter_pushed_down(spark):
    plan = plan_of(spark, "p2_time_slice")
    assert "PushedFilters" in plan
    assert re.search(r"PushedFilters:.*GreaterThanOrEqual\(ts", plan), plan


def test_column_pruning_reaches_scan(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = m.group(1)
    # Only the 7 needed lineitem columns, not all 11.
    assert "l_orderkey" not in cols and "l_partkey" not in cols
    assert "l_quantity" in cols and "l_shipdate" in cols


def test_star_join_broadcasts_dims(spark):
    plan = plan_of(spark, "q5_nation_revenue")
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "CartesianProduct" not in plan


def test_flagging_is_broadcast_no_shuffle_before_agg(spark):
    plan = plan_of(spark, "j5_gross_range_flags")
    assert "BroadcastHashJoin" in plan
    # exactly one exchange: the final partial->final aggregation
    # (formatted mode prints one "(n) Exchange" detail header per exchange)
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan


def test_climatology_join_broadcast(spark):
    plan = plan_of(spark, "j4_climatology_flags")
    assert "BroadcastHashJoin" in plan, plan


def test_asof_join_single_shuffle_no_nested_loop(spark):
    plan = plan_of(spark, "j1_asof_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_whole_stage_codegen_covers_flagging(spark):
    df = QUERIES["j5_gross_range_flags"](spark, SF_CORRECTNESS)
    codegen = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "codegen")
    assert "WholeStageCodegen" in codegen


def test_minhash_no_cartesian(spark):
    plan = plan_of(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("name", ["ann_topk_cosine", "ann_threshold_neighbors"])
def test_ann_broadcasts_queries(spark, name):
    plan = plan_of(spark, name)
    # the intended cross product is broadcast-nested-loop with the tiny
    # query side broadcast, never a shuffled cartesian
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_no_cartesian_product_anywhere(spark):
    """Sweep every registered query's physical plan: a CartesianProduct in
    any of them is an accidental unkeyed join — the kind of plan that dies at
    scale. (Intended cross products compile to BroadcastNestedLoopJoin with
    the tiny side broadcast, which is allowed.)"""
    offenders = []
    for name, fn in sorted(QUERIES.items()):
        try:
            plan = plan_of(spark, name)
        except Exception as ex:  # a query that cannot even plan is a failure
            offenders.append((name, f"plan error: {ex}"))
            continue
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
    assert not offenders, offenders


def test_no_row_at_a_time_python_udf_anywhere(spark):
    """Sweep every registered query's physical plan for BatchEvalPython — the
    row-at-a-time (pickle-per-row) Python UDF path, 10-100x slower than
    Arrow. Python is allowed only through the vectorized operators
    (ArrowEvalPython, MapInPandas, FlatMapGroupsInPandas)."""
    offenders = []
    for name, fn in sorted(QUERIES.items()):
        plan = plan_of(spark, name)
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert not offenders, offenders


def test_asof_directions_no_nested_loop(spark):
    for name in ("j1_asof_forward", "j1_asof_nearest"):
        plan = plan_of(spark, name)
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_exact_dedup_single_exchange(spark):
    """Exact dedup's only exchange is the fingerprint groupBy — the
    shuffle-32-byte-hashes-not-documents claim, plan-verified."""
    plan = plan_of(spark, "dedup_exact")
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges <= 2, plan  # fingerprint agg (+ optional repartition)


def test_contamination_join_is_equi_shaped(spark):
    plan = plan_of(spark, "text_contamination")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_partitioned_layout_prunes_partitions(spark, tmp_path):
    """The at-scale layout claim, plan-verified: on <table>/date=YYYY-MM-DD/
    directories a ts window derives a date partition predicate, so the scan
    shows PartitionFilters and reads only the window's directories."""
    from pyspark.sql import functions as F

    from rca_data_tools_spark.sources.readers import load_table

    src = load_table(spark, SF_CORRECTNESS, "events").select("user_id", "ts", "value")
    sf_dir = tmp_path / "sf"
    (
        src.withColumn("date", F.to_date("ts"))
        .write.partitionBy("date")
        .parquet(str(sf_dir / "events"))
    )
    lo, hi = "2024-01-03 00:00:00", "2024-01-05 00:00:00"
    df = load_table(spark, str(sf_dir), "events", time_filters={"ts": (lo, hi)})
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "date" in m.group(1), plan
    # correctness: identical rows to filtering the unpartitioned table
    expect = src.filter(
        (F.col("ts") >= F.lit(lo).cast("timestamp")) & (F.col("ts") < F.lit(hi).cast("timestamp"))
    ).count()
    assert df.count() == expect
    # pruning actually happened: scanned files live only under the window's dates
    files = [r[0] for r in df.select(F.input_file_name()).distinct().collect()]
    assert files and all(("date=2024-01-03" in f) or ("date=2024-01-04" in f) for f in files), files


def test_partition_predicate_only_from_contract_column(spark, tmp_path):
    """A time filter on a column OTHER than the layout's partition time column
    must NOT derive a date partition predicate — on a table partitioned by
    observation time, filtering on e.g. an ingest-time column would otherwise
    silently over-prune partitions and drop rows."""
    from pyspark.sql import functions as F

    from rca_data_tools_spark.sources.readers import load_table

    src = (
        load_table(spark, SF_CORRECTNESS, "events")
        .select("user_id", "ts", "value")
        # second timestamp column deliberately offset from the partition time
        .withColumn("ingest_ts", F.col("ts") + F.expr("INTERVAL 10 DAYS"))
    )
    sf_dir = tmp_path / "sf"
    (
        src.withColumn("date", F.to_date("ts"))
        .write.partitionBy("date")
        .parquet(str(sf_dir / "events"))
    )
    lo, hi = "2024-01-13 00:00:00", "2024-01-15 00:00:00"
    df = load_table(spark, str(sf_dir), "events", time_filters={"ingest_ts": (lo, hi)})
    expect = src.filter(
        (F.col("ingest_ts") >= F.lit(lo).cast("timestamp"))
        & (F.col("ingest_ts") < F.lit(hi).cast("timestamp"))
    ).count()
    assert expect > 0
    assert df.count() == expect  # would drop every row if date were derived
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert not (m and "date" in m.group(1)), plan


# Shuffle budget per headline query, measured from the current (audited)
# plans. These are CEILINGS, not snapshots: a future edit that introduces an
# extra Exchange in a headline plan fails here before it ships — the
# structural version of a perf-regression gate (at 100 TB an extra fact-table
# shuffle dwarfs any constant-factor change).
EXCHANGE_BUDGET = {
    "q1_pricing_summary": 1,
    "q3_shipping_priority": 1,
    "q5_nation_revenue": 1,
    "j4_climatology_flags": 2,
    "j5_gross_range_flags": 1,
    "j1_asof_join": 2,
    "qc_bitmask_decode": 1,
    "a2_pivot_counts": 2,
    "a3_windowed_mean": 1,
    "w9_topk_per_group": 1,
    "w1_lag_step_flags": 1,
    "w4_lttb_decimation": 1,
    "sessionize_events": 1,
    "dedup_exact": 2,
    "dedup_minhash_lsh": 2,
    "ann_topk_cosine": 1,
    "ann_ivf_topk": 1,
    "text_quality_scores": 0,
    "text_tfidf_topk": 4,
    "media_feature_extract": 0,
    "q7_volume_shipping": 1,
    "q10_returned_items": 1,
    "q18_large_orders": 2,
    "instr_pco2w_flags": 2,
    "instr_optical_products": 1,
    "hitl_latest_note": 1,
    "pipeline_qaqc_job": 1,
    # r09: the batch-LUT IVFPQ — the two per-query top-k windows are the
    # ONLY shuffles; probes/LUTs join broadcast (AQE), the corpus never
    # exchanges, and the plan is query-count-independent
    "ann_ivf_pq_batch": 2,
}


@pytest.mark.parametrize("name", sorted(EXCHANGE_BUDGET))
def test_headline_shuffle_budget(spark, name):
    plan = plan_of(spark, name)
    n = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n <= EXCHANGE_BUDGET[name], (
        f"{name}: {n} exchanges, budget {EXCHANGE_BUDGET[name]}\n{plan}"
    )


def test_no_single_partition_window_anywhere(spark):
    """Sweep every registered query for a WindowExec fed by an Exchange
    SinglePartition — the plan Spark silently produces for an unpartitioned
    window function, which funnels the whole input through one task. Global
    rankings must go through operators/ranking.py instead. (Scalar aggregates
    also plan a SinglePartition exchange — those are 1-row and fine — so the
    check requires a Window node directly above the exchange, allowing an
    interposed Sort.)"""
    offenders = []
    for name, fn in sorted(QUERIES.items()):
        try:
            df = fn(spark, SF_CORRECTNESS)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:
            offenders.append((name, f"plan error: {ex}"))
            continue
        if re.search(
            r"Window[^\n]*\n(?:[^\n]*Sort[^\n]*\n)?[^\n]*Exchange SinglePartition",
            plan,
        ):
            offenders.append((name, "single-partition Window"))
    assert not offenders, offenders


# Queries where a BroadcastNestedLoopJoin is the INTENDED plan: non-equi
# predicates against a broadcast side that is 1-row (scalar thresholds,
# corpus totals), dim-sized (profile intervals, time grids), or an explicit
# cross matrix. Everything else must stay equi-shaped.
BNLJ_ALLOWED = {
    "a4_resample_interpolate",   # time-grid crossJoin (grid is dim-sized)
    "ann_threshold_neighbors",   # broadcast query vectors
    "ann_topk_cosine",           # broadcast query vectors
    "ann_hamming_topk",          # broadcast query SIGNATURES (8 bytes per
                                 # query): the coarse pass is the intended
                                 # scan, two intrinsics per pair; only 32
                                 # candidates/query pay full-precision cosine
    "retrieval_rrf_fusion",      # 1-row (n_docs, sum_dl) corpus stats, as
                                 # text_bm25_topk
    "ann_recall_report",         # contains the brute-force baseline: same
                                 # broadcast-query BNLJ as ann_topk_cosine
                                 # (recall is DEFINED against exact top-k)
    "ann_ivf_hamming_recall",    # same brute-force baseline (recall of the
                                 # composed IVF+Hamming index)
    "j3_profile_phase_split",    # profile-interval range join (dim broadcast)
    "j3_profile_range_join",     # same
    "join_cross_matrix",         # explicit cross product, small side broadcast
    "q11_important_parts",       # 1-row threshold, value > thr
    "q22_idle_customers",        # 1-row avg-balance threshold
    "sample_importance",         # 1-row vocab scalar
    "text_tfidf_topk",           # 1-row corpus size
    "text_bm25_topk",            # 1-row (n_docs, sum_dl) corpus stats
    "sample_domain_mix",         # 1-row corpus total
    "sample_temperature_mix",    # 1-row corpus total + 1-row normalizer
    "text_vocab_growth",         # triangular cumsum on the bucket dim (docs/50 rows, broadcast)
    "layout_zorder_clustering",  # 1-row min/max bounds broadcast
    "sink_merge_prune_2d",       # 1-row table aggregate x 1-row lookup
                                 # aggregate (stats cross of two scalars)
}


def test_bnlj_only_where_intended(spark):
    """Any BroadcastNestedLoopJoin outside the whitelist is an accidental
    non-equi join — at scale that is an O(rows x rows) comparison loop even
    with a broadcast side. New entries here require justification."""
    offenders = []
    for name, fn in sorted(QUERIES.items()):
        try:
            plan = plan_of(spark, name)
        except Exception as ex:
            offenders.append((name, f"plan error: {ex}"))
            continue
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            offenders.append((name, "unexpected BNLJ"))
    assert not offenders, offenders


def test_merge_full_plan_one_join_no_bnlj(spark):
    """merge_full's plan is ONE keyed full-outer join regardless of how
    many clauses are active: no nested-loop, no cartesian, and the
    single-side conditions ride as precomputed columns (no second join)."""
    from rca_data_tools_spark.sources.sinks import merge_full

    tgt = spark.createDataFrame(
        [(i, i % 7, float(i)) for i in range(100)], "k long, u long, v double"
    )
    src = spark.createDataFrame(
        [(i, 9, float(i + 1000)) for i in range(0, 50, 2)],
        "k long, u long, v double",
    )
    df = merge_full(
        tgt, src, ["k"],
        matched_update_cond="s.v > t.v",
        matched_delete_cond="s.v = -1.0",
        insert_cond="v > 0",
        nmbs_update_set={"u": "u + 1"}, nmbs_update_cond="v > 90",
        nmbs_delete_cond="v < 2",
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    joins = len(
        re.findall(r"^\(\d+\) (?:SortMergeJoin|BroadcastHashJoin)", plan, re.M)
    )
    assert joins == 1, f"{joins} joins\n{plan}"
    assert "BatchEvalPython" not in plan
