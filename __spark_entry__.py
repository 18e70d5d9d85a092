"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps each implemented operator from SURVEY.md §2 (plus the
training-data-pipeline extras) to a callable ``(spark, sf_dir) -> DataFrame``;
``oracle_sql()`` gives the DuckDB-runnable ANSI-SQL equivalent. Aggregates of
doubles go through round->DECIMAL summation on BOTH sides so results are
bit-identical regardless of partitioning/order (see
rca_data_tools_spark/functions/numeric.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rca_data_tools_spark.queries import QUERIES, ORACLES
from rca_data_tools_spark.sources.readers import load_table

# The driver verifies the first 50 entries of queries() per round.
# Cumulative state after round 8: 228 registered, 227 cumulative
# driver-green (the one non-green is the documented no-oracle
# agg_approx_distinct row), 0 never-checked. Round 9 adds 22 queries
# (250 registered): 8 in the first session (DV-safe table stack, DML
# chain, batch IVFPQ) + 13 in the second (RESTORE/CLONE, all-DML CDF +
# replay, bloom-index lookup, expectations gate batch+streaming, OPTIMIZE
# ZORDER, edit-distance dedup, incremental ANN ingest, salted join,
# curated-table pipeline).
#
# Round-9 window = (a) the eight queries ADDED this round (the DV-safe
# table-stack faces, the DML chain, the batch-LUT IVFPQ), (b) the rows
# whose PLANS
# CHANGED this round — the deletion-vector sidecar moved executor-side
# (parquet _deletes/ dir, distributed anti-join subtraction), compaction
# and pruned MERGE became DV-aware, the MERGE duplicate-source-key check
# moved IN-PLAN (lazy guarded join key), the delete-key join lost its
# forced broadcast, the manifest is cross-checked against the directory
# listing, and the streaming merges write commit markers — and (c) r05-cohort
# sentinels, now the oldest greens (rotation discipline: r01->r04,
# r02->r05, r03->r07, r04->r08, r05->r09): 25 at the session handoff, 19
# after the second session's (d) additions displaced six into the r10
# rotation (media_audio_frames, text_vocab_growth, sink_csv_roundtrip,
# streaming_cdc_matches, sink_json_index_roundtrip,
# quality_classifier_score — all cumulative-green since r05; re-proving
# deferred one round to make room for never-checked r09 adds, which the
# driver contract prioritizes). dedup_incremental (also r05-added) was
# re-proven r08 and yields its slot.
_ROUND_WINDOW = [
    # (a) added round 9
    "sink_compact_deletes",     # delete -> OPTIMIZE: DVs materialize + clear
    "sink_read_as_of",          # time-travel API over v0/v1/v2 with a DV
    "sink_merge_concurrent",    # optimistic concurrency: rebase-and-retry
    "streaming_merge_cdc",      # CDC apply: update/delete ops via foreachBatch
    "ann_ivf_pq_batch",         # broadcast-LUT IVFPQ, query-count-free plan
    "sink_update_chain",        # DELETE -> UPDATE (MoR) -> OPTIMIZE on one chain
    "sink_table_changes",       # persisted per-version CDF + read_changes
    "dedup_lsh_recall",         # MinHash-LSH recall vs exact ground truth
    # (b) changed-plan rows (executor-side DVs / DV-aware compact+merge /
    #     in-plan dup guard / unhinted delete join / commit markers)
    "sink_delete_vectors",
    "sink_compact_roundtrip",
    "sink_merge_upsert",
    "sink_merge_changes",
    "sink_merge_evolved",
    "sink_merge_prune_roundtrip",
    "sink_merge_history",
    "streaming_merge_upsert",
    "streaming_merge_deduped",
    # (c) r05-cohort sentinels (oldest greens, last proven r05)
    "ann_pq_topk",
    "catalog_variable_resolution",
    "dedup_cdc_chunks",
    "embed_quantize_int8",
    "ingest_html_camera_index",
    "ingest_http_csv",
    "ingest_sheet_hitl",
    "layout_zorder_clustering",
    "qc_rate_of_change",
    "qc_spike_test",
    "quality_classifier_train",
    "sample_temperature_mix",
    "sink_partition_overwrite",
    "sink_stale_reconcile",
    "streaming_neardup_matches",
    "streaming_qaqc_rollup",
    "w10_windowed_lttb",
    "w_seasonal_decompose",
    # r05-cohort per VERDICT's enumeration (checked in the r05 window)
    "f_nested_cal_arrays",
    # (d) added mid-round 9 (second session): RESTORE/CLONE on the chain,
    # the full-fidelity DML change feed, per-file bloom-index point lookup,
    # and the expectations gate — these take the early-rotation fill slots
    # (the displaced r07 rows rotate in r10)
    "sink_restore_version",
    "sink_clone_table",
    "sink_bloom_lookup",
    "sink_changes_all_dml",
    "quality_expectations",
    "quality_quarantine",
    "sink_optimize_zorder",
    "streaming_merge_quarantine",
    "dedup_edit_distance",
    "sink_changes_replay",
    "ann_index_incremental",
    "join_salted_skew",
    "pipeline_curated_table",
    "sink_table_history",
]


def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _ROUND_WINDOW if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(ORACLES)
