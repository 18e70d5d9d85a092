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
# Cumulative state after round 9: 250 registered, 249 cumulative
# driver-green (the one non-green is the documented no-oracle
# agg_approx_distinct row), 0 never-checked. Round 10 adds 14 queries
# (264 registered): the 2-D zone-map pruned merge+lookup, the
# capped-components edit-distance dedup, the concurrent-writer
# streaming merge, ALTER TABLE ADD/DROP CONSTRAINT as chain commits,
# the VACUUM retention face, the manifest-pruned range scan, the
# full-clause MERGE (conditional matched UPDATE/DELETE, conditional
# INSERT, NOT MATCHED BY SOURCE UPDATE/DELETE) as one chain DML, the
# object-store data plane (chain DML over a conditional-PUT KV store
# with pointer-link carry, sources/kv_table.py), the leakage-safe
# train/val/test split (near-dup components pin whole clone clusters
# to one side of every eval boundary), the full-clause merge's
# persisted change-data-feed (read_changes ranges cross merge_full
# versions), the streaming snapshot-sync face of the full merge
# (txn-tagged exactly-once, per-batch NMBS purge), column mapping
# (RENAME and DROP COLUMN as zero-copy metadata commits; logical-name
# merges translate at the boundary, dead slots NULL-fill on rewrite),
# and the capped-components split (the leakage-safe split's scale path,
# sharing dedup_lsh_capped's oracle CTE chain).
#
# Round-10 window = (a) the six queries ADDED this round, (b) rows
# whose PLANS CHANGED this round — sink_changes_replay's chain now
# contains a RESTORE whose change feed is the persisted snapshot diff;
# the streaming merge sink gained crash-claim recovery + persisted
# CHECK-constraint enforcement; clone copies (not hardlinks) table
# metadata; mark_committed preserves history entries on re-publish; the
# chain DML claim loop moved to the substrate-agnostic
# commit_store.advance with capped-exponential backoff; the manifest
# grew per-column secondary maps (merge carry + OPTIMIZE ZORDER write
# path); the bloom sidecar rebuild writes per-key parallel parts and
# point_lookup composes manifest range pruning — and (c) oldest-cohort
# sentinels: the six r05-cohort rows displaced in r09 (documented there)
# plus 18 queries whose last driver window was r01 (p4_value_filter,
# q12_priority_shipping, e2_union_distinct, a10_bit_or_rollup,
# o7_argmin_nearest, j8_time_shifted_overlay, j3_profile_range_join and
# subperiod_grouping yielded their slots to the eight second-session
# additions sink_merge_full_surface / sink_kv_chain_roundtrip /
# split_leakage_safe / sink_merge_full_changes / streaming_merge_full /
# sink_column_mapping / sink_drop_column / split_leakage_capped; all
# eight stay oracle-checked at sf0.001 every session) — the oldest
# greens in
# the registry by last-proven round; the full registry is still
# oracle-checked at sf0.001 every session by tests/test_quick.py — this
# re-proves them at the driver's sf0.01 gate).
_ROUND_WINDOW = [
    # (a) added round 10
    "sink_merge_prune_2d",        # ZORDER 2nd dim prunes via manifest maps
    "dedup_edit_distance_capped",  # star-edge routing over the cap
    "streaming_merge_concurrent",  # two writers, txn tags, no lost update
    "sink_alter_constraints",     # ALTER ADD/DROP CONSTRAINT as commits
    "sink_vacuum_retention",      # protocol-aware VACUUM, hashed retention
    "sink_range_scan_pruned",     # manifest-pruned range read, 2nd Z dim
    "sink_merge_full_surface",    # full MERGE grammar incl. NMBS clauses
    "sink_kv_chain_roundtrip",    # object-store data plane, pointer carry
    "split_leakage_safe",         # near-dup components pin the eval split
    "sink_merge_full_changes",    # full-fidelity CDF of the 5-clause merge
    "streaming_merge_full",       # snapshot-sync NMBS merge, txn-tagged
    "sink_column_mapping",        # rename w/o rewrite; logical-name merge
    "sink_drop_column",           # drop w/o rewrite; NULL-filled dead slot
    "split_leakage_capped",       # capped-components split (scale path)
    # (b) changed-plan rows
    "sink_changes_replay",        # feed crosses RESTORE (snapshot diff)
    "sink_restore_version",
    "sink_clone_table",           # metadata copied, not hardlinked
    "sink_table_history",         # mark_committed idempotent re-publish
    "sink_merge_concurrent",      # commit_store.advance + expo backoff
    "sink_merge_upsert",
    "sink_merge_prune_roundtrip",  # secondary-map carry in the manifest
    "sink_optimize_zorder",       # ZORDER writes both manifest columns
    "sink_bloom_lookup",          # parallel per-key sidecar + manifest prune
    "streaming_merge_upsert",     # crash-claim recovery + constraints
    "streaming_merge_quarantine",
    "streaming_merge_cdc",
    # (c) oldest-cohort sentinels: the six displaced r05 rows
    "media_audio_frames",
    "text_vocab_growth",
    "sink_csv_roundtrip",
    "streaming_cdc_matches",
    "sink_json_index_roundtrip",
    "quality_classifier_score",
    # (c) cont.: the 18 oldest greens (last driver-proven in the r01
    # window; re-proven here at sf0.01)
    "a14_rollup_counts",
    "a3_windowed_mean",
    "coarsen_block_mean",
    "dedup_exact",
    "dedup_simhash_pairs",
    "j2_interval_clip",
    "j5_gross_range_flags",
    "j7_annotation_overlap",
    "o6_argmax_per_bucket",
    "p10_isin_filter",
    "p7_band_extraction",
    "q14_promo_revenue",
    "q19_banded_revenue",
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q_semi_anti_churn",
    "qc_climatology_build",
    "w1_lag_step_flags",
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
