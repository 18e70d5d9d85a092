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
# Cumulative state after round 10: 264 registered, 263 cumulative
# driver-green (the one non-green is the documented no-oracle
# agg_approx_distinct row), 0 never-checked. Round 11 adds 6 queries
# (270 registered): the object-store data plane over a LIVE HTTP store
# (conditional-PUT claims, streamed blob uploads, cold-cache read with
# EXECUTOR-side blob fetch — sources/kv_http.py), the lease takeover of a
# crashed writer's claim (generational claims + conditional marker
# publish, at-most-one commit per version), versioned table metadata
# (per-version docs: time travel resolves the schema each version was
# committed under, RESTORE rolls the logical schema back with the data),
# and the capped SimHash components face (near-dup components whose
# over-cap 16-bit block buckets route to star edges — pair work linear in
# corpus size for fixed cap, crossover vs the exact face measured in
# SCALING.md), plus the logical change-data-feed face (read_changes_logical
# — a CDF range spanning a rename reads under the end version's names)
# and the streaming-onto-object-store face (stream_merge_kv: micro-batches
# claim/merge/publish immutable store versions, txn-tag exactly-once with
# a fresh-checkpoint replay proven a no-op in-band).
#
# Round-11 window = (a) the six queries ADDED this round, (b) rows whose
# PLANS CHANGED this round — split_leakage_capped was rebuilt on the cheap
# SimHash fingerprints (VERDICT r10 item 3; it beats the exact face now),
# both split faces hash components through a wrap-safe mod-prime Knuth
# assignment (ADVICE r10 overflow), the metadata-commit faces
# (sink_column_mapping / sink_drop_column / sink_alter_constraints) write
# per-version docs committed by the marker publish, RESTORE/CLONE/history
# faces carry version metadata, sink_changes_replay's restore pins the
# restored doc, sink_kv_chain_roundtrip rides the rewritten generational
# commit store with streaming blob IO, the pruned merges
# (sink_merge_upsert / sink_merge_full_surface) validate their
# no-matched-files fallback eagerly and dup-guard its insert set, the
# capped edit-distance face releases its caches after the components
# checkpoint, and streaming_merge_upsert resolves constraints through the
# versioned metadata accessor — and (c) oldest-cohort sentinels
# (VERDICT r10 item 8): the eight rows displaced by the r10 window
# (p4_value_filter, q12_priority_shipping, e2_union_distinct,
# a10_bit_or_rollup, o7_argmin_nearest, j8_time_shifted_overlay,
# j3_profile_range_join, subperiod_grouping), the named r02-r04 cohort
# (qc_bitmask_decode, the f_* scalar families, j10, p9_regex_filter), and
# the remaining oldest r01/r02 greens. The full registry is still
# oracle-checked at sf0.001 every session by tests/test_quick.py.
_ROUND_WINDOW = [
    # (a) added round 11
    "sink_kv_http_roundtrip",     # live HTTP object store + executor fetch
    "sink_lease_takeover",        # expired claim taken over, one commit
    "sink_versioned_metadata",    # time-traveling schema; RESTORE rolls it
    "dedup_simhash_capped",       # capped SimHash components (scale face)
    "sink_changes_logical",       # CDF across a rename, logical names
    "streaming_merge_kv",         # streaming ingest onto the object store
    # (b) changed-plan rows
    "split_leakage_capped",       # rebuilt on SimHash bands; now wins
    "split_leakage_safe",         # wrap-safe component hash
    "sink_column_mapping",        # per-version metadata docs
    "sink_drop_column",
    "sink_alter_constraints",
    "sink_restore_version",       # restore pins the restored version's doc
    "sink_clone_table",           # clone copies the cloned version's doc
    "sink_table_history",
    "sink_changes_replay",        # restore-in-chain writes version meta
    "sink_kv_chain_roundtrip",    # generational store, streaming blob IO
    "sink_merge_upsert",          # eager fallback validation + dup guard
    "sink_merge_full_surface",
    "dedup_edit_distance_capped",  # unpersist after components checkpoint
    "streaming_merge_upsert",     # constraints via versioned accessor
    # (c) oldest-cohort sentinels: the eight rows displaced by r10
    "p4_value_filter",
    "q12_priority_shipping",
    "e2_union_distinct",
    "a10_bit_or_rollup",
    "o7_argmin_nearest",
    "j8_time_shifted_overlay",
    "j3_profile_range_join",
    "subperiod_grouping",
    # (c) cont.: the named r02-r04 cohort
    "qc_bitmask_decode",
    "f_json_extract",
    "f_math_conversions",
    "f_nested_cal_arrays",
    "f_string_parse",
    "j10_latest_deploy_window",
    "p9_regex_filter",
    # (c) cont.: remaining oldest r01/r02 greens
    "w2_lead_intervals",
    "w3_gap_detection",
    "w5_positional_flags",
    "w6_interpolate_na",
    "dedup_components",
    "dedup_ngram_jaccard",
    "a15_percentiles",
    "text_lang_id",
    "text_token_stats",
    "sample_stratified",
    "pack_sequences",
    "corpus_curation",
    "media_frame_sample",
    "q4_order_priority",
    "ann_lsh_topk",
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
