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
# Cumulative state: 213 registered; 195 had a driver-green row through
# round 5 (agg_approx_distinct is the documented no-oracle row). ROUND 6
# PRODUCED NO CORRECTNESS FILE (the round ended without a judge pass), so
# the 17 round-6 window entries — 13 additions + 4 changed-plan rows —
# have never been driver-verified and STAY in the round-7 window, as does
# the r03-cohort block that was awaiting its rotation row.
#
# Round-7 window = (a) those 17 carried-over round-6 entries, (b) the seven
# queries ADDED this round (zarr-v3 + hdf5 writer lifecycles, Gopher gate,
# Hamming ANN, RRF fusion, MERGE upsert, zone-map pruning), and (c) 26 of
# the 33 r03-cohort sentinels from the round-6 window (seven yield slots to
# (b) and rotate back next round — besides the five below, sessionize_events
# is a bench headline exercised every round and j10's join family keeps
# j1_asof_nearest + j3 in-window:
# a8 — a9 keeps the array-math sentinel; j1_asof_forward — j1_asof_nearest
# keeps the as-of family; agg_multi_distinct — agg_grouping_sets keeps the
# agg family; q16 — q11/q22 keep TPC-H; text_ngram_freq — three other text
# sentinels remain. All five stay cumulative-green from r03.)
_ROUND_WINDOW = [
    # (a) round-6 additions, never driver-verified (no CORRECTNESS_r06)
    "ingest_status_degrade",    # S8 degrade-to-empty contract, live+dead feed
    "ann_ivf_refined_topk",     # Lloyd-refined IVF search, refinement in-oracle
    "dedup_substring_spans",    # ExactSubstr spans (Lee et al. 2022)
    "dedup_substring_removal",  # ...and its text-cut face
    "sample_token_budget",      # per-domain greedy token-budget selection
    "dedup_keep_best",          # highest-quality representative per cluster
    "streaming_substring_matches",  # stream-static ExactSubstr window face
    "text_chunk_windows",       # overlapping RAG chunking, zero-shuffle scan
    "sink_zarr_roundtrip",      # distributed Zarr v2 WRITE -> native read-back
    "sink_netcdf_roundtrip",    # distributed CDF-5 WRITE -> native read-back
    "ann_recall_report",        # measured IVF recall@5 vs exact, in-oracle
    "sink_compact_roundtrip",   # small-file compaction, content-invariant
    "pipeline_rag_corpus",      # gate->substr-removal->dedup->budget->chunk
    # (a) round-6 changed-plan rows, never driver-verified
    "dedup_minhash_lsh",        # pair-list broadcast size guard
    "dedup_lsh_capped",
    "dedup_components",
    "q18_large_orders",         # re-planned broadcast semi-gate -> windowed having
    # (b) added round 7
    "sink_zarr_v3_roundtrip",   # Zarr v3 sharded WRITE -> native v3 read-back
    "sink_hdf5_roundtrip",      # HDF5 WRITE -> native HDF5 scan read-back
    "text_gopher_gate",         # Gopher word-level quality rules, per-rule bits
    "ann_hamming_topk",         # binary-quantized Hamming coarse + cosine re-rank
    "retrieval_rrf_fusion",     # BM25 x term-density reciprocal-rank fusion
    "sink_merge_upsert",        # MERGE-INTO row-granular upsert lifecycle
    "layout_zonemap_prune",     # file min/max zone-map data skipping
    # (c) r03-cohort sentinels carried from the unverified round-6 window
    "a4_resample_interpolate",
    "a9_row_stddev_array",
    "agg_approx_distinct",      # rows-only (documented no-oracle row)
    "agg_grouping_sets",
    "calc_griddata_surface",
    "contamination_bloom",
    "dedup_embedding_cosine",
    "dedup_exact_spans",
    "dedup_strip_boilerplate",
    "e4_set_intersection",
    "embed_gram_entries",
    "j1_asof_nearest",
    "j3_profile_phase_split",
    "pipeline_qaqc_job",
    "q11_important_parts",
    "q22_idle_customers",
    "sample_importance",
    "skew_two_stage_agg",
    "streaming_session_window",
    "text_perplexity",
    "text_pii_redaction",
    "text_repetition",
    "w7_profile_regrid",
    "w8_cell_aggregation",
    "w_ewma",
    "w_rank_tail",
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
