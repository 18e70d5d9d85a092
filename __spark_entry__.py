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
# Cumulative state after round 7: 215 registered, 214 cumulative
# driver-green (CORRECTNESS_r07: 49/50 green + the documented no-oracle
# agg_approx_distinct row), 0 never-checked. Round 8 adds 13 queries
# (228 registered).
#
# Round-8 window = (a) the thirteen queries ADDED this round, (b) the rows
# whose PLANS CHANGED this round — the pair-list broadcast guard moved to
# a byte bound (operators/dedup.py BROADCAST_PAIR_BYTES, the r07 sf1
# regression fix), merge_upsert grew the MERGE duplicate-source-key check,
# the zarr v3 missing-chunk fill semantics fix (ADVICE r07), and the
# pwrite short-write loop in the HDF5/CDF sinks — and (c) 35 of the 50
# r04-cohort sentinels, now the oldest greens (rotation discipline:
# r01->r04, r02->r05, r03->r07, r04->r08). The 12 r04 entries NOT
# rotated here: ten are bench HEADLINE queries executed every round
# (j4_climatology_flags, j1_asof_join, qc_bitmask_decode,
# w4_lttb_decimation, instr_pco2w_flags, instr_optical_products,
# q3_shipping_priority, q5_nation_revenue, a2_pivot_counts,
# w9_topk_per_group), and instr_flor_flags / instr_vel3d_flags /
# instr_ph_flags / bpe_apply_tokens / streaming_cms_cells /
# sketch_cms_heavyhitters / sample_domain_mix / agg_histogram /
# qc_flat_line / text_pmi_cooccurrence / streaming_join_enriched yield
# their slots to (a)/(b) — each family keeps another sentinel in-window
# (bpe_train_merges, streaming_hll_registers, sketch_hll_cardinality,
# sample_weighted_topk + sample_shuffle_order, agg_mode,
# qc_flag_transitions, text_entropy + text_minhash_containment,
# streaming_hll_registers for the streaming family, five instrument
# reps). All twenty-one remain cumulative-green from r04.
_ROUND_WINDOW = [
    # (a) added round 8
    "ann_ivf_hamming_topk",     # Hamming coarse scan WITHIN nprobe IVF lists
    "ann_ivf_hamming_recall",   # recall@5 of the composed index, in-oracle
    "ann_ivf_pq_topk",          # IVFPQ: ADC over nprobe lists' 4-byte codes
    "sink_merge_prune_roundtrip",  # copy-on-write file-pruned MERGE
    "streaming_merge_upsert",   # real readStream foreachBatch merge, 2 batches
    "sink_merge_history",       # time travel: v0/v1/v2 snapshot isolation
    "sink_merge_changes",       # MERGE change-data-feed (Delta CDF shape)
    "streaming_merge_deduped",  # in-batch dup keys -> max_by(rev) upstream
    "sink_incremental_agg",     # materialized-view delta maintenance
    "profile_table_stats",      # ANALYZE job: nulls/distincts/min-max
    "ann_index_persisted",      # IVFPQ build -> write -> load -> search
    "sink_merge_evolved",       # MERGE: MATCHED-DELETE + schema evolution
    "sink_delete_vectors",      # merge-on-read row deletes, 0 files rewritten
    # (b) changed-plan rows (byte-bound pair guard / MERGE dup check /
    #     zarr v3 fill / pwrite loop)
    "dedup_minhash_lsh",
    "dedup_lsh_capped",
    "dedup_components",
    "dedup_keep_best",
    "dedup_incremental",
    "dedup_ngram_jaccard",
    "sink_merge_upsert",
    "sink_zarr_roundtrip",
    "sink_zarr_v3_roundtrip",
    "sink_netcdf_roundtrip",
    "sink_hdf5_roundtrip",
    # (c) r04-cohort sentinels (oldest greens, last proven r04)
    "bpe_train_merges",
    "text_bm25_topk",
    "sketch_hll_cardinality",
    "embed_kmeans_clusters",
    "pipeline_pretrain_corpus",
    "sample_weighted_topk",
    "sample_shuffle_order",
    "w_mad_outliers",
    "calc_tidal_harmonic",
    "agg_mode",
    "qc_flag_transitions",
    "streaming_hll_registers",
    "graph_degree_stats",
    "text_minhash_containment",
    "j1_asof_tolerance",
    "j11_interval_difference",
    "text_entropy",
    "a16_array_quantiles",
    "embed_norm_stats",
    "instr_velpt_flags",
    "instr_nutnr_flags",
    "instr_adcp_flags",
    "instr_opt_converters",
    "instr_sidelobe_depth",
    "p2_time_slice",
    "j6_multiway_time_join",
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
