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

# The driver verifies the first 50 entries of queries() per round. Round 1
# checked the first 50 registrations (46 green). This window leads with the
# queries that have no driver-green row yet — instrument flaggers, ANN,
# sampling, text, media, calc-registry, scalar-function and TPC-H-extension
# families — plus two already-green sentinels (regression guards) and the
# three round-1 rows fixed this round (a15 scalar percentiles, two BIGINT
# oracle casts) and w4 now that it has a real oracle. The ~28 still-unchecked
# queries rotate into the round-3 window.
_ROUND_WINDOW = [
    # sentinels (green in r01; guard regressions)
    "q1_pricing_summary",
    "dedup_minhash_lsh",
    # round-1 reds, fixed this round
    "a15_percentiles",
    "dedup_simhash_fingerprints",
    "text_contamination",
    # no_oracle in r01; recursive-CTE oracle added this round
    "w4_lttb_decimation",
    # instrument flaggers (the reference's advanced-QA/QC surface)
    "instr_velpt_flags",
    "instr_flor_flags",
    "instr_nutnr_flags",
    "instr_adcp_flags",
    "instr_pco2w_flags",
    "instr_ph_flags",
    "instr_vel3d_flags",
    "instr_opt_converters",
    "instr_sidelobe_depth",
    "instr_optical_products",
    "calc_nutnr_nitrate",
    # ANN / similarity
    "ann_topk_cosine",
    "ann_threshold_neighbors",
    "ann_lsh_topk",
    "ann_ivf_topk",
    # sampling / packing
    "sample_hash_fraction",
    "sample_stratified",
    "sample_uniform_topk",
    "sample_domain_cap",
    "sample_split_assign",
    "pack_sequences",
    # text analysis
    "text_token_stats",
    "text_quality_scores",
    "text_lang_id",
    "text_fingerprints",
    "text_tfidf_topk",
    "corpus_curation",
    "p9_regex_filter",
    # multimodal
    "media_feature_extract",
    "media_batch_stats",
    "media_frame_sample",
    # calc registry + scalar functions
    "calc_registry_flags",
    "calc_poly_fit",
    "f_nested_cal_arrays",
    "f_string_parse",
    "f_json_extract",
    "f_math_conversions",
    # TPC-H extensions
    "q4_order_priority",
    "q8_market_share",
    "q9_product_profit",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity",
    "q21_sole_late_supplier",
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
