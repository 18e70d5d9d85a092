"""Bloom filter (functions/bloom.py): no false negatives ever, false-positive
rate in the expected range, and the probe stays a codegen'd Column (no Python
in the probe path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rca_data_tools_spark.functions.bloom import (
    BLOOM_SEEDS,
    bloom_build,
    bloom_might_contain,
)


def test_no_false_negatives(spark):
    keys = spark.range(1000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    words = bloom_build(keys, "k")
    hits = keys.filter(bloom_might_contain(words, F.col("k"))).count()
    assert hits == 1000


def test_false_positive_rate_bounded(spark):
    keys = spark.range(1000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    words = bloom_build(keys, "k")
    # Disjoint probe set: prefix differs, so zero true members.
    probes = spark.range(20000).select(F.concat(F.lit("x"), F.col("id")).alias("k"))
    fp = probes.filter(bloom_might_contain(words, F.col("k"))).count()
    # k=4 hashes, n=1000 keys, m=65536 bits -> theoretical fpr ~ 3.8e-6;
    # allow two orders of magnitude slack and still catch a broken probe.
    assert fp <= 20, fp


def test_probe_is_jvm_only(spark):
    keys = spark.range(10).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    words = bloom_build(keys, "k")
    plan = (
        keys.filter(bloom_might_contain(words, F.col("k")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_seed_count_matches_probe():
    assert len(BLOOM_SEEDS) == 4
