"""Count-Min sketch invariants: overestimation, exactness without
collisions, shard mergeability."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from rca_data_tools_spark.operators.sketch import cms_build, cms_estimate


def test_overestimates_never_under(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": [f"u{i % 37}" for i in range(1000)]})
    )
    cells = cms_build(df, "k", depth=4, width=16)  # force collisions
    keys = df.groupBy(F.col("k").alias("key")).agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(keys, cells, "key", depth=4, width=16).collect()
    assert est
    for r in est:
        assert r["cms_estimate"] >= r["exact"], r


def test_exact_when_width_exceeds_keys(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": ["a"] * 5 + ["b"] * 3 + ["c"] * 2}))
    cells = cms_build(df, "k", depth=4, width=4096)
    keys = df.groupBy(F.col("k").alias("key")).agg(F.count(F.lit(1)).alias("exact"))
    for r in cms_estimate(keys, cells, "key", depth=4, width=4096).collect():
        assert r["cms_estimate"] == r["exact"], r


def test_shard_merge_is_cellwise_sum(spark):
    full = spark.createDataFrame(
        pd.DataFrame({"rid": range(200), "k": [f"u{i % 9}" for i in range(200)]})
    )
    s1 = full.filter(F.col("rid") % 2 == 0)
    s2 = full.filter(F.col("rid") % 2 == 1)
    merged = (
        cms_build(s1, "k").unionByName(cms_build(s2, "k"))
        .groupBy("i", "bucket").agg(F.sum("c").alias("c"))
    )
    direct = cms_build(full, "k")
    a = {(r["i"], r["bucket"]): r["c"] for r in merged.collect()}
    b = {(r["i"], r["bucket"]): r["c"] for r in direct.collect()}
    assert a == b


def test_hll_tracks_exact_within_error_bound(spark):
    import pandas as pd

    from rca_data_tools_spark.operators.sketch import hll_estimate, hll_register_rows

    df = spark.createDataFrame(
        pd.DataFrame(
            {"g": ["a"] * 3000 + ["b"] * 500,
             "k": [f"k{i}" for i in range(3000)] + [f"x{i % 40}" for i in range(500)]}
        )
    )
    regs = hll_register_rows(df, "g", "k")
    est = {r["grp"]: r["hll_estimate"] for r in hll_estimate(regs).collect()}
    # m=64 -> typical rel. error 1.04/sqrt(64) = 13%; assert a loose 3-sigma
    assert abs(est["a"] - 3000) / 3000 < 0.40, est
    assert abs(est["b"] - 40) / 40 < 0.40, est


def test_hll_shard_merge_is_registerwise_max(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from rca_data_tools_spark.operators.sketch import hll_register_rows

    full = spark.createDataFrame(
        pd.DataFrame({"rid": range(400), "g": ["a"] * 400,
                      "k": [f"k{i % 123}" for i in range(400)]})
    )
    s1, s2 = full.filter(F.col("rid") % 2 == 0), full.filter(F.col("rid") % 2 == 1)
    merged = (
        hll_register_rows(s1, "g", "k").unionByName(hll_register_rows(s2, "g", "k"))
        .groupBy("grp", "idx").agg(F.max("r").alias("r"))
    )
    direct = hll_register_rows(full, "g", "k")
    a = {(r["grp"], r["idx"]): r["r"] for r in merged.collect()}
    b = {(r["grp"], r["idx"]): r["r"] for r in direct.collect()}
    assert a == b


def test_null_keys_excluded_like_count_distinct(spark):
    """NULL keys must not enter either sketch: the HLL estimate tracks
    COUNT(DISTINCT key) (which excludes NULLs) and the CMS cell mass equals
    COUNT(key) (ditto), no matter how NULL-heavy the input."""
    from rca_data_tools_spark.operators.sketch import (
        HLL_M,
        hll_estimate,
        hll_register_rows,
    )

    pdf = pd.DataFrame(
        {
            "grp": ["g"] * 400,
            "k": [f"u{i % 23}" if i % 3 else None for i in range(400)],
        }
    )
    df = spark.createDataFrame(pdf)
    exact = df.filter(F.col("k").isNotNull()).select("k").distinct().count()
    n_nonnull = int(df.filter(F.col("k").isNotNull()).count())

    regs = hll_register_rows(df, "grp", "k")
    # no register row may come from a NULL hash (md5(NULL) -> NULL index)
    assert regs.filter(F.col("idx").isNull()).count() == 0
    est = hll_estimate(regs).collect()[0]["hll_estimate"]
    # 23 distinct << 64 registers: small-range correction is near-exact
    assert abs(est - exact) / exact < 0.35, (est, exact)

    cells = cms_build(df, "k", depth=4, width=4096)
    total = cells.groupBy("i").agg(F.sum("c").alias("mass")).collect()
    assert all(r["mass"] == n_nonnull for r in total)  # NULLs carry no mass

    # an all-NULL corpus builds an EMPTY sketch, not a phantom-key one
    allnull = spark.createDataFrame(
        pd.DataFrame({"grp": ["g"] * 10, "k": [None] * 10}).astype({"k": "object"}),
        "grp string, k string",
    )
    assert cms_build(allnull, "k").count() == 0
    assert hll_register_rows(allnull, "grp", "k").count() == 0
