#!/usr/bin/env python
"""Cumulative stage timing for the MinHash/LSH dedup pipeline (guide §1:
measure per stage with the noop sink so you time computation, not the sink).

Usage: python tools/stage_profile_dedup.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from pyspark.sql import functions as F  # noqa: E402

from rca_data_tools_spark.operators.dedup import (  # noqa: E402
    lsh_banded,
    minhash_signatures,
    shingle_arrays,
    shingle_hashes,
)
from rca_data_tools_spark.functions.text import normalize  # noqa: E402
from rca_data_tools_spark.session import get_spark  # noqa: E402
from rca_data_tools_spark.sources.readers import load_table  # noqa: E402

spark = get_spark("rca-stageprof")
spark.range(1).count()
cores = spark.sparkContext.defaultParallelism
warm = spark.range(cores * 4).repartition(cores).select(
    F.col("id").cast("double").alias("x")
)
warm.mapInPandas(lambda it: it, schema="x double").count()


def t(name, df, runs=3):
    spark.sparkContext.setJobDescription(f"stage:{name}")
    df.write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best:7.3f}s")
    return best


docs = load_table(spark, sf_dir, "documents")
spread = docs.repartition(cores, "doc_id")

norm = spread.select("doc_id", normalize("text").alias("nt"))
sh = shingle_arrays(spread, "doc_id", "text")
hashed = shingle_hashes(sh, "doc_id")
sig = minhash_signatures(hashed, "doc_id")
banded = lsh_banded(sig, "doc_id")
a = banded.withColumnRenamed("doc_id", "id1")
c = banded.withColumnRenamed("doc_id", "id2")
pairs = (
    a.join(c, ["band_id", "band_sig"])
    .filter(F.col("id1") < F.col("id2"))
    .select("id1", "id2")
)
pairs_d = pairs.distinct()

t("normalize", norm)
t("shingle_arrays", sh)
t("shingle_hashes", hashed)
t("minhash_signatures", sig)
t("lsh_banded", banded)
t("band self-join pairs", pairs)
t("pairs distinct", pairs_d)
