#!/usr/bin/env python
"""Measure a list of queries from ONE source tree; print a JSON line
{name: [samples...]}. Driven by an outer loop that interleaves two trees so
ambient (co-tenant) load hits both sides equally; compare per-query MINIMUM
across interleaved reps — load only ever ADDS time, so min-of-k is the
robust estimator on a noisy box (guide §1: measure first, trust medians/
minima over single runs).

Usage: python tools/ab_bench.py <tree> <runs> <name> [name...]
"""

from __future__ import annotations

import json
import os
import sys
import time

tree = sys.argv[1]
runs = int(sys.argv[2])
names = sys.argv[3:]
sys.path.insert(0, tree)
os.chdir(tree)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from rca_data_tools_spark.queries import QUERIES  # noqa: E402
from rca_data_tools_spark.session import get_spark  # noqa: E402

spark = get_spark("rca-ab")
spark.range(1).count()
from pyspark.sql import functions as F  # noqa: E402

cores = spark.sparkContext.defaultParallelism
warm = (
    spark.range(cores * 4).repartition(cores)
    .select(F.col("id").cast("double").alias("x"))
)
warm.mapInPandas(lambda it: it, schema="x double").count()

out: dict[str, list[float]] = {}
for name in names:
    spark.catalog.clearCache()
    QUERIES[name](spark, sf_dir).count()  # untimed warm-up (codegen/JIT)
    samples = []
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        samples.append(round(time.perf_counter() - t0, 4))
    out[name] = samples
    print(f"# {name}: {samples}", file=sys.stderr)
print(json.dumps(out))
