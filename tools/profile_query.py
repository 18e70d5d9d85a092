#!/usr/bin/env python
"""Profile one registered query's driver-side wall clock.

Usage: python tools/profile_query.py <query_name> [sf_dir] [--cprofile]

Runs the query once untimed (JIT/codegen warm-up), then once under timing;
with --cprofile the timed run is wrapped in cProfile and the top cumulative
entries are printed — for orchestration-heavy faces (table lifecycle, KV
plane) the py4j-call attribution shows which driver step each second hides
under. Guide §1: measure first, label jobs.
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    use_cprofile = "--cprofile" in sys.argv
    runs = int(os.environ.get("PROFILE_RUNS", "2"))

    from rca_data_tools_spark.queries import QUERIES
    from rca_data_tools_spark.session import get_spark

    spark = get_spark("rca-profile")
    spark.range(1).count()
    from pyspark.sql import functions as F

    cores = spark.sparkContext.defaultParallelism
    warm = (
        spark.range(cores * 4)
        .repartition(cores)
        .select(F.col("id").cast("double").alias("x"))
    )
    warm.mapInPandas(lambda it: it, schema="x double").count()

    fn = QUERIES[name]
    spark.sparkContext.setJobDescription(f"profile-warmup:{name}")
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    print(f"warmup: {time.perf_counter() - t0:.3f}s", file=sys.stderr)

    for i in range(runs):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"profile:{name}:{i}")
        if use_cprofile and i == runs - 1:
            pr = cProfile.Profile()
            t0 = time.perf_counter()
            pr.enable()
            n = fn(spark, sf_dir).count()
            pr.disable()
            dt = time.perf_counter() - t0
            s = io.StringIO()
            ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
            ps.print_stats(45)
            print(s.getvalue())
        else:
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
        print(f"run{i}: {dt:.3f}s rows={n}", file=sys.stderr)


if __name__ == "__main__":
    main()
