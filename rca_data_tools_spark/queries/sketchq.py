"""Sketch queries: Count-Min heavy hitters over the events stream, with the
whole sketch (hashing, cell accumulation, min-estimate) replayed in the
DuckDB oracle — a frequency sketch as a deterministic DataFrame plan."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rca_data_tools_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_build,
    cms_estimate,
)
from rca_data_tools_spark.queries._registry import query
from rca_data_tools_spark.sources.readers import load_table

_BUCKET_SQL = (
    "CAST(('0x' || substr(md5('cms' || {i} || '|' || CAST({key} AS VARCHAR)), 1, 8)) "
    f"AS BIGINT) % {CMS_WIDTH}"
)

_IDX = ", ".join(str(i) for i in range(CMS_DEPTH))

_CMS_ORACLE = f"""
WITH keyc AS MATERIALIZED (
  SELECT user_id AS key, COUNT(*) AS cnt FROM events
  WHERE user_id IS NOT NULL GROUP BY user_id
),
cells AS MATERIALIZED (
  SELECT ii.i, {_BUCKET_SQL.format(i="ii.i", key="k.key")} AS bucket,
         SUM(k.cnt)::BIGINT AS c
  FROM keyc k, (SELECT unnest([{_IDX}]) AS i) ii
  GROUP BY 1, 2
),
est AS (
  SELECT k.key, k.cnt, MIN(c.c) AS cms_estimate
  FROM keyc k, (SELECT unnest([{_IDX}]) AS i) ii
  JOIN cells c
    ON c.i = ii.i AND c.bucket = {_BUCKET_SQL.format(i="ii.i", key="k.key")}
  GROUP BY k.key, k.cnt
)
SELECT key AS user_id, cnt AS exact_count, cms_estimate
FROM est
ORDER BY cms_estimate DESC, user_id ASC
LIMIT 10
"""


@query("sketch_cms_heavyhitters", oracle=_CMS_ORACLE)
def sketch_cms_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 heavy hitters by Count-Min estimate (4 hash rows x 64 buckets)
    over the events stream, with the exact count alongside so the
    overestimate property is visible in the result.

    Scale shape: the only corpus-sized operation is the map-side-combined
    per-key count; the sketch itself is d*w = 256 cells — constant-size
    state regardless of corpus size, broadcast for the probe, and mergeable
    across shards by cell-wise addition. The top-10 is TakeOrdered.
    """
    e = load_table(spark, sf_dir, "events")
    cells = cms_build(e, "user_id")
    # NOT NULL mirrors the sketch build: NULL ids are not countable keys.
    keys = (
        e.filter(F.col("user_id").isNotNull())
        .groupBy(F.col("user_id").alias("key"))
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    est = cms_estimate(keys, cells)
    return (
        est.select(
            F.col("key").alias("user_id"), "exact_count", "cms_estimate"
        )
        .orderBy(F.col("cms_estimate").desc(), F.col("user_id").asc())
        .limit(10)
    )


_H32 = "CAST(('0x' || substr(md5('hll|' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)"
_W = "CAST(FLOOR(h / 64) AS BIGINT)"
_RAW = "(0.709::DOUBLE * 64 * 64 * 134217728.0::DOUBLE / (s_present + (64 - n_regs) * 134217728))"

_HLL_ORACLE = f"""
WITH h AS MATERIALIZED (
  SELECT event_type, {_H32} AS h FROM events WHERE user_id IS NOT NULL
),
regs AS MATERIALIZED (
  SELECT event_type, h % 64 AS idx,
         MAX(CASE WHEN {_W} > 0 THEN 27 - LENGTH(bin({_W})) ELSE 27 END) AS r
  FROM h GROUP BY 1, 2
),
per AS MATERIALIZED (
  SELECT event_type,
         SUM(CAST(POWER(2, 27 - r) AS BIGINT))::BIGINT AS s_present,
         COUNT(*)::BIGINT AS n_regs
  FROM regs GROUP BY 1
),
est AS (
  SELECT event_type,
         CASE WHEN {_RAW} <= 160.0::DOUBLE AND (64 - n_regs) > 0
              THEN 64.0::DOUBLE * LN(64.0::DOUBLE / (64 - n_regs))
              ELSE {_RAW} END AS e
  FROM per
),
ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events GROUP BY 1)
SELECT ex.event_type, ex.n_exact, ROUND(est.e, 4) AS hll_estimate
FROM ex JOIN est USING (event_type)
"""


@query("sketch_hll_cardinality", oracle=_HLL_ORACLE)
def sketch_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user cardinality: exact count alongside a
    DETERMINISTIC HyperLogLog estimate (64 registers, salted-md5 hashing).

    The engine's built-in approx_count_distinct is HLL++ with an
    engine-private sketch, so it can only be bounds-tested; this HLL is a
    plain Column plan, so the register table AND the estimate replay in the
    oracle and hash-match. Scale shape: one map-side-combined groupBy to
    (groups x 64) register rows — constant state per group, register-wise
    MAX merges shard sketches.
    """
    from rca_data_tools_spark.operators.sketch import hll_estimate, hll_register_rows

    e = load_table(spark, sf_dir, "events")
    est = hll_estimate(hll_register_rows(e, "event_type", "user_id"))
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return exact.join(
        F.broadcast(est.withColumnRenamed("grp", "event_type")), "event_type"
    ).select("event_type", "n_exact", "hll_estimate")


_WSTART = "CAST(to_timestamp(CAST(FLOOR(EPOCH(ts) / 3600) * 3600 AS BIGINT)) AS TIMESTAMP)"

_STREAM_HLL_ORACLE = f"""
WITH h AS MATERIALIZED (
  SELECT {_WSTART} AS window_start, event_type, {_H32} AS h
  FROM events WHERE user_id IS NOT NULL
)
SELECT window_start, event_type, h % 64 AS idx,
       MAX(CASE WHEN {_W} > 0 THEN 27 - LENGTH(bin({_W})) ELSE 27 END) AS r
FROM h GROUP BY 1, 2, 3
"""


@query("streaming_hll_registers", oracle=_STREAM_HLL_ORACLE)
def streaming_hll_registers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The windowed streaming HyperLogLog register build run through Spark's
    unified API on a batch frame — byte-identical logic to the readStream
    version (streaming/windows.py streaming_hll_registers; batch ≡ stream is
    proven in tests/test_streaming.py). HLL's merge operator IS max, so the
    watermarked streaming agg maintains the exact sketch incrementally —
    bounded 64 registers per (window, key), evicted by the watermark — and
    this face gives the driver a hash row for the register table itself."""
    from rca_data_tools_spark.streaming.windows import streaming_hll_registers

    e = load_table(spark, sf_dir, "events")
    return streaming_hll_registers(e, window_duration="1 hour")


_STREAM_CMS_ORACLE = f"""
WITH cells AS MATERIALIZED (
  SELECT {_WSTART} AS window_start, ii.i,
         {_BUCKET_SQL.format(i="ii.i", key="user_id")} AS bucket
  FROM events, (SELECT unnest([{_IDX}]) AS i) ii
  WHERE user_id IS NOT NULL
)
SELECT window_start, i, bucket, COUNT(*) AS c
FROM cells GROUP BY 1, 2, 3
"""


@query("streaming_cms_cells", oracle=_STREAM_CMS_ORACLE)
def streaming_cms_cells_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The windowed streaming Count-Min cell build run through the unified
    API on a batch frame — same logic as the readStream version
    (streaming/windows.py streaming_cms_cells; batch ≡ stream proven in
    tests/test_streaming.py). CMS's merge operator IS cell-wise addition, so
    the watermarked streaming sum maintains the exact sketch incrementally —
    bounded d·w cells per window — and this face hash-checks the cell table
    the streaming job would hand to cms_estimate."""
    from rca_data_tools_spark.streaming.windows import streaming_cms_cells

    e = load_table(spark, sf_dir, "events")
    return streaming_cms_cells(e, window_duration="1 hour")
