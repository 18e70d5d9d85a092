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
  SELECT user_id AS key, COUNT(*) AS cnt FROM events GROUP BY user_id
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
    keys = e.groupBy(F.col("user_id").alias("key")).agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    est = cms_estimate(keys, cells)
    return (
        est.select(
            F.col("key").alias("user_id"), "exact_count", "cms_estimate"
        )
        .orderBy(F.col("cms_estimate").desc(), F.col("user_id").asc())
        .limit(10)
    )
