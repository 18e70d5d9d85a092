"""Window-frame and grouping-set coverage beyond §2.5's row-offset windows:
sliding ROWS-frame statistics, NTILE bucketing, rank-distribution functions,
CUBE grouping sets, cross joins, and an exponentially-weighted moving average
(the classic sensor-smoothing recurrence, reference decimate.py's coarsen
being its block-mean cousin).

Determinism notes: frame sums go through the decimal trick
(functions/numeric.py) so partial-order differences can't show; NTILE /
PERCENT_RANK / CUME_DIST are integer-ratio functions over a total order
(value, event_id), bit-identical across engines; the EWMA recurrence is the
same IEEE-754 expression tree on both sides (numpy loop ≙ recursive CTE), so
even floats hash-match.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rca_data_tools_spark.functions.numeric import dsum, dsum_sql
from rca_data_tools_spark.queries._registry import query
from rca_data_tools_spark.sources.readers import load_table


@query(
    "w_moving_stats",
    oracle=f"""
SELECT user_id, event_id,
       CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6)))
            OVER w AS DOUBLE) AS mov_sum,
       MIN(value) OVER w AS mov_min,
       MAX(value) OVER w AS mov_max,
       CAST(COUNT(*) OVER w AS BIGINT) AS mov_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""",
)
def w_moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS-frame statistics (trailing window of 4 samples) — the
    moving-average smoother family (reference plots.py coarsen / rolling
    overlays). One shuffle on user_id; the frame itself is computed within
    each sorted partition with no further exchange. At 100 TB: frames never
    cross the partitionBy key, so this scales linearly in rows per key."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    mov_sum = (
        F.sum(F.round(F.col("value"), 6).cast("decimal(28,6)")).over(w).cast("double")
    )
    return e.select(
        "user_id",
        "event_id",
        mov_sum.alias("mov_sum"),
        F.min("value").over(w).alias("mov_min"),
        F.max("value").over(w).alias("mov_max"),
        F.count(F.lit(1)).over(w).alias("mov_n"),
    )


@query(
    "w_ntile_deciles",
    oracle=f"""
WITH d AS (
  SELECT event_type, value,
         NTILE(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS decile
  FROM events
)
SELECT event_type, decile, COUNT(*) AS n, {dsum_sql('value')} AS sum_value
FROM d GROUP BY event_type, decile
""",
)
def w_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE decile bucketing per event_type — the quality-decile cut used to
    stratify training corpora. Total order (value, event_id) makes bucket
    edges deterministic. At 100 TB swap the per-key total sort for
    approxQuantile edges + a bucketize join (see p7_band_extraction); NTILE
    itself is the exact small-key face."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        e.withColumn("decile", F.ntile(10).over(w))
        .groupBy("event_type", "decile")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
    )


@query(
    "w_rank_tail",
    oracle="""
WITH d AS (
  SELECT event_type, event_id, value,
         PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value, event_id) AS pr,
         CUME_DIST()    OVER (PARTITION BY event_type ORDER BY value, event_id) AS cd
  FROM events
)
SELECT event_type, event_id, value, pr, cd
FROM d WHERE cd <= 0.05
""",
)
def w_rank_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-distribution functions: the bottom-5% tail per event_type by
    PERCENT_RANK / CUME_DIST — integer-ratio ranks over a unique total order,
    so the doubles are bit-identical across engines. The distribution-tail
    extraction pattern (outlier review queues)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        e.select(
            "event_type",
            "event_id",
            "value",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        )
        .filter(F.col("cd") <= 0.05)
    )


@query(
    "agg_cube",
    oracle=f"""
WITH d AS (SELECT event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day, value FROM events)
SELECT event_type, day,
       CAST(GROUPING(event_type) AS INT) AS g_type,
       CAST(GROUPING(day) AS INT) AS g_day,
       COUNT(*) AS n, {dsum_sql('value')} AS sum_value
FROM d GROUP BY CUBE (event_type, day)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: all four aggregation lattices (type×day, type,
    day, grand total) in one pass — Spark expands grouping sets before the
    exchange so partial aggregation still combines map-side; a naive
    union-of-groupbys would re-scan the fact table 4×."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value"
    )
    return e.cube("event_type", "day").agg(
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("day").cast("int").alias("g_day"),
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("sum_value"),
    )


@query(
    "join_cross_matrix",
    oracle="""
SELECT a.r_name AS from_region, b.r_name AS to_region,
       CAST(a.r_regionkey = b.r_regionkey AS INT) AS is_self
FROM region a CROSS JOIN region b
""",
)
def join_cross_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Cartesian product of a tiny dimension with itself — the
    route/transfer-matrix shape. Planned as BroadcastNestedLoopJoin (both
    sides under the broadcast threshold); a cross join is only ever sane when
    at least one side broadcasts, which this asserts by construction."""
    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("from_region"), F.col("r_regionkey").alias("__ka"))
    b = r.select(F.col("r_name").alias("to_region"), F.col("r_regionkey").alias("__kb"))
    return a.crossJoin(F.broadcast(b)).select(
        "from_region",
        "to_region",
        (F.col("__ka") == F.col("__kb")).cast("int").alias("is_self"),
    )


EWMA_ALPHA = 0.25  # exactly representable in binary — products stay exact


def _ewma_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-key EWMA recurrence y_i = α·x_i + (1-α)·y_{i-1}, y_0 = x_0.

    Plain float64 loop: the identical IEEE-754 expression tree the oracle's
    recursive CTE evaluates, so results are bit-exact. Sequential per key by
    nature; parallelism comes from distributing keys."""
    pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
    x = pdf["value"].to_numpy(dtype=np.float64)
    y = np.empty_like(x)
    acc = x[0] if len(x) else 0.0
    for i in range(len(x)):
        acc = EWMA_ALPHA * x[i] + (1.0 - EWMA_ALPHA) * acc if i else x[0]
        y[i] = acc
    out = pdf[["user_id", "event_id", "value"]].copy()
    out["rn"] = np.arange(1, len(x) + 1, dtype=np.int64)
    out["ewma"] = y
    return out


@query(
    "w_ewma",
    oracle="""
WITH RECURSIVE t AS (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
s AS (
  SELECT user_id, event_id, value, rn, CAST(value AS DOUBLE) AS ewma
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.user_id, t.event_id, t.value, t.rn,
         0.25 * t.value + 0.75 * s.ewma
  FROM t JOIN s ON t.user_id = s.user_id AND t.rn = s.rn + 1
)
SELECT user_id, event_id, value, rn, ewma FROM s
""",
)
def w_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per sensor key — the smoothing
    recurrence block-mean coarsening approximates (reference decimate.py).

    Inherently serial within a key (y_t depends on y_{t-1}); expressed as
    applyInPandas so each key's series runs as one Arrow-batched numpy loop
    while keys distribute across the cluster. The oracle is a recursive CTE
    evaluating the same double arithmetic — results hash-match bit-exactly.
    At 100 TB: state per task is one float per key; for a skewed key (a
    sensor with billions of points) use operators/scan.chunked_ewma — the
    two-pass Blelloch-style chunked scan that parallelizes the same
    recurrence across time buckets (fp-reassociation tolerance ~1e-12, so
    the bit-exact oracle query stays on this serial kernel)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    return e.groupBy("user_id").applyInPandas(
        _ewma_group,
        schema="user_id bigint, event_id bigint, value double, rn bigint, ewma double",
    )


@query(
    "streaming_session_window",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
                OR LAG(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM numbered GROUP BY user_id, sid
""",
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window operator (batch mode here; the same
    expression runs under readStream with a watermark — streaming/windows.py
    and tests/test_streaming.py prove batch≡stream equivalence). Sessions
    close after a 30-minute gap; window end = last event + gap, which the
    oracle replays with the gaps-and-islands formulation — proving the
    built-in operator and the classic SQL idiom agree row-for-row."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       {dsum_sql('l_extendedprice')} AS sum_price,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the irregular-lattice case ROLLUP/CUBE can't
    express (here: pair, status-only, grand total; no flag-only level). One
    Expand + one exchange, same single-pass economics as rollup; GROUPING()
    markers disambiguate subtotal rows from real NULL keys."""
    e = load_table(spark, sf_dir, "lineitem")
    e.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               {dsum_sql('l_extendedprice')} AS sum_price,
               COUNT(*) AS n
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
    """)
