"""QA/QC operator queries: bitmask decode, span flags, climatology,
positional digit-string flags, rollups (SURVEY §2.2 P6, §2.3 J4/J5,
§2.4 A10/A11, §2.5 W5).

The driver corpus has no instrument tables, so the QC semantics are exercised
on the events table: ``event_id % 256`` plays the role of the ``qc_executed``
bitmask, ``user_id % 256`` the ``qc_results`` bitmask, and ``value`` the
measured parameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rca_data_tools_spark.functions.numeric import dsum, dsum_sql
from rca_data_tools_spark.functions.qc import qc_test_flags, rollup_flags, span_flag
from rca_data_tools_spark.operators.flagging import climatology_flags, gross_range_flags
from rca_data_tools_spark.queries._registry import query
from rca_data_tools_spark.sources.readers import load_table

# Gross-range spans per event_type (the gross_range dimension of
# FIXTURES.md §3; reference semantics qaqc/calculate.py:100-115).
GROSS_RANGE_ROWS = [
    ("click", 0.0, 450.0, 10.0, 300.0),
    ("view", 0.0, 450.0, 10.0, 300.0),
    ("purchase", 5.0, 480.0, 20.0, 400.0),
    ("signup", 0.0, 400.0, 5.0, 250.0),
    ("error", 0.0, 350.0, 2.0, 200.0),
]
_GR_VALUES_SQL = ", ".join(f"('{t}', {fl}, {fh}, {sl}, {sh})" for t, fl, fh, sl, sh in GROSS_RANGE_ROWS)


@query(
    "j5_gross_range_flags",
    oracle=f"""
WITH gr(event_type, fail_lo, fail_hi, sus_lo, sus_hi) AS (VALUES {_GR_VALUES_SQL})
SELECT e.event_type,
       CASE WHEN e.value IS NULL THEN 9
            WHEN e.value < gr.fail_lo OR e.value > gr.fail_hi THEN 4
            WHEN e.value < gr.sus_lo OR e.value > gr.sus_hi THEN 3
            ELSE 1 END AS gross_range_flag,
       COUNT(*) AS n
FROM events e LEFT JOIN gr USING (event_type)
GROUP BY 1, 2
""",
)
def j5_gross_range_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast gross-range dimension join + span test + flag histogram."""
    e = load_table(spark, sf_dir, "events")
    # VALUES via SQL keeps the literal dim JVM-side (createDataFrame would
    # spin up a Python RDD worker just to ship 5 rows).
    dim = spark.sql(
        f"SELECT * FROM VALUES {_GR_VALUES_SQL} AS t(event_type, fail_lo, fail_hi, sus_lo, sus_hi)"
    )
    flagged = gross_range_flags(e, dim, value_col="value", join_keys=["event_type"])
    return flagged.groupBy("event_type", "gross_range_flag").agg(F.count(F.lit(1)).alias("n"))


@query(
    "j4_climatology_flags",
    oracle="""
WITH clim AS (
  SELECT event_type,
         CAST(FLOOR(EPOCH(ts) / 86400) % 7 AS INT) AS dow,
         CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(28,4))) AS DOUBLE) / COUNT(value) AS mean_v,
         SQRT(GREATEST(
           (CAST(SUM(CAST(ROUND(value * value, 8) AS DECIMAL(28,8))) AS DOUBLE)
            - COUNT(value) * POW(CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(28,4))) AS DOUBLE) / COUNT(value), 2))
           / (COUNT(value) - 1), 0.0)) AS std_v
  FROM events GROUP BY 1, 2
)
SELECT e.event_type,
       CASE WHEN e.value IS NULL THEN 9
            WHEN c.mean_v IS NULL THEN 9
            WHEN e.value < c.mean_v - 3 * c.std_v OR e.value > c.mean_v + 3 * c.std_v THEN 3
            ELSE 1 END AS climatology_flag,
       COUNT(*) AS n
FROM events e
LEFT JOIN clim c
  ON e.event_type = c.event_type
 AND CAST(FLOOR(EPOCH(e.ts) / 86400) % 7 AS INT) = c.dow
GROUP BY 1, 2
""",
)
def j4_climatology_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Climatology test (reference: qaqc/calculate.py:130-193): per
    (event_type, day-of-week) mean±3σ bounds derived from the data itself,
    broadcast back onto the stream, values outside -> suspect(3).

    The bounds table is tiny (types × 7) — the fact scan joins it broadcast,
    so the whole flagging pass is shuffle-free at any scale; only the bounds
    aggregation shuffles (partial-agg combined).
    """
    e = load_table(spark, sf_dir, "events").withColumn(
        "dow", (F.floor(F.unix_timestamp("ts") / 86400) % 7).cast("int")
    )
    n = F.count("value")
    sx = F.sum(F.round(F.col("value"), 4).cast("decimal(28,4)")).cast("double")
    sxx = F.sum(F.round(F.col("value") * F.col("value"), 8).cast("decimal(28,8)")).cast("double")
    mean_v = (sx / n).alias("mean_v")
    std_v = F.sqrt(F.greatest((sxx - n * F.pow(sx / n, 2)) / (n - 1), F.lit(0.0))).alias("std_v")
    clim = e.groupBy("event_type", "dow").agg(mean_v, std_v)
    joined = e.join(F.broadcast(clim), ["event_type", "dow"], "left")
    flag = (
        F.when(F.col("value").isNull(), F.lit(9))
        .when(F.col("mean_v").isNull(), F.lit(9))
        .when(
            (F.col("value") < F.col("mean_v") - 3 * F.col("std_v"))
            | (F.col("value") > F.col("mean_v") + 3 * F.col("std_v")),
            F.lit(3),
        )
        .otherwise(F.lit(1))
    )
    return (
        joined.withColumn("climatology_flag", flag)
        .groupBy("event_type", "climatology_flag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "qc_bitmask_decode",
    oracle="""
SELECT event_type,
       GREATEST(1,
         CASE WHEN (((event_id % 256) >> 0) & 1) = 0 THEN 2 WHEN (((user_id % 256) >> 0) & 1) = 1 THEN 1 ELSE 4 END,
         CASE WHEN (((event_id % 256) >> 1) & 1) = 0 THEN 2 WHEN (((user_id % 256) >> 1) & 1) = 1 THEN 1 ELSE 4 END,
         CASE WHEN (((event_id % 256) >> 2) & 1) = 0 THEN 2 WHEN (((user_id % 256) >> 2) & 1) = 1 THEN 1 ELSE 4 END,
         CASE WHEN (((event_id % 256) >> 3) & 1) = 0 THEN 2 WHEN (((user_id % 256) >> 3) & 1) = 1 THEN 1 ELSE 4 END
       ) AS summary_flag,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2
""",
)
def qc_bitmask_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OOI QC bitmask decode + summary rollup (reference: retrieve_qc,
    qaqc/dashboard.py:2031-2061): bit i of executed/results -> per-test
    QARTOD flag, then row-wise max with floor 1."""
    e = load_table(spark, sf_dir, "events")
    executed = (F.col("event_id") % 256).cast("int")
    results = (F.col("user_id") % 256).cast("int")
    flags = [qc_test_flags(executed, results, bit) for bit in range(4)]
    return (
        e.withColumn("summary_flag", rollup_flags(*flags))
        .groupBy("event_type", "summary_flag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "w5_positional_flags",
    oracle="""
WITH encoded AS (
  SELECT event_id, event_type,
         CONCAT(
           CASE WHEN value > 300.0 THEN 3 ELSE 1 END,
           CASE WHEN value < 1.0 THEN 4 ELSE 1 END,
           CASE WHEN event_type = 'error' THEN 3 ELSE 1 END
         ) AS qartod_executed
  FROM events
)
SELECT event_type, qartod_executed,
       CAST(SUBSTRING(qartod_executed, 1, 1) AS INT) AS test1,
       CAST(SUBSTRING(qartod_executed, 2, 1) AS INT) AS test2,
       CAST(SUBSTRING(qartod_executed, 3, 1) AS INT) AS test3,
       COUNT(*) AS n
FROM encoded
GROUP BY 1, 2, 3, 4, 5
""",
)
def w5_positional_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional digit-string encode + decode round trip (reference:
    calculateFunctions.py:19-46 encode, qaqc/utils.py:20-33 decode)."""
    from rca_data_tools_spark.functions.qc import decode_positional_flags, encode_positional_flags

    e = load_table(spark, sf_dir, "events")
    flags = [
        F.when(F.col("value") > 300.0, F.lit(3)).otherwise(F.lit(1)),
        F.when(F.col("value") < 1.0, F.lit(4)).otherwise(F.lit(1)),
        F.when(F.col("event_type") == "error", F.lit(3)).otherwise(F.lit(1)),
    ]
    enc = e.withColumn("qartod_executed", encode_positional_flags(flags))
    for name, col in decode_positional_flags("qartod_executed", 3):
        enc = enc.withColumn(name, col)
    return enc.groupBy("event_type", "qartod_executed", "test1", "test2", "test3").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "a10_bit_or_rollup",
    oracle="""
SELECT user_id,
       BIT_OR(CAST(event_id % 256 AS INTEGER)) AS tests_executed_mask,
       MAX(CASE WHEN value > 300.0 THEN 3 ELSE 1 END) AS max_flag
FROM events
GROUP BY user_id
""",
)
def a10_bit_or_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise-OR reduce of executed-test masks per key (reference:
    np.bitwise_or.reduce, qaqc/dashboard.py:2043) + max-flag rollup."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.bit_or((F.col("event_id") % 256).cast("int")).alias("tests_executed_mask"),
        F.max(F.when(F.col("value") > 300.0, F.lit(3)).otherwise(F.lit(1))).alias("max_flag"),
    )


@query(
    "qc_climatology_build",
    oracle=f"""
WITH stats AS (
  SELECT month(ts) AS clim_month,
         CAST(FLOOR(value / 100.0) AS BIGINT) AS bracket,
         {dsum_sql('value')} AS s1,
         {dsum_sql('value * value')} AS s2,
         COUNT(value) AS n
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
)
SELECT clim_month, bracket, n,
       s1 / n AS mean_v,
       s1 / n - 3.0 * SQRT((s2 - s1 * s1 / n) / (n - 1)) AS clim_lo,
       s1 / n + 3.0 * SQRT((s2 - s1 * s1 / n) / (n - 1)) AS clim_hi
FROM stats
WHERE n >= 2
""",
)
def qc_climatology_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Climatology table CONSTRUCTION — the producer side of the monthly
    mean±3σ brackets the reference only consumes as prebuilt CSV
    (qaqc/qartod.py:83-106; the mean-3σ/mean+3σ span convention from its
    climatology dict). One map-side-combined pass builds every (month,
    bracket) row; mean and σ derive from decimal-exact Σx and Σx² in the
    identical expression order on both engines, so the bounds are
    bit-reproducible. At 100 TB this is the same single-shuffle shape as any
    rollup: no per-month scans, no driver-side loops."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    stats = e.groupBy(
        F.month("ts").alias("clim_month"),
        F.floor(F.col("value") / 100.0).cast("long").alias("bracket"),
    ).agg(
        dsum("value").alias("s1"),
        dsum(F.col("value") * F.col("value")).alias("s2"),
        F.count("value").alias("n"),
    )
    mean = F.col("s1") / F.col("n")
    std = F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1))
    return (
        stats.filter(F.col("n") >= 2)
        .select(
            "clim_month", "bracket", "n",
            mean.alias("mean_v"),
            (mean - 3.0 * std).alias("clim_lo"),
            (mean + 3.0 * std).alias("clim_hi"),
        )
    )


@query(
    "qc_flag_transitions",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN value < 5.0 OR value > 200.0 THEN 4
              WHEN value < 15.0 OR value > 150.0 THEN 3
              ELSE 1 END AS flag
  FROM events
),
seq AS (
  SELECT user_id, flag,
         LAG(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_flag
  FROM flagged
)
SELECT prev_flag, flag, COUNT(*) AS n
FROM seq WHERE prev_flag IS NOT NULL
GROUP BY 1, 2
""",
)
def qc_flag_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QC flag transition matrix: per-series lag over the QARTOD-style
    good(1)/suspect(3)/fail(4) state, counted into a (prev, next) matrix —
    the stability diagnostic behind alarm-fatigue tuning (how often series
    flip states vs dwell).

    Scale shape: one window partitioned by series (parallel across keys,
    (ts, event_id) total order so ranks are partition-independent), then a
    map-side-combined count onto at most 9 matrix cells.
    """
    e = load_table(spark, sf_dir, "events")
    flag = (
        F.when((F.col("value") < 5.0) | (F.col("value") > 200.0), 4)
        .when((F.col("value") < 15.0) | (F.col("value") > 150.0), 3)
        .otherwise(1)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select("user_id", "ts", "event_id", flag.alias("flag")).withColumn(
        "prev_flag", F.lag("flag").over(w)
    )
    return (
        seq.filter(F.col("prev_flag").isNotNull())
        .groupBy("prev_flag", "flag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "qc_flat_line",
    oracle="""
WITH sig AS (
  SELECT user_id, ts, event_id, CAST(FLOOR(value / 100) AS BIGINT) AS level
  FROM events
), lagged AS (
  SELECT user_id, ts, event_id, level,
         LAG(level, 1) OVER w AS p1, LAG(level, 2) OVER w AS p2,
         LAG(level, 3) OVER w AS p3, LAG(level, 4) OVER w AS p4
  FROM sig WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id, ts, level,
       CASE WHEN p2 IS NULL THEN 2
            WHEN level = p1 AND level = p2 AND level = p3 AND level = p4 THEN 4
            WHEN level = p1 AND level = p2 THEN 3
            ELSE 1 END AS flat_flag
FROM lagged
""",
)
def qc_flat_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QARTOD flat-line test (IOOS QARTOD test 8): a sensor reporting the
    SAME value for too many consecutive samples indicates a stuck sensor or
    an obstructed flow cell. Flag 4 (fail) when the current reading equals
    the previous 4, flag 3 (suspect) at 2 repeats, flag 2 (not evaluated)
    while the series is too short, else 1. The measured signal here is the
    value quantized to 100-unit levels (the events corpus is continuous;
    a real sensor's repeated raw values play the same role).

    Complements the engine's other QARTOD tests (gross range j5,
    climatology j4, step/spike w1, gap w3) — reference analogue: the PCO2W
    flat-intensity masks (calculateFunctions.py:932-975) generalized to the
    standard per-series time-domain form.

    Scale shape: one hash shuffle on the series key; four lags share one
    window frame in a single pass; flags are a codegen'd CASE."""
    e = load_table(spark, sf_dir, "events")
    level = F.floor(F.col("value") / 100).cast("bigint")
    sig = e.select("user_id", "ts", "event_id", level.alias("level"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = {k: F.lag("level", k).over(w) for k in (1, 2, 3, 4)}
    eq = lambda k: F.col("level") == lags[k]  # noqa: E731
    flag = (
        F.when(lags[2].isNull(), F.lit(2))
        .when(eq(1) & eq(2) & eq(3) & eq(4), F.lit(4))
        .when(eq(1) & eq(2), F.lit(3))
        .otherwise(F.lit(1))
    )
    return sig.select("user_id", "event_id", "ts", "level", flag.alias("flat_flag"))


@query(
    "qc_spike_test",
    oracle="""
WITH lagged AS (
  SELECT user_id, event_id, ts, value,
         LAG(value) OVER w AS prev_v, LEAD(value) OVER w AS next_v
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), scored AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN prev_v IS NULL OR next_v IS NULL THEN NULL
              ELSE ROUND(ABS(value - (prev_v + next_v) / 2), 6) END AS spike_mag
  FROM lagged
)
SELECT user_id, event_id, ts, value, spike_mag,
       CASE WHEN spike_mag IS NULL THEN 2
            WHEN spike_mag > 200.0 THEN 4
            WHEN spike_mag > 120.0 THEN 3
            ELSE 1 END AS spike_flag
FROM scored
""",
)
def qc_spike_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QARTOD spike test (IOOS QARTOD test 6): a point is a spike when it
    deviates from the midpoint of its neighbors by more than a threshold —
    flag 4 above the fail threshold, 3 above suspect, 2 where a neighbor is
    missing (series edges), else 1. One lag + one lead in a single
    series-partitioned window pass; the magnitude is rounded once so the
    flag boundaries are engine-exact.

    Completes the engine's time-domain QARTOD family (gross range j5,
    climatology j4, step w1, gap w3, flat line qc_flat_line)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_v, next_v = F.lag("value").over(w), F.lead("value").over(w)
    mag = F.when(
        prev_v.isNull() | next_v.isNull(), F.lit(None).cast("double")
    ).otherwise(F.round(F.abs(F.col("value") - (prev_v + next_v) / 2), 6))
    scored = e.select("user_id", "event_id", "ts", "value", mag.alias("spike_mag"))
    flag = (
        F.when(F.col("spike_mag").isNull(), 2)
        .when(F.col("spike_mag") > 200.0, 4)
        .when(F.col("spike_mag") > 120.0, 3)
        .otherwise(1)
    )
    return scored.select("*", flag.alias("spike_flag"))


@query(
    "qc_rate_of_change",
    oracle="""
WITH lagged AS (
  SELECT user_id, event_id, ts, value,
         LAG(value) OVER w AS prev_v, LAG(ts) OVER w AS prev_ts
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), stats AS (
  SELECT user_id,
         COUNT(value) AS n,
         CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(value * value, 12) AS DECIMAL(28,12))) AS DOUBLE) AS sxx
  FROM events GROUP BY user_id
), thr AS (
  SELECT user_id, 3.0 * SQRT((sxx - sx * sx / n) / (n - 1)) AS sd3
  FROM stats WHERE n > 1
)
SELECT l.user_id, l.event_id, l.ts,
       CASE WHEN l.prev_v IS NULL THEN NULL
            ELSE ROUND(ABS(l.value - l.prev_v)
                       / GREATEST((epoch_ms(l.ts) - epoch_ms(l.prev_ts)) / 60000.0,
                                  0.016666666666666666), 6) END AS roc_per_min,
       CASE WHEN l.prev_v IS NULL THEN 2
            WHEN ROUND(ABS(l.value - l.prev_v)
                       / GREATEST((epoch_ms(l.ts) - epoch_ms(l.prev_ts)) / 60000.0,
                                  0.016666666666666666), 6) > t.sd3 THEN 3
            ELSE 1 END AS roc_flag
FROM lagged l JOIN thr t ON t.user_id = l.user_id
""",
)
def qc_rate_of_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QARTOD rate-of-change test (IOOS QARTOD test 7): flag 3 (suspect)
    when |Δvalue| per minute exceeds 3 standard deviations of the series'
    values, 2 at series starts, else 1. The per-series threshold comes from
    ONE decimal-exact aggregation (n, Σx, Σx²) broadcast back onto the
    lag pass — the fact table shuffles once on the series key and the dim
    is series-sized.

    Time gaps are floored at one second so bursts of rapid samples do not
    divide by ~zero; the rate and threshold round/derive identically in
    both engines (the sd expression tree matches the oracle's exactly)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_v, prev_ts = F.lag("value").over(w), F.lag("ts").over(w)
    dt_min = F.greatest(
        (F.unix_millis("ts") - F.unix_millis(prev_ts)) / 60000.0,
        F.lit(1.0 / 60.0),
    )
    roc = F.when(prev_v.isNull(), F.lit(None).cast("double")).otherwise(
        F.round(F.abs(F.col("value") - prev_v) / dt_min, 6)
    )
    lagged = e.select(
        "user_id", "event_id", "ts", roc.alias("roc_per_min")
    )
    n = F.count("value")
    sx = dsum("value")
    sxx = dsum(F.col("value") * F.col("value"), 12)
    stats = e.groupBy("user_id").agg(n.alias("n"), sx.alias("sx"), sxx.alias("sxx"))
    thr = stats.filter(F.col("n") > 1).select(
        "user_id",
        (3.0 * F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1))).alias("sd3"),
    )
    joined = lagged.join(F.broadcast(thr), "user_id")
    flag = (
        F.when(F.col("roc_per_min").isNull(), 2)
        .when(F.col("roc_per_min") > F.col("sd3"), 3)
        .otherwise(1)
    )
    return joined.select(
        "user_id", "event_id", "ts", "roc_per_min", flag.alias("roc_flag")
    )


@query(
    "streaming_qaqc_rollup",
    oracle="""
WITH dim AS (
  SELECT user_id, 0.0 AS fail_lo, 400.0 AS fail_hi, 10.0 AS sus_lo, 300.0 AS sus_hi
  FROM range(150) t(user_id)
),
f AS (
  SELECT e.user_id, DATE_TRUNC('day', e.ts) AS window_start, e.value,
         CASE WHEN e.value IS NULL THEN 9
              WHEN e.value < d.fail_lo OR e.value > d.fail_hi THEN 4
              WHEN e.value < d.sus_lo OR e.value > d.sus_hi THEN 3
              ELSE 1 END AS fl
  FROM events e LEFT JOIN dim d USING (user_id)
)
SELECT user_id, CAST(window_start AS TIMESTAMP) AS window_start,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN fl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN fl = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_suspect,
       CAST(SUM(CASE WHEN fl = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_fail,
       CAST(SUM(CASE WHEN fl = 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM f GROUP BY 1, 2
""",
)
def streaming_qaqc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's QA/QC main path as a continuously-running streaming
    job (streaming/windows.py:stream_qaqc_rollup), here on the batch frame
    for the hash row: stateless broadcast gross-range flagging + per-(key,
    1-day window) flag histogram and value extremes — what the scheduled
    batch re-run becomes when the instrument feed is a stream."""
    from rca_data_tools_spark.streaming.windows import stream_qaqc_rollup

    e = load_table(spark, sf_dir, "events")
    dim = spark.sql(
        "SELECT id AS user_id, 0.0 AS fail_lo, 400.0 AS fail_hi, "
        "10.0 AS sus_lo, 300.0 AS sus_hi FROM range(150)"
    )
    return stream_qaqc_rollup(
        e, dim, key_col="user_id", ts_col="ts", val_col="value",
        window_duration="1 day",
    )
