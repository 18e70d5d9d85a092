"""Window-function operator queries (SURVEY §2.5): lag step test, lead
interval building, gap detection, linear interpolate-NA, LTTB, coarsen,
argmax/argmin (§2.6 O6/O7), sub-period grouping keys (§2.9)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rca_data_tools_spark.functions.numeric import davg, davg_sql
from rca_data_tools_spark.operators.decimate import block_mean, lttb
from rca_data_tools_spark.operators.interpolate import interpolate_na
from rca_data_tools_spark.queries._lttb_oracle import lttb_keep_ctes
from rca_data_tools_spark.queries._registry import query
from rca_data_tools_spark.sources.readers import load_table


@query(
    "w1_lag_step_flags",
    oracle="""
WITH d AS (
  SELECT user_id, event_id, value,
         value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step
  FROM events
)
SELECT user_id,
       COUNT(*) FILTER (WHERE ABS(step) > 400.0) AS n_steps,
       COUNT(*) AS n
FROM d GROUP BY user_id
""",
)
def w1_lag_step_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step test: |x - lag(x)| > threshold flags pump-failure-style jumps
    (reference: calculateFunctions.py:861-870). Tie-broken by event_id."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    step = F.col("value") - F.lag("value").over(w)
    return (
        e.withColumn("step", step)
        .groupBy("user_id")
        .agg(
            F.count(F.when(F.abs(F.col("step")) > 400.0, F.lit(1))).alias("n_steps"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "w2_lead_intervals",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate AS valid_start,
       COALESCE(LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                TIMESTAMP '2002-01-01 00:00:00') AS valid_stop
FROM orders
""",
)
def w2_lead_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval building: valid_stop = next start, last clipped to a sentinel
    (reference: valid_stop = cal_date.shift(-1), qaqc/utils.py:186-191)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("valid_start"),
        F.coalesce(
            F.lead("o_orderdate").over(w), F.lit("2002-01-01 00:00:00").cast("timestamp")
        ).alias("valid_stop"),
    )


@query(
    "w3_gap_detection",
    oracle="""
WITH d AS (
  SELECT user_id,
         epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
  FROM events
)
SELECT user_id,
       COUNT(*) FILTER (WHERE gap_ms > 3600000) AS n_gaps,
       MAX(gap_ms) AS max_gap_ms
FROM d GROUP BY user_id
""",
)
def w3_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling-gap detection (reference: np.diff(times) > threshold,
    qaqc/dashboard.py:962-967). Millisecond epoch keeps both engines integral."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts"))
    gap = ms - F.lag(ms).over(w)
    return (
        e.withColumn("gap_ms", gap)
        .groupBy("user_id")
        .agg(
            F.count(F.when(F.col("gap_ms") > 3600000, F.lit(1))).alias("n_gaps"),
            F.max("gap_ms").alias("max_gap_ms"),
        )
    )


@query(
    "w6_interpolate_na",
    oracle="""
WITH base AS (
  SELECT user_id, event_id, ts, epoch_ms(ts) AS ms,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
  FROM events
), filled AS (
  SELECT user_id, event_id, ts, ms, v,
    LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    LAST_VALUE(CASE WHEN v IS NOT NULL THEN ms END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
    FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN ms END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
  FROM base
)
SELECT user_id, event_id,
       CASE WHEN v IS NOT NULL THEN v
            WHEN prev_v IS NULL THEN next_v
            WHEN next_v IS NULL THEN prev_v
            WHEN next_t = prev_t THEN prev_v
            ELSE prev_v + (next_v - prev_v) * ((ms - prev_t) / (next_t - prev_t))
       END AS value_interp
FROM filled
""",
)
def w6_interpolate_na(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolate-NA over time (reference: calculateFunctions.py:103).
    'error' rows play the NULL runs; ffill/bfill at the edges."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "error", F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    out = interpolate_na(e, ["user_id"], "ts", "v", out_col="value_interp")
    return out.select("user_id", "event_id", "value_interp")


@query(
    "o6_argmax_per_bucket",
    oracle="""
WITH b AS (
  SELECT user_id, CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day_bucket, event_id, value
  FROM events
), m AS (
  SELECT user_id, day_bucket, MAX(value) AS max_value FROM b GROUP BY 1, 2
)
SELECT b.user_id, b.day_bucket, m.max_value, MIN(b.event_id) AS argmax_event
FROM b JOIN m ON b.user_id = m.user_id AND b.day_bucket = m.day_bucket AND b.value = m.max_value
GROUP BY 1, 2, 3
""",
)
def o6_argmax_per_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax within bucket (reference: LTTB point pick, decimate.py:143-145)
    via max + join-back with deterministic min-id tie-break."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "day_bucket", F.floor(F.unix_timestamp("ts") / 86400).cast("long")
    )
    m = (
        e.groupBy("user_id", "day_bucket")
        .agg(F.max("value").alias("max_value"))
        .withColumnRenamed("user_id", "m_user")
        .withColumnRenamed("day_bucket", "m_bucket")
    )
    return (
        e.join(
            m,
            (e["user_id"] == m["m_user"]) & (e["day_bucket"] == m["m_bucket"]) & (e["value"] == m["max_value"]),
        )
        .groupBy("m_user", "m_bucket", "max_value")
        .agg(F.min("event_id").alias("argmax_event"))
        .select(
            F.col("m_user").alias("user_id"),
            F.col("m_bucket").alias("day_bucket"),
            "max_value",
            "argmax_event",
        )
    )


@query(
    "o7_argmin_nearest",
    oracle="""
WITH d AS (SELECT event_id, user_id, value, ABS(value - 250.0) AS dist FROM events),
m AS (SELECT user_id, MIN(dist) AS min_dist FROM d GROUP BY 1)
SELECT d.user_id, m.min_dist, MIN(d.event_id) AS nearest_event
FROM d JOIN m ON d.user_id = m.user_id AND d.dist = m.min_dist
GROUP BY 1, 2
""",
)
def o7_argmin_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin |x - target| (reference: nearest-wavelength pick,
    calculateFunctions.py:678-689)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.abs(F.col("value") - 250.0).alias("dist")
    )
    m = e.groupBy("user_id").agg(F.min("dist").alias("min_dist")).withColumnRenamed("user_id", "m_user")
    return (
        e.join(m, (e["user_id"] == m["m_user"]) & (e["dist"] == m["min_dist"]))
        .groupBy("m_user", "min_dist")
        .agg(F.min("event_id").alias("nearest_event"))
        .select(F.col("m_user").alias("user_id"), "min_dist", "nearest_event")
    )


@query(
    "coarsen_block_mean",
    oracle=f"""
WITH numbered AS (
  SELECT user_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
  FROM events
), bucketed AS (
  SELECT user_id, CAST(FLOOR(rn / 10) AS BIGINT) AS bucket, MIN(ts) AS ts,
         {davg_sql('value')} AS value, COUNT(*) AS n
  FROM numbered GROUP BY 1, 2
)
SELECT user_id, ts, value FROM bucketed WHERE n = 10
""",
)
def coarsen_block_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-block downsample mean with trim boundary (reference:
    ds.coarsen(time=w, boundary='trim').mean(), qaqc/plots.py:193-201)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "value", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    bucketed = e.withColumn("bucket", F.floor((F.row_number().over(w) - 1) / 10))
    out = bucketed.groupBy("user_id", "bucket").agg(
        F.min("ts").alias("ts"), davg("value").alias("value"), F.count(F.lit(1)).alias("n")
    )
    return out.filter(F.col("n") == 10).select("user_id", "ts", "value")


@query(
    "w4_lttb_decimation",
    oracle=f"""
WITH RECURSIVE
{lttb_keep_ctes("SELECT user_id, ts, value FROM events", threshold=50)}
SELECT b.user_id, b.ts, b.value
FROM base b JOIN keep k ON k.user_id = b.user_id AND k.rn = b.rn
""",
)
def w4_lttb_decimation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact LTTB decimation to 50 points per user series via mapInPandas
    (reference: qaqc/decimate.py:94-163). The sequential bucket recurrence
    (each pick depends on the previous pick) is replayed bit-exactly by a
    DuckDB recursive CTE: identical float64 arithmetic — epoch-ns x values,
    linspace edge truncation, triangle-area argmax with NaN->-1 and first-hit
    ties — so results hash-match, not just count-match. Exact at the
    correctness SF, where next-bucket centroids average <=2 points; much
    larger buckets could diverge in float summation order (numpy pairwise vs
    sequential AVG), which the bench SF tolerates (no hash gate there)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    out = lttb(e, ["user_id"], "ts", "value", threshold=50)
    return out.select("user_id", "ts", "value")


@query(
    "subperiod_grouping",
    oracle="""
SELECT user_id,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_key,
       weekofyear(ts) AS iso_week,
       month(ts) AS month_key,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2, 3, 4
""",
)
def subperiod_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-period grouping keys: day / ISO-week / month (reference:
    qaqc/dashboard.py:1282-1295)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day_key"),
        F.weekofyear("ts").alias("iso_week"),
        F.month("ts").alias("month_key"),
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "w_mad_outliers",
    oracle="""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1
),
mad AS (
  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type) GROUP BY 1
)
SELECT m.event_type, ROUND(m.med, 6) AS med, ROUND(d.mad, 6) AS mad,
       COUNT(*) AS n,
       SUM(CASE WHEN abs(e.value - m.med) > 4.4478 * d.mad
                THEN 1 ELSE 0 END)::BIGINT AS n_outliers
FROM events e
JOIN med m USING (event_type)
JOIN mad d USING (event_type)
GROUP BY m.event_type, m.med, d.mad
""",
)
def w_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-series outlier census: median absolute deviation with the
    standard 3-sigma-equivalent cut (|x - med| > 3 * 1.4826 * MAD = 4.4478
    * MAD) — the robust alternative to the mean/stddev spike tests, immune
    to the outliers it is hunting.

    Scale shape: two map-side-combined aggregations onto the (few) series
    keys, each broadcast back onto the fact scan — the fact table never
    shuffles. The exact median sorts inside the aggregation buffer; at
    100 TB swap percentile -> percentile_approx (same plan shape). Spark's
    percentile and DuckDB's quantile_cont share the p*(n-1) interpolation
    and are bit-identical on doubles (a15 precedent).
    """
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    with_med = e.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    full = with_med.join(F.broadcast(mad), "event_type")
    return full.groupBy("event_type", "med", "mad").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                F.abs(F.col("value") - F.col("med")) > F.lit(4.4478) * F.col("mad"),
                1,
            ).otherwise(0)
        ).alias("n_outliers"),
    ).select(
        "event_type",
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        "n",
        "n_outliers",
    )


@query(
    "w_seasonal_decompose",
    oracle="""
WITH base AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod, value
  FROM events
),
hourly AS (
  SELECT event_type, hod,
         COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sx
  FROM base GROUP BY 1, 2
),
overall AS (
  SELECT event_type,
         COUNT(*) AS n_all,
         CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sx_all
  FROM base GROUP BY 1
)
SELECT h.event_type, h.hod, h.n,
       ROUND(h.sx / h.n, 6) AS hour_mean,
       ROUND(h.sx / h.n - o.sx_all / o.n_all, 6) AS seasonal_delta
FROM hourly h JOIN overall o USING (event_type)
""",
)
def w_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per series: the mean at each hour and
    its delta from the series mean — the additive seasonal component of a
    classic decomposition, and the sub-daily analogue of the climatology
    dimension (j4 flags against it; reference: monthly climatology tables).

    Scale shape: two map-side-combined aggregations over one scan — the
    (type, hour) table is dim-sized (|types| x 24) and the per-type means
    broadcast back onto it. Decimal sums make both means engine-exact."""
    from rca_data_tools_spark.functions.numeric import dsum

    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_type", F.hour("ts").cast("bigint").alias("hod"), "value"
    )
    hourly = base.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("sx")
    )
    overall = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_all"), dsum("value").alias("sx_all")
    )
    joined = hourly.join(F.broadcast(overall), "event_type")
    hour_mean = F.col("sx") / F.col("n")
    return joined.select(
        "event_type", "hod", "n",
        F.round(hour_mean, 6).alias("hour_mean"),
        F.round(hour_mean - F.col("sx_all") / F.col("n_all"), 6).alias("seasonal_delta"),
    )


_W10_ETYPE_CASE = (
    "CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1 "
    "WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END"
)
# composite (day, event_type) series key so the shared recursive-CTE LTTB
# machinery (which partitions on one column) replays the windowed variant:
# epoch-day * 10 + event-type index — decomposed back in the outer select
_W10_SRC = (
    "SELECT (CAST(epoch_ms(DATE_TRUNC('day', ts)) AS BIGINT) // 86400000) * 10 + "
    f"{_W10_ETYPE_CASE} AS user_id, ts, value FROM events"
)


@query(
    "w10_windowed_lttb",
    oracle=f"""
WITH RECURSIVE
{lttb_keep_ctes(_W10_SRC, threshold=12)}
SELECT CASE CAST(b.user_id % 10 AS INT)
         WHEN 0 THEN 'click' WHEN 1 THEN 'error' WHEN 2 THEN 'purchase'
         WHEN 3 THEN 'signup' ELSE 'view' END AS event_type,
       epoch_ms((b.user_id // 10) * 86400000) AS window_start,
       b.ts, b.value
FROM base b JOIN keep k ON k.user_id = b.user_id AND k.rn = b.rn
""",
)
def w10_windowed_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed LTTB: each (event_type, 1-day tumbling window) series
    decimates to 12 points — the streaming decimation face
    (streaming/windows.py:windowed_lttb) run on the batch frame, proving
    the unified API; the stream emits the identical rows per closed window
    (tests/test_streaming.py). The oracle replays the full sequential
    recurrence per composite (day, event_type) key through the shared
    recursive-CTE machinery — same exactness caveat as w4: bit-exact at
    the correctness SF where next-bucket centroids average < 8 points
    (numpy pairwise == sequential AVG below the pairwise block size)."""
    from rca_data_tools_spark.streaming.windows import windowed_lttb

    e = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    return windowed_lttb(
        e, key_col="event_type", ts_col="ts", val_col="value",
        window_duration="1 day", threshold=12,
    )
