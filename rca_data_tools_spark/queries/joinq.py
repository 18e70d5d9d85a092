"""Interval / as-of / range / overlap join queries (SURVEY §2.3) and set
operations (§2.7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rca_data_tools_spark.functions.numeric import davg, davg_sql
from rca_data_tools_spark.operators.interval_join import as_of_join, clip_intervals, range_tag_join
from rca_data_tools_spark.queries._registry import query
from rca_data_tools_spark.sources.readers import load_table


@query(
    "j1_asof_join",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'click'
), clicks_d AS (SELECT user_id, ts, value, event_id FROM clicks WHERE rn = 1),
errors AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'error')
SELECT e.event_id, e.user_id, e.ts,
       c.event_id AS click_event_id, c.ts AS click_ts, c.value AS click_value
FROM errors e ASOF LEFT JOIN clicks_d c
  ON e.user_id = c.user_id AND e.ts >= c.ts
""",
)
def j1_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error event picks up the most recent click of the
    same user (reference: calibration interval lookup, qaqc/utils.py:288-310).

    Uses the union-window strategy (operators/interval_join.as_of_join): one
    hash shuffle, no non-equi join — the plan that survives both sides large.
    Right side deduped per (key, ts) for determinism.
    """
    e = load_table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value", "event_id")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    clicks_d = (
        clicks.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .withColumnRenamed("event_id", "click_event_id")
        .withColumnRenamed("value", "click_value")
    )
    clicks_d = clicks_d.withColumnRenamed("ts", "click_ts")
    joined = as_of_join(
        errors,
        clicks_d,
        key="user_id",
        left_ts="ts",
        right_ts="click_ts",
        value_cols=["click_event_id", "click_value"],
    )
    return joined.select("event_id", "user_id", "ts", "click_event_id", "click_ts", "click_value")


@query(
    "j2_interval_clip",
    oracle="""
WITH iv AS (
  SELECT o_custkey, o_orderkey, o_orderdate AS lo,
         COALESCE(LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                  TIMESTAMP '2002-01-01 00:00:00') AS hi
  FROM orders
)
SELECT o_custkey, o_orderkey,
       GREATEST(lo, TIMESTAMP '1996-03-01 00:00:00') AS lo,
       LEAST(hi, TIMESTAMP '1997-03-01 00:00:00') AS hi
FROM iv
WHERE GREATEST(lo, TIMESTAMP '1996-03-01 00:00:00') < LEAST(hi, TIMESTAMP '1997-03-01 00:00:00')
""",
)
def j2_interval_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval clipping to a window, empties dropped (reference: deployment
    x calibration clipping, qaqc/utils.py:177-207)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    iv = o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("lo"),
        F.coalesce(F.lead("o_orderdate").over(w), F.lit("2002-01-01 00:00:00").cast("timestamp")).alias("hi"),
    )
    return clip_intervals(iv, "lo", "hi", "1996-03-01 00:00:00", "1997-03-01 00:00:00")


PROFILE_WINDOWS = [
    (1, "2024-01-03 00:00:00", "2024-01-03 12:00:00"),
    (2, "2024-01-08 06:00:00", "2024-01-09 00:00:00"),
    (3, "2024-01-14 00:00:00", "2024-01-15 00:00:00"),
    (4, "2024-01-21 18:00:00", "2024-01-22 06:00:00"),
    (5, "2024-01-28 00:00:00", "2024-01-29 12:00:00"),
]
_PROFILE_VALUES_SQL = ", ".join(f"({i}, TIMESTAMP '{s}', TIMESTAMP '{e}')" for i, s, e in PROFILE_WINDOWS)


@query(
    "j3_profile_range_join",
    oracle=f"""
WITH profiles(profile_id, p_start, p_end) AS (VALUES {_PROFILE_VALUES_SQL})
SELECT p.profile_id, e.event_type, COUNT(*) AS n,
       {davg_sql('e.value')} AS avg_value
FROM events e JOIN profiles p ON e.ts >= p.p_start AND e.ts <= p.p_end
GROUP BY 1, 2
""",
)
def j3_profile_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join tagging samples with their containing profile window
    (reference: gridProfiles slicing, qaqc/dashboard.py:186-210). The
    interval table is broadcast; the fact scan never shuffles."""
    e = load_table(spark, sf_dir, "events")
    profiles = spark.sql(
        f"SELECT * FROM VALUES {_PROFILE_VALUES_SQL} AS t(profile_id, p_start, p_end)"
    )
    tagged = range_tag_join(e, profiles, "ts", "p_start", "p_end", "profile_id")
    return tagged.groupBy("profile_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"), davg("value").alias("avg_value")
    )


ANNOTATIONS = [
    (1, "2024-01-02 00:00:00", "2024-01-05 00:00:00", "biofouling suspected"),
    (2, "2024-01-10 00:00:00", "2024-01-10 06:00:00", "pump failure"),
    (3, "2024-01-20 00:00:00", None, "ongoing drift"),
]
_ANNO_VALUES_SQL = ", ".join(
    f"({i}, TIMESTAMP '{b}', {('TIMESTAMP ' + chr(39) + e + chr(39)) if e else 'NULL'}, '{a}')"
    for i, b, e, a in ANNOTATIONS
)


@query(
    "j7_annotation_overlap",
    oracle=f"""
WITH annos(anno_id, begin_dt, end_dt, annotation) AS (VALUES {_ANNO_VALUES_SQL})
SELECT anno_id, annotation,
       GREATEST(begin_dt, TIMESTAMP '2024-01-04 00:00:00') AS clip_start,
       LEAST(COALESCE(end_dt, TIMESTAMP '9999-12-31 23:59:59'), TIMESTAMP '2024-01-25 00:00:00') AS clip_end
FROM annos
WHERE begin_dt < TIMESTAMP '2024-01-25 00:00:00'
  AND COALESCE(end_dt, TIMESTAMP '9999-12-31 23:59:59') > TIMESTAMP '2024-01-04 00:00:00'
""",
)
def j7_annotation_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annotation-interval overlap with a plot window; NULL end = ongoing
    (reference: annoInRange, qaqc/dashboard.py:324-338)."""
    w_lo, w_hi = "2024-01-04 00:00:00", "2024-01-25 00:00:00"
    annos = spark.sql(
        f"SELECT * FROM VALUES {_ANNO_VALUES_SQL} AS t(anno_id, begin_dt, end_dt, annotation)"
    ).select("anno_id", "begin_dt", F.col("end_dt").cast("timestamp").alias("end_dt"), "annotation")
    endc = F.coalesce(F.col("end_dt"), F.lit("9999-12-31 23:59:59").cast("timestamp"))
    return (
        annos.filter((F.col("begin_dt") < F.lit(w_hi).cast("timestamp")) & (endc > F.lit(w_lo).cast("timestamp")))
        .select(
            "anno_id",
            "annotation",
            F.greatest(F.col("begin_dt"), F.lit(w_lo).cast("timestamp")).alias("clip_start"),
            F.least(endc, F.lit(w_hi).cast("timestamp")).alias("clip_end"),
        )
    )


@query(
    "j8_time_shifted_overlay",
    oracle=f"""
SELECT 1996 AS source_year, o_orderkey,
       o_orderdate + INTERVAL 730 DAY AS shifted_date, o_totalprice
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-03-01 00:00:00'
UNION ALL
SELECT 1997 AS source_year, o_orderkey,
       o_orderdate + INTERVAL 365 DAY AS shifted_date, o_totalprice
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-03-01 00:00:00'
""",
)
def j8_time_shifted_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Time machine' overlay: prior-year windows shifted by k*365d onto the
    current axis (reference: qaqc/dashboard.py:1733-1786)."""
    o = load_table(spark, sf_dir, "orders")

    def year_slice(year: int, shift_days: int) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{year}-03-01 00:00:00").cast("timestamp"))
            ).select(
                F.lit(year).alias("source_year"),
                "o_orderkey",
                (F.col("o_orderdate") + F.expr(f"INTERVAL {shift_days} DAYS")).alias("shifted_date"),
                "o_totalprice",
            )
        )

    return year_slice(1996, 730).unionByName(year_slice(1997, 365))


@query(
    "j10_latest_deploy_window",
    oracle="""
WITH latest AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey AS latest_orderkey,
       o_orderdate - INTERVAL 15 DAY AS window_start,
       o_orderdate + INTERVAL 15 DAY AS window_end
FROM latest WHERE rn = 1
""",
)
def j10_latest_deploy_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-recent deployment -> ±15-day event window (reference:
    qaqc/dashboard.py:559-567)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            (F.col("o_orderdate") - F.expr("INTERVAL 15 DAYS")).alias("window_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 15 DAYS")).alias("window_end"),
        )
    )


@query(
    "e3_set_difference",
    oracle="""
SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
FROM events WHERE event_type = 'click'
EXCEPT
SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP)
FROM events WHERE event_type = 'purchase'
""",
)
def e3_set_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (reference: stale-output anti-entropy, qaqc/plots.py:500)
    at (user, day) grain — click-days with no purchase, a non-degenerate set
    on this corpus (every user has every event type at user grain)."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", day).distinct()
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", day).distinct()
    return clicks.exceptAll(purchases)


@query(
    "e4_set_intersection",
    oracle="""
SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
""",
)
def e4_set_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (reference: svg∧png pairs, qaqc/plots.py:543)."""
    e = load_table(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select("user_id").distinct()
    errors = e.filter(F.col("event_type") == "error").select("user_id").distinct()
    return signups.intersect(errors)


# Profiles with an apex: (start, peak, end) — the reference slices ascent as
# [start, peak] and descent as [peak, end], choosing by instrument
# (dashboard.py:186-210, :1116-1121).
PROFILE_PEAKS = [
    (1, "2024-01-03 00:00:00", "2024-01-03 06:00:00", "2024-01-03 12:00:00"),
    (2, "2024-01-08 06:00:00", "2024-01-08 18:00:00", "2024-01-09 00:00:00"),
    (3, "2024-01-14 00:00:00", "2024-01-14 15:00:00", "2024-01-15 00:00:00"),
    (4, "2024-01-21 18:00:00", "2024-01-21 21:00:00", "2024-01-22 06:00:00"),
    (5, "2024-01-28 00:00:00", "2024-01-28 12:00:00", "2024-01-29 12:00:00"),
]
_PEAK_VALUES_SQL = ", ".join(
    f"({i}, TIMESTAMP '{s}', TIMESTAMP '{p}', TIMESTAMP '{e}')" for i, s, p, e in PROFILE_PEAKS
)


@query(
    "j3_profile_phase_split",
    oracle=f"""
WITH profiles(profile_id, p_start, p_peak, p_end) AS (VALUES {_PEAK_VALUES_SQL})
SELECT p.profile_id,
       CASE WHEN e.ts <= p.p_peak THEN 'ascent' ELSE 'descent' END AS phase,
       COUNT(*) AS n,
       {davg_sql('e.value')} AS avg_value
FROM events e JOIN profiles p ON e.ts >= p.p_start AND e.ts <= p.p_end
GROUP BY 1, 2
""",
)
def j3_profile_phase_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direction-aware profile slicing: samples tagged with their profile AND
    cast phase — ascent [start, peak] vs descent (peak, end] — the choice the
    reference makes per instrument (pco2/ph plot the descent;
    qaqc/dashboard.py:1116-1121). One broadcast range join, phase is a
    projection."""
    e = load_table(spark, sf_dir, "events")
    profiles = spark.sql(
        f"SELECT * FROM VALUES {_PEAK_VALUES_SQL} AS t(profile_id, p_start, p_peak, p_end)"
    )
    cond = (e["ts"] >= profiles["p_start"]) & (e["ts"] <= profiles["p_end"])
    tagged = e.join(F.broadcast(profiles), cond).withColumn(
        "phase", F.when(F.col("ts") <= F.col("p_peak"), "ascent").otherwise("descent")
    )
    return tagged.groupBy("profile_id", "phase").agg(
        F.count(F.lit(1)).alias("n"), davg("value").alias("avg_value")
    )


@query(
    "f_nested_cal_arrays",
    oracle="""
WITH m AS (
  SELECT event_id,
         list_transform(generate_series(0, 3),
           r -> list_transform(generate_series(0, 2), c -> (event_id * (r * 3 + c + 1)) % 100)) AS mat
  FROM events
)
SELECT event_id % 16 AS bucket,
       CAST(SUM(mat[3][3]) AS BIGINT) AS sum_elem_2_2,
       CAST(SUM(list_sum(list_transform(flatten(mat), x -> CAST(x AS BIGINT)))) AS BIGINT) AS sum_all,
       COUNT(*) AS n
FROM m GROUP BY 1
""",
)
def f_nested_cal_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D per-row arrays — the calibration SheetRef shape (reference:
    2-D coefficient sheets padded/stacked per cal row, qaqc/utils.py:55-98,
    :238-284): ArrayType(ArrayType) column, element indexing and full-matrix
    reduction as pure array expressions."""
    e = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    mat = F.transform(
        F.sequence(F.lit(0), F.lit(3)),
        lambda r: F.transform(F.sequence(F.lit(0), F.lit(2)), lambda c: (eid * (r * 3 + c + 1)) % 100),
    )
    m = e.select("event_id", mat.alias("mat"))
    elem22 = F.element_at(F.element_at("mat", 3), 3)
    sum_all = F.aggregate(F.flatten("mat"), F.lit(0).cast("long"), lambda acc, x: acc + x)
    return m.groupBy((F.col("event_id") % 16).alias("bucket")).agg(
        F.sum(elem22).alias("sum_elem_2_2"),
        F.sum(sum_all).alias("sum_all"),
        F.count(F.lit(1)).alias("n"),
    )


_ASOF_CTE = """
clicks AS (
  SELECT user_id, ts, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'click'
), clicks_d AS (SELECT user_id, ts AS click_ts, value AS click_value, event_id AS click_event_id FROM clicks WHERE rn = 1),
errors AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'error')
"""


@query(
    "j1_asof_forward",
    oracle=f"""
WITH {_ASOF_CTE}
SELECT e.event_id, e.user_id, e.ts,
       c.click_event_id, c.click_ts, c.click_value
FROM errors e ASOF LEFT JOIN clicks_d c
  ON e.user_id = c.user_id AND e.ts <= c.click_ts
""",
)
def j1_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each error picks up the NEXT click of the same
    user — the other direction of the union-window strategy (same single
    shuffle). Completes the as-of family beyond the reference's
    backward-only calibration lookup."""
    errors, clicks_d = _asof_sides(spark, sf_dir)
    joined = as_of_join(
        errors, clicks_d, key="user_id", left_ts="ts", right_ts="click_ts",
        value_cols=["click_event_id", "click_value"], direction="forward",
    )
    return joined.select("event_id", "user_id", "ts", "click_event_id", "click_ts", "click_value")


@query(
    "j1_asof_nearest",
    oracle=f"""
WITH {_ASOF_CTE},
b AS (
  SELECT e.event_id, c.click_event_id, c.click_ts, c.click_value
  FROM errors e ASOF LEFT JOIN clicks_d c
    ON e.user_id = c.user_id AND e.ts >= c.click_ts
), f AS (
  SELECT e.event_id, c.click_event_id, c.click_ts, c.click_value
  FROM errors e ASOF LEFT JOIN clicks_d c
    ON e.user_id = c.user_id AND e.ts <= c.click_ts
)
SELECT e.event_id, e.user_id, e.ts,
       CASE WHEN use_f THEN f.click_event_id ELSE b.click_event_id END AS click_event_id,
       CASE WHEN use_f THEN f.click_ts ELSE b.click_ts END AS click_ts,
       CASE WHEN use_f THEN f.click_value ELSE b.click_value END AS click_value
FROM errors e
JOIN b ON b.event_id = e.event_id
JOIN f ON f.event_id = e.event_id
CROSS JOIN LATERAL (SELECT (b.click_ts IS NULL OR (f.click_ts IS NOT NULL
  AND (epoch(f.click_ts) - epoch(e.ts)) < (epoch(e.ts) - epoch(b.click_ts)))) AS use_f) u
""",
)
def j1_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: each error picks the closer of its previous and
    next click (exact-distance ties prefer backward). Both direction passes
    share one exchange."""
    errors, clicks_d = _asof_sides(spark, sf_dir)
    joined = as_of_join(
        errors, clicks_d, key="user_id", left_ts="ts", right_ts="click_ts",
        value_cols=["click_event_id", "click_value"], direction="nearest",
    )
    return joined.select("event_id", "user_id", "ts", "click_event_id", "click_ts", "click_value")


def _asof_sides(spark: SparkSession, sf_dir: str):
    e = load_table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    clicks_d = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", "ts", "value", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .withColumnRenamed("event_id", "click_event_id")
        .withColumnRenamed("value", "click_value")
        .withColumnRenamed("ts", "click_ts")
    )
    return errors, clicks_d


@query(
    "streaming_join_enriched",
    oracle="""
SELECT a.event_id,
       COUNT(*) AS n_prior,
       CAST(SUM(CAST(ROUND(b.value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sum_prior
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts - INTERVAL 1 HOUR
 AND b.ts <= a.ts
 AND b.event_id <> a.event_id
GROUP BY 1
""",
)
def streaming_join_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-stream interval join (streaming/joins.py
    stream_interval_join) run through the unified API on batch frames: each
    event enriched with the count and decimal-exact sum of the same user's
    OTHER events in the preceding hour. The streaming form watermarks both
    sides and bounds state to lookback + watermark per key; called on batch
    it is this exact plan, which is how tests/test_streaming.py proves
    stream ≡ batch — and this face gives the driver a hash row for it.

    Scale shape: the join shuffles both sides on the equality key once; the
    range predicate prunes within co-partitioned groups, and the aggregate
    is map-side combined on the already-shuffled key."""
    from rca_data_tools_spark.functions.numeric import dsum
    from rca_data_tools_spark.streaming.joins import stream_interval_join

    e = load_table(spark, sf_dir, "events")
    left = e.select("event_id", "user_id", "ts")
    right = e.select(
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
    )
    joined = stream_interval_join(left, right).filter(
        F.col("r_event_id") != F.col("event_id")
    )
    return joined.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_prior"),
        dsum("r_value").alias("sum_prior"),
    )


@query(
    "j1_asof_tolerance",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'click'
), clicks_d AS (SELECT user_id, ts, value, event_id FROM clicks WHERE rn = 1),
errors AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'error'),
matched AS (
  SELECT e.event_id, e.user_id, e.ts,
         c.event_id AS click_event_id, c.ts AS click_ts, c.value AS click_value
  FROM errors e ASOF LEFT JOIN clicks_d c
    ON e.user_id = c.user_id AND e.ts >= c.ts
)
SELECT event_id, user_id, ts,
       CASE WHEN click_ts >= ts - INTERVAL 30 MINUTE THEN click_event_id END AS click_event_id,
       CASE WHEN click_ts >= ts - INTERVAL 30 MINUTE THEN click_ts END AS click_ts,
       CASE WHEN click_ts >= ts - INTERVAL 30 MINUTE THEN click_value END AS click_value,
       CASE WHEN click_ts >= ts - INTERVAL 30 MINUTE
            THEN (epoch_ms(ts) - epoch_ms(click_ts)) / 1000 END AS gap_s
FROM matched
""",
)
def j1_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a max-staleness tolerance: the backward match is
    kept only when it lies within 30 minutes of the probe — the standard
    'most recent calibration, unless it has gone stale' semantic
    (pandas merge_asof(tolerance=...); reference analogue: calibration
    interval lookup with bounded validity, qaqc/utils.py:288-310).

    Built as the plain as-of join (union-window strategy, one hash shuffle)
    plus a pure projection gate — tolerance costs nothing at scale."""
    errors, clicks_d = _asof_sides(spark, sf_dir)
    joined = as_of_join(
        errors, clicks_d, key="user_id", left_ts="ts", right_ts="click_ts",
        value_cols=["click_event_id", "click_value"],
    )
    fresh = F.col("click_ts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES")
    gap = (F.unix_millis("ts") - F.unix_millis("click_ts")) / 1000
    return joined.select(
        "event_id", "user_id", "ts",
        F.when(fresh, F.col("click_event_id")).alias("click_event_id"),
        F.when(fresh, F.col("click_ts")).alias("click_ts"),
        F.when(fresh, F.col("click_value")).alias("click_value"),
        F.when(fresh, gap).alias("gap_s"),
    )


@query(
    "j11_interval_difference",
    oracle="""
WITH iv AS (
  SELECT user_id, ts AS lo, ts + INTERVAL 5 MINUTE AS hi, event_id FROM events
), swept AS (
  SELECT user_id, lo, hi,
         MAX(hi) OVER (PARTITION BY user_id ORDER BY lo, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_hi
  FROM iv
)
SELECT user_id,
       COUNT(*) AS n_intervals,
       CAST(SUM(CASE WHEN prev_max_hi IS NOT NULL AND lo > prev_max_hi
                     THEN epoch_ms(lo) - epoch_ms(prev_max_hi) ELSE 0 END) AS BIGINT) AS gap_ms,
       CAST(SUM(CASE WHEN prev_max_hi IS NOT NULL AND lo > prev_max_hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps
FROM swept GROUP BY user_id
""",
)
def j11_interval_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-set difference / uncovered-time computation: treating each
    event as a 5-minute activity interval, report per user how much time
    between intervals is NOT covered by any interval (and how many distinct
    gaps) — the sweep-line union-gap algorithm (sort by start, running max
    of ends, gap when the next start clears the running max). The
    reference's annotation system needs exactly this to find un-annotated
    stretches of a deployment.

    Scale shape: ONE hash shuffle on the series key, a running-max window
    within each series, then a map-side-combined agg. Integer millisecond
    arithmetic throughout — bit-exact across engines."""
    e = load_table(spark, sf_dir, "events")
    iv = e.select(
        "user_id", "event_id",
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("hi"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("lo", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = iv.withColumn("prev_max_hi", F.max("hi").over(w))
    is_gap = F.col("prev_max_hi").isNotNull() & (F.col("lo") > F.col("prev_max_hi"))
    gap_ms = F.when(
        is_gap, F.unix_millis("lo") - F.unix_millis("prev_max_hi")
    ).otherwise(F.lit(0))
    return swept.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(gap_ms).alias("gap_ms"),
        F.sum(F.when(is_gap, 1).otherwise(0)).cast("bigint").alias("n_gaps"),
    )


@query(
    "join_salted_skew",
    oracle="""
SELECT l.event_type,
       COUNT(*) AS n_pairs,
       CAST(SUM(l.user_id * r.user_id) AS BIGINT) AS xprod
FROM events l
JOIN (SELECT event_type, user_id FROM events
      WHERE value > 90 AND user_id < 20) r
  ON r.event_type = l.event_type
GROUP BY l.event_type
""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALTED JOIN on a pathologically hot key: the full events table
    joins a bounded high-value-activity slice on event_type — FIVE
    distinct values, so an unsalted shuffle join puts ~20% of BOTH sides
    in each of five tasks no matter how many executors exist (the
    straggler/OOM shape at 100 TB). salted_equi_join spreads every hot
    key over 16 salt partitions (probe side salted deterministically,
    build side replicated 16×) and the result — certified against the
    plain SQL join — is identical pair-for-pair. The
    exchange-on-(key, salt) physical shape is plan-asserted in
    tests/test_operators.py.

    Scale shape: parallelism becomes keys×n_salts instead of keys; the
    price is n_salts× the build side, which is why the recipe applies
    when the build side is the smaller non-broadcastable input (a
    broadcastable dim needs no salt — see j5). The build side here is
    bounded (a fixed user cohort) so the demo's pair volume grows
    LINEARLY with the probe side — the same discipline a production
    salted join needs, since output volume, not the technique, is what
    explodes on a hot-key self-join."""
    from rca_data_tools_spark.operators.skew import salted_equi_join

    e = load_table(spark, sf_dir, "events")
    left = e.select("event_type", "user_id")
    right = e.filter(
        (F.col("value") > 90) & (F.col("user_id") < 20)
    ).select("event_type", "user_id")
    joined = salted_equi_join(
        left, right.withColumnRenamed("user_id", "r_user_id"), ["event_type"]
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("user_id") * F.col("r_user_id")).cast("bigint").alias("xprod"),
    )
