"""Queries exercising the declarative calculation registry (SURVEY §2.10) and
the remaining scalar-function families (§2.8), streaming batch-equivalents
(§2.9), sessionization, and grid/resample operators (§2.5 W6-W8, §2.4 A4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rca_data_tools_spark.functions.numeric import dsum, dsum_sql
from rca_data_tools_spark.operators.interpolate import profile_regrid, resample_linear, time_grid
from rca_data_tools_spark.plans.registry import REGISTRY, CalcSpec
from rca_data_tools_spark.queries._lttb_oracle import lttb_keep_ctes
from rca_data_tools_spark.queries._registry import query
from rca_data_tools_spark.sources.readers import load_table


@query(
    "calc_registry_flags",
    oracle="""
WITH lagged AS (
  SELECT event_type, value,
         LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
  FROM events
), calc AS (
  SELECT event_type,
    CASE WHEN value IS NULL THEN 9 WHEN value < 1.0 OR value > 400.0 THEN 3 ELSE 1 END AS range_flag,
    CASE WHEN prev_value IS NULL THEN 1 WHEN ABS(value - prev_value) > 350.0 THEN 3 ELSE 1 END AS step_flag,
    value * 0.01 + 0.5 AS volts,
    ((0.002 * (value * 0.01 + 0.5) + 0.1) * (value * 0.01 + 0.5) + 1.0) AS poly_temp
  FROM lagged
)
SELECT event_type,
       CONCAT(range_flag, step_flag) AS combined_flags,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(volts, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sum_volts,
       CAST(SUM(CAST(ROUND(poly_temp, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sum_poly
FROM calc
GROUP BY 1, 2
""",
)
def calc_registry_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config rows -> compiled Column plan: a spec list (range flag, step
    flag, linear conversion, Horner polynomial, positional combine) applied
    by the registry, mirroring calculateCalls.csv execution
    (reference: qaqc/plots.py:50-110, utils.py:327-358)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = e.withColumn("prev_value", F.lag("value").over(w))
    specs = [
        CalcSpec("range", "range_flag", ["value"], ["range_flag"], {"lo": 1.0, "hi": 400.0}),
        CalcSpec("step", "step_flag", ["value", "prev_value"], ["step_flag"], {"threshold": 350.0}),
        CalcSpec("volts", "linear_convert", ["value"], ["volts"], {"scale": 0.01, "offset": 0.5}),
        CalcSpec("temp", "polynomial", ["volts"], ["poly_temp"], {"coeffs": [0.002, 0.1, 1.0]}),
        CalcSpec("combined", "combine_flags", ["range_flag", "step_flag"], ["combined_flags"]),
    ]
    out = REGISTRY.apply(e, specs)
    return out.groupBy("event_type", "combined_flags").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("volts").alias("sum_volts"),
        dsum("poly_temp").alias("sum_poly"),
    )


@query(
    "calc_poly_fit",
    oracle="""
WITH pts AS (
  SELECT user_id,
         FLOOR((epoch_ms(ts) - 1704067200000) / 3600.0) / 1000.0 AS x,
         value AS y
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL
),
s AS (
  SELECT user_id,
         COUNT(*) AS n_points,
         CAST(COUNT(*) AS DOUBLE) AS nd,
         CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x*y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(x*x, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ROUND(y*y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS syy
  FROM pts GROUP BY user_id
),
fit AS (
  SELECT *, (nd*sxy - sx*sy) / (nd*sxx - sx*sx) AS slope FROM s
),
fit2 AS (
  SELECT *, (sy - slope*sx) / nd AS intercept FROM fit
)
SELECT user_id, slope, intercept,
       sqrt(greatest(
         syy - 2*slope*sxy + slope*slope*sxx
             - 2*intercept*sy + 2*slope*intercept*sx + intercept*intercept*nd,
         0.0) / nd) AS rmse,
       n_points
FROM fit2
""",
)
def calc_poly_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares fit (value ~ time) through the registry's
    ``linear_fit`` grouped kernel — the nutnr_plant2023 shape (per-group fit,
    scalar coefficient outputs; reference: calculateFunctions.py:267-468),
    solved closed-form as pure Column aggregation: one map-side-combinable
    shuffle of 5 decimal partial sums per group instead of shipping every row
    through applyInPandas. The regressor is quantized to millihour resolution
    (FLOOR to an integer count, then /1000) so every product the decimal
    summation sees is an exact 5/6-decimal value -> both engines round to the
    identical addend and the whole fit is bit-deterministic (the oracle
    replays the same expression tree)."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "t_hours",
        F.floor((F.unix_millis("ts") - F.lit(1704067200000)) / F.lit(3600.0)) / F.lit(1000.0),
    )
    spec = CalcSpec("fit", "linear_fit", ["t_hours", "value"], [], {"group_cols": ["user_id"]})
    return REGISTRY.apply(e, [spec])


@query(
    "f_string_parse",
    oracle="""
WITH r AS (
  SELECT doc_id, source || '-' || lang || '-' || CAST(doc_id AS VARCHAR) AS ref_des FROM documents
)
SELECT doc_id, ref_des,
       string_split(ref_des, '-')[1] AS site,
       string_split(ref_des, '-')[2] AS node,
       regexp_extract(ref_des, 'src([0-9]+)', 1) AS src_num
FROM r
""",
)
def f_string_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """refDes-style split/element_at/regexp_extract
    (reference: refDes.split('-'), qaqc/dashboard.py:234)."""
    d = load_table(spark, sf_dir, "documents")
    ref = F.concat_ws("-", F.col("source"), F.col("lang"), F.col("doc_id").cast("string"))
    r = d.select("doc_id", ref.alias("ref_des"))
    return r.select(
        "doc_id",
        "ref_des",
        F.element_at(F.split("ref_des", "-"), 1).alias("site"),
        F.element_at(F.split("ref_des", "-"), 2).alias("node"),
        F.regexp_extract("ref_des", r"src([0-9]+)", 1).alias("src_num"),
    )


@query(
    "f_json_extract",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(json_extract_string(props, '$.k')) AS n_with_k
FROM events
GROUP BY 1
""",
)
def f_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction (reference: annotation/qcConfig JSON parsing,
    qaqc/dashboard.py:56, qartod.py:72-73)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(F.sum(k).alias("sum_k"), F.count(k).alias("n_with_k"))


@query(
    "f_math_conversions",
    oracle=f"""
SELECT event_type,
       {dsum_sql('SQRT(value)')} AS sum_sqrt,
       {dsum_sql('LN(value + 1.0)')} AS sum_log,
       {dsum_sql('value * 0.01')} AS sum_cm_to_m,
       COUNT(*) AS n
FROM events
GROUP BY 1
""",
)
def f_math_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math conversion family (reference: thermistor log/exp conversions,
    cm->m, counts->volts; calculateFunctions.py:513-616). sqrt is IEEE-exact;
    log values are rounded per-row before the decimal sum."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        dsum(F.sqrt(F.col("value"))).alias("sum_sqrt"),
        dsum(F.log(F.col("value") + 1.0)).alias("sum_log"),
        dsum(F.col("value") * 0.01).alias("sum_cm_to_m"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "a13_bracket_midpoint",
    oracle="""
SELECT p_brand,
       (MIN(p_retailprice) + MAX(p_retailprice)) / 2 AS midpoint,
       COUNT(*) AS n
FROM part GROUP BY 1
""",
)
def a13_bracket_midpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bracket midpoint (reference: climatology midpoints st.mean([lo,hi]),
    qaqc/dashboard.py:93-97)."""
    p = load_table(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        ((F.min("p_retailprice") + F.max("p_retailprice")) / 2).alias("midpoint"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "sessionize_events",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, epoch_ms(ts) AS ms,
         CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w > 1800000 OR
                   LAG(epoch_ms(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts, ms,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MAX(ms) - MIN(ms) AS duration_ms
FROM sessions GROUP BY 1, 2
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap flag + running sum -> session ids (the batch
    formulation; streaming uses session_window, streaming/windows.py)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts"))
    new_session = F.when(
        (ms - F.lag(ms).over(w) > 1800000) | F.lag(ms).over(w).isNull(), F.lit(1)
    ).otherwise(F.lit(0))
    flagged = e.withColumn("ms", ms).withColumn("new_session", new_session)
    wsum = Window.partitionBy("user_id").orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(wsum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ms") - F.min("ms")).alias("duration_ms"),
    )


@query(
    "streaming_tumbling_agg",
    oracle="""
SELECT CAST(to_timestamp(CAST(FLOOR(EPOCH(ts) / 3600) * 3600 AS BIGINT)) AS TIMESTAMP) AS window_start,
       CAST(to_timestamp(CAST(FLOOR(EPOCH(ts) / 3600) * 3600 + 3600 AS BIGINT)) AS TIMESTAMP) AS window_end,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2, 3
""",
)
def streaming_tumbling_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming tumbling-window aggregation run through Spark's unified
    API on a batch frame — byte-identical logic to the readStream version
    (streaming/windows.py; watermark semantics tested in tests/test_streaming.py)."""
    from rca_data_tools_spark.streaming.windows import streaming_tumbling_agg

    e = load_table(spark, sf_dir, "events")
    return streaming_tumbling_agg(e, window_duration="1 hour")


@query(
    "a4_resample_interpolate",
    oracle="""
WITH samples AS (
  SELECT user_id, ts, value, 0 AS is_grid, epoch_ms(ts) AS ms
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-14 00:00:00'
    AND user_id < 20
), grid AS (
  SELECT u.user_id, g.gts AS ts, CAST(NULL AS DOUBLE) AS value, 1 AS is_grid, epoch_ms(g.gts) AS ms
  FROM (SELECT DISTINCT user_id FROM samples) u,
       (SELECT unnest(generate_series(TIMESTAMP '2024-01-10 00:00:00',
                                      TIMESTAMP '2024-01-11 23:00:00',
                                      INTERVAL 1 HOUR)) AS gts) g
), unioned AS (
  SELECT * FROM samples UNION ALL SELECT * FROM grid
), filled AS (
  SELECT user_id, ts, ms, value, is_grid,
    LAST_VALUE(value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, is_grid
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    LAST_VALUE(CASE WHEN value IS NOT NULL THEN ms END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, is_grid
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
    FIRST_VALUE(value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, is_grid
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    FIRST_VALUE(CASE WHEN value IS NOT NULL THEN ms END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, is_grid
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
  FROM unioned
)
SELECT user_id, ts AS grid_ts,
       CASE WHEN value IS NOT NULL THEN value
            WHEN prev_v IS NULL THEN next_v
            WHEN next_v IS NULL THEN prev_v
            WHEN next_t = prev_t THEN prev_v
            ELSE prev_v + (next_v - prev_v) * ((ms - prev_t) / (next_t - prev_t))
       END AS value
FROM filled WHERE is_grid = 1
""",
)
def a4_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample onto an hourly grid with linear interpolation (reference:
    climatology resample('H').interpolate('linear'), qaqc/dashboard.py:141-148)
    via the union+window formulation — one shuffle, no crossJoin of facts."""
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit("2024-01-08 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-14 00:00:00").cast("timestamp"))
        & (F.col("user_id") < 20)
    ).select("user_id", "ts", "value")
    grid = time_grid(spark, "2024-01-10 00:00:00", "2024-01-12 00:00:00", 3600)
    return resample_linear(e, grid, ["user_id"], "ts", "value")


@query(
    "w7_profile_regrid",
    oracle="""
WITH pts AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         (epoch_ms(ts) % 86400000) / 3600000.0 AS hour,
         MIN(value) AS value
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2, 3
), grid AS (
  SELECT p.user_id, p.day, CAST(g AS DOUBLE) AS ghour
  FROM (SELECT DISTINCT user_id, day FROM pts) p,
       (SELECT unnest(generate_series(0, 23)) AS g)
), lo AS (
  SELECT g.user_id, g.day, g.ghour, p.hour AS x_lo, p.value AS y_lo
  FROM grid g ASOF LEFT JOIN pts p
    ON g.user_id = p.user_id AND g.day = p.day AND g.ghour >= p.hour
), hi AS (
  SELECT g.user_id, g.day, g.ghour, p.hour AS x_hi, p.value AS y_hi
  FROM grid g ASOF LEFT JOIN pts p
    ON g.user_id = p.user_id AND g.day = p.day AND g.ghour < p.hour
)
SELECT l.user_id, l.day, l.ghour AS hour,
  CASE
    WHEN l.x_lo IS NULL THEN CAST(NULL AS DOUBLE)
    WHEN l.x_lo = l.ghour THEN l.y_lo
    WHEN h.x_hi IS NULL THEN CAST(NULL AS DOUBLE)
    ELSE ((h.y_hi - l.y_lo) / (h.x_hi - l.x_lo)) * (l.ghour - l.x_lo) + l.y_lo
  END AS value
FROM lo l JOIN hi h USING (user_id, day, ghour)
""",
)
def w7_profile_regrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-profile 1-D regridding via np.interp in applyInPandas (reference:
    qaqc/dashboard.py:197-226). Here each (user_id, day) is a 'profile' and
    hour-of-day is the depth axis.

    Duplicate hours are collapsed (MIN) before the regrid so each profile's x
    axis is strictly increasing — np.interp's bracketing is order-dependent
    under duplicate x, which would make the result nondeterministic. With
    unique x the kernel is exactly reproducible in SQL: the oracle's ASOF
    joins pick the bracketing samples and the blend uses np.interp's exact
    operation order ((y1-y0)/(x1-x0))*(g-x0)+y0; outside the sampled
    range the kernel's NaN surfaces as NULL through Arrow, so the oracle
    emits NULL there too."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    ).select(
        "user_id",
        # midnight TIMESTAMP, not DATE: DateType reaches pandas as an object
        # column of datetime.date while DuckDB DATE arrives as datetime64 —
        # a dtype mismatch under hash canonicalization (timestamps match).
        F.date_trunc("day", "ts").alias("day"),
        ((F.unix_millis("ts") % 86400000) / 3600000.0).alias("hour"),
        "value",
    )
    pts = e.groupBy("user_id", "day", "hour").agg(F.min("value").alias("value"))
    grid = [float(h) for h in range(24)]
    return profile_regrid(pts, ["user_id", "day"], "hour", "value", grid)


@query(
    "w8_cell_aggregation",
    oracle="""
SELECT CAST(FLOOR(EPOCH(ts) / 21600) AS BIGINT) AS time_cell,
       CAST(FLOOR(value / 50.0) AS BIGINT) AS value_cell,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value) AS cell_mean
FROM events
GROUP BY 1, 2
""",
)
def w8_cell_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D cell aggregation: bucketize (time x value) and aggregate per cell —
    the engine-side equivalent of the scatter->grid interpolation surface
    (reference: scipy.griddata over (time, depth), qaqc/dashboard.py:944-967;
    exact barycentric interpolation stays in the viz layer)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("time_cell", F.floor(F.unix_timestamp("ts") / 21600).cast("long"))
        .withColumn("value_cell", F.floor(F.col("value") / 50.0).cast("long"))
        .groupBy("time_cell", "value_cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value"), 6).cast("decimal(28,6)")).cast("double") / F.count("value")).alias(
                "cell_mean"
            ),
        )
    )


_QAQC_FLAG_SQL = """CASE WHEN b.value IS NULL THEN 9
            WHEN b.value < 0.0 OR b.value > 400.0 THEN 4
            WHEN b.value < 10.0 OR b.value > 300.0 THEN 3
            ELSE 1 END"""


@query(
    "pipeline_qaqc_job",
    oracle=f"""
WITH RECURSIVE
{lttb_keep_ctes(
    "SELECT user_id, ts, value FROM events "
    "WHERE ts >= TIMESTAMP '2024-01-13 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'",
    threshold=50,
)}
SELECT b.user_id, b.ts, b.value,
       {_QAQC_FLAG_SQL} AS gross_range_flag,
       CAST(GREATEST(1, {_QAQC_FLAG_SQL}) AS INTEGER) AS rollup_flag,
       'SITE01' AS site, 'week' AS span
FROM base b JOIN keep k ON k.user_id = b.user_id AND k.rn = b.rn
""",
)
def pipeline_qaqc_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's main entry end-to-end (SURVEY §3.1): windowed scan with
    pushed-down bounds -> broadcast gross-range flags -> rollup -> LTTB
    decimation, as one declarative plan (pipeline.run_qaqc_job). The oracle
    replays the whole lifecycle: the week window, the constant gross-range
    spans as CASE flags, the rollup floor, and the LTTB selection via the
    shared recursive-CTE machinery (_lttb_oracle.py) — so the composite job
    is hash-checked end-to-end, not rows-only."""
    from rca_data_tools_spark.pipeline import QAQCJobSpec, run_qaqc_job

    spec = QAQCJobSpec(
        site="SITE01",
        span="week",
        table="events",
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        window_end="2024-01-20 00:00:00",
        threshold=50,
    )
    dim = spark.createDataFrame(
        [(u, 0.0, 400.0, 10.0, 300.0) for u in range(150)],
        "user_id long, fail_lo double, fail_hi double, sus_lo double, sus_hi double",
    )
    return run_qaqc_job(spark, sf_dir, spec, dim).select(
        "user_id", "ts", "value", "gross_range_flag", "rollup_flag", "site", "span"
    )


@query(
    "hitl_latest_note",
    oracle="""
SELECT user_id,
       arg_max(props, ts ORDER BY ts, event_id) AS latest_note,
       MAX(ts) AS latest_ts,
       COUNT(props) AS n_notes
FROM events
WHERE props IS NOT NULL
GROUP BY user_id
""",
)
def hitl_latest_note(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-recent-note selection (reference: HITL tables keep the most
    recent note column per page, qaqc/notes.py:66-173) — max_by keyed on
    (ts, event_id) so ties resolve identically in any engine."""
    e = load_table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    return e.groupBy("user_id").agg(
        F.max_by("props", F.struct("ts", "event_id")).alias("latest_note"),
        F.max("ts").alias("latest_ts"),
        F.count("props").alias("n_notes"),
    )


@query(
    "skew_two_stage_agg",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1
""",
)
def skew_two_stage_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation (operators/skew.py): the hot-key groupBy
    decomposed into (key, salt) partials + a final combine — identical result
    to the direct groupBy (this oracle IS the direct groupBy), but no single
    reducer ever sees a whole hot key. The decimal partial keeps the sum
    order-insensitive across both stages."""
    from rca_data_tools_spark.operators.skew import two_stage_agg

    e = load_table(spark, sf_dir, "events")
    out = two_stage_agg(
        e.select("event_type", "value"),
        keys=["event_type"],
        aggs={
            "n": (F.count(F.lit(1)), F.sum("n")),
            "sum_value": (
                F.sum(F.round(F.col("value"), 6).cast("decimal(28,6)")),
                F.sum("sum_value"),
            ),
        },
        n_salts=16,
    )
    return out.withColumn("sum_value", F.col("sum_value").cast("double"))


@query(
    "calc_griddata_surface",
    oracle="""
WITH g AS (
  SELECT CAST(i AS DOUBLE) / 20.0 AS c
  FROM unnest(generate_series(1, 19)) AS t(i)
)
SELECT a.c AS gx, b.c AS gy, ROUND(2 * a.c - 3 * b.c + 7.0, 6) AS v
FROM g a, g b
""",
)
def calc_griddata_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D scattered->grid linear interpolation (reference:
    scipy.griddata(method='linear') over the (time, depth) mesh,
    qaqc/dashboard.py:944-967) — the full engine path: Bowyer-Watson
    Delaunay + barycentric interpolation per group inside applyInPandas
    (operators/griddata.py).

    Oracle design: the scattered values are sampled from the affine field
    v = 2x - 3y + 7, and linear barycentric interpolation reproduces an
    affine field EXACTLY at every in-hull point for ANY valid triangulation
    — so the interpolated 19x19 grid hash-matches the closed-form plane in
    SQL, without the oracle having to reproduce triangulation tie-breaks.
    The four unit-square corners are included in the point set so the hull
    covers the whole grid. Non-planar correctness (data-point reproduction,
    hull masking) is covered in tests/test_griddata.py."""
    from rca_data_tools_spark.operators.griddata import grid_surface

    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    u = lambda salt: (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col("event_id").cast("string"))), 1, 8), 16, 10)
        .cast("double") / F.lit(float(2**32))
    )
    pts = e.select(u("gx").alias("x"), u("gy").alias("y"))
    corners = spark.createDataFrame(
        [(0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0)], "x double, y double"
    )
    allpts = (
        pts.unionByName(corners)
        .withColumn("v", F.lit(2.0) * F.col("x") - F.lit(3.0) * F.col("y") + F.lit(7.0))
        .withColumn("surface", F.lit(1))
    )
    grid = [i / 20.0 for i in range(1, 20)]
    out = grid_surface(allpts, ["surface"], "x", "y", "v", grid, grid)
    return out.select("gx", "gy", "v")


@query(
    "calc_anomaly_surface",
    oracle=f"""
WITH obs AS (
  SELECT month(ts) AS m,
         CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day_cell,
         CAST(user_id % 10 AS BIGINT) AS ybin,
         {dsum_sql('value')} AS s1,
         COUNT(value) AS n
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2, 3
), clim AS (
  SELECT m, ybin, {dsum_sql('s1')} AS cs1, SUM(n) AS cn
  FROM obs GROUP BY 1, 2
)
SELECT o.day_cell, o.ybin, o.n AS n_obs,
       o.s1 / o.n AS obs_mean,
       o.s1 / o.n - c.cs1 / c.cn AS anomaly
FROM obs o JOIN clim c ON o.m = c.m AND o.ybin = c.ybin
""",
)
def calc_anomaly_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly surface: per-(day, bin) observed mean minus that month's
    climatology mean for the same bin — the reference dashboard's difference
    plot ``zi - clim_zi`` (qaqc/dashboard.py:833, climatology surface
    :825-833) as engine-side data.

    Scale shape: ONE fact scan. The day-level cell aggregation is the only
    data-sized shuffle; the monthly climatology is a re-aggregation OF the
    day cells (Σ of their decimal-exact sums — exact under re-ordering, so
    the derived climatology is bit-identical to a direct monthly pass), and
    it joins back broadcast (month x bin is config-sized). The reference
    recomputes the climatology surface from raw on every run; deriving it
    from the already-aggregated cells is the 100 TB formulation."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    obs = e.groupBy(
        F.month("ts").alias("m"),
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_cell"),
        (F.col("user_id") % 10).cast("long").alias("ybin"),
    ).agg(dsum("value").alias("s1"), F.count("value").alias("n"))
    clim = obs.groupBy("m", "ybin").agg(
        dsum("s1").alias("cs1"), F.sum("n").alias("cn")
    )
    joined = obs.join(F.broadcast(clim), ["m", "ybin"])
    obs_mean = F.col("s1") / F.col("n")
    return joined.select(
        "day_cell", "ybin", F.col("n").alias("n_obs"),
        obs_mean.alias("obs_mean"),
        (obs_mean - F.col("cs1") / F.col("cn")).alias("anomaly"),
    )


# --- tidal harmonic fit (M2 constituent) ------------------------------------
# omega in rad/hour for the principal lunar semidiurnal period (12.4206 h).
_M2_OMEGA = 2.0 * 3.141592653589793 / 12.4206

_TIDAL_ORACLE = f"""
WITH b AS (
  SELECT user_id,
         ROUND(cos({_M2_OMEGA!r} * (CAST(epoch_us(ts) AS DOUBLE) / 3600000000.0)), 6) AS cw,
         ROUND(sin({_M2_OMEGA!r} * (CAST(epoch_us(ts) AS DOUBLE) / 3600000000.0)), 6) AS sw,
         value AS y
  FROM events
),
s AS (
  SELECT user_id,
         COUNT(*) AS n,
         {dsum_sql('cw')} AS sc, {dsum_sql('sw')} AS ss,
         {dsum_sql('cw * cw', 12)} AS scc, {dsum_sql('cw * sw', 12)} AS scs,
         {dsum_sql('sw * sw', 12)} AS sss,
         {dsum_sql('y')} AS sy, {dsum_sql('cw * y', 12)} AS scy,
         {dsum_sql('sw * y', 12)} AS ssy
  FROM b GROUP BY user_id
),
f AS (
  SELECT user_id, n,
         (scc * (sss * n - ss * ss) - scs * (scs * n - ss * sc) + sc * (scs * ss - sss * sc)) AS det,
         (scy * (sss * n - ss * ss) - scs * (ssy * n - ss * sy) + sc * (ssy * ss - sss * sy)) AS det_a,
         (scc * (ssy * n - ss * sy) - scy * (scs * n - ss * sc) + sc * (scs * sy - ssy * sc)) AS det_b,
         (scc * (sss * sy - ssy * ss) - scs * (scs * sy - ssy * sc) + scy * (scs * ss - sss * sc)) AS det_c
  FROM s
)
SELECT user_id, n,
       ROUND(SQRT((det_a / det) * (det_a / det) + (det_b / det) * (det_b / det)), 4) AS m2_amp,
       ROUND(DEGREES(ATAN2(det_b / det, det_a / det)), 2) AS m2_phase_deg,
       ROUND(det_c / det, 4) AS mean_level
FROM f
WHERE ABS(det) > 1e-9
"""


@query("calc_tidal_harmonic", oracle=_TIDAL_ORACLE)
def calc_tidal_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series harmonic analysis at the M2 tidal frequency: least-squares
    fit of y = a*cos(wt) + b*sin(wt) + c per user series, reported as
    amplitude / phase / mean level — the constituent decomposition an ocean
    observatory runs on pressure/level series (the reference's domain).

    Exactness: the closed-form 3x3 normal equations solve entirely in
    IEEE-correctly-rounded ops (+,-,*,/,sqrt) over decimal-exact sums of
    round-6 basis values, so both engines produce bit-identical fits; the
    only libm calls (cos/sin/atan2) are rounded before use / at output.
    Scale shape: one map-side-combined aggregation onto the series keys —
    nine running sums — then scalar algebra on the dim-sized result. The
    fact table never shuffles; adding constituents adds columns, not passes.
    """
    e = load_table(spark, sf_dir, "events")
    t_hours = F.unix_micros(F.col("ts")).cast("double") / F.lit(3600000000.0)
    cw = F.round(F.cos(F.lit(_M2_OMEGA) * t_hours), 6)
    sw = F.round(F.sin(F.lit(_M2_OMEGA) * t_hours), 6)
    b = e.select("user_id", cw.alias("cw"), sw.alias("sw"), F.col("value").alias("y"))
    s = b.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("cw").alias("sc"), dsum("sw").alias("ss"),
        dsum(F.col("cw") * F.col("cw"), 12).alias("scc"),
        dsum(F.col("cw") * F.col("sw"), 12).alias("scs"),
        dsum(F.col("sw") * F.col("sw"), 12).alias("sss"),
        dsum("y").alias("sy"),
        dsum(F.col("cw") * F.col("y"), 12).alias("scy"),
        dsum(F.col("sw") * F.col("y"), 12).alias("ssy"),
    )
    scc, scs, sss = F.col("scc"), F.col("scs"), F.col("sss")
    sc, ss, sy = F.col("sc"), F.col("ss"), F.col("sy")
    scy, ssy, n = F.col("scy"), F.col("ssy"), F.col("n")
    det = scc * (sss * n - ss * ss) - scs * (scs * n - ss * sc) + sc * (scs * ss - sss * sc)
    det_a = scy * (sss * n - ss * ss) - scs * (ssy * n - ss * sy) + sc * (ssy * ss - sss * sy)
    det_b = scc * (ssy * n - ss * sy) - scy * (scs * n - ss * sc) + sc * (scs * sy - ssy * sc)
    det_c = scc * (sss * sy - ssy * ss) - scs * (scs * sy - ssy * sc) + scy * (scs * ss - sss * sc)
    f = s.select(
        "user_id", "n",
        det.alias("det"), det_a.alias("det_a"),
        det_b.alias("det_b"), det_c.alias("det_c"),
    ).filter(F.abs(F.col("det")) > 1e-9)
    a_, b_ = F.col("det_a") / F.col("det"), F.col("det_b") / F.col("det")
    return f.select(
        "user_id", "n",
        F.round(F.sqrt(a_ * a_ + b_ * b_), 4).alias("m2_amp"),
        F.round(F.degrees(F.atan2(b_, a_)), 2).alias("m2_phase_deg"),
        F.round(F.col("det_c") / F.col("det"), 4).alias("mean_level"),
    )
