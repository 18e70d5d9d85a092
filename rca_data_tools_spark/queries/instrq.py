"""Oracle-checked queries for the concrete instrument flagger/converter
families (functions/instruments.py; reference: advanced_qaqc/
calculateFunctions.py).

The synthetic corpus has no SAMI light frames or ADCP beams, so each query
derives instrument-shaped inputs deterministically from `events` with integer
arithmetic that DuckDB replays verbatim — the flag logic under test is then
bit-identical on both sides, including the positional digit-string output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rca_data_tools_spark.functions.instruments import (
    adcp_advanced_flags,
    flor_advanced_flags,
    nutnr_advanced_flags,
    opt_external_temp,
    opt_internal_temp,
    opt_pressure,
    pco2w_advanced_flags,
    ph_advanced_flags,
    sidelobe_depth,
    vel3d_advanced_flags,
    velpt_advanced_flags,
)
from rca_data_tools_spark.functions.numeric import dsum, dsum_sql
from rca_data_tools_spark.queries._registry import query
from rca_data_tools_spark.sources.readers import load_table

# cos(radians(20)) pinned as a shared literal so the sidelobe mask cannot
# diverge between engines on a last-ulp cos() difference.
COS_20_DEG = 0.9396926207859084


@query(
    "instr_velpt_flags",
    oracle="""
WITH derived AS (
  SELECT (value - 30) / 2.0 AS pitch,
         (value - 40) / 3.0 AS roll,
         1350 + value * 0.5 AS sound_speed,
         value - 5.0 AS pressure
  FROM events
)
SELECT CONCAT(
         CASE WHEN ABS(pitch) > 20 THEN 3 ELSE 1 END,
         CASE WHEN ABS(pitch) >= 30 THEN 3 ELSE 1 END,
         CASE WHEN ABS(roll) > 20 THEN 3 ELSE 1 END,
         CASE WHEN ABS(roll) >= 30 THEN 3 ELSE 1 END,
         CASE WHEN sound_speed <= 1400 OR sound_speed >= 1700 THEN 3 ELSE 1 END,
         CASE WHEN pressure <= 0 THEN 3 ELSE 1 END
       ) AS flags,
       COUNT(*) AS n
FROM derived GROUP BY 1
""",
)
def instr_velpt_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VELPT pitch/roll/sound-speed/pressure flags
    (reference: velpt_advanced_flags, calculateFunctions.py:985-1014)."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value")
    flags = velpt_advanced_flags(
        pitch=(v - 30) / 2.0,
        roll=(v - 40) / 3.0,
        sound_speed=1350 + v * 0.5,
        pressure=v - 5.0,
    )
    return e.select(flags.alias("flags")).groupBy("flags").agg(F.count(F.lit(1)).alias("n"))


@query(
    "instr_flor_flags",
    oracle="""
WITH derived AS (
  SELECT (event_id * 3) % 5200 AS raw_beta,
         (event_id * 7 + 11) % 5200 AS raw_chl,
         (event_id * 13 + 5) % 5200 AS raw_cdom
  FROM events
)
SELECT CONCAT(
         CASE WHEN raw_beta <= 0 OR raw_beta > 4125 THEN 3 ELSE 1 END,
         CASE WHEN raw_chl <= 0 OR raw_chl > 4125 THEN 3 ELSE 1 END,
         CASE WHEN raw_cdom <= 0 OR raw_cdom > 4125 THEN 3 ELSE 1 END
       ) AS flags,
       COUNT(*) AS n
FROM derived GROUP BY 1
""",
)
def instr_flor_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLOR raw-count span flags, CDOM channel present
    (reference: flor_advanced_flags, calculateFunctions.py:189-218)."""
    e = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    flags = flor_advanced_flags(
        raw_beta=(eid * 3) % 5200,
        raw_chl=(eid * 7 + 11) % 5200,
        raw_cdom=(eid * 13 + 5) % 5200,
    )
    return e.select(flags.alias("flags")).groupBy("flags").agg(F.count(F.lit(1)).alias("n"))


@query(
    "instr_nutnr_flags",
    oracle="""
WITH derived AS (
  SELECT list_transform(generate_series(0, 9), j -> (event_id * (j + 2)) % 60000) AS spectral_channels,
         (event_id * 11) % 900 AS dark_value,
         (event_id * 17) % 40000 AS spectrum_average,
         ((event_id * 19) % 300) / 100.0 AS a254,
         ((event_id * 23) % 300) / 100.0 AS a350,
         ((event_id * 29) % 40) / 10000.0 AS fit_rmse
  FROM events
)
SELECT CONCAT(
         CASE WHEN spectrum_average < 10000 THEN 3 ELSE 1 END,
         CASE WHEN len(list_filter(spectral_channels, ch -> ch - dark_value <= 0)) > 0 THEN 3 ELSE 1 END,
         CASE WHEN a254 > 1.3 OR a350 > 1.3 THEN 3 ELSE 1 END,
         CASE WHEN fit_rmse > 0.001 THEN 3 ELSE 1 END
       ) AS flags,
       COUNT(*) AS n
FROM derived GROUP BY 1
""",
)
def instr_nutnr_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NUTNR/SUNA lamp, invalid-spectra, CDOM-absorbance and RMSE flags
    (reference: nutnr_advanced_flags, calculateFunctions.py:225-266)."""
    e = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    spectral = F.transform(F.sequence(F.lit(0), F.lit(9)), lambda j: (eid * (j + 2)) % 60000)
    flags = nutnr_advanced_flags(
        spectral_channels=spectral,
        dark_value=(eid * 11) % 900,
        spectrum_average=(eid * 17) % 40000,
        absorbance_254=((eid * 19) % 300) / 100.0,
        absorbance_350=((eid * 23) % 300) / 100.0,
        fit_rmse=((eid * 29) % 40) / 10000.0,
    )
    return e.select(flags.alias("flags")).groupBy("flags").agg(F.count(F.lit(1)).alias("n"))


@query(
    "instr_adcp_flags",
    oracle=f"""
WITH derived AS (
  SELECT value % 50.0 AS bin_depth,
         (value / 10.0) * (1.0 - {COS_20_DEG!r}) + 3.0 * (400.0 / 100.0) / 2.0 AS z_ic,
         (value - 200) / 1000.0 AS err_vel,
         (value - 150) / 500.0 AS up_vel,
         (value - 100) / 100.0 AS east_vel,
         (value - 120) / 110.0 AS north_vel,
         list_transform(generate_series(0, 3), j -> (event_id * (j + 19)) % 160) AS corr_beams,
         list_transform(generate_series(0, 3), j -> (event_id * (j + 23)) % 100) AS pg_beams
  FROM events
)
SELECT CONCAT(
         CASE WHEN bin_depth < z_ic THEN 3 ELSE 1 END,
         CASE WHEN ABS(err_vel) > 0.20 THEN 3 ELSE 1 END,
         CASE WHEN ABS(up_vel) > 0.50 THEN 3 ELSE 1 END,
         CASE WHEN ABS(east_vel) > 2.50 OR ABS(north_vel) > 2.50 THEN 3 ELSE 1 END,
         CASE WHEN len(list_filter(corr_beams, b -> b > 115)) < 2 THEN 3 ELSE 1 END,
         CASE WHEN len(list_filter(pg_beams, b -> b > 56)) < 3 THEN 3 ELSE 1 END
       ) AS flags,
       COUNT(*) AS n
FROM derived GROUP BY 1
""",
)
def instr_adcp_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADCP six-test flags: sidelobe (Lentz 2022 z_ic), velocities, and the
    k-of-n beam votes (reference: adcp_advanced_flags + sidelobe_depth,
    calculateFunctions.py:78-186; thresholds TRDI QA/QC Model rev12-1)."""
    e = load_table(spark, sf_dir, "events")
    v, eid = F.col("value"), F.col("event_id")
    z_ic = (v / 10.0) * (1.0 - COS_20_DEG) + 3.0 * (400.0 / 100.0) / 2.0
    flags = adcp_advanced_flags(
        bin_depth=v % 50.0,
        z_ic=z_ic,
        error_velocity=(v - 200) / 1000.0,
        upward_velocity=(v - 150) / 500.0,
        eastward_velocity=(v - 100) / 100.0,
        northward_velocity=(v - 120) / 110.0,
        correlation_beams=F.transform(F.sequence(F.lit(0), F.lit(3)), lambda j: (eid * (j + 19)) % 160),
        percent_good_beams=F.transform(F.sequence(F.lit(0), F.lit(3)), lambda j: (eid * (j + 23)) % 100),
        instrument_type="ADCPT",
    )
    return e.select(flags.alias("flags")).groupBy("flags").agg(F.count(F.lit(1)).alias("n"))


@query(
    "instr_pco2w_flags",
    oracle="""
WITH derived AS (
  SELECT user_id, ts, event_id,
         list_transform(generate_series(0, 13),
           j -> (event_id * (2 * j + 7)) % (CASE WHEN j IN (0, 1, 8, 9) THEN 260 ELSE 4300 END)) AS light,
         (event_id * 97) % 16384 AS blank_434,
         (event_id * 89) % 16384 AS blank_620,
         value * 4.0 AS pco2
  FROM events
), lagged AS (
  SELECT *,
         LAG(blank_434) OVER w AS prev_blank_434,
         LAG(blank_620) OVER w AS prev_blank_620,
         LAG(pco2) OVER w AS prev_pco2
  FROM derived
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT CONCAT(
    CASE WHEN light[1] < 50 OR light[1] > 200 OR light[9] < 50 OR light[9] > 200
           OR light[2] < 50 OR light[2] > 200 OR light[10] < 50 OR light[10] > 200 THEN 3 ELSE 1 END,
    CASE WHEN light[4] > 4000 OR light[12] > 4000 OR light[6] > 4000 OR light[14] > 4000 THEN 3 ELSE 1 END,
    CASE WHEN light[4] < 5 OR light[12] < 5 OR light[6] < 5 OR light[14] < 5 THEN 3 ELSE 1 END,
    CASE WHEN blank_434 < 16384 * 0.20 OR blank_620 < 16384 * 0.20 THEN 3 ELSE 1 END,
    CASE WHEN ABS(blank_434 - prev_blank_434) > 2800 OR ABS(blank_620 - prev_blank_620) > 2800 THEN 3 ELSE 1 END,
    CASE WHEN ABS(pco2 - prev_pco2) > 1600 THEN 3 ELSE 1 END,
    CASE WHEN pco2 < 200.0 OR pco2 > 1200.0 THEN 3 ELSE 1 END
  ) AS flags,
  COUNT(*) AS n
FROM lagged GROUP BY 1
""",
)
def instr_pco2w_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCO2W seven-test flags over the 14-element SAMI light frame, with the
    blank/pco2 step tests fed by window lags (reference: pco2w_advanced_flags,
    calculateFunctions.py:809-893; W1 step-test mapping)."""
    e = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    light = F.transform(
        F.sequence(F.lit(0), F.lit(13)),
        lambda j: (eid * (2 * j + 7)) % F.when(j.isin(0, 1, 8, 9), 260).otherwise(4300),
    )
    d = e.select(
        "user_id",
        "ts",
        "event_id",
        ((eid * 97) % 16384).alias("blank_434"),
        ((eid * 89) % 16384).alias("blank_620"),
        (F.col("value") * 4.0).alias("pco2"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = (
        d.withColumn("prev_blank_434", F.lag("blank_434").over(w))
        .withColumn("prev_blank_620", F.lag("blank_620").over(w))
        .withColumn("prev_pco2", F.lag("pco2").over(w))
        # the 14-element light frame is a pure function of event_id: derive
        # it AFTER the window so the lag exchange + sort move 4 scalar
        # columns per row instead of carrying a 14-element array through the
        # shuffle (guide §2.3 — shuffle fewer bytes; Catalyst does not delay
        # projections past a Window on its own)
        .withColumn("light", light)
    )
    flags = pco2w_advanced_flags(
        light=F.col("light"),
        blank_434=F.col("blank_434"),
        blank_620=F.col("blank_620"),
        pco2=F.col("pco2"),
        prev_blank_434=F.col("prev_blank_434"),
        prev_blank_620=F.col("prev_blank_620"),
        prev_pco2=F.col("prev_pco2"),
        cal_range_lo=F.lit(200.0),
        cal_range_hi=F.lit(1200.0),
    )
    return d.select(flags.alias("flags")).groupBy("flags").agg(F.count(F.lit(1)).alias("n"))


_PH_STD = (
    "sqrt(list_sum(list_transform({col}, x -> CAST(x AS DOUBLE) * x)) / 23.0"
    " - (list_sum(list_transform({col}, x -> CAST(x AS DOUBLE))) / 23.0)"
    " * (list_sum(list_transform({col}, x -> CAST(x AS DOUBLE))) / 23.0))"
)


@query(
    "instr_ph_flags",
    oracle=f"""
WITH derived AS (
  SELECT list_transform(generate_series(0, 91), j -> (event_id * (j + 3) + 17 * j) % 4096) AS light,
         list_transform(generate_series(0, 15), j -> (event_id * (j + 5) + 13 * j) % 4096) AS refl
  FROM events
), mats AS (
  SELECT list_transform(generate_series(0, 22), r -> light[r * 4 + 1]) AS ref434,
         list_transform(generate_series(0, 22), r -> light[r * 4 + 2]) AS sig434,
         list_transform(generate_series(0, 22), r -> light[r * 4 + 3]) AS ref578,
         list_transform(generate_series(0, 22), r -> light[r * 4 + 4]) AS sig578,
         list_transform(generate_series(0, 3), r -> refl[r * 4 + 2]) AS blank_sig434,
         list_transform(generate_series(0, 3), r -> refl[r * 4 + 4]) AS blank_sig578
  FROM derived
)
SELECT CONCAT(
    CASE WHEN len(list_filter(sig434, x -> x < 4096 / 12)) > 0
           OR len(list_filter(sig578, x -> x < 4096 / 12)) > 0 THEN 3 ELSE 1 END,
    CASE WHEN {_PH_STD.format(col="sig434")} < 180 OR {_PH_STD.format(col="sig578")} < 180 THEN 3 ELSE 1 END,
    CASE WHEN {_PH_STD.format(col="ref434")} > 10 OR {_PH_STD.format(col="ref578")} > 10 THEN 3 ELSE 1 END,
    CASE WHEN len(list_filter(blank_sig434, x -> x > 4096 - 4096 / 20 OR x < 4096 / 12)) > 0
           OR len(list_filter(blank_sig578, x -> x > 4096 - 4096 / 20 OR x < 4096 / 12)) > 0 THEN 3 ELSE 1 END,
    CASE WHEN len(list_filter(sig434, x -> x > 4096 - 4096 / 20 OR x < 5)) > 0
           OR len(list_filter(sig578, x -> x > 4096 - 4096 / 20 OR x < 5)) > 0 THEN 3 ELSE 1 END,
    CASE WHEN {_PH_STD.format(col="sig434")} < 60 OR {_PH_STD.format(col="sig578")} < 60 THEN 3 ELSE 1 END
  ) AS flags,
  COUNT(*) AS n
FROM mats GROUP BY 1
""",
)
def instr_ph_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PHSEN six-test flags over the 23x4 light matrix and 4x4 DI blanks,
    population-std in the integer-exact form (reference: ph_advanced_flags,
    calculateFunctions.py:898-979)."""
    from rca_data_tools_spark.functions.instruments import ph_advanced_flags_df

    e = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    light = F.transform(F.sequence(F.lit(0), F.lit(91)), lambda j: (eid * (j + 3) + 17 * j) % 4096)
    refl = F.transform(F.sequence(F.lit(0), F.lit(15)), lambda j: (eid * (j + 5) + 13 * j) % 4096)
    d = e.select(light.alias("light"), refl.alias("refl"))
    flagged = ph_advanced_flags_df(d, "light", "refl", flag_col="flags")
    return flagged.groupBy("flags").agg(F.count(F.lit(1)).alias("n"))


@query(
    "instr_vel3d_flags",
    oracle="""
WITH derived AS (
  SELECT (value - 30) / 2.0 AS pitch,
         (value - 40) / 3.0 AS roll,
         value - 2.0 AS pressure,
         event_id % 4 AS error_code,
         list_transform(generate_series(0, 2), j -> (event_id * (j + 31)) % 120) AS correlations
  FROM events
)
SELECT CONCAT(
    CASE WHEN ABS(pitch) > 20 THEN 3 ELSE 1 END,
    CASE WHEN ABS(pitch) >= 30 THEN 3 ELSE 1 END,
    CASE WHEN ABS(roll) > 20 THEN 3 ELSE 1 END,
    CASE WHEN ABS(roll) >= 30 THEN 3 ELSE 1 END,
    CASE WHEN pressure <= 15 THEN 3 ELSE 1 END,
    CASE WHEN (CAST(error_code AS INT) & 1) = 1 THEN 3 ELSE 1 END,
    CASE WHEN len(list_filter(correlations, c -> c < 50)) > 0 THEN 3 ELSE 1 END
  ) AS flags,
  COUNT(*) AS n
FROM derived GROUP BY 1
""",
)
def instr_vel3d_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VEL3D dynamic test list — this stream carries pitch/roll/pressure/
    error_code/beam correlations but no speed-of-sound or ambiguity velocity,
    so the digit string has exactly those 7 positions
    (reference: vel3d_advanced_flags, calculateFunctions.py:1020-1073)."""
    e = load_table(spark, sf_dir, "events")
    v, eid = F.col("value"), F.col("event_id")
    flags = vel3d_advanced_flags(
        pitch=(v - 30) / 2.0,
        roll=(v - 40) / 3.0,
        pressure=v - 2.0,
        error_code=eid % 4,
        correlations=F.transform(F.sequence(F.lit(0), F.lit(2)), lambda j: (eid * (j + 31)) % 120),
    )
    return e.select(flags.alias("flags")).groupBy("flags").agg(F.count(F.lit(1)).alias("n"))


@query(
    "instr_opt_converters",
    oracle=f"""
WITH derived AS (
  SELECT event_type,
         5000 + (event_id % 50000) AS traw_int,
         event_id % 65000 AS traw_ext,
         value * 100.0 AS praw
  FROM events
), conv AS (
  SELECT event_type,
         1.0 / (0.00093135 + 0.000221631 * ln(10000.0 * (5.0 * traw_int / 65535.0) / (4.516 - (5.0 * traw_int / 65535.0)))
                + 0.000000125741 * ln(10000.0 * (5.0 * traw_int / 65535.0) / (4.516 - (5.0 * traw_int / 65535.0)))
                  * ln(10000.0 * (5.0 * traw_int / 65535.0) / (4.516 - (5.0 * traw_int / 65535.0)))
                  * ln(10000.0 * (5.0 * traw_int / 65535.0) / (4.516 - (5.0 * traw_int / 65535.0)))) - 273.15 AS t_int,
         -7.1023317e-13 * traw_ext * traw_ext * traw_ext + 7.09341920e-08 * traw_ext * traw_ext
           - 3.87065673e-03 * traw_ext + 95.8241397 AS t_ext,
         praw * 0.01 + 10.0 AS depth
  FROM derived
)
SELECT event_type,
       {dsum_sql('t_int')} AS sum_t_int,
       {dsum_sql('t_ext')} AS sum_t_ext,
       {dsum_sql('depth')} AS sum_depth,
       COUNT(*) AS n
FROM conv GROUP BY 1
""",
)
def instr_opt_converters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTAA converters: internal thermistor (log polynomial), external
    temperature (cubic), pressure (linear) — summed per event_type with the
    round->decimal protocol (reference: opt_internal_temp/opt_external_temp/
    opt_pressure, calculateFunctions.py:476-620)."""
    e = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    traw_int = (5000 + (eid % 50000)).cast("double")
    traw_ext = (eid % 65000).cast("double")
    conv = e.select(
        "event_type",
        opt_internal_temp(traw_int).alias("t_int"),
        opt_external_temp(traw_ext).alias("t_ext"),
        opt_pressure(F.col("value") * 100.0, offset=10.0, sfactor=0.01).alias("depth"),
    )
    return conv.groupBy("event_type").agg(
        dsum("t_int").alias("sum_t_int"),
        dsum("t_ext").alias("sum_t_ext"),
        dsum("depth").alias("sum_depth"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "instr_sidelobe_depth",
    oracle=f"""
SELECT user_id,
       {dsum_sql(f'(value / 10.0) * (1.0 - {COS_20_DEG!r}) + 3.0 * (((event_id % 500) / 100.0)) / 2.0')} AS sum_z_ic,
       COUNT(*) AS n
FROM events GROUP BY 1
""",
)
def instr_sidelobe_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sidelobe contamination depth z_ic = ha*(1-cos theta) + 3*dz/2
    (reference: sidelobe_depth, calculateFunctions.py:78-107; Lentz 2022)."""
    e = load_table(spark, sf_dir, "events")
    z = sidelobe_depth(
        transducer_depth=F.col("value") / 10.0,
        cell_length_cm_mean=(F.col("event_id") % 500).cast("double"),
    )
    return e.groupBy("user_id").agg(dsum(z).alias("sum_z_ic"), F.count(F.lit(1)).alias("n"))


# --- OPTAA optical products & NUTNR nitrate fit ----------------------------

# Synthetic calibration grids (config data): wl_a/aw index the absorption
# array, cw indexes attenuation — mirroring CC_awlngth/CC_cwlngth cal tables.
_WL_A = [400.0 + 3.5 * j for j in range(92)]
_CW = [400.0 + 4.0 * j for j in range(80)]


def _opt_oracle() -> str:
    from rca_data_tools_spark.functions.instruments import _win3, nearest_index

    m = {t: nearest_index(_WL_A, t) for t in (412.0, 440.0, 490.0, 530.0, 676.0)}
    w650 = _win3(nearest_index(_WL_A, 650.0), len(_WL_A))
    w676 = _win3(nearest_index(_WL_A, 676.0), len(_WL_A))
    w715 = _win3(nearest_index(_WL_A, 715.0), len(_WL_A))
    w660 = _win3(nearest_index(_CW, 660.0), len(_CW))

    def med(arr: str, idxs: list[int]) -> str:
        elems = ", ".join(f"{arr}[{i + 1}]" for i in idxs)
        return f"list_sort([{elems}])[2]"

    a = {k: f"light[{v + 1}]" for k, v in m.items()}
    return f"""
WITH derived AS (
  SELECT event_type,
         list_transform(generate_series(0, 91), j -> ((event_id * (j + 7)) % 1000) / 250.0) AS light,
         list_transform(generate_series(0, 79), j -> ((event_id * (j + 11)) % 1000) / 200.0) AS att
  FROM events
), prods AS (
  SELECT event_type,
         CASE WHEN {a[440.0]} != 0 THEN {a[412.0]} / {a[440.0]} END AS ratio_cdom,
         CASE WHEN {a[440.0]} != 0 THEN {a[490.0]} / {a[440.0]} END AS ratio_carotenoids,
         CASE WHEN {a[440.0]} != 0 THEN {a[530.0]} / {a[440.0]} END AS ratio_phycobilins,
         CASE WHEN {a[440.0]} != 0 THEN {a[676.0]} / {a[440.0]} END AS ratio_qband,
         ({med('light', w676)} - ((({med('light', w715)} - {med('light', w650)}) / 65) * 26 + {med('light', w650)})) / 0.02 AS estimated_chlorophyll,
         {med('att', w660)} * 381 AS estimated_poc
  FROM derived
)
SELECT event_type,
       {dsum_sql('ratio_cdom')} AS sum_cdom,
       {dsum_sql('ratio_carotenoids')} AS sum_carot,
       {dsum_sql('ratio_phycobilins')} AS sum_phyco,
       {dsum_sql('ratio_qband')} AS sum_qband,
       {dsum_sql('estimated_chlorophyll')} AS sum_chl,
       {dsum_sql('estimated_poc')} AS sum_poc,
       COUNT(*) AS n
FROM prods GROUP BY 1
"""


@query("instr_optical_products", oracle=_opt_oracle())
def instr_optical_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTAA pigment ratios, chlorophyll line height and POC as pure Column
    array math — the reference's chunked-with-gc loop becomes a plain
    partitioned projection (reference: opt_calculate_all_optical_products,
    calculateFunctions.py:622-791)."""
    from rca_data_tools_spark.functions.instruments import opt_all_optical_products

    e = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    light = F.transform(F.sequence(F.lit(0), F.lit(91)), lambda j: ((eid * (j + 7)) % 1000) / 250.0)
    att = F.transform(F.sequence(F.lit(0), F.lit(79)), lambda j: ((eid * (j + 11)) % 1000) / 200.0)
    d = e.select("event_type", light.alias("light"), att.alias("att"))
    prods = opt_all_optical_products(
        F.col("light"), F.col("att"), wl_a=_WL_A, aw=_WL_A, cw=_CW
    )
    p = d.select("event_type", *[c.alias(k) for k, c in prods.items()])
    return p.groupBy("event_type").agg(
        dsum("ratio_cdom").alias("sum_cdom"),
        dsum("ratio_carotenoids").alias("sum_carot"),
        dsum("ratio_phycobilins").alias("sum_phyco"),
        dsum("ratio_qband").alias("sum_qband"),
        dsum("estimated_chlorophyll").alias("sum_chl"),
        dsum("estimated_poc").alias("sum_poc"),
        F.count(F.lit(1)).alias("n"),
    )


# NUTNR synthetic calibration (config data; 40 channels, fit window 217-240).
# ENO3 carries a quadratic term: real nitrate extinction spectra are strongly
# curved in wavelength, and a curvature-free (exactly linear-in-wl) ENO3 would
# make the [ENO3, 1/100, WL/1000] design matrix rank-deficient (cond ~ 1e17)
# so the fit itself would be ill-posed. cond(M) here is ~6e3.
NUTNR_CAL = {
    "wl": [210.0 + j for j in range(40)],
    "eno3": [0.01 + 0.001 * j + 0.00008 * j * j for j in range(40)],
    "eswa": [0.005 + 0.0005 * j for j in range(40)],
    "di": [50000.0 - 100.0 * j for j in range(40)],
    "cal_temp": 20.0,
    "wllower": 217.0,
    "wlupper": 240.0,
}


def _nutnr_oracle() -> str:
    """DuckDB replay of the normal-equations nitrate fit.

    The calibration channel constants (design-matrix rows, f', DI) and the
    six Gram-inverse entries are computed ONCE here and embedded as exact
    double literals, so the only live SQL arithmetic is the per-row chain the
    Spark kernel also executes (log10/exp/fused linear combine) — identical
    expression trees, diffs bounded by transcendental ulps (~1e-9 after the
    solve), absorbed by the output rounding (4/3/6 decimals)."""
    from rca_data_tools_spark.operators.spectra import design_arrays, gram_inverse

    d = design_arrays(
        wl=NUTNR_CAL["wl"], eno3=NUTNR_CAL["eno3"], eswa=NUTNR_CAL["eswa"],
        di=NUTNR_CAL["di"], wllower=NUTNR_CAL["wllower"], wlupper=NUTNR_CAL["wlupper"],
    )
    M, ESWA, DI, fp = d["M"], d["ESWA"], d["DI"], d["f_prime"]
    i11, i12, i13, i22, i23, i33 = gram_inverse(M)
    chan_rows = ",\n    ".join(
        f"({j}, {M[r,0]!r}, {M[r,1]!r}, {M[r,2]!r}, {ESWA[r]!r}, {fp[r]!r}, {DI[r]!r})"
        for r, j in enumerate(d["use_idx"].tolist())
    )
    return f"""
WITH chan(j, m1, m2, m3, eswa, fp, di) AS (
  VALUES
    {chan_rows}
),
rows_in AS (
  SELECT event_id, CAST(event_id % 1000 AS DOUBLE) AS dark,
         value/20.0 AS ctd_t, 30.0 + value/100.0 AS ctd_sp,
         (event_type = 'error') AS is_dark
  FROM events
),
cells AS (
  SELECT r.event_id, r.is_dark, c.m1, c.m2, c.m3,
         log10(c.di / (CAST(20000 + ((r.event_id * (c.j + 3)) % 30000) AS DOUBLE) - r.dark))
           - r.ctd_sp * (c.eswa * exp(c.fp * (r.ctd_t - 20.0))) AS acomp
  FROM rows_in r CROSS JOIN chan c
),
bvec AS (
  SELECT event_id, is_dark,
         SUM(m1*acomp) AS b1, SUM(m2*acomp) AS b2, SUM(m3*acomp) AS b3
  FROM cells GROUP BY 1, 2
),
coefs AS (
  SELECT event_id, is_dark,
         {i11!r}*b1 + {i12!r}*b2 + {i13!r}*b3 AS c1,
         {i12!r}*b1 + {i22!r}*b2 + {i23!r}*b3 AS c2,
         {i13!r}*b1 + {i23!r}*b2 + {i33!r}*b3 AS c3
  FROM bvec
),
resid AS (
  SELECT ce.event_id, co.is_dark, co.c1, co.c2, co.c3,
         ce.acomp - (co.c1*ce.m1 + co.c2*ce.m2 + co.c3*ce.m3) AS r
  FROM cells ce JOIN coefs co ON ce.event_id = co.event_id
)
SELECT event_id,
       CASE WHEN is_dark THEN NULL ELSE ROUND(ANY_VALUE(c1), 4) END AS dissolved_nitrate,
       CASE WHEN is_dark THEN NULL ELSE ROUND(ANY_VALUE(c1), 4) END AS fit_coef_0,
       CASE WHEN is_dark THEN NULL ELSE ROUND(ANY_VALUE(c2), 3) END AS fit_coef_1,
       CASE WHEN is_dark THEN NULL ELSE ROUND(ANY_VALUE(c3), 4) END AS fit_coef_2,
       CASE WHEN is_dark THEN NULL ELSE ROUND(sqrt(AVG(r*r)), 6) END AS nutnr_rmse
FROM resid GROUP BY event_id, is_dark
"""


@query("calc_nutnr_nitrate", oracle=_nutnr_oracle())
def calc_nutnr_nitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS-corrected nitrate (Sakamoto 2009 / Plant 2023): bromide-component
    subtraction + 3-term spectral least squares, vectorized to one pass per
    Arrow batch (reference: nutnr_plant2023, calculateFunctions.py:267-468;
    dark frames SDB/SDF/NDF -> NaN, :418-420). Emits the fit as scalar
    coefficient columns (rounded at 4/3/6 decimals, matching the oracle's
    replay precision); dark-frame NaNs surface as NULL."""
    from rca_data_tools_spark.operators.spectra import nitrate_ts_corrected

    e = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    d = e.select(
        "event_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(39)),
            lambda j: (20000 + ((eid * (j + 3)) % 30000)).cast("double"),
        ).alias("spectral_channels"),
        (eid % 1000).cast("double").alias("dark_value"),
        (F.col("value") / 20.0).alias("ctd_t"),
        (30.0 + F.col("value") / 100.0).alias("ctd_sp"),
        F.when(F.col("event_type") == "error", "SDB").otherwise("SLB").alias("frame_type"),
    )
    out = nitrate_ts_corrected(
        d, "spectral_channels", "dark_value", "ctd_t", "ctd_sp", "frame_type",
        solver="normal", **NUTNR_CAL,
    )

    def scalar(col: str, scale: int):
        r = F.round(F.col(col), scale)
        return F.when(~F.isnan(r), r).alias(col)

    return out.select(
        "event_id",
        scalar("dissolved_nitrate", 4),
        scalar("fit_coef_0", 4),
        scalar("fit_coef_1", 3),
        scalar("fit_coef_2", 4),
        scalar("nutnr_rmse", 6),
    )
