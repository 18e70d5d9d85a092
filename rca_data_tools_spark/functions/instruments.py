"""Concrete instrument QC flaggers and converters from the reference's
advanced-QA/QC layer, re-expressed as pure Spark Column expressions.

Reference: rca_data_tools/qaqc/advanced_qaqc/calculateFunctions.py —
`combine_qc_flags` (:19-46) rolls an ordered list of boolean fail-masks into
a positional digit string ("113…", 1 = pass, 3 = fail); every instrument
family builds its masks and delegates there. We keep that contract exactly:
each function here returns the same digit-string Column, and each mask is a
whole-stage-codegen comparison — no Python in the hot path, so these run at
scan speed on any corpus size.

Null semantics match the reference: a NULL measurement makes the comparison
NULL, which `when(mask, 3).otherwise(1)` maps to pass — the same result as
xarray's NaN comparisons evaluating False.

Threshold provenance (all public): TRDI ADCP QA/QC Model rev12-1 (ADCP),
Sea-Bird SUNA V2 vendor docs (NUTNR), Sunburst SAMI vendor docs (PCO2W/PHSEN),
OOI DPS 1341-00690/-00700 (OPTAA thermistor/pressure conversions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rca_data_tools_spark.functions.vectors import array_pop_std_exact, k_of_n_above

# TRDI ADCP QA/QC Model rev12-1 thresholds
# (reference: calculateFunctions.py:53-76).
ADCP_QC_THRESHOLDS = {
    "error_velocity": {"pass": 0.05, "fail": 0.20},
    "correlation_magnitude": {"pass": 115, "fail": 63},
    "vertical_velocity": {"pass": 0.30, "fail": 0.50},
    "horizontal_speed": {"pass": 1.00, "fail": 2.50},
    "percent_good": {"ADCPT": {"pass": 56, "fail": 45}, "ADCPS": {"pass": 48, "fail": 38}},
}

FLOR_MAX_COUNTS = 4125  # calculateFunctions.py:195


def combine_qc_flags(*masks: Column) -> Column:
    """Ordered fail-masks -> positional digit string, 1 pass / 3 fail
    (reference: combine_qc_flags, calculateFunctions.py:19-46). NULL mask
    values count as pass, matching NaN-comparison behavior in the reference."""
    digits = [
        F.when(m, F.lit(3)).otherwise(F.lit(1)).cast("string") for m in masks
    ]
    return F.concat(*digits)


# --- FLOR (fluorometer) — calculateFunctions.py:189-218 --------------------

def flor_advanced_flags(
    raw_beta: Column, raw_chl: Column, raw_cdom: Column | None = None
) -> Column:
    """Raw-count span tests: counts must be in (0, 4125]. The CDOM test is
    appended only when the stream carries a CDOM channel, mirroring the
    reference's dynamic test list."""

    def bad(c: Column) -> Column:
        return (c <= 0) | (c > FLOR_MAX_COUNTS)

    masks = [bad(raw_beta), bad(raw_chl)]
    if raw_cdom is not None:
        masks.append(bad(raw_cdom))
    return combine_qc_flags(*masks)


# --- NUTNR (SUNA nitrate) — calculateFunctions.py:225-266 ------------------

def nutnr_advanced_flags(
    spectral_channels: Column,
    dark_value: Column,
    spectrum_average: Column,
    absorbance_254: Column,
    absorbance_350: Column,
    fit_rmse: Column,
    extra_rmse: Column | None = None,
) -> Column:
    """Four tests in reference order: blocked channel / failed lamp
    (spectrum average < 10000), invalid spectra (any channel where
    channel - dark <= 0 or channel is null), CDOM interference (A254 or
    A350 > 1.3 AU), and RMSE (> 1e-3, optionally OR'd with the plant2023
    refit RMSE when present)."""
    channel_mask = spectrum_average < 10000
    invalid_mask = F.exists(
        spectral_channels, lambda ch: (ch - dark_value <= 0) | ch.isNull()
    )
    cdom_mask = (absorbance_254 > 1.3) | (absorbance_350 > 1.3)
    rmse_mask = fit_rmse > 0.001
    if extra_rmse is not None:
        rmse_mask = rmse_mask | (extra_rmse > 0.001)
    return combine_qc_flags(channel_mask, invalid_mask, cdom_mask, rmse_mask)


# --- ADCP — calculateFunctions.py:78-186 -----------------------------------

def sidelobe_depth(
    transducer_depth: Column, cell_length_cm_mean: Column, theta_deg: float = 20.0
) -> Column:
    """Sidelobe contamination depth, Lentz et al. (2022):
    z_ic = ha * (1 - cos(theta)) + 3 * delta_z / 2, delta_z in m (cm / 100).
    The reference interpolates ha over time first (interpolate_na); feed this
    an already-interpolated column (operators/interpolate.py) to match."""
    delta_z = cell_length_cm_mean / 100.0
    return transducer_depth * (1.0 - F.cos(F.radians(F.lit(theta_deg)))) + 3.0 * delta_z / 2.0


def adcp_advanced_flags(
    bin_depth: Column,
    z_ic: Column,
    error_velocity: Column,
    upward_velocity: Column,
    eastward_velocity: Column,
    northward_velocity: Column,
    correlation_beams: Column,
    percent_good_beams: Column,
    instrument_type: str = "ADCPT",
) -> Column:
    """Six tests in reference order: sidelobe (bin shallower than z_ic),
    error velocity, vertical velocity, horizontal speed (either component),
    correlation magnitude (< 2 of 4 beams above pass), percent good
    (< 3 of 4 beams above the subtype's pass threshold). Beam sets arrive as
    array columns; the k-of-n vote is an array filter, not an explode."""
    thr = ADCP_QC_THRESHOLDS
    sidelobe = bin_depth < z_ic
    ev = F.abs(error_velocity) > thr["error_velocity"]["fail"]
    vv = F.abs(upward_velocity) > thr["vertical_velocity"]["fail"]
    hs_fail = thr["horizontal_speed"]["fail"]
    hs = (F.abs(eastward_velocity) > hs_fail) | (F.abs(northward_velocity) > hs_fail)
    cm = k_of_n_above(correlation_beams, thr["correlation_magnitude"]["pass"]) < 2
    pg = k_of_n_above(percent_good_beams, thr["percent_good"][instrument_type]["pass"]) < 3
    return combine_qc_flags(sidelobe, ev, vv, hs, cm, pg)


# --- PCO2W (SAMI-CO2) — calculateFunctions.py:809-893 ----------------------

def pco2w_advanced_flags(
    light: Column,
    blank_434: Column,
    blank_620: Column,
    pco2: Column,
    prev_blank_434: Column,
    prev_blank_620: Column,
    prev_pco2: Column,
    cal_range_lo: Column,
    cal_range_hi: Column,
) -> Column:
    """Seven tests in reference order over the 14-element light-measurement
    array (positions per the SAMI frame layout: dark ref [0,8], dark signal
    [1,9], ref434 [2,10], sig434 [3,11], ref620 [4,12], sig620 [5,13]).

    The reference's diff('time') step tests arrive here as pre-computed lag
    columns (window layer); first-row lag NULL means pass, matching
    reindex(fill_value=False)."""

    def at(*idx0: int) -> list[Column]:
        # element_at is 1-based; SAMI positions are 0-based
        return [F.element_at(light, i + 1) for i in idx0]

    def any_outside(cols: list[Column], lo: float, hi: float) -> Column:
        m = F.lit(False)
        for c in cols:
            m = m | (c < lo) | (c > hi)
        return m

    def any_over(cols: list[Column], hi: float) -> Column:
        m = F.lit(False)
        for c in cols:
            m = m | (c > hi)
        return m

    def any_under(cols: list[Column], lo: float) -> Column:
        m = F.lit(False)
        for c in cols:
            m = m | (c < lo)
        return m

    suspect_dark = any_outside(at(0, 8), 50, 200) | any_outside(at(1, 9), 50, 200)
    suspect_signal = any_over(at(3, 11) + at(5, 13), 4000)
    failed_signal = any_under(at(3, 11) + at(5, 13), 5)
    failed_blank = (blank_434 < 16384 * 0.20) | (blank_620 < 16384 * 0.20)
    failed_blank_step = (F.abs(blank_434 - prev_blank_434) > 2800) | (
        F.abs(blank_620 - prev_blank_620) > 2800
    )
    failed_pco2_step = F.abs(pco2 - prev_pco2) > 1600
    failed_cal_range = (pco2 < cal_range_lo) | (pco2 > cal_range_hi)
    return combine_qc_flags(
        suspect_dark,
        suspect_signal,
        failed_signal,
        failed_blank,
        failed_blank_step,
        failed_pco2_step,
        failed_cal_range,
    )


# --- PHSEN (SAMI-pH) — calculateFunctions.py:898-979 -----------------------

PH_MAX_BITS = 4096


def ph_matrix_column(flat: Column, rows: int, cols: int, col_idx: int) -> Column:
    """Extract one column of a row-major (rows x cols) matrix stored as a
    flat array: elements [col_idx], [cols + col_idx], ... — the Spark form of
    the reference's reshape(nrec, 23, 4)[:, :, col_idx]."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(rows - 1)),
        lambda r: F.element_at(flat, r * cols + col_idx + 1),
    )


def ph_advanced_flags(light_flat: Column, reference_flat: Column) -> Column:
    """Six tests in reference order over the 23x4 seawater light matrix and
    the 4x4 DI-blank matrix (columns: ref434, sig434, ref578, sig578).

    Array std uses population std (numpy's default ddof=0), matching
    signal.std(axis=1) in the reference — computed in the integer-exact
    sqrt(E[x^2]-E[x]^2) form so any engine reproduces it bit-for-bit
    (counts are 12-bit ints; both sums stay exact in doubles)."""
    sig434 = ph_matrix_column(light_flat, 23, 4, 1)
    sig578 = ph_matrix_column(light_flat, 23, 4, 3)
    ref434 = ph_matrix_column(light_flat, 23, 4, 0)
    ref578 = ph_matrix_column(light_flat, 23, 4, 2)
    blank_sig434 = ph_matrix_column(reference_flat, 4, 4, 1)
    blank_sig578 = ph_matrix_column(reference_flat, 4, 4, 3)

    def any_lt(a: Column, v: float) -> Column:
        return F.exists(a, lambda x: x < v)

    def any_gt(a: Column, v: float) -> Column:
        return F.exists(a, lambda x: x > v)

    low = any_lt(sig434, PH_MAX_BITS / 12) | any_lt(sig578, PH_MAX_BITS / 12)
    flat_ind = (array_pop_std_exact(sig434) < 180) | (array_pop_std_exact(sig578) < 180)
    erratic = (array_pop_std_exact(ref434) > 10) | (array_pop_std_exact(ref578) > 10)
    sat = PH_MAX_BITS - PH_MAX_BITS / 20
    failed_blank = (
        any_gt(blank_sig434, sat)
        | any_lt(blank_sig434, PH_MAX_BITS / 12)
        | any_gt(blank_sig578, sat)
        | any_lt(blank_sig578, PH_MAX_BITS / 12)
    )
    failed_intensity = (
        any_gt(sig434, sat) | any_lt(sig434, 5) | any_gt(sig578, sat) | any_lt(sig578, 5)
    )
    flat_intensity = (array_pop_std_exact(sig434) < 60) | (array_pop_std_exact(sig578) < 60)
    return combine_qc_flags(low, flat_ind, erratic, failed_blank, failed_intensity, flat_intensity)


# --- VELPT / VEL3D — calculateFunctions.py:985-1073 ------------------------

def velpt_advanced_flags(
    pitch: Column, roll: Column, sound_speed: Column, pressure: Column
) -> Column:
    """Six tests in reference order: suspect/failed pitch (>20 / >=30 deg),
    suspect/failed roll, speed of sound outside (1400, 1700) m/s,
    non-positive pressure."""
    return combine_qc_flags(
        F.abs(pitch) > 20,
        F.abs(pitch) >= 30,
        F.abs(roll) > 20,
        F.abs(roll) >= 30,
        (sound_speed <= 1400) | (sound_speed >= 1700),
        pressure <= 0,
    )


def vel3d_advanced_flags(
    pitch: Column | None = None,
    roll: Column | None = None,
    speed_of_sound: Column | None = None,
    pressure: Column | None = None,
    error_code: Column | None = None,
    correlations: Column | None = None,
    velocities: Column | None = None,
    ambiguity_velocity: Column | None = None,
) -> Column:
    """VEL3D test list is assembled dynamically from whichever variables the
    stream carries (reference checks `in vel3d.variables` per test); pass the
    columns the dataset has and the digit string grows accordingly.
    `correlations`/`velocities` are 3-element array columns."""
    masks: list[Column] = []
    if pitch is not None:
        masks += [F.abs(pitch) > 20, F.abs(pitch) >= 30]
    if roll is not None:
        masks += [F.abs(roll) > 20, F.abs(roll) >= 30]
    if speed_of_sound is not None:
        masks.append((speed_of_sound < 1400) | (speed_of_sound > 1700))
    if pressure is not None:
        masks.append(pressure <= 15)
    if error_code is not None:
        masks.append(error_code.cast("int").bitwiseAND(F.lit(1)) == 1)
    if correlations is not None:
        masks.append(F.exists(correlations, lambda c: c < 50))
    if velocities is not None and ambiguity_velocity is not None:
        masks.append(F.exists(velocities, lambda v: F.abs(v) > ambiguity_velocity))
    return combine_qc_flags(*masks)


# --- OPTAA converters — calculateFunctions.py:476-620 ----------------------

def opt_internal_temp(traw: Column) -> Column:
    """Raw thermistor counts -> deg C (OOI DPS 1341-00690): counts -> volts
    -> thermistor resistance -> Steinhart-Hart-style log polynomial."""
    volts = 5.0 * traw / 65535.0
    res = 10000.0 * volts / (4.516 - volts)
    log_res = F.log(res)
    a, b, c = 0.00093135, 0.000221631, 0.000000125741
    return 1.0 / (a + b * log_res + c * log_res * log_res * log_res) - 273.15


def opt_external_temp(traw: Column) -> Column:
    """Raw external-sensor counts -> deg C: cubic polynomial with the DPS
    coefficients."""
    a, b, c, d = -7.1023317e-13, 7.09341920e-08, -3.87065673e-03, 95.8241397
    return a * traw * traw * traw + b * traw * traw + c * traw + d


def opt_pressure(praw: Column, offset: float, sfactor: float) -> Column:
    """Raw pressure counts -> depth (m): praw * sfactor + offset."""
    return praw * sfactor + offset

# --- calc-registry bindings -------------------------------------------------
# Every family is also addressable declaratively (CalcSpec rows), mirroring
# how calculateCalls.csv binds these functions by name
# (reference: qaqc/params/calculateCalls.csv, qaqc/utils.py:327-358).
from rca_data_tools_spark.plans.registry import REGISTRY  # noqa: E402

for _key, _fn in {
    "flor_flags": flor_advanced_flags,
    "nutnr_flags": nutnr_advanced_flags,
    "adcp_flags": adcp_advanced_flags,
    "pco2w_flags": pco2w_advanced_flags,
    "ph_flags": ph_advanced_flags,
    "velpt_flags": velpt_advanced_flags,
    "vel3d_flags": vel3d_advanced_flags,
    "sidelobe_depth": sidelobe_depth,
    "opt_internal_temp": opt_internal_temp,
    "opt_external_temp": opt_external_temp,
    "opt_pressure": opt_pressure,
}.items():
    REGISTRY.register_column(_key)(_fn)


# --- OPTAA optical products — calculateFunctions.py:622-791 ----------------

def _median3(vals: list[Column]) -> Column:
    """Median of an up-to-3-element window: sort and take the middle
    (reference: np.nanmedian over win3 index windows,
    calculateFunctions.py:709-711, 764-774)."""
    arr = F.sort_array(F.array(*vals))
    n = len(vals)
    if n == 3:
        return F.element_at(arr, 2)
    if n == 2:
        return (F.element_at(arr, 1) + F.element_at(arr, 2)) / 2.0
    return F.element_at(arr, 1)


def nearest_index(grid: list[float], target: float) -> int:
    """Index of the grid wavelength nearest to target — computed at plan
    time from the (config-sized) wavelength grid, exactly like the
    reference's argmin over the cal table (calculateFunctions.py:678-689)."""
    return min(range(len(grid)), key=lambda i: abs(grid[i] - target))


def _win3(i: int, n: int) -> list[int]:
    return list(range(max(i - 1, 0), min(i + 2, n)))


def opt_all_optical_products(
    absorption: Column,
    attenuation: Column,
    wl_a: list[float],
    aw: list[float],
    cw: list[float],
    chl_line_height: float = 0.020,
) -> dict[str, Column]:
    """Six optical products from per-row absorption/attenuation spectra
    (reference: opt_calculate_all_optical_products,
    calculateFunctions.py:622-791): four pigment ratios against chlorophyll
    absorption at 440 nm, chlorophyll-a via the 676 nm line height over the
    650-715 nm baseline, and POC from attenuation at 660 nm (x 381).

    The wavelength grids are calibration config (hundreds of floats), so the
    nearest-index searches happen at plan time and every product compiles to
    element_at/sort_array expressions — the reference's chunked loop with
    manual gc (time_chunk=1e6, :728-778) becomes ordinary partitioned scan
    execution with nothing to tune. Zero-valued a440 yields NULL ratios
    (reference: np.where(a440 != 0, ..., nan))."""
    m412 = nearest_index(wl_a, 412.0)
    m440 = nearest_index(wl_a, 440.0)
    m490 = nearest_index(wl_a, 490.0)
    m530 = nearest_index(wl_a, 530.0)
    m676r = nearest_index(wl_a, 676.0)
    m650 = nearest_index(aw, 650.0)
    m676 = nearest_index(aw, 676.0)
    m715 = nearest_index(aw, 715.0)
    m660 = nearest_index(cw, 660.0)

    def a_at(i0: int) -> Column:
        return F.element_at(absorption, i0 + 1)

    a440 = a_at(m440)

    def ratio(num: Column) -> Column:
        return F.when(a440 != 0, num / a440)

    a650 = _median3([a_at(i) for i in _win3(m650, len(aw))])
    a676 = _median3([a_at(i) for i in _win3(m676, len(aw))])
    a715 = _median3([a_at(i) for i in _win3(m715, len(aw))])
    abl = ((a715 - a650) / (715 - 650)) * (676 - 650) + a650
    att660 = _median3([F.element_at(attenuation, i + 1) for i in _win3(m660, len(cw))])

    return {
        "ratio_cdom": ratio(a_at(m412)),
        "ratio_carotenoids": ratio(a_at(m490)),
        "ratio_phycobilins": ratio(a_at(m530)),
        "ratio_qband": ratio(a_at(m676r)),
        "estimated_chlorophyll": (a676 - abl) / chl_line_height,
        "estimated_poc": att660 * 381,
    }


REGISTRY.register_column("opt_optical_products")(opt_all_optical_products)


def ph_advanced_flags_df(
    df, light_col: str, ref_col: str, flag_col: str = "ph_flags"
):
    """Staged-projection form of ph_advanced_flags for real workloads.

    The pure-Column form inlines the 23x4 matrix extraction into every mask
    that references it; higher-order functions run interpreted (outside
    whole-stage codegen), so each reference re-evaluates the transform —
    measured ~70x slower at 100k rows. Here every extraction and std is
    materialized once per projection stage; the multiply-referenced aliases
    are non-cheap, so Catalyst's CollapseProject keeps the stages separate
    and each expression evaluates exactly once per row."""
    lf, rf = F.col(light_col), F.col(ref_col)
    d = df.withColumns(
        {
            "__sig434": ph_matrix_column(lf, 23, 4, 1),
            "__sig578": ph_matrix_column(lf, 23, 4, 3),
            "__ref434": ph_matrix_column(lf, 23, 4, 0),
            "__ref578": ph_matrix_column(lf, 23, 4, 2),
            "__bsig434": ph_matrix_column(rf, 4, 4, 1),
            "__bsig578": ph_matrix_column(rf, 4, 4, 3),
        }
    )
    d = d.withColumns(
        {
            "__std_s434": array_pop_std_exact(F.col("__sig434")),
            "__std_s578": array_pop_std_exact(F.col("__sig578")),
            "__std_r434": array_pop_std_exact(F.col("__ref434")),
            "__std_r578": array_pop_std_exact(F.col("__ref578")),
        }
    )
    lo_cut = PH_MAX_BITS / 12
    sat = PH_MAX_BITS - PH_MAX_BITS / 20

    def any_lt(c: str, v: float):
        return F.exists(F.col(c), lambda x: x < v)

    def any_gt(c: str, v: float):
        return F.exists(F.col(c), lambda x: x > v)

    d = d.withColumn(
        flag_col,
        combine_qc_flags(
            any_lt("__sig434", lo_cut) | any_lt("__sig578", lo_cut),
            (F.col("__std_s434") < 180) | (F.col("__std_s578") < 180),
            (F.col("__std_r434") > 10) | (F.col("__std_r578") > 10),
            any_gt("__bsig434", sat)
            | any_lt("__bsig434", lo_cut)
            | any_gt("__bsig578", sat)
            | any_lt("__bsig578", lo_cut),
            any_gt("__sig434", sat)
            | any_lt("__sig434", 5)
            | any_gt("__sig578", sat)
            | any_lt("__sig578", 5),
            (F.col("__std_s434") < 60) | (F.col("__std_s578") < 60),
        ),
    )
    return d.drop(
        "__sig434", "__sig578", "__ref434", "__ref578", "__bsig434", "__bsig578",
        "__std_s434", "__std_s578", "__std_r434", "__std_r578",
    )
