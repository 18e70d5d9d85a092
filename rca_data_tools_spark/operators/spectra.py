"""Per-row spectral least-squares: the TS-corrected nitrate product.

Reference: nutnr_plant2023 (rca_data_tools/qaqc/advanced_qaqc/
calculateFunctions.py:267-468) — the Sakamoto 2009 / Plant 2023 algorithm:
subtract the temperature-scaled bromide (seawater) component from each UV
absorbance spectrum, then solve a 3-term linear model
[ENO3, 1/100, WL/1000] for nitrate concentration, returning
(nitrate, fit coefficients, rmse) per sample. Dark frames (SDB/SDF/NDF)
yield NaN (:418-420).

Spark mapping: the reference loops rows and calls np.linalg.pinv per sample
(:425-460). For one calibration the design matrix M is IDENTICAL for every
row, so we hoist pinv(M) out of the loop entirely: each Arrow batch does one
(3 x k) @ (k x N) matmul for all its rows — mapInPandas, vectorized, no
per-row Python. Scale shape: embarrassingly parallel over partitions, zero
shuffles, cal constants closure-captured (broadcast by Spark's task
serializer).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (kept for callers)

# Sakamoto/Plant f' polynomial coefficients (public DPS 1341-00620)
_C = (1.46380e-02, 1.67660e-03, 2.91898e-05, -7.56395e-06, 1.27353e-07)

DARK_FRAMES = ("SDB", "SDF", "NDF")


def nitrate_ts_corrected(
    df: DataFrame,
    spectra_col: str,
    dark_col: str,
    temp_col: str,
    sal_col: str,
    frame_col: str,
    *,
    wl: list[float],
    eno3: list[float],
    eswa: list[float],
    di: list[float],
    cal_temp: float,
    wllower: float = 217.0,
    wlupper: float = 240.0,
) -> DataFrame:
    """Append dissolved_nitrate / fit coefficients / nutnr_rmse columns.

    Calibration vectors (wl/eno3/eswa/di, one value per spectral channel) and
    scalars arrive as plain Python lists — config data, exactly the shape the
    reference pulls from its calibration CSVs (utils.py:105-285)."""
    wl_a = np.asarray(wl, dtype=np.float64)
    use = (wllower <= wl_a) & (wl_a <= wlupper)
    WL = wl_a[use]
    ENO3 = np.asarray(eno3, dtype=np.float64)[use]
    ESWA = np.asarray(eswa, dtype=np.float64)[use]
    DI = np.asarray(di, dtype=np.float64)[use]
    k = int(use.sum())

    wl_prime = WL - 210.0
    f_prime = _C[0] + _C[1] * wl_prime + _C[2] * wl_prime**2 + _C[3] * wl_prime**3 + _C[4] * wl_prime**4
    # Fixed design matrix -> one pinv for the whole job.
    M = np.column_stack((ENO3, np.ones(k) / 100.0, WL / 1000.0))
    pinv_M = np.linalg.pinv(M)
    use_idx = np.flatnonzero(use)

    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        + ", dissolved_nitrate double, nutnr_fitting_function array<double>, nutnr_rmse double"
    )

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            n = len(pdf)
            spectra = np.asarray(
                [np.asarray(s, dtype=np.float64)[use_idx] for s in pdf[spectra_col]]
            )  # (n, k)
            dark = pdf[dark_col].to_numpy(dtype=np.float64)[:, None]
            ctd_t = pdf[temp_col].to_numpy(dtype=np.float64)
            ctd_sp = pdf[sal_col].to_numpy(dtype=np.float64)

            with np.errstate(divide="ignore", invalid="ignore"):
                absorbance = np.log10(DI[None, :] / (spectra - dark))
            swa_ext_at_t = ESWA[None, :] * np.exp(f_prime[None, :] * (ctd_t[:, None] - cal_temp))
            acomp = absorbance - ctd_sp[:, None] * swa_ext_at_t  # (n, k)

            C = acomp @ pinv_M.T  # (n, 3): row-wise solve, one matmul
            afit = C @ M.T  # (n, k)
            resid = acomp - afit
            rmse = np.sqrt(np.nanmean(resid**2, axis=1))

            is_dark = pdf[frame_col].isin(DARK_FRAMES).to_numpy()
            no3 = np.where(is_dark, np.nan, C[:, 0])
            rmse = np.where(is_dark, np.nan, rmse)

            out = pdf.copy()
            out["dissolved_nitrate"] = no3
            out["nutnr_fitting_function"] = [row.tolist() for row in C]
            out["nutnr_rmse"] = rmse
            yield out

    return df.mapInPandas(kernel, schema=out_schema)


def nitrate_reference_rowloop(
    pdf: pd.DataFrame,
    spectra_col: str,
    dark_col: str,
    temp_col: str,
    sal_col: str,
    frame_col: str,
    **cal,
) -> pd.DataFrame:
    """Straight per-row transcription of the reference's loop (pinv per row),
    used by the tests as the independent truth for the vectorized kernel."""
    wl_a = np.asarray(cal["wl"], dtype=np.float64)
    use = (cal.get("wllower", 217.0) <= wl_a) & (wl_a <= cal.get("wlupper", 240.0))
    WL = wl_a[use]
    ENO3 = np.asarray(cal["eno3"], dtype=np.float64)[use]
    ESWA = np.asarray(cal["eswa"], dtype=np.float64)[use]
    DI = np.asarray(cal["di"], dtype=np.float64)[use]
    wl_prime = WL - 210.0
    f_prime = _C[0] + _C[1] * wl_prime + _C[2] * wl_prime**2 + _C[3] * wl_prime**3 + _C[4] * wl_prime**4
    rows = []
    for _, r in pdf.iterrows():
        if r[frame_col] in DARK_FRAMES:
            rows.append((np.nan, [np.nan] * 3, np.nan))
            continue
        SW = np.asarray(r[spectra_col], dtype=np.float64)[use]
        with np.errstate(divide="ignore", invalid="ignore"):
            absorbance = np.log10(DI / (SW - r[dark_col]))
        swa = ESWA * np.exp(f_prime * (r[temp_col] - cal["cal_temp"]))
        acomp = np.atleast_2d(absorbance - r[sal_col] * swa).T
        M = np.vstack((ENO3, np.ones(len(WL)) / 100.0, WL / 1000.0)).T
        C = np.linalg.pinv(M) @ acomp
        afit = (M @ C).flatten()
        resid = acomp.flatten() - afit
        rows.append((C[0, 0], C.flatten().tolist(), float(np.sqrt(np.mean(resid**2)))))
    out = pdf.copy()
    out[["dissolved_nitrate", "nutnr_fitting_function", "nutnr_rmse"]] = pd.DataFrame(
        rows, index=pdf.index
    )
    return out
