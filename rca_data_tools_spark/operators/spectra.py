"""Per-row spectral least-squares: the TS-corrected nitrate product.

Reference: nutnr_plant2023 (rca_data_tools/qaqc/advanced_qaqc/
calculateFunctions.py:267-468) — the Sakamoto 2009 / Plant 2023 algorithm:
subtract the temperature-scaled bromide (seawater) component from each UV
absorbance spectrum, then solve a 3-term linear model
[ENO3, 1/100, WL/1000] for nitrate concentration, returning
(nitrate, fit coefficients, rmse) per sample. Dark frames (SDB/SDF/NDF)
yield NaN across every output (:418-420).

Spark mapping: the reference loops rows and calls np.linalg.pinv per sample
(:425-460). For one calibration the design matrix M is IDENTICAL for every
row, so we hoist the solve out of the loop entirely: each Arrow batch does one
(3 x k) @ (k x N) pass for all its rows — mapInPandas, vectorized, no
per-row Python. Scale shape: embarrassingly parallel over partitions, zero
shuffles, cal constants closure-captured (broadcast by Spark's task
serializer).

Two solvers:
- ``pinv`` (default): SVD pseudo-inverse, the numerically robust choice and
  the reference's own call.
- ``normal``: explicit 3x3 normal equations with the Gram inverse computed
  ONCE (cofactor formula) and applied per row as three fused
  multiply-add-free scalar expressions. For a well-conditioned calibration
  (cond(M)^2 << 1/eps) this matches pinv to ~1e-9 and — crucially — the
  identical expression tree is replayable in ANSI SQL, so a DuckDB oracle
  can reproduce the result to rounding precision. The query layer embeds
  :func:`gram_inverse`'s exact double literals in the oracle text so both
  engines use the same inverse.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (kept for callers)

# Sakamoto/Plant f' polynomial coefficients (public DPS 1341-00620)
_C = (1.46380e-02, 1.67660e-03, 2.91898e-05, -7.56395e-06, 1.27353e-07)

DARK_FRAMES = ("SDB", "SDF", "NDF")


def design_arrays(
    *,
    wl: list[float],
    eno3: list[float],
    eswa: list[float],
    di: list[float],
    wllower: float = 217.0,
    wlupper: float = 240.0,
) -> dict[str, np.ndarray]:
    """Wavelength-windowed calibration vectors + f' + the fixed design matrix.

    f' is evaluated with explicit chained multiplication (wlp2 = wlp*wlp, ...)
    so an oracle that replays the same chain gets bit-identical doubles.
    """
    wl_a = np.asarray(wl, dtype=np.float64)
    use = (wllower <= wl_a) & (wl_a <= wlupper)
    WL = wl_a[use]
    ENO3 = np.asarray(eno3, dtype=np.float64)[use]
    ESWA = np.asarray(eswa, dtype=np.float64)[use]
    DI = np.asarray(di, dtype=np.float64)[use]
    k = int(use.sum())
    wlp = WL - 210.0
    wlp2 = wlp * wlp
    wlp3 = wlp2 * wlp
    wlp4 = wlp3 * wlp
    f_prime = _C[0] + _C[1] * wlp + _C[2] * wlp2 + _C[3] * wlp3 + _C[4] * wlp4
    M = np.column_stack((ENO3, np.ones(k) / 100.0, WL / 1000.0))
    return {
        "use_idx": np.flatnonzero(use),
        "WL": WL,
        "ENO3": ENO3,
        "ESWA": ESWA,
        "DI": DI,
        "f_prime": f_prime,
        "M": M,
    }


def gram_inverse(M: np.ndarray) -> tuple[float, float, float, float, float, float]:
    """Upper triangle (i11,i12,i13,i22,i23,i33) of inv(M'M) via the closed
    cofactor formula — six plain doubles that a SQL oracle can embed verbatim
    so both engines apply the *same* inverse."""
    G = M.T @ M
    g11, g12, g13 = G[0, 0], G[0, 1], G[0, 2]
    g22, g23, g33 = G[1, 1], G[1, 2], G[2, 2]
    det = g11 * (g22 * g33 - g23 * g23) - g12 * (g12 * g33 - g13 * g23) + g13 * (
        g12 * g23 - g13 * g22
    )
    return (
        (g22 * g33 - g23 * g23) / det,
        (g13 * g23 - g12 * g33) / det,
        (g12 * g23 - g13 * g22) / det,
        (g11 * g33 - g13 * g13) / det,
        (g12 * g13 - g11 * g23) / det,
        (g11 * g22 - g12 * g12) / det,
    )


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
    solver: str = "pinv",
) -> DataFrame:
    """Append dissolved_nitrate / fit_coef_0..2 / nutnr_rmse columns.

    Calibration vectors (wl/eno3/eswa/di, one value per spectral channel) and
    scalars arrive as plain Python lists — config data, exactly the shape the
    reference pulls from its calibration CSVs (utils.py:105-285). Dark frames
    get NaN in every output, matching the reference (:418-420)."""
    d = design_arrays(wl=wl, eno3=eno3, eswa=eswa, di=di, wllower=wllower, wlupper=wlupper)
    WL, ENO3, ESWA, DI, f_prime, M = (
        d["WL"], d["ENO3"], d["ESWA"], d["DI"], d["f_prime"], d["M"],
    )
    use_idx = d["use_idx"]
    if solver == "pinv":
        pinv_M = np.linalg.pinv(M)
    elif solver == "normal":
        i11, i12, i13, i22, i23, i33 = gram_inverse(M)
    else:  # pragma: no cover - config error
        raise ValueError(f"unknown solver {solver!r}")

    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        + ", dissolved_nitrate double, fit_coef_0 double, fit_coef_1 double,"
        + " fit_coef_2 double, nutnr_rmse double"
    )

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
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

            if solver == "pinv":
                C = acomp @ pinv_M.T  # (n, 3): row-wise solve, one matmul
                c1, c2, c3 = C[:, 0], C[:, 1], C[:, 2]
            else:
                # SQL-replayable tree: b_i = sum_j M_ji * acomp_j, C = invG @ b
                b1 = (acomp * M[:, 0][None, :]).sum(axis=1)
                b2 = (acomp * M[:, 1][None, :]).sum(axis=1)
                b3 = (acomp * M[:, 2][None, :]).sum(axis=1)
                c1 = i11 * b1 + i12 * b2 + i13 * b3
                c2 = i12 * b1 + i22 * b2 + i23 * b3
                c3 = i13 * b1 + i23 * b2 + i33 * b3
            afit = (
                c1[:, None] * M[:, 0][None, :]
                + c2[:, None] * M[:, 1][None, :]
                + c3[:, None] * M[:, 2][None, :]
            )
            resid = acomp - afit
            rmse = np.sqrt(np.nanmean(resid**2, axis=1))

            is_dark = pdf[frame_col].isin(DARK_FRAMES).to_numpy()
            out = pdf.copy()
            out["dissolved_nitrate"] = np.where(is_dark, np.nan, c1)
            out["fit_coef_0"] = np.where(is_dark, np.nan, c1)
            out["fit_coef_1"] = np.where(is_dark, np.nan, c2)
            out["fit_coef_2"] = np.where(is_dark, np.nan, c3)
            out["nutnr_rmse"] = np.where(is_dark, np.nan, rmse)
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
