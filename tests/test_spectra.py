"""Truth test for the vectorized nitrate spectral fit: the mapInPandas kernel
(one pinv + batch matmul) must reproduce a straight per-row transcription of
the reference loop (calculateFunctions.py:425-460) to float precision."""

from __future__ import annotations

import numpy as np
import pandas as pd

from rca_data_tools_spark.queries import QUERIES
from rca_data_tools_spark.queries.instrq import NUTNR_CAL
from rca_data_tools_spark.operators.spectra import nitrate_reference_rowloop
from tests.conftest import SF_SMOKE


def test_nitrate_matches_rowloop_reference(spark):
    import duckdb

    out = (
        QUERIES["calc_nutnr_nitrate"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    e = duckdb.sql(f"select * from '{SF_SMOKE}/events.parquet' order by event_id").df()
    pdf = pd.DataFrame(
        {
            "event_id": e.event_id,
            "spectral_channels": [
                [float(20000 + (i * (j + 3)) % 30000) for j in range(40)] for i in e.event_id
            ],
            "dark_value": (e.event_id % 1000).astype(float),
            "ctd_t": e.value / 20.0,
            "ctd_sp": 30.0 + e.value / 100.0,
            "frame_type": np.where(e.event_type == "error", "SDB", "SLB"),
        }
    )
    truth = nitrate_reference_rowloop(
        pdf, "spectral_channels", "dark_value", "ctd_t", "ctd_sp", "frame_type", **NUTNR_CAL
    )
    m = out.merge(
        truth[["event_id", "dissolved_nitrate", "nutnr_rmse"]], on="event_id", suffixes=("", "_t")
    )
    assert len(m) == len(e)
    # dark frames -> NULL/NaN on both sides
    assert (m.dissolved_nitrate.isna() == m.dissolved_nitrate_t.isna()).all()
    # query output is rounded to 4/6 decimals for the oracle replay — compare
    # the rowloop truth at that precision
    assert np.allclose(
        m.dissolved_nitrate, m.dissolved_nitrate_t.round(4), atol=1e-9, equal_nan=True
    )
    assert np.allclose(m.nutnr_rmse, m.nutnr_rmse_t.round(6), atol=1e-9, equal_nan=True)
    # fit coefficients: scalar columns, coef_0 == nitrate on lit frames
    lit = m[~m.dissolved_nitrate.isna()]
    assert (lit.fit_coef_0 == lit.dissolved_nitrate).all()
    assert out.fit_coef_1.notna().sum() == lit.shape[0]
    assert out.fit_coef_2.notna().sum() == lit.shape[0]
