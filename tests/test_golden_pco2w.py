"""Golden-number test on the PCO2W fixture shape (FIXTURES.md §1-4; reference
toy data: tests/toy_data/PCO2WA101_*.nc): an 8-row hand-computed truth table
through the full QC chain — gross range, climatology (incl. the NaN-bracket
flag-9 path), bitmask decode, positional-string decode, and the rollup."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from rca_data_tools_spark.functions.qc import (
    decode_positional_flags,
    qc_test_flags,
    rollup_flags,
)
from rca_data_tools_spark.operators.flagging import climatology_flags, gross_range_flags


def _t(day: int, month: int = 6) -> dt.datetime:
    return dt.datetime(2024, month, day, 12, 0, 0)


def test_pco2w_golden_chain(spark):
    # samples: (refDes, time, pco2, pressure)
    samples = spark.createDataFrame(
        [
            # in-range, depth 20 -> bracket [15,25) clim [300,500]
            ("PCO2WA101", _t(1), 400.0, 20.0),
            # suspect by gross range (sus span [200,1000])
            ("PCO2WA101", _t(2), 1100.0, 20.0),
            # fail by gross range (fail span [0,2000])
            ("PCO2WA101", _t(3), 2100.0, 20.0),
            # NULL value -> flag 9 on both tests
            ("PCO2WA101", _t(4), None, 20.0),
            # clim suspect: outside [300,500] but inside gross spans
            ("PCO2WA101", _t(5), 600.0, 20.0),
            # NaN clim bracket (depth 95 -> no bracket row) -> clim flag 9
            ("PCO2WA101", _t(6), 400.0, 95.0),
            # different month (july bracket [350,450]) -> suspect at 500
            ("PCO2WA101", _t(1, month=7), 500.0, 20.0),
            # in-range july
            ("PCO2WA101", _t(2, month=7), 400.0, 20.0),
        ],
        "refDes string, time timestamp, pco2 double, press double",
    )
    gr = spark.createDataFrame(
        [("PCO2WA101", 0.0, 2000.0, 200.0, 1000.0)],
        "refDes string, fail_lo double, fail_hi double, sus_lo double, sus_hi double",
    )
    clim = spark.createDataFrame(
        [
            ("PCO2WA101", 6, 15.0, 25.0, 300.0, 500.0),
            ("PCO2WA101", 7, 15.0, 25.0, 350.0, 450.0),
        ],
        "refDes string, month int, depth_lo double, depth_hi double, clim_lo double, clim_hi double",
    )

    flagged = gross_range_flags(samples, gr, value_col="pco2", join_keys=["refDes"])
    flagged = climatology_flags(
        flagged, clim, value_col="pco2", time_col="time", depth_col="press", extra_keys=["refDes"]
    )
    rows = {r.time: r for r in flagged.collect()}

    expect = {
        _t(1): (1, 1),
        _t(2): (3, 3),  # 1100 also outside june clim span
        _t(3): (4, 3),
        _t(4): (9, 9),
        _t(5): (1, 3),
        _t(6): (1, 9),  # no depth bracket -> clim flag 9
        _t(1, month=7): (1, 3),
        _t(2, month=7): (1, 1),
    }
    for t, (g, c) in expect.items():
        assert rows[t].gross_range_flag == g, (t, rows[t])
        assert rows[t].climatology_flag == c, (t, rows[t])

    # companion-variable decode: bitmask (bit0=gross_range, bit1=climatology)
    # + positional string "13" in tests_executed order, + rollup
    qc = spark.createDataFrame(
        [(3, 1, "13"), (3, 3, "11"), (1, 0, "41")],
        "qc_executed int, qc_results int, qartod_executed string",
    )
    decoded = qc.select(
        qc_test_flags("qc_executed", "qc_results", 0).alias("bit_gross"),
        qc_test_flags("qc_executed", "qc_results", 1).alias("bit_clim"),
        *[c.alias(n) for n, c in decode_positional_flags("qartod_executed", 2, prefix="pos")],
    ).withColumn("rollup", rollup_flags(F.col("pos1"), F.col("pos2")))
    got = [tuple(r) for r in decoded.collect()]
    # executed+pass->1, executed+fail->4(OOI bitmask convention), not-executed->2
    assert got[0] == (1, 4, 1, 3, 3)
    assert got[1] == (1, 1, 1, 1, 1)
    assert got[2] == (4, 2, 4, 1, 4)
