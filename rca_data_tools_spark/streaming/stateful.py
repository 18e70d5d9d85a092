"""Custom stateful streaming operators (applyInPandasWithState).

The reference's step tests (abs(x.diff('time')) > threshold — advanced_qaqc/
calculateFunctions.py:861-870) are batch window functions in the engine
(W1, queries/windowq.py). Re-run-on-a-schedule batch recomputes the whole
span each time; the streaming form below carries the last observation per
instrument key in GroupState, so each micro-batch flags only its new rows —
constant state per key (one timestamp + one double), unbounded input.

This is the `applyInPandasWithState` pattern: state is an Arrow-typed tuple,
the kernel sees each micro-batch's rows for one key, and emission is
incremental (update mode). A GroupStateTimeout would expire idle instruments
in production; the local harness keeps it off for determinism.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

STEP_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("step_flag", IntegerType()),
    ]
)

# (last_ts_epoch_us, last_value) per key
STEP_STATE_SCHEMA = StructType(
    [StructField("last_ts_us", LongType()), StructField("last_value", DoubleType())]
)


def _step_kernel_factory(threshold: float):
    def kernel(
        key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            last_ts_us, last_value = state.get
        else:
            last_ts_us, last_value = None, None
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("ts").reset_index(drop=True)
            prev = pdf["value"].shift(1)
            if last_value is not None:
                prev.iloc[0] = last_value
            diff = (pdf["value"] - prev).abs()
            flags = diff.gt(threshold).map({True: 3, False: 1})
            flags[prev.isna()] = 1  # first-ever row per key passes
            out = pd.DataFrame(
                {
                    "user_id": pdf["user_id"],
                    "ts": pdf["ts"],
                    "value": pdf["value"],
                    "step_flag": flags.astype("int32"),
                }
            )
            last_ts_us = int(pdf["ts"].iloc[-1].value // 1000)
            last_value = float(pdf["value"].iloc[-1])
            yield out
        if last_value is not None:
            state.update((last_ts_us, last_value))

    return kernel


def streaming_step_flags(
    events: DataFrame, threshold: float = 350.0, key_col: str = "user_id"
) -> DataFrame:
    """Incremental per-key step flags: 3 when |value - previous value| exceeds
    the threshold, 1 otherwise; the previous value survives micro-batch
    boundaries in GroupState. Matches the batch lag-window formulation
    (w1_lag_step_flags) row-for-row when replayed over the same data."""
    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            _step_kernel_factory(threshold),
            outputStructType=STEP_OUTPUT_SCHEMA,
            stateStructType=STEP_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
