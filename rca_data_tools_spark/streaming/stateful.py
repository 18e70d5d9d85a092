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


# --- transformWithState EWMA (Spark 4 arbitrary-state API) ------------------

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("ewma", DoubleType()),
    ]
)


class EwmaProcessor:
    """Per-key streaming EWMA via the transformWithState arbitrary-state API
    (Spark 4): y_i = α·x_i + (1-α)·y_{i-1}, the exact recurrence of the batch
    operator (queries/frameq.py `_ewma_group`), with the accumulator carried
    across micro-batches in a ValueState.

    State per key is ONE double — constant regardless of stream length — and
    lives in the state store (RocksDB in production), so a million instrument
    keys cost ~8 MB of state. Requires per-key event-time-ordered arrival
    (true for replayed sensor archives; out-of-order sources need a watermark
    sort upstream, e.g. a windowed sort-within-watermark stage)."""

    def __init__(self, alpha: float = 0.25):
        self.alpha = float(alpha)

    def init(self, handle) -> None:
        self._acc = handle.getValueState("ewma_acc", "acc double")

    def handleInputRows(self, key, rows, timerValues):
        alpha = self.alpha
        prev = self._acc.get() if self._acc.exists() else None
        acc = prev[0] if prev is not None else None
        for pdf in rows:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
            x = pdf["value"].to_numpy(dtype="float64")
            y = x.copy()
            for i in range(len(x)):
                acc = x[i] if acc is None else alpha * x[i] + (1.0 - alpha) * acc
                y[i] = acc
            yield pd.DataFrame(
                {
                    "user_id": pdf["user_id"],
                    "ts": pdf["ts"],
                    "value": pdf["value"],
                    "ewma": y,
                }
            )
        if acc is not None:
            self._acc.update((float(acc),))

    def close(self) -> None:
        pass


def streaming_ewma(events: DataFrame, alpha: float = 0.25, key_col: str = "user_id") -> DataFrame:
    """Streaming face of w_ewma: identical arithmetic, incremental execution.
    Each micro-batch emits only its own rows; the accumulator survives in the
    state store. Output mode `append` (each input row produces exactly one
    output row, never revised)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # Subclass dynamically so the module imports even if the API moves.
    proc = EwmaProcessor(alpha)
    if not isinstance(proc, StatefulProcessor):
        EwmaProcessor.__bases__ = (StatefulProcessor,)
    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


# --- streaming spike test (QARTOD test 6, one-sample emission latency) ------

SPIKE_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("spike_flag", IntegerType()),
    ]
)

# (prev_prev_value, prev_ts_epoch_us, prev_value); prev_prev NaN = absent
SPIKE_STATE_SCHEMA = StructType(
    [
        StructField("pp_value", DoubleType()),
        StructField("p_ts_us", LongType()),
        StructField("p_value", DoubleType()),
    ]
)


def _spike_kernel_factory(fail: float, suspect: float):
    import math

    def kernel(key, pdf_iter, state: GroupState):
        if state.exists:
            pp_v, p_ts_us, p_v = state.get
        else:
            pp_v, p_ts_us, p_v = math.nan, None, None
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("ts").reset_index(drop=True)
            out_rows = []
            for _, row in pdf.iterrows():
                v, ts = float(row["value"]), row["ts"]
                if p_v is not None:
                    # the arrival of v completes the neighborhood of the
                    # PREVIOUS point: flag it now (one-sample latency, the
                    # streaming form of the centered spike test)
                    if math.isnan(pp_v):
                        flag = 2  # series start: not evaluable
                    else:
                        mag = round(abs(p_v - (pp_v + v) / 2), 6)
                        flag = 4 if mag > fail else (3 if mag > suspect else 1)
                    out_rows.append(
                        (row["user_id"], pd.Timestamp(p_ts_us, unit="us"), p_v, flag)
                    )
                pp_v = p_v if p_v is not None else math.nan
                p_ts_us = int(ts.value // 1000)
                p_v = v
            if out_rows:
                yield pd.DataFrame(
                    out_rows, columns=["user_id", "ts", "value", "spike_flag"]
                )
        if p_v is not None:
            state.update((pp_v, p_ts_us, p_v))

    return kernel


def streaming_spike_flags(
    events: DataFrame, fail: float = 200.0, suspect: float = 120.0,
    key_col: str = "user_id",
) -> DataFrame:
    """Incremental QARTOD spike test: each point is flagged as soon as its
    successor arrives (neighbor-midpoint deviation over fail/suspect
    thresholds, matching the batch qc_spike_test row-for-row except each
    key's final point, whose neighborhood is still open). State per key is
    two samples — constant regardless of stream length — carried across
    micro-batches in GroupState."""
    return events.groupBy(key_col).applyInPandasWithState(
        _spike_kernel_factory(fail, suspect),
        outputStructType=SPIKE_OUTPUT_SCHEMA,
        stateStructType=SPIKE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
