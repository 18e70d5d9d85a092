"""Chunked distributed EWMA (operators/scan.py): must agree with the serial
kernel to fp-reassociation tolerance, chunk across tasks, and handle the
hot-key shape the serial form cannot."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from rca_data_tools_spark.operators.scan import chunked_ewma
from rca_data_tools_spark.sources.readers import load_table
from tests.conftest import SF_CORRECTNESS


def _serial_ewma(xs, alpha=0.25):
    acc, out = 0.0, []
    for x in xs:
        acc = alpha * x + (1 - alpha) * acc
        out.append(acc)
    return out


def test_matches_serial_on_events(spark):
    e = load_table(spark, SF_CORRECTNESS, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    got = chunked_ewma(
        e, "user_id", "ts", ["ts", "event_id"], "value", chunk_seconds=6 * 3600
    ).toPandas()
    for uid, grp in got.groupby("user_id"):
        grp = grp.sort_values(["ts", "event_id"])
        want = _serial_ewma(grp["value"].tolist())
        assert np.allclose(grp["ewma"].to_numpy(), want, rtol=1e-11, atol=1e-12), uid


def test_single_hot_key_parallel_chunks(spark):
    """One key, many chunks: the serial kernel would run this as one task;
    the chunked scan spreads pass 1 across the cluster and only the chunk
    chain (not the rows) touches the driver."""
    n = 50_000
    df = (
        spark.range(n)
        .select(
            F.lit(7).alias("k"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60).alias("ts"),
            F.col("id").alias("event_id"),
            (F.pmod(F.xxhash64("id"), F.lit(1000)) / 100.0).alias("value"),
        )
    )
    out = chunked_ewma(df, "k", "ts", ["ts", "event_id"], "value").toPandas()
    out = out.sort_values("event_id")
    assert len(out) == n
    xs = out["value"].tolist()
    want = _serial_ewma(xs)
    assert np.allclose(out["ewma"].to_numpy(), want, rtol=1e-10, atol=1e-12)
    # the day-bucket chunking actually split the series
    n_chunks = df.select(
        F.count_distinct(F.floor(F.unix_timestamp("ts") / 86400))
    ).collect()[0][0]
    assert n_chunks > 30


def test_decay_weights_forgotten_history():
    """Sanity on the recurrence itself: far-past values decay geometrically."""
    xs = [100.0] + [0.0] * 60
    out = _serial_ewma(xs)
    assert out[-1] < 1e-5
