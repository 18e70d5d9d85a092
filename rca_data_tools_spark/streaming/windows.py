"""Structured Streaming forms of the engine's windowed operators.

The reference is batch re-run on a schedule (SURVEY §2.9) — its tumbling
spans, sub-period grouping and incremental refresh map here onto real
Structured Streaming: watermarks bound state, windowed aggregation replaces
the span filter, and session windows cover the gap-based grouping. The same
transformations run identically on a batch DataFrame (Spark's unified API),
which is how the tests drive them deterministically with a parquet source
and a memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window count/sum per key with a watermark for late data.

    On a stream: append-mode emission once the watermark passes the window
    end. On a batch frame: identical result, no state. Window struct is
    flattened to start/end columns for a stable sink schema.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window_duration).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col(value_col), 6).cast("decimal(28,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), key_col, "n", "sum_value")
    )


def sessionized_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows per key (session_window handles the merge
    logic that the batch lag+cumsum formulation implements by hand)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def run_stream_to_memory(
    spark,
    source_dir: str,
    schema,
    transform,
    query_name: str = "stream_out",
    max_files_per_trigger: int = 1,
    output_mode: str = "complete",
) -> DataFrame:
    """Drive a file-source stream through ``transform`` into a memory sink,
    synchronously (processAllAvailable) — the deterministic local harness for
    streaming operators; swap source/sink for Kafka + Delta in production.

    Default output mode is ``complete`` because with a finite source the
    watermark never passes the last windows, so append would emit nothing.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    out = transform(stream)
    q = (
        out.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup on ``key_cols``: keep the first arrival of each
    key, with state bounded by the watermark (dropDuplicatesWithinWatermark —
    a duplicate arriving later than the watermark delay is admitted again,
    the documented trade of bounded state for at-most-once-per-window
    semantics). The batch path uses plain dropDuplicates so the same
    callable serves both sides of the unified API.

    This is the streaming face of the exact-dedup operator
    (operators/dedup.py): at ingest time the key would be the same
    md5(normalized text) fingerprint, so records dedupe before ever landing
    in the corpus — state carries only fingerprints, never documents."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
    return events.dropDuplicates(key_cols)


def streaming_hll_registers(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    id_col: str = "user_id",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed distinct-cardinality sketch build as ONE streaming
    aggregation: per (window, key, register) MAX of the HLL rank.

    HLL's merge operator IS max, so the watermarked streaming agg maintains
    the exact sketch incrementally — bounded state of 64 registers per
    (window, key), evicted by the watermark; batch and stream produce the
    identical register table (tested), and operators.sketch.hll_estimate
    turns either into cardinality estimates downstream.
    """
    from rca_data_tools_spark.operators.sketch import hll_hash_cols

    idx, rho = hll_hash_cols(id_col)
    # NULL ids are not countable keys (matches the batch build and
    # COUNT(DISTINCT) semantics — operators/sketch.hll_register_rows).
    events = events.filter(F.col(id_col).isNotNull())
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(
            F.window(ts_col, window_duration).alias("w"),
            F.col(key_col),
            idx.alias("idx"),
        )
        .agg(F.max(rho).alias("r"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            "idx",
            "r",
        )
    )


def streaming_cms_cells(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed Count-Min sketch build as ONE streaming aggregation: per
    (window, hash-row, bucket) SUM of occurrences.

    CMS's merge operator IS cell-wise addition, so the watermarked streaming
    sum maintains the exact sketch incrementally — bounded d*w cells per
    window, evicted by the watermark; batch and stream produce the identical
    cell table (tested) and operators.sketch.cms_estimate serves point
    queries downstream.
    """
    from rca_data_tools_spark.operators.sketch import CMS_DEPTH, CMS_WIDTH, cms_bucket

    # NULL keys would form a phantom cell (md5(NULL) is NULL) — drop them,
    # matching the batch build (operators/sketch.cms_build).
    events = events.filter(F.col(key_col).isNotNull())
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    cms_bucket(F.col(key_col), i, CMS_WIDTH).alias("bucket"),
                )
                for i in range(CMS_DEPTH)
            ]
        )
    ).alias("cell")
    return (
        src.select(F.col(ts_col), cells)
        .groupBy(F.window(ts_col, window_duration).alias("w"), "cell.i", "cell.bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("w.start").alias("window_start"), "i", "bucket", "c")
    )


def windowed_lttb(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    window_duration: str = "1 day",
    threshold: int = 12,
    watermark: str = "2 hours",
    max_stride_factor: int = 10,
) -> DataFrame:
    """Per-(key, tumbling window) LTTB decimation, emitted on window close —
    the streaming form of operators/decimate.py:lttb (reference:
    qaqc/decimate.py:94-163 run on a schedule per span). ``df`` may be a
    STREAM (watermarked windowed collect_list, append mode: each window
    decimates exactly once, when it closes) or a batch frame (identical
    plan minus the watermark — the unified-API contract the batch face and
    the stream≡batch test share).

    Same kernel semantics as the batch operator: 10x pre-stride cap, then
    the sequential bucket-argmax recurrence (_lttb_indices) over epoch-ns
    float64 — so the recursive-CTE oracle machinery replays this too, per
    composite (key, window) series.

    Scale shape: state per open window is the window's points for its keys
    (bounded by watermark x arrival rate); the decimation itself is a
    per-row Arrow kernel on the closed window's array — no second shuffle
    after the windowed aggregation."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    from rca_data_tools_spark.operators.decimate import _lttb_indices

    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    pts = F.sort_array(
        F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col(val_col).alias("v")))
    )
    agg = src.groupBy(
        F.window(ts_col, window_duration).alias("__w"), F.col(key_col)
    ).agg(pts.alias("__pts"))
    cap = threshold * max_stride_factor

    def _keep(ts_ns, vals):  # (pd.Series, pd.Series) -> pd.Series
        out = []
        for xs, ys in zip(ts_ns, vals):
            x = np.asarray(xs, dtype=np.float64)
            y = np.asarray(ys, dtype=np.float64)
            n = len(x)
            idx = np.arange(n)
            stride = max(1, n // cap)
            m = (idx % stride == 0) | (idx == n - 1)
            sidx = idx[m]
            out.append(sidx[_lttb_indices(x[m], y[m], threshold)].tolist())
        return pd.Series(out)

    keep_udf = F.pandas_udf(_keep, ArrayType(LongType()))
    # cast: NTZ-typed sources (e.g. plain pyarrow writes) resolve too; a
    # wall-clock no-op under the engine's UTC session
    ts_ns = F.transform("__pts", lambda p: F.unix_micros(p["t"].cast("timestamp")) * 1000)
    val_arr = F.transform("__pts", lambda p: p["v"].cast("double"))
    picked = agg.select(
        F.col(key_col),
        F.col("__w").start.alias("window_start"),
        "__pts",
        F.explode(keep_udf(ts_ns, val_arr)).alias("__i"),
    )
    pt = F.element_at("__pts", (F.col("__i") + 1).cast("int"))
    return picked.select(
        key_col,
        "window_start",
        pt["t"].alias(ts_col),
        pt["v"].alias(val_col),
    )


def stream_qaqc_rollup(
    df: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    window_duration: str = "1 day",
    watermark: str = "2 hours",
) -> DataFrame:
    """The reference's QA/QC main path as a CONTINUOUSLY-RUNNING job
    (SURVEY §3.1 run on a stream instead of a re-run schedule): arriving
    samples pick up gross-range flags through the stateless broadcast dim
    join (operators/flagging.py — the dim is config-sized, so the stream
    side never shuffles for flagging), then a watermarked tumbling window
    per key rolls up the flag histogram and value extremes, emitted once
    per closed window in append mode. ``df`` may be a stream or a batch
    frame (unified API; the batch face is the hash-checked oracle query).

    Scale shape: flagging adds ZERO streaming state (projection +
    broadcast join); the rollup state per open (key, window) is one count
    vector + two extremes — KBs per key, bounded by the watermark."""
    from rca_data_tools_spark.operators.flagging import gross_range_flags

    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    flagged = gross_range_flags(src, dim, val_col, [key_col])
    fl = F.col("gross_range_flag")
    return (
        flagged.groupBy(F.window(ts_col, window_duration).alias("__w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(fl == 1, 1).otherwise(0)).alias("n_pass"),
            F.sum(F.when(fl == 3, 1).otherwise(0)).alias("n_suspect"),
            F.sum(F.when(fl == 4, 1).otherwise(0)).alias("n_fail"),
            F.sum(F.when(fl == 9, 1).otherwise(0)).alias("n_missing"),
            F.min(val_col).alias("min_value"),
            F.max(val_col).alias("max_value"),
        )
        .select(
            key_col,
            F.col("__w").start.alias("window_start"),
            "n", "n_pass", "n_suspect", "n_fail", "n_missing",
            "min_value", "max_value",
        )
    )
