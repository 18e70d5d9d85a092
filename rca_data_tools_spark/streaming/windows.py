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
