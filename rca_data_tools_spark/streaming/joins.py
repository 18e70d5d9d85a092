"""Stream-stream joins and incremental streaming sinks.

Completes the §2.9 streaming story: the reference correlates two instrument
streams by re-running a batch interval join on a schedule
(reference: qaqc/dashboard.py overlay plots join CTD casts onto discrete
samples per span); Structured Streaming expresses the same semantics online —
both sides watermarked, an equality key co-partitions the state stores, and
the time-range predicate bounds how long either side's rows are retained.
The sink half maps the reference's regenerate-one-window refresh
(ST-4) onto ``foreachBatch`` + dynamic partition overwrite: each micro-batch
rewrites exactly the partitions it carries, so replays are idempotent.

Every transform here keeps the unified-API contract: called on a batch
DataFrame it produces the identical result with no state, which is how the
tests prove stream ≡ batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    right_key: str = "r_user_id",
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Join each left event to right-stream events of the same key within the
    preceding ``lookback`` interval (the streaming face of the as-of /
    interval-overlap family, operators/interval_join.py).

    Streaming requirements baked in: BOTH sides carry watermarks (state on
    either side can be evicted once the other side's watermark passes the
    range bound) and the join condition pairs an equality key with a closed
    time range — exactly the pattern Structured Streaming's state-cleanup
    planner recognizes. Scale shape: state is hash-partitioned by the join
    key across executors; per-key state holds only ``lookback + watermark``
    worth of rows, independent of stream length.

    Inner join in append mode: a result row emits as soon as both inputs
    exist; state for a row is dropped once the opposing watermark passes
    ``its timestamp + lookback``.
    """
    l_ts, r_ts = F.col(left_ts), F.col(right_ts)
    if left.isStreaming or right.isStreaming:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(key_col) == F.col(right_key))
        & (r_ts >= l_ts - F.expr(f"INTERVAL {lookback}"))
        & (r_ts <= l_ts)
    )
    return left.join(right, cond, "inner")


def stream_to_partitioned_sink(
    stream: DataFrame,
    path: str,
    partition_cols: list[str],
    checkpoint_dir: str,
    fmt: str = "parquet",
):
    """Incremental refresh sink: every micro-batch overwrites exactly the
    partitions it contains (dynamic partition overwrite via foreachBatch) —
    the streaming form of the reference's span-job rewrite
    (sources/sinks.write_partitioned). Micro-batch replays after failure
    rewrite the same partitions with the same rows, so the sink is
    idempotent as long as batches align with partition boundaries (the
    span-per-batch contract the reference's scheduler already enforces).

    Returns the started StreamingQuery (availableNow trigger — drains the
    source then stops, the scheduled-refresh execution mode).
    """
    from rca_data_tools_spark.sources.sinks import write_partitioned

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        write_partitioned(batch_df, path, partition_cols, fmt=fmt)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_neardup_matches(
    incoming: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Streaming face of incremental ingestion dedup
    (operators/dedup.py:incremental_neardup): ``incoming`` may be a STREAM,
    ``corpus`` is the static standing index; every arriving document is
    shingled, signed, and banded in stateless per-row projections (Arrow
    kernels work unchanged on streams), band rows join the corpus's band
    table (a stream-static equi-join — no watermark, no state store), and
    each collision verifies with exact Jaccard on 60-bit shingle hashes
    in-row. Emits (band_id, new_id, old_id, jaccard) match rows in append
    mode; a pair colliding in several bands appears once per band
    (deterministic multiplicity — stream and batch agree exactly; the
    micro-batch sink or a downstream batch step takes the keep/drop
    decision, which needs aggregation the stateless path deliberately
    avoids).

    Scale shape: per micro-batch cost is O(batch) projections plus the
    band-key equi-join against the (persisted, bucketable) corpus band
    table; the corpus is never shuffled per batch and no streaming state
    accumulates."""
    from rca_data_tools_spark.operators.dedup import (
        lsh_banded,
        minhash_signatures,
        shingle_arrays,
        shingle_hashes,
    )

    ex_hash = shingle_hashes(shingle_arrays(corpus, id_col, text_col), id_col)
    ex_bands = lsh_banded(
        minhash_signatures(ex_hash, id_col, keep_cols=("h60",)),
        id_col,
        keep_cols=("h60",),
    ).select(
        F.col(id_col).alias("old_id"),
        F.col("h60").alias("h_old"),
        "band_id",
        "band_sig",
    )
    in_hash = shingle_hashes(shingle_arrays(incoming, id_col, text_col), id_col)
    in_bands = lsh_banded(
        minhash_signatures(in_hash, id_col, keep_cols=("h60",)),
        id_col,
        keep_cols=("h60",),
    ).select(
        F.col(id_col).alias("new_id"),
        F.col("h60").alias("h_new"),
        "band_id",
        "band_sig",
    )
    joined = in_bands.join(ex_bands, ["band_id", "band_sig"]).filter(
        F.col("new_id") != F.col("old_id")
    )
    n_inter = F.size(F.array_intersect(F.col("h_new"), F.col("h_old")))
    jac = F.round(n_inter / (F.size("h_new") + F.size("h_old") - n_inter), 6)
    return (
        joined.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("band_id", "new_id", "old_id", "jaccard")
    )
