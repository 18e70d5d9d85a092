"""Structured Streaming checks: the streaming transformations must produce
the same results as their batch formulation when driven from a file source
to a memory sink (unified-API contract)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from rca_data_tools_spark.sources.readers import load_table
from rca_data_tools_spark.streaming.windows import (
    run_stream_to_memory,
    sessionized_counts,
    streaming_tumbling_agg,
)
from tests.conftest import SF_SMOKE

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _events_dir(spark, tmp_path):
    """Stage the smoke events as a streaming-readable directory (the source
    fixture is a single file with nanos timestamps; rewrite via load_table)."""
    out = str(tmp_path / "events_stream")
    load_table(spark, SF_SMOKE, "events").write.mode("overwrite").parquet(out)
    return out

def test_streaming_tumbling_matches_batch(spark, tmp_path):
    src = _events_dir(spark, tmp_path)
    batch_df = spark.read.schema(EVENTS_SCHEMA).parquet(src)
    expect = {
        tuple(r)
        for r in streaming_tumbling_agg(batch_df, window_duration="1 hour").collect()
    }
    got_df = run_stream_to_memory(
        spark,
        src,
        EVENTS_SCHEMA,
        lambda s: streaming_tumbling_agg(s, window_duration="1 hour"),
        query_name="t_tumbling",
    )
    got = {tuple(r) for r in got_df.collect()}
    assert got == expect
    assert len(got) > 0


def test_streaming_sessionization_runs(spark, tmp_path):
    src = _events_dir(spark, tmp_path)
    out = run_stream_to_memory(
        spark,
        src,
        EVENTS_SCHEMA,
        lambda s: sessionized_counts(s, gap="30 minutes"),
        query_name="t_sessions",
    )
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.session_start <= r.session_end
        assert r.n_events >= 1
    # sessions within a key must not overlap
    by_key = {}
    for r in rows:
        by_key.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for spans in by_key.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 <= s2


def test_streaming_stateful_step_flags(spark, tmp_path):
    """The applyInPandasWithState step test must equal the batch lag-window
    formulation even when the data arrives split across micro-batches — i.e.
    the previous value genuinely survives in GroupState."""
    import time

    from pyspark.sql.window import Window

    from rca_data_tools_spark.streaming.stateful import streaming_step_flags

    e = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .orderBy("ts")
    )
    pdf = e.toPandas()
    src = tmp_path / "step_src"
    src.mkdir()
    third = len(pdf) // 3
    for i, chunk in enumerate([pdf[:third], pdf[third : 2 * third], pdf[2 * third :]]):
        chunk.to_parquet(
            str(src / f"part-{i}.parquet"),
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        time.sleep(0.05)  # distinct mtimes -> deterministic batch order

    got_df = run_stream_to_memory(
        spark,
        str(src),
        EVENTS_SCHEMA,
        lambda s: streaming_step_flags(s, threshold=100.0),
        query_name="t_step_flags",
        output_mode="update",
    )
    got = {(r.user_id, r.ts, r.step_flag) for r in got_df.collect()}

    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("value").over(w)
    batch = e.withColumn(
        "step_flag",
        F.when(prev.isNull(), 1).when(F.abs(F.col("value") - prev) > 100.0, 3).otherwise(1),
    )
    expect = {(r.user_id, r.ts, r.step_flag) for r in batch.collect()}
    assert got == expect
    assert any(f == 3 for _, _, f in got)  # the threshold actually fires


def test_session_window_equals_batch_sessionization(spark, tmp_path):
    """session_window's merge semantics must agree with the batch lag+cumsum
    formulation (sessionize_events): same number of sessions per user and the
    same event-count multiset, for the same 30-minute gap."""
    from rca_data_tools_spark.queries import QUERIES
    from tests.conftest import SF_SMOKE

    batch = (
        QUERIES["sessionize_events"](spark, SF_SMOKE)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sort_array(F.collect_list("n_events")).alias("sizes"))
    )
    e = load_table(spark, SF_SMOKE, "events")
    sw = (
        sessionized_counts(e, gap="30 minutes")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sort_array(F.collect_list("n_events")).alias("sizes"))
    )
    b = {r.user_id: (r.n_sessions, list(r.sizes)) for r in batch.collect()}
    s = {r.user_id: (r.n_sessions, list(r.sizes)) for r in sw.collect()}
    assert b == s


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Streamed first-arrival dedup covers the batch dropDuplicates key set;
    duplicates within the watermark never reach the sink twice."""
    from rca_data_tools_spark.streaming.windows import streaming_dedup

    src = _events_dir(spark, tmp_path)
    batch_df = spark.read.schema(EVENTS_SCHEMA).parquet(src)
    expect_keys = {
        r["user_id"] for r in streaming_dedup(batch_df, ["user_id"]).collect()
    }
    got_df = run_stream_to_memory(
        spark,
        src,
        EVENTS_SCHEMA,
        lambda s: streaming_dedup(s, ["user_id"]),
        query_name="t_dedup",
        output_mode="append",  # dedup emits rows immediately; no window wait
    )
    rows = got_df.collect()
    got_keys = [r["user_id"] for r in rows]
    assert set(got_keys) == expect_keys
    assert len(got_keys) == len(set(got_keys))  # no key emitted twice


def test_streaming_gross_range_flag_counts_match_batch(spark, tmp_path):
    """QC flagging composes with Structured Streaming: the gross-range
    broadcast dim joins a stream (stream-static join) and the per-flag
    tumbling counts equal the batch run — the incremental face of the
    reference's re-run-the-window pipeline."""
    from pyspark.sql import functions as F

    from rca_data_tools_spark.operators.flagging import gross_range_flags

    src = _events_dir(spark, tmp_path)
    dim = spark.createDataFrame(
        [("click", 0.0, 500.0, 50.0, 450.0), ("error", 0.0, 500.0, 100.0, 400.0)],
        "event_type string, fail_lo double, fail_hi double, sus_lo double, sus_hi double",
    )

    def flag_counts(df):
        flagged = gross_range_flags(df, dim, value_col="value", join_keys=["event_type"])
        srcd = flagged.withWatermark("ts", "2 hours") if flagged.isStreaming else flagged
        return (
            srcd.groupBy(F.window("ts", "6 hours").alias("w"), "gross_range_flag")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "gross_range_flag", "n")
        )

    batch_df = spark.read.schema(EVENTS_SCHEMA).parquet(src)
    expect = {tuple(r) for r in flag_counts(batch_df).collect()}
    got_df = run_stream_to_memory(
        spark, src, EVENTS_SCHEMA, flag_counts, query_name="t_qc_flags"
    )
    got = {tuple(r) for r in got_df.collect()}
    assert got == expect and len(got) > 0


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream watermarked interval join must emit exactly the batch
    join's row set: 'error' events joined to same-user 'click' events within
    the preceding hour, both sides fed as independent file streams."""
    from rca_data_tools_spark.streaming.joins import stream_interval_join

    ldir = str(tmp_path / "left")
    rdir = str(tmp_path / "right")
    ev = load_table(spark, SF_SMOKE, "events")
    left_b = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    right_b = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("r_event_id"),
            F.col("user_id").alias("r_user_id"),
            F.col("ts").alias("r_ts"),
        )
    )
    left_b.write.mode("overwrite").parquet(ldir)
    right_b.write.mode("overwrite").parquet(rdir)

    l_schema = spark.read.parquet(ldir).schema
    r_schema = spark.read.parquet(rdir).schema
    expect = {
        (r.event_id, r.r_event_id)
        for r in stream_interval_join(
            spark.read.schema(l_schema).parquet(ldir),
            spark.read.schema(r_schema).parquet(rdir),
        ).collect()
    }
    assert expect, "batch join produced no pairs — fixture too sparse"

    ls = spark.readStream.schema(l_schema).option("maxFilesPerTrigger", 1).parquet(ldir)
    rs = spark.readStream.schema(r_schema).option("maxFilesPerTrigger", 1).parquet(rdir)
    q = (
        stream_interval_join(ls, rs)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.event_id, r.r_event_id)
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }
    assert got == expect


def test_foreachbatch_partitioned_sink_incremental_refresh(spark, tmp_path):
    """The foreachBatch dynamic-overwrite sink must (a) land the full drained
    stream partitioned on disk, and (b) on a second run with revised data,
    overwrite ONLY the partitions present in the new batch."""
    from rca_data_tools_spark.streaming.joins import stream_to_partitioned_sink

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_to_partitioned_sink(stream, out, ["day"], str(tmp_path / "ckpt1"))
    q.awaitTermination()
    first = spark.read.parquet(out)
    assert first.count() == ev.count()

    # revision: one day's rows, values nulled — must replace only that day
    days = sorted(r.day for r in first.select("day").distinct().collect())
    target_day = days[0]
    rev_src = str(tmp_path / "src2")
    ev.filter(F.col("day") == target_day).withColumn(
        "value", F.lit(None).cast("double")
    ).write.mode("overwrite").parquet(rev_src)
    stream2 = spark.readStream.schema(schema).parquet(rev_src)
    q2 = stream_to_partitioned_sink(stream2, out, ["day"], str(tmp_path / "ckpt2"))
    q2.awaitTermination()

    after = spark.read.parquet(out)
    assert after.count() == ev.count()
    assert after.filter((F.col("day") == target_day) & F.col("value").isNotNull()).count() == 0
    untouched = after.filter((F.col("day") != target_day) & F.col("value").isNotNull()).count()
    assert untouched == ev.filter((F.col("day") != target_day) & F.col("value").isNotNull()).count()


def test_checkpoint_restart_exactly_once(spark, tmp_path):
    """Kill-and-restart recovery: run a windowed aggregation to a parquet
    sink with a checkpoint, stop, land MORE source files, restart the same
    query from the checkpoint, and verify the final sink equals the batch
    answer over ALL data — no lost and no double-counted windows. This is
    the incremental-refresh semantics the reference approximates by
    re-running flows (SURVEY §2.9), expressed as Spark's native
    exactly-once source->state->sink contract."""
    src_dir = str(tmp_path / "src")
    sink_dir = str(tmp_path / "sink")
    ckpt_dir = str(tmp_path / "ckpt")

    events = load_table(spark, SF_SMOKE, "events")
    # Split by TIME (first half of the range, then the rest): a restart picks
    # up later data, as in production. A value-based split would instead land
    # pre-watermark events in run 2, which append-mode correctly DROPS as
    # late — finalized windows are immutable.
    mid = events.agg(
        F.expr("percentile_approx(unix_timestamp(ts), 0.5)")
    ).collect()[0][0]
    split_expr = F.unix_timestamp("ts") <= F.lit(mid)
    first = events.filter(split_expr)
    second = events.filter(~split_expr)
    first.write.mode("overwrite").parquet(src_dir)

    def agg(s):
        return (
            s.withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
            .select(
                F.col("w.start").alias("w_start"),
                "event_type",
                "n",
                F.round("total", 6).alias("total"),
            )
        )

    def run_once():
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src_dir)
        q = (
            agg(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # processes the first half, then stops (availableNow)
    second.write.mode("append").parquet(src_dir)
    run_once()  # restarts from the checkpoint, processes only the new files

    got = {tuple(r) for r in spark.read.parquet(sink_dir).collect()}
    # Batch answer over everything; append-mode emits each window once the
    # watermark passes its end. The boundary window (open at run 1's end,
    # extended in run 2) is the recovery case: its run-1 partial state must
    # survive the restart and merge with run-2 rows — a lost checkpoint shows
    # up as a split or double-counted boundary window.
    batch = agg(spark.read.schema(EVENTS_SCHEMA).parquet(src_dir))
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    closed = batch.filter(
        F.col("w_start") + F.expr("INTERVAL 1 HOUR") <= F.lit(max_ts)
    )
    expect = {tuple(r) for r in closed.collect()}
    assert expect and expect <= got, (len(expect), len(got))
    # nothing double-counted: sink has at most one row per (window, type)
    import collections

    keys = collections.Counter((r[0], r[1]) for r in got)
    assert max(keys.values()) == 1


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    """The HLL sketch builds incrementally as one watermarked streaming
    max-agg (merge operator = MAX); stream and batch register tables are
    identical, hence identical estimates."""
    from pyspark.sql import functions as F

    from rca_data_tools_spark.operators.sketch import hll_estimate
    from rca_data_tools_spark.sources.readers import load_table
    from rca_data_tools_spark.streaming.windows import (
        run_stream_to_memory,
        streaming_hll_registers,
    )

    src_dir = str(tmp_path / "src")
    events = load_table(spark, SF_SMOKE, "events").select("ts", "event_type", "user_id")
    events.write.parquet(src_dir)
    got = run_stream_to_memory(
        spark, src_dir, events.schema, streaming_hll_registers,
        query_name="hll_regs",
    ).orderBy("window_start", "event_type", "idx")
    expect = streaming_hll_registers(events).orderBy(
        "window_start", "event_type", "idx"
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in expect.collect()]
    # and the estimates derived from the streamed registers are sane
    regs = got.groupBy("event_type", "idx").agg(F.max("r").alias("r")).withColumnRenamed("event_type", "grp")
    ests = {r["grp"]: r["hll_estimate"] for r in hll_estimate(regs).collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("n")
        ).collect()
    }
    for k, n in exact.items():
        assert abs(ests[k] - n) / max(n, 1) < 0.4, (k, ests[k], n)


def test_streaming_cms_cells_match_batch(spark, tmp_path):
    """CMS builds incrementally as one watermarked streaming count-agg
    (merge operator = cell-wise SUM); stream and batch cell tables match."""
    from rca_data_tools_spark.sources.readers import load_table
    from rca_data_tools_spark.streaming.windows import (
        run_stream_to_memory,
        streaming_cms_cells,
    )

    src_dir = str(tmp_path / "src")
    events = load_table(spark, SF_SMOKE, "events").select("ts", "user_id")
    events.write.parquet(src_dir)
    got = run_stream_to_memory(
        spark, src_dir, events.schema, streaming_cms_cells, query_name="cms_cells"
    ).orderBy("window_start", "i", "bucket")
    expect = streaming_cms_cells(events).orderBy("window_start", "i", "bucket")
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in expect.collect()]


def test_streaming_spike_flags_match_batch(spark, tmp_path):
    """The stateful streaming spike test must reproduce the batch
    qc_spike_test flags row-for-row across micro-batch boundaries — except
    each key's final point, whose neighborhood is still open when the
    stream drains."""
    import time

    from pyspark.sql import Window

    from rca_data_tools_spark.streaming.stateful import streaming_spike_flags

    e = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    pdf = e.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    src = tmp_path / "spike_src"
    src.mkdir()
    third = len(pdf) // 3
    for i, chunk in enumerate([pdf[:third], pdf[third : 2 * third], pdf[2 * third :]]):
        chunk.to_parquet(
            str(src / f"part-{i}.parquet"), index=False,
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )
        time.sleep(0.05)

    got_df = run_stream_to_memory(
        spark, str(src), EVENTS_SCHEMA,
        lambda s: streaming_spike_flags(s),
        query_name="t_spike_flags", output_mode="update",
    )
    got = {(r.user_id, r.ts, r.spike_flag) for r in got_df.collect()}

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_v, next_v = F.lag("value").over(w), F.lead("value").over(w)
    mag = F.round(F.abs(F.col("value") - (prev_v + next_v) / 2), 6)
    batch = e.withColumn(
        "spike_flag",
        F.when(prev_v.isNull(), 2)
        .when(next_v.isNull(), None)  # open neighborhood: not emitted yet
        .when(mag > 200.0, 4)
        .when(mag > 120.0, 3)
        .otherwise(1),
    ).filter(F.col("spike_flag").isNotNull())
    expect = {(r.user_id, r.ts, r.spike_flag) for r in batch.collect()}
    assert got == expect
    assert any(f in (3, 4) for _, _, f in got)  # thresholds actually fire


def test_stream_neardup_matches_batch(spark, tmp_path):
    """The stream-static incremental-dedup transform must emit EXACTLY the
    batch row set when the incoming docs arrive as a file stream against
    the static corpus — including per-band multiplicity and jaccard
    values (stateless stream-static join: no watermark, no state)."""
    from rca_data_tools_spark.streaming.joins import stream_neardup_matches

    base = "near dup detection over streaming corpora works fine " * 4
    corpus = spark.createDataFrame(
        [(1, base), (2, "a completely different standing corpus document " * 5)],
        "doc_id long, text string",
    )
    incoming_rows = [
        (100, base),
        (101, base + " trailing change"),
        (102, "novel arriving text with nothing in common at all " * 4),
    ]
    in_dir = str(tmp_path / "incoming")
    spark.createDataFrame(incoming_rows, "doc_id long, text string").repartition(
        3
    ).write.mode("overwrite").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema

    expect = {
        (r.band_id, r.new_id, r.old_id, r.jaccard)
        for r in stream_neardup_matches(
            spark.read.schema(schema).parquet(in_dir), corpus, "doc_id", "text"
        ).collect()
    }
    assert expect and {m[1] for m in expect} == {100, 101}

    st = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in_dir)
    q = (
        stream_neardup_matches(st, corpus, "doc_id", "text")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("neardup_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.band_id, r.new_id, r.old_id, r.jaccard)
        for r in spark.sql("SELECT * FROM neardup_stream").collect()
    }
    assert got == expect


def test_windowed_lttb_stream_matches_batch(spark, tmp_path):
    """Windowed decimation: a file stream through the watermarked windowed
    LTTB must emit exactly the batch face's row set once every window has
    closed — same pre-stride, same sequential bucket-argmax picks."""
    import datetime as dt
    import random

    from rca_data_tools_spark.streaming.windows import windowed_lttb

    rng = random.Random(7)
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (
            key,
            t0 + dt.timedelta(hours=day * 24 + h, minutes=rng.randrange(60)),
            round(rng.uniform(-5, 50), 3),
        )
        for key in ("sensorA", "sensorB")
        for day in range(3)
        for h in range(24)
    ]
    in_dir = str(tmp_path / "series")
    # time-ranged files fed in ARRIVAL order (the file source orders by
    # modification time, so each chunk gets an explicit increasing mtime —
    # part-file mtime ties would randomize arrival): the realistic pattern,
    # and the one where no row is later than the watermark. A random split
    # would DROP late rows — correct streaming semantics, but then partial
    # windows decimate differently from batch by design.
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(in_dir)
    ordered = sorted(rows, key=lambda r: r[1])
    n_chunks = 4
    per = -(-len(ordered) // n_chunks)
    for i in range(n_chunks):
        chunk = ordered[i * per : (i + 1) * per]
        pdf = pd.DataFrame(chunk, columns=["series", "ts", "value"])
        # instant-typed (UTC) so the stream's watermark accepts the column
        pdf["ts"] = (
            pd.to_datetime(pdf["ts"]).astype("datetime64[us]").dt.tz_localize("UTC")
        )
        f = os.path.join(in_dir, f"b{i:03d}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f)
        os.utime(f, (1_000_000 + i, 1_000_000 + i))
    schema = spark.read.parquet(in_dir).schema

    def as_set(df):
        return {(r.series, r.window_start, r.ts, r.value) for r in df.collect()}

    batch = as_set(
        windowed_lttb(
            spark.read.schema(schema).parquet(in_dir),
            key_col="series", ts_col="ts", val_col="value",
            window_duration="1 day", threshold=8,
        )
    )
    # 2 series x 3 day-windows x 8 points (24 points/window > threshold)
    assert len(batch) == 2 * 3 * 8

    st = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in_dir)
    q = (
        windowed_lttb(
            st, key_col="series", ts_col="ts", val_col="value",
            window_duration="1 day", threshold=8, watermark="1 hour",
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("wlttb_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = as_set(spark.sql("SELECT * FROM wlttb_stream"))
    # append mode emits only windows the watermark has closed; every emitted
    # window must match the batch pick exactly, and the non-final windows
    # (all but the last per series) must all have been emitted
    assert got <= batch
    emitted_windows = {(s, w) for s, w, *_ in got}
    assert len(emitted_windows) >= 2 * 2
    batch_by_win = {}
    for s, w, ts, v in batch:
        batch_by_win.setdefault((s, w), set()).add((ts, v))
    for s, w in emitted_windows:
        assert {(ts, v) for s2, w2, ts, v in got if (s2, w2) == (s, w)} == batch_by_win[(s, w)]


def test_stream_qaqc_rollup_matches_batch(spark, tmp_path):
    """The streaming QA/QC rollup must emit, per closed window, exactly the
    batch face's flag histogram and extremes — flagging itself is stateless
    (broadcast dim join), so only the windowed rollup carries state."""
    import datetime as dt
    import random

    from rca_data_tools_spark.streaming.windows import stream_qaqc_rollup

    rng = random.Random(11)
    t0 = dt.datetime(2024, 5, 1)
    rows = []
    for day in range(3):
        for h in range(24):
            for key in (1, 2):
                v = rng.choice([None, -5.0, 50.0, 350.0, 450.0, rng.uniform(10, 300)])
                rows.append((key, t0 + dt.timedelta(hours=day * 24 + h), v))
    in_dir = str(tmp_path / "qaqc_stream")
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(in_dir)
    ordered = sorted(rows, key=lambda r: r[1])
    per = -(-len(ordered) // 3)
    for i in range(3):
        pdf = pd.DataFrame(ordered[i * per : (i + 1) * per], columns=["user_id", "ts", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]").dt.tz_localize("UTC")
        f = os.path.join(in_dir, f"b{i:03d}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f)
        os.utime(f, (2_000_000 + i, 2_000_000 + i))
    schema = spark.read.parquet(in_dir).schema
    dim = spark.sql(
        "SELECT id + 1 AS user_id, 0.0 AS fail_lo, 400.0 AS fail_hi, "
        "10.0 AS sus_lo, 300.0 AS sus_hi FROM range(2)"
    )

    def as_set(df):
        return {tuple(r) for r in df.collect()}

    batch = as_set(
        stream_qaqc_rollup(
            spark.read.schema(schema).parquet(in_dir), dim,
            key_col="user_id", ts_col="ts", val_col="value",
        )
    )
    assert len(batch) == 2 * 3  # 2 keys x 3 day-windows
    # every flag class genuinely occurs in the fixture
    assert any(r[4] > 0 and r[5] > 0 and r[6] > 0 for r in batch)

    st = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in_dir)
    q = (
        stream_qaqc_rollup(st, dim, key_col="user_id", ts_col="ts", val_col="value",
                           watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("qaqc_rollup_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = as_set(spark.sql("SELECT * FROM qaqc_rollup_stream"))
    assert got <= batch
    # all but the final (never-closed) window per key must have emitted
    assert len(got) >= 2 * 2


def test_stream_cdc_chunk_matches_batch(spark, tmp_path):
    """The stream-static CDC chunk-match transform must emit EXACTLY the
    batch row set when the incoming docs arrive as a file stream against
    the static corpus — per-chunk-instance multiplicity included
    (stateless: the Arrow chunk kernel + one fingerprint equi-join)."""
    from rca_data_tools_spark.streaming.joins import stream_cdc_chunk_matches

    shared = (
        "the shared boilerplate paragraph that rides along every report "
        "and is long enough to span several content defined chunks " * 3
    )
    corpus = spark.createDataFrame(
        [(1, shared + " plus corpus-only trailing analysis"),
         (2, "a fully distinct standing corpus document " * 6)],
        "doc_id long, text string",
    )
    incoming_rows = [
        (100, "fresh preamble before " + shared),
        (101, "totally novel arriving text with nothing shared at all " * 4),
    ]
    in_dir = str(tmp_path / "cdc_incoming")
    spark.createDataFrame(incoming_rows, "doc_id long, text string").repartition(
        2
    ).write.mode("overwrite").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema

    expect = sorted(
        (r.new_id, r.fp, r.clen, r.df)
        for r in stream_cdc_chunk_matches(
            spark.read.schema(schema).parquet(in_dir), corpus, "doc_id", "text"
        ).collect()
    )
    # the shared suffix re-synchronizes into matching chunks; the novel doc
    # contributes nothing
    assert expect and {e[0] for e in expect} == {100}

    st = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in_dir)
    q = (
        stream_cdc_chunk_matches(st, corpus, "doc_id", "text")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cdc_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r.new_id, r.fp, r.clen, r.df)
        for r in spark.sql("SELECT * FROM cdc_stream").collect()
    )
    assert got == expect


def test_stream_substring_matches_batch(spark, tmp_path):
    """The stream-static repeated-substring transform must emit EXACTLY the
    batch row set when the incoming docs arrive as a file stream against
    the static corpus — per-window-position multiplicity included
    (stateless: windowing projection + one fingerprint equi-join)."""
    from rca_data_tools_spark.streaming.joins import stream_substring_matches

    passage = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor"
    corpus = spark.createDataFrame(
        [(1, "corpus preamble " + passage + " corpus tail"),
         (2, "a fully distinct standing corpus document with its own words entirely")],
        "doc_id long, text string",
    )
    incoming_rows = [
        (100, "fresh lead-in before " + passage + " and a fresh tail"),
        (101, "totally novel arriving text sharing nothing with anyone at all today"),
    ]
    in_dir = str(tmp_path / "substr_incoming")
    spark.createDataFrame(incoming_rows, "doc_id long, text string").repartition(
        2
    ).write.mode("overwrite").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema

    expect = sorted(
        (r.new_id, r.pos, r.fp, r.df)
        for r in stream_substring_matches(
            spark.read.schema(schema).parquet(in_dir), corpus, "doc_id", "text"
        ).collect()
    )
    # the planted 12-token passage yields 12-8+1 = 5 matching windows for
    # doc 100; the novel doc contributes nothing
    assert {e[0] for e in expect} == {100} and len(expect) == 5

    st = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in_dir)
    q = (
        stream_substring_matches(st, corpus, "doc_id", "text")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("substr_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r.new_id, r.pos, r.fp, r.df)
        for r in spark.sql("SELECT * FROM substr_stream").collect()
    )
    assert got == expect


def test_stream_merge_upsert_matches_batch_and_replays_idempotently(spark, tmp_path):
    """Batch ≡ stream for the ingest-to-merge lifecycle: two correction
    micro-batches through stream_merge_upsert must leave EXACTLY the table
    that two sequential batch merge_upsert calls produce — proving
    exactly-once row states across micro-batch boundaries — and a replay
    of the second batch (the crash-between-commit-and-offsets case) must
    rebuild an identical version from its predecessor, not double-apply."""
    import os
    import shutil

    from rca_data_tools_spark.sources.sinks import merge_upsert
    from rca_data_tools_spark.streaming.joins import stream_merge_upsert

    ddl = "d string, event_type string, n bigint, n_users bigint"
    e = load_table(spark, SF_SMOKE, "events")
    daily = e.groupBy(
        F.to_date("ts").cast("string").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.count_distinct("user_id").alias("n_users"))

    root = str(tmp_path / "table")
    os.makedirs(root)
    # range-cluster the initial version on the zone key, as a maintained
    # table would be — gives the merges' zone maps real ranges to prune
    daily.repartitionByRange(4, "d").write.parquet(os.path.join(root, "v0"))

    b1 = daily.filter(F.col("d") >= "2024-01-10").withColumn("n", F.col("n") + 100)
    b2 = daily.filter(F.col("d") >= "2024-01-20").withColumn("n", F.col("n") + 200)

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    for i, b in enumerate([b1, b2]):
        stage = str(tmp_path / f"stage{i}")
        b.select("d", "event_type", "n", "n_users").coalesce(1).write.parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        dst = os.path.join(feed, f"batch-{i}.parquet")
        os.rename(os.path.join(stage, part), dst)
        os.utime(dst, (1_000_000 + i * 10, 1_000_000 + i * 10))

    stream = spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(feed)
    q = stream_merge_upsert(stream, root, ["d", "event_type"], ddl, str(tmp_path / "ck"))
    q.awaitTermination()

    # two micro-batches -> exactly versions v0, v1, v2
    vs = sorted(int(d[1:]) for d in os.listdir(root) if d.startswith("v"))
    assert vs == [0, 1, 2]

    # batch replay: the same two merges applied sequentially
    expect_df = merge_upsert(
        merge_upsert(daily.select("d", "event_type", "n", "n_users"),
                     b1.select("d", "event_type", "n", "n_users"),
                     ["d", "event_type"]),
        b2.select("d", "event_type", "n", "n_users"),
        ["d", "event_type"],
    )
    expect = sorted(map(tuple, expect_df.collect()))
    got = sorted(map(tuple, spark.read.schema(ddl).parquet(os.path.join(root, "v2")).collect()))
    assert got == expect

    # copy-on-write actually pruned: v2 shares (hardlinks) at least one
    # untouched file with v1 instead of rewriting the whole table
    inodes_v1 = {os.stat(os.path.join(root, "v1", f)).st_ino
                 for f in os.listdir(os.path.join(root, "v1")) if f.endswith(".parquet")}
    inodes_v2 = {os.stat(os.path.join(root, "v2", f)).st_ino
                 for f in os.listdir(os.path.join(root, "v2")) if f.endswith(".parquet")}
    assert inodes_v1 & inodes_v2

    # replayed batch 1 (batch_id=1 -> v2): a fresh checkpoint re-delivers
    # both batches; pre-existing v1/v2 are rebuilt from their predecessors
    # and the final state is identical (idempotent replay)
    shutil.rmtree(str(tmp_path / "ck"))
    stream2 = spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(feed)
    q2 = stream_merge_upsert(stream2, root, ["d", "event_type"], ddl, str(tmp_path / "ck2"))
    q2.awaitTermination()
    got2 = sorted(map(tuple, spark.read.schema(ddl).parquet(os.path.join(root, "v2")).collect()))
    assert got2 == expect


def test_stream_merge_cdc_applies_deletes_and_matches_batch(spark, tmp_path):
    """CDC apply ≡ sequential batch MERGEs with delete clauses: a feed
    carrying update AND delete ops must leave exactly the table two batch
    merge_upsert(delete_col=...) calls produce — deletes remove matched
    rows, a delete for an absent key is a no-op, and a replay rebuilds the
    same final version."""
    import os
    import shutil

    from rca_data_tools_spark.sources.sinks import merge_upsert
    from rca_data_tools_spark.streaming.joins import stream_merge_cdc

    ddl = "d string, event_type string, n bigint, n_users bigint"
    feed_ddl = ddl + ", op string"
    e = load_table(spark, SF_SMOKE, "events")
    daily = e.groupBy(
        F.to_date("ts").cast("string").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.count_distinct("user_id").alias("n_users"))

    root = str(tmp_path / "table")
    os.makedirs(root)
    daily.repartitionByRange(4, "d").write.parquet(os.path.join(root, "v0"))

    # batch 1 deletes clicks it touches, updates the rest;
    # batch 2 deletes views (incl. rows batch 1 just wrote) and re-deletes
    # clicks — by then absent, so those must be no-ops
    def ops(src, del_type):
        return src.select(
            "d", "event_type", "n", "n_users",
            F.when(F.col("event_type") == del_type, F.lit("delete"))
            .otherwise(F.lit("update")).alias("op"),
        )

    b1 = ops(daily.filter(F.col("d") >= "2024-01-10").withColumn("n", F.col("n") + 100), "click")
    b2 = ops(daily.filter(F.col("d") >= "2024-01-05"), "click").where(
        F.col("event_type").isin("click", "view")
    ).withColumn(
        "op", F.lit("delete")
    )

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    for i, b in enumerate([b1, b2]):
        stage = str(tmp_path / f"stage{i}")
        b.coalesce(1).write.parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        dst = os.path.join(feed, f"batch-{i}.parquet")
        os.rename(os.path.join(stage, part), dst)
        os.utime(dst, (1_000_000 + i * 10, 1_000_000 + i * 10))

    stream = spark.readStream.schema(feed_ddl).option("maxFilesPerTrigger", 1).parquet(feed)
    q = stream_merge_cdc(stream, root, ["d", "event_type"], ddl, str(tmp_path / "ck"))
    q.awaitTermination()
    vs = sorted(int(d[1:]) for d in os.listdir(root) if d.startswith("v"))
    assert vs == [0, 1, 2]

    def to_flag(b):
        return b.withColumn("_del", F.col("op") == "delete").drop("op")

    expect_df = merge_upsert(
        merge_upsert(
            daily.select("d", "event_type", "n", "n_users"),
            to_flag(b1), ["d", "event_type"], delete_col="_del",
        ),
        to_flag(b2), ["d", "event_type"], delete_col="_del",
    )
    expect = sorted(map(tuple, expect_df.collect()))
    got = sorted(map(tuple, spark.read.schema(ddl).parquet(os.path.join(root, "v2")).collect()))
    assert got == expect
    # deletes actually landed: no click/view rows in the deleted window
    final = spark.read.schema(ddl).parquet(os.path.join(root, "v2"))
    assert final.where(
        (F.col("d") >= "2024-01-10") & (F.col("event_type") == "click")
    ).count() == 0

    # replay from a fresh checkpoint rebuilds identical state
    stream2 = spark.readStream.schema(feed_ddl).option("maxFilesPerTrigger", 1).parquet(feed)
    q2 = stream_merge_cdc(stream2, root, ["d", "event_type"], ddl, str(tmp_path / "ck2"))
    q2.awaitTermination()
    got2 = sorted(map(tuple, spark.read.schema(ddl).parquet(os.path.join(root, "v2")).collect()))
    assert got2 == expect


def test_stream_merge_onto_dv_bearing_table_never_resurrects(spark, tmp_path):
    """The last DV composition face: a STREAMING merge whose base version
    carries deletion vectors must rewrite matched files through them and
    carry surviving vectors forward — a correction stream cannot resurrect
    GDPR-deleted rows."""
    import os

    from rca_data_tools_spark.sources.sinks import (
        delete_where, mark_committed, read_with_deletes,
    )
    from rca_data_tools_spark.streaming.joins import stream_merge_upsert

    ddl = "d string, event_type string, n bigint, n_users bigint"
    e = load_table(spark, SF_SMOKE, "events")
    daily = e.groupBy(
        F.to_date("ts").cast("string").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.count_distinct("user_id").alias("n_users"))

    root = str(tmp_path / "table")
    os.makedirs(root)
    stage0 = os.path.join(root, "stage0")
    daily.repartitionByRange(4, "d").write.parquet(stage0)
    os.rename(stage0, os.path.join(root, "v0_raw"))
    # v0 = raw table, v1 = v0 with every 'click' row DELETED as vectors
    delete_where(spark, os.path.join(root, "v0_raw"), os.path.join(root, "v0"),
                 "event_type = 'click'", ddl)
    mark_committed(os.path.join(root, "v0"))

    b1 = daily.filter(
        (F.col("d") >= "2024-01-10") & (F.col("event_type") != "click")
    ).withColumn("n", F.col("n") + 100)
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    stage = str(tmp_path / "stage1")
    b1.select("d", "event_type", "n", "n_users").coalesce(1).write.parquet(stage)
    part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
    os.rename(os.path.join(stage, part), os.path.join(feed, "batch-0.parquet"))

    stream = spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(feed)
    q = stream_merge_upsert(stream, root, ["d", "event_type"], ddl, str(tmp_path / "ck"))
    q.awaitTermination()

    latest = max(int(d[1:]) for d in os.listdir(root)
                 if d.startswith("v") and d[1:].isdigit() and d != "v0_raw")
    back = read_with_deletes(spark, os.path.join(root, f"v{latest}"), ddl)
    assert back.where(F.col("event_type") == "click").count() == 0, \
        "deleted rows resurrected through the streaming merge"
    got = {(r["d"], r["event_type"]): r["n"] for r in back.collect()}
    expect_updates = {(r["d"], r["event_type"]): r["n"] for r in b1.collect()}
    for k, v in expect_updates.items():
        assert got[k] == v


def test_stream_table_changes_incremental_consumption(spark, tmp_path):
    """The streaming CDF read: a consumer drains the persisted per-version
    change feeds, CHECKPOINTS, and after another merge commits it receives
    ONLY the new version's changes on restart — exactly-once incremental
    replay of the table's history, no snapshot diffing."""
    import os

    from rca_data_tools_spark.sources.sinks import create_table, merge_into_table
    from rca_data_tools_spark.streaming.joins import stream_table_changes

    ddl = "id long, v double"
    feed_ddl = "id long, op string, before_v double, after_v double"
    root = str(tmp_path / "t")
    create_table(
        spark.createDataFrame([(i, float(i)) for i in range(20)], ddl),
        root, zone_key="id",
    )
    merge_into_table(
        spark, root, spark.createDataFrame([(3, 33.0), (100, 1.0)], ddl),
        ["id"], ddl, changes_feed=True,
    )

    def drain(name: str):
        rows = []
        q = (
            stream_table_changes(spark, root, feed_ddl)
            .writeStream.foreachBatch(lambda b, _i: rows.extend(b.collect()))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return {
            (r["_version"], r["id"]): (r["op"], r["before_v"], r["after_v"])
            for r in rows
        }

    first = drain("cdf1")
    assert first == {
        (1, 3): ("update", 3.0, 33.0),
        (1, 100): ("insert", None, 1.0),
    }

    merge_into_table(
        spark, root, spark.createDataFrame([(100, 2.0)], ddl),
        ["id"], ddl, changes_feed=True,
    )
    second = drain("cdf2")  # same checkpoint: only v2's feed arrives
    assert second == {(2, 100): ("update", 1.0, 2.0)}


def test_stream_merge_refuses_to_destroy_dml_version(spark, tmp_path):
    """Writer-identity guard: a merge stream names versions by batch id, so
    a stream started against a chain that BATCH DML advanced would want to
    rebuild (rmtree!) the DML's committed version. Stream-written versions
    carry a _writer tag and may rebuild on replay; an untagged (DML)
    version must refuse loudly instead of being silently destroyed."""
    import os

    from pyspark.sql.streaming import StreamingQueryException

    from rca_data_tools_spark.sources.sinks import (
        create_table, delete_into_table, read_version,
    )
    from rca_data_tools_spark.streaming.joins import stream_merge_upsert

    ddl = "d string, event_type string, n bigint, n_users bigint"
    e = load_table(spark, SF_SMOKE, "events")
    daily = e.groupBy(
        F.to_date("ts").cast("string").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.count_distinct("user_id").alias("n_users"))

    root = str(tmp_path / "table")
    create_table(daily.select("d", "event_type", "n", "n_users"), root,
                 zone_key="d", n_files=4)
    delete_into_table(spark, root, "event_type = 'click'", ddl)  # v1: DML
    v1_rows = read_version(spark, root, ddl, n=1).count()

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    b = daily.filter(F.col("d") >= "2024-01-10").select(
        "d", "event_type", "n", "n_users"
    )
    b.coalesce(1).write.parquet(str(tmp_path / "stage"))
    part = [f for f in os.listdir(str(tmp_path / "stage")) if f.endswith(".parquet")][0]
    os.rename(os.path.join(str(tmp_path / "stage"), part),
              os.path.join(feed, "batch-0.parquet"))

    stream = spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(feed)
    q = stream_merge_upsert(stream, root, ["d", "event_type"], ddl,
                            str(tmp_path / "ck"))
    import pytest

    with pytest.raises(StreamingQueryException, match="not written by a merge stream"):
        q.awaitTermination()
    # the DML version survived untouched
    assert read_version(spark, root, ddl, n=1).count() == v1_rows


def test_stream_merge_expectations_quarantine_replay_idempotent(spark, tmp_path):
    """The streaming expectations gate must (a) merge only clean rows,
    (b) quarantine violating rows with their rule names, and (c) stay
    idempotent under full reprocess: a second drain with a fresh
    checkpoint rebuilds both the versions AND the quarantine partitions —
    no duplicated quarantine rows, identical final table."""
    import os
    import shutil

    from rca_data_tools_spark.streaming.joins import stream_merge_expectations

    ddl = "d string, event_type string, n bigint, n_users bigint"
    e = load_table(spark, SF_SMOKE, "events")
    daily = e.groupBy(
        F.to_date("ts").cast("string").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.count_distinct("user_id").alias("n_users"))

    root = str(tmp_path / "table")
    os.makedirs(root)
    daily.select("d", "event_type", "n", "n_users").write.parquet(
        os.path.join(root, "v0")
    )
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    b = daily.filter(F.col("d") >= "2024-01-10").select(
        "d", "event_type", "n", "n_users"
    ).unionByName(
        spark.createDataFrame([("2024-03-01", "bad", -5, 1)], ddl)
    )
    b.coalesce(1).write.parquet(str(tmp_path / "stage"))
    part = [f for f in os.listdir(str(tmp_path / "stage")) if f.endswith(".parquet")][0]
    os.rename(os.path.join(str(tmp_path / "stage"), part),
              os.path.join(feed, "batch-0.parquet"))

    qdir = str(tmp_path / "quar")
    rules = {"n_nonneg": "n >= 0"}

    def _drain(ck):
        stream = spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(feed)
        q = stream_merge_expectations(
            stream, root, ["d", "event_type"], ddl, ck, rules, qdir
        )
        q.awaitTermination()

    _drain(str(tmp_path / "ck1"))
    table1 = sorted(map(tuple, spark.read.schema(ddl).parquet(
        os.path.join(root, "v1")).collect()))
    quar1 = sorted(map(tuple, spark.read.parquet(qdir)
                       .select("d", "event_type", "n", "violations").collect()))
    assert quar1 == [("2024-03-01", "bad", -5, "n_nonneg")]
    assert ("2024-03-01", "bad", -5, 1) not in table1  # never admitted

    # full reprocess with a fresh checkpoint: identical table, identical
    # (not doubled) quarantine
    shutil.rmtree(str(tmp_path / "ck1"))
    _drain(str(tmp_path / "ck2"))
    table2 = sorted(map(tuple, spark.read.schema(ddl).parquet(
        os.path.join(root, "v1")).collect()))
    quar2 = sorted(map(tuple, spark.read.parquet(qdir)
                       .select("d", "event_type", "n", "violations").collect()))
    assert table2 == table1 and quar2 == quar1


def test_stream_merge_recovers_crashed_uncommitted_claim(spark, tmp_path):
    """Crash recovery (ADVICE r09): a stream batch that died AFTER creating
    its v{N} directory but BEFORE publishing (_writer tag / _commit marker)
    leaves an uncommitted claim. A restart must treat that as a crashed
    claim and rebuild through it — not raise 'not written by a merge
    stream' and wedge the stream forever. Only a COMMITTED version another
    writer published is protected."""
    import os

    from rca_data_tools_spark.sources.sinks import create_table, read_version
    from rca_data_tools_spark.streaming.joins import stream_merge_upsert

    ddl = "d string, event_type string, n bigint, n_users bigint"
    e = load_table(spark, SF_SMOKE, "events")
    daily = e.groupBy(
        F.to_date("ts").cast("string").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.count_distinct("user_id").alias("n_users"))

    root = str(tmp_path / "table")
    create_table(daily.select("d", "event_type", "n", "n_users"), root,
                 zone_key="d", n_files=4)

    # simulate the crash: v1 exists with partial content, no tag, no marker
    crashed = os.path.join(root, "v1")
    os.makedirs(crashed)
    with open(os.path.join(crashed, "part-garbage.parquet"), "wb") as fh:
        fh.write(b"\x00not a parquet file")

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    b = daily.filter(F.col("d") >= "2024-01-10").select(
        "d", "event_type", "n", "n_users"
    )
    b.coalesce(1).write.parquet(str(tmp_path / "stage"))
    part = [f for f in os.listdir(str(tmp_path / "stage")) if f.endswith(".parquet")][0]
    os.rename(os.path.join(str(tmp_path / "stage"), part),
              os.path.join(feed, "batch-0.parquet"))

    stream = spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(feed)
    q = stream_merge_upsert(stream, root, ["d", "event_type"], ddl,
                            str(tmp_path / "ck"))
    q.awaitTermination()  # must NOT raise

    # v1 was rebuilt correctly: it equals the batch merge of b onto v0
    got = read_version(spark, root, ddl, n=1)
    expect = daily.select("d", "event_type", "n", "n_users")  # b upserts same values
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))
    assert not os.path.exists(os.path.join(root, "v1", "part-garbage.parquet"))


def test_stream_merge_honors_persisted_check_constraints(spark, tmp_path):
    """Persisted CHECK constraints (create_table(constraints=...)) govern
    EVERY write — including the streaming merge (ADVICE r09: _sink called
    merge_upsert_pruned directly and silently admitted violating rows).
    A violating micro-batch row must fail the stream loudly."""
    import os

    import pytest
    from pyspark.sql.streaming import StreamingQueryException

    from rca_data_tools_spark.sources.sinks import create_table
    from rca_data_tools_spark.streaming.joins import stream_merge_upsert

    ddl = "d string, event_type string, n bigint, n_users bigint"
    e = load_table(spark, SF_SMOKE, "events")
    daily = e.groupBy(
        F.to_date("ts").cast("string").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.count_distinct("user_id").alias("n_users"))

    root = str(tmp_path / "table")
    create_table(daily.select("d", "event_type", "n", "n_users"), root,
                 zone_key="d", n_files=4, constraints={"n_nonneg": "n >= 0"})

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    bad = spark.createDataFrame([("2024-03-01", "bad", -5, 1)], ddl)
    bad.coalesce(1).write.parquet(str(tmp_path / "stage"))
    part = [f for f in os.listdir(str(tmp_path / "stage")) if f.endswith(".parquet")][0]
    os.rename(os.path.join(str(tmp_path / "stage"), part),
              os.path.join(feed, "batch-0.parquet"))

    stream = spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(feed)
    q = stream_merge_upsert(stream, root, ["d", "event_type"], ddl,
                            str(tmp_path / "ck"))
    with pytest.raises(StreamingQueryException, match="constraint violated"):
        q.awaitTermination()


def test_two_concurrent_merge_streams_serialize_without_lost_updates(spark, tmp_path):
    """VERDICT r09 item 7: two availableNow merge streams with different
    app ids run AT THE SAME TIME against one version chain via
    stream_merge_concurrent — each batch claims its version through
    merge_into_table's rebase-and-retry, so the four batches land as four
    serialized committed versions with no lost update. A re-run of one
    stream from a FRESH checkpoint finds its (app, batch) txn tags in the
    commit markers and no-ops (exactly-once without batch-addressed
    versions)."""
    import os

    from rca_data_tools_spark.sources.sinks import (
        applied_txns, committed_versions, create_table, read_version,
    )
    from rca_data_tools_spark.streaming.joins import stream_merge_concurrent

    ddl = "k bigint, grp string, val double"
    base = spark.range(100).select(
        F.col("id").alias("k"), F.lit("g0").alias("grp"),
        (F.col("id") * 1.0).alias("val"),
    )
    root = str(tmp_path / "table")
    create_table(base, root, zone_key="k", n_files=4)

    # stream A upserts keys 0..49 (two batches), stream B keys 100..149
    # (two batches) — disjoint, so the final table is interleaving-free
    def _feed(name, lo, hi, grp):
        d = str(tmp_path / name)
        os.makedirs(d)
        for i, (a, b) in enumerate([(lo, (lo + hi) // 2), ((lo + hi) // 2, hi)]):
            batch = spark.range(a, b).select(
                F.col("id").alias("k"), F.lit(grp).alias("grp"),
                (F.col("id") + 0.5).alias("val"),
            )
            stage = str(tmp_path / f"{name}_stage{i}")
            batch.coalesce(1).write.parquet(stage)
            part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
            os.rename(os.path.join(stage, part), os.path.join(d, f"b{i}.parquet"))
        return d

    fa = _feed("feedA", 0, 50, "gA")
    fb = _feed("feedB", 100, 150, "gB")

    def _start(feed, app, ck):
        s = spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(feed)
        return stream_merge_concurrent(s, root, ["k"], ddl, str(tmp_path / ck), app)

    qa = _start(fa, "appA", "ckA")
    qb = _start(fb, "appB", "ckB")
    qa.awaitTermination()
    qb.awaitTermination()

    assert committed_versions(root) == [0, 1, 2, 3, 4]
    assert applied_txns(root) == {
        ("appA", 0), ("appA", 1), ("appB", 0), ("appB", 1),
    }
    tip = read_version(spark, root, ddl)
    assert tip.count() == 150
    assert tip.filter(F.col("grp") == "gA").count() == 50   # no lost update
    assert tip.filter(F.col("grp") == "gB").count() == 50
    assert tip.filter((F.col("k") < 50) & (F.col("val") != F.col("k") + 0.5)).count() == 0

    # fresh-checkpoint replay of stream A: txn tags -> no-op, no new versions
    qa2 = _start(fa, "appA", "ckA2")
    qa2.awaitTermination()
    assert committed_versions(root) == [0, 1, 2, 3, 4]
    assert read_version(spark, root, ddl).count() == 150


def test_stream_cdf_consumer_crosses_restore(spark, tmp_path):
    """A checkpointed streaming CDF consumer must survive a rollback: when
    the RESTORE persists its effective change set (r10), the restore
    version's feed arrives as one more micro-batch — the consumer keeps
    replaying instead of being stranded, and its replica equals the
    restored table."""
    import os

    from rca_data_tools_spark.sources.sinks import (
        create_table, merge_into_table, read_version, replay_changes,
        restore_table,
    )
    from rca_data_tools_spark.streaming.joins import stream_table_changes

    ddl = "k bigint, grp string, val double"
    base = spark.range(60).select(
        F.col("id").alias("k"), F.lit("g0").alias("grp"),
        (F.col("id") * 1.0).alias("val"),
    )
    root = str(tmp_path / "t")
    create_table(base, root, zone_key="k")
    b1 = spark.range(10).select(
        F.col("id").alias("k"), F.lit("g1").alias("grp"), F.lit(-1.0).alias("val")
    )
    merge_into_table(spark, root, b1, ["k"], ddl, zone_key="k",
                     changes_feed=True)                                # v1
    restore_table(root, 0, spark=spark, changes_feed_keys=["k"],
                  schema_ddl=ddl)                                      # v2

    feed_ddl = ("k bigint, op string, before_grp string, after_grp string, "
                "before_val double, after_val double")
    out = str(tmp_path / "consumed")

    q = (
        stream_table_changes(spark, root, feed_ddl)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    consumed = spark.read.parquet(out)
    # both the merge's feed AND the restore's effective diff arrived
    assert set(r["_version"] for r in consumed.select("_version").distinct().collect()) == {1, 2}
    replica = replay_changes(
        read_version(spark, root, ddl, n=0), consumed, ["k"]
    )
    tip = read_version(spark, root, ddl)
    assert sorted(map(tuple, replica.collect())) == sorted(map(tuple, tip.collect()))


def test_stream_merge_full_exactly_once_replay(spark):
    """A fresh-checkpoint reprocess of the same snapshots must no-op on the
    applied (app, batch) txn tags — no new versions, identical table."""
    import os
    import tempfile

    from rca_data_tools_spark.sources.sinks import (
        committed_versions, create_table, read_version,
    )
    from rca_data_tools_spark.streaming.joins import stream_merge_full

    ddl = "k bigint, v double"
    root = tempfile.mkdtemp(prefix="smf_")
    troot = os.path.join(root, "t")
    os.makedirs(troot)
    base = spark.createDataFrame([(i, float(i)) for i in range(100)], ddl)
    create_table(base, troot, zone_key="k", n_files=4)
    snap = spark.createDataFrame(
        [(i, float(i + 1000)) for i in range(0, 100, 2)], ddl
    )
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    stage = os.path.join(root, "stage")
    snap.coalesce(1).write.parquet(stage)
    part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
    os.rename(os.path.join(stage, part), os.path.join(feed, "s0.parquet"))

    def run(ck):
        q = stream_merge_full(
            spark.readStream.schema(ddl).parquet(feed),
            troot, ["k"], ddl, os.path.join(root, ck), "sync",
            zone_key="k",
            matched_update_cond="s.v > t.v",
            nmbs_delete_cond="v < 10",
        )
        q.awaitTermination()

    run("ck1")
    after1 = sorted(map(tuple, read_version(spark, troot, ddl).collect()))
    v1 = committed_versions(troot)
    run("ck2")  # fresh checkpoint: same (app, batch=0) tag -> must no-op
    assert committed_versions(troot) == v1
    assert sorted(map(tuple, read_version(spark, troot, ddl).collect())) == after1
    # semantics sanity: evens updated, odds >= 10 kept, odds < 10 purged
    d = dict(after1)
    assert d[0] == 1000.0 and d[98] == 1098.0
    assert d[11] == 11.0 and 1 not in d and 9 not in d


def test_stream_table_changes_crosses_merge_full(spark):
    """The streaming CDF consumer reads a merge_table_full version's
    persisted feed exactly like a merge_into_table one — full-clause
    merges produce the same replayable stream (incl. delete ops, which
    plain merge feeds never carry)."""
    import os
    import tempfile

    from rca_data_tools_spark.sources.sinks import (
        create_table, merge_into_table, merge_table_full,
    )
    from rca_data_tools_spark.streaming.joins import stream_table_changes

    ddl = "k bigint, v double"
    root = os.path.join(tempfile.mkdtemp(prefix="cdfmf_"), "t")
    os.makedirs(root)
    base = spark.createDataFrame([(i, float(i)) for i in range(50)], ddl)
    create_table(base, root, zone_key="k", n_files=2)
    merge_into_table(
        spark, root,
        spark.createDataFrame([(1, 100.0), (999, 5.0)], ddl),
        ["k"], ddl, zone_key="k", changes_feed=True,
    )
    merge_table_full(
        spark, root,
        spark.createDataFrame([(2, 200.0)], ddl),
        ["k"], ddl, zone_key="k", changes_feed=True,
        matched_update_cond="s.v > t.v",
        nmbs_delete_cond="v = 49",
    )
    feed_ddl = (
        "k bigint, op string, before_v double, after_v double"
    )
    q = (
        stream_table_changes(spark, root, feed_ddl)
        .writeStream.format("memory").queryName("cdf_mf")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from cdf_mf").collect()
    by_ver = {}
    for r in rows:
        by_ver.setdefault(r["_version"], []).append((r["k"], r["op"]))
    assert sorted(by_ver[1]) == [(1, "update"), (999, "insert")]
    assert sorted(by_ver[2]) == [(2, "update"), (49, "delete")]


def test_stream_merge_kv_takes_over_crashed_claim(spark, tmp_path):
    """A writer crashed mid-claim on the object store; the restarted
    streaming job passes lease_ttl and drains through a takeover instead
    of wedging — every batch lands exactly once."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    from rca_data_tools_spark.sources.commit_store import MemoryKVCommitStore
    from rca_data_tools_spark.sources.kv_table import KVTable
    from rca_data_tools_spark.streaming.joins import stream_merge_kv

    ddl = "k bigint, v double"
    store = MemoryKVCommitStore()
    t = KVTable(store, str(tmp_path / "cache"))
    t.create(
        spark.createDataFrame([(i, float(i)) for i in range(100)], ddl),
        zone_key="k", n_files=4,
    )
    # the crash: an orphan claim at tip+1
    assert store.try_claim(1)
    _time.sleep(0.15)

    feed = tmp_path / "feed"
    feed.mkdir()
    for i, rows in enumerate([[(3, 100.0)], [(5, 200.0), (200, 1.0)]]):
        stage = tmp_path / f"s{i}"
        spark.createDataFrame(rows, ddl).coalesce(1).write.parquet(str(stage))
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.rename(str(stage / part), str(feed / f"b{i}.parquet"))
        os.utime(str(feed / f"b{i}.parquet"), (1_000_000 + i, 1_000_000 + i))

    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = stream_merge_kv(
        stream, t, ["k"], ddl, str(tmp_path / "ckpt"),
        zone_key="k", lease_ttl=0.1,
    )
    q.awaitTermination()
    got = {r["k"]: r["v"] for r in t.read(spark, ddl).collect()}
    assert got[3] == 100.0 and got[5] == 200.0 and got[200] == 1.0
    assert len(got) == 101
    # batch 0 landed at the WEDGED version number via takeover (gen >= 1)
    assert store.read_marker(1)["gen"] >= 1
    assert sorted(x["batch"] for x in t.applied_txns()) == [0, 1]
