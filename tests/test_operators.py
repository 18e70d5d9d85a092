"""Golden/property tests for operators whose semantics the DuckDB oracle
can't express (FIXTURES.md golden-check targets 4-6)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rca_data_tools_spark.operators.decimate import _lttb_indices, block_mean, lttb
from rca_data_tools_spark.operators.interpolate import interpolate_na
from rca_data_tools_spark.operators.interval_join import as_of_join
from rca_data_tools_spark.sources.readers import load_table
from tests.conftest import SF_CORRECTNESS


def test_lttb_properties(spark):
    e = load_table(spark, SF_CORRECTNESS, "events").select("user_id", "ts", "value")
    out = lttb(e, ["user_id"], "ts", "value", threshold=50).toPandas()
    src = e.toPandas()
    for uid, grp in src.groupby("user_id"):
        sel = out[out.user_id == uid].sort_values("ts")
        n = len(grp)
        expect = min(n, 50) if n >= 3 else n
        assert len(sel) == expect, f"user {uid}: {len(sel)} != {expect}"
        grp_sorted = grp.sort_values(["ts"])
        assert sel.iloc[0].ts == grp_sorted.iloc[0].ts  # first point kept
        assert sel.iloc[-1].ts == grp_sorted.iloc[-1].ts  # last point kept


def test_lttb_indices_small():
    x = np.arange(10, dtype=float)
    y = np.zeros(10)
    y[4] = 100.0  # spike must survive decimation
    idx = _lttb_indices(x, y, 5)
    assert len(idx) == 5
    assert idx[0] == 0 and idx[-1] == 9
    assert 4 in idx
    # threshold >= n -> identity
    assert list(_lttb_indices(x, y, 10)) == list(range(10))


def test_as_of_join_matches_pandas(spark):
    e = load_table(spark, SF_CORRECTNESS, "events")
    left = e.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    right = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"), F.col("value").alias("p_value"))
    )
    got = (
        as_of_join(left, right, key="user_id", left_ts="ts", right_ts="p_ts", value_cols=["p_value"])
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("p_ts")
    expect = pd.merge_asof(lp, rp, left_on="ts", right_on="p_ts", by="user_id", direction="backward")
    expect = expect.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    assert len(got) == len(expect)
    pd.testing.assert_series_equal(
        got["p_value"].reset_index(drop=True), expect["p_value"].reset_index(drop=True), check_names=False
    )


def test_interpolate_na_edges(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", t0, None),
        ("a", t0 + dt.timedelta(seconds=10), 10.0),
        ("a", t0 + dt.timedelta(seconds=20), None),
        ("a", t0 + dt.timedelta(seconds=30), None),
        ("a", t0 + dt.timedelta(seconds=40), 40.0),
        ("a", t0 + dt.timedelta(seconds=50), None),
        ("b", t0, None),  # all-null series stays null
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        (r.k, r.ts): r.v2
        for r in interpolate_na(df, ["k"], "ts", "v", out_col="v2").collect()
    }
    assert out[("a", t0)] == 10.0  # bfill leading edge
    assert out[("a", t0 + dt.timedelta(seconds=20))] == pytest.approx(20.0)
    assert out[("a", t0 + dt.timedelta(seconds=30))] == pytest.approx(30.0)
    assert out[("a", t0 + dt.timedelta(seconds=50))] == 40.0  # ffill trailing edge
    assert out[("b", t0)] is None


def test_block_mean_trims_ragged_tail(spark):
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1, 0, 0, i), float(i)) for i in range(25)],
        "k string, ts timestamp, v double",
    )
    out = block_mean(df, ["k"], "ts", ["v"], window=10).orderBy("ts").collect()
    assert len(out) == 2  # 25 rows -> 2 full blocks, tail trimmed
    assert out[0].v == pytest.approx(4.5)
    assert out[1].v == pytest.approx(14.5)


def test_multimodal_frame_sample_and_resize(spark):
    """Frame fan-out geometry, fingerprint determinism, resize aspect fit,
    and the explicit decode stub contract."""
    import hashlib

    import pytest

    from rca_data_tools_spark.operators.multimodal import (
        attach_binary,
        decode_image,
        resize_stub,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, ""), (3, "xyz" * 40)], "doc_id long, text string"
    )
    media = attach_binary(docs, "doc_id", "text")
    frames = {(r["doc_id"], r["frame_idx"]): r for r in sample_frames(media, stride=2).collect()}
    # doc 1: 10 bytes -> n_frames = 1 + 10 % 7 = 4, fsize = 2, sampled idx {0, 2}
    assert {(d, i) for d, i in frames if d == 1} == {(1, 0), (1, 2)}
    assert frames[(1, 0)]["frame_len"] == 2
    assert frames[(1, 0)]["frame_md5"] == hashlib.md5(b"ab".hex().upper().encode()).hexdigest()
    assert frames[(1, 2)]["frame_md5"] == hashlib.md5(b"ef".hex().upper().encode()).hexdigest()
    # empty payload: one empty frame, md5 of empty string
    assert frames[(2, 0)]["frame_len"] == 0
    assert frames[(2, 0)]["frame_md5"] == hashlib.md5(b"").hexdigest()

    originals = {1: b"abcdefghij", 2: b"", 3: b"xyz" * 40}
    rs = {r["doc_id"]: r for r in resize_stub(media, 32, 32).collect()}
    for did, r in rs.items():
        assert max(r["out_w"], r["out_h"]) <= 32
        assert bytes(r["media_bytes"]) == originals[did]  # payload rides through untouched
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_ewma_matches_pandas_ewm(spark):
    """frameq's recurrence equals pandas ewm(alpha, adjust=False) bitwise."""
    import pandas as pd

    from rca_data_tools_spark.queries.frameq import EWMA_ALPHA, _ewma_group

    rng = pd.DataFrame(
        {
            "user_id": [1] * 50,
            "ts": pd.date_range("2024-01-01", periods=50, freq="h"),
            "event_id": range(50),
            "value": [((i * 37) % 101) / 7.0 for i in range(50)],
        }
    )
    out = _ewma_group(rng)
    expected = rng["value"].ewm(alpha=EWMA_ALPHA, adjust=False).mean()
    assert (out["ewma"].to_numpy() == expected.to_numpy()).all()


def test_decode_image_routes_through_pillow_when_present(monkeypatch):
    """decode_image probes for Pillow at call time: with a PIL module
    present it decodes; without one it raises the loud capability error.
    (Driver-side unit check of the routing — the end-to-end kernel test
    below runs when real Pillow is installed.)"""
    import sys
    import types

    from rca_data_tools_spark.operators import multimodal

    class _FakeImg:
        size = (8, 4)

        def convert(self, mode):
            assert mode == "L"
            return self

        def histogram(self):
            h = [0] * 256
            h[10] = 16  # 16 px of luma 10, 16 px of luma 30 -> mean 20
            h[30] = 16
            return h

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    fake_pil = types.ModuleType("PIL")
    fake_image_mod = types.ModuleType("PIL.Image")
    fake_image_mod.open = lambda fp: _FakeImg()
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)
    w, h, luma = multimodal.decode_image(b"\x89PNG fake")
    assert (w, h) == (8, 4) and luma == pytest.approx(20.0)

    monkeypatch.delitem(sys.modules, "PIL")
    monkeypatch.delitem(sys.modules, "PIL.Image")
    monkeypatch.setattr(multimodal, "_pillow", lambda: None)
    with pytest.raises(NotImplementedError, match="Pillow"):
        multimodal.decode_image(b"\x89PNG fake")


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("PIL") is None,
    reason="Pillow not installed in this runtime",
)
def test_extract_image_features_real_png(spark):
    """With real Pillow installed, a real PNG flows through the SAME
    mapInPandas kernel shape as the stub path and yields true geometry."""
    import io

    from PIL import Image

    from rca_data_tools_spark.operators.multimodal import extract_image_features

    buf = io.BytesIO()
    Image.new("L", (12, 7), color=128).save(buf, format="PNG")
    png = buf.getvalue()
    media = spark.createDataFrame(
        [(1, bytearray(png), "image/png")],
        "doc_id long, media_bytes binary, media_type string",
    )
    row = extract_image_features(media).collect()[0]
    assert (row["width"], row["height"]) == (12, 7)
    assert row["n_frames"] == 1 and row["byte_len"] == len(png)
    assert row["mean_luma"] == pytest.approx(128.0)


def test_synth_wav_is_real_riff_and_decodes_back():
    """synth_wav writes a genuine RIFF/WAVE container (stdlib encoder) and
    decode_audio RIFF-parses it back: geometry and PCM bytes round-trip."""
    from rca_data_tools_spark.operators.multimodal import decode_audio, synth_wav

    blob = synth_wav(7, 120)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    nch, rate, n, frames = decode_audio(blob)
    assert (nch, rate, n) == (1, 8000, 120)
    assert frames == bytes((7 * 7 + i * 13) % 256 for i in range(120))


def test_extract_audio_features_matches_hand_computation(spark):
    """The mapInPandas kernel's decoded statistics equal a direct numpy
    computation on the known PCM sequence."""
    import numpy as np

    from rca_data_tools_spark.operators.multimodal import (
        attach_audio,
        extract_audio_features,
    )

    docs = spark.createDataFrame([(3, 200), (11, 64)], "doc_id long, n_samples int")
    rows = {r["doc_id"]: r for r in
            extract_audio_features(attach_audio(docs, "doc_id", "n_samples")).collect()}
    for did, n in ((3, 200), (11, 64)):
        c = np.array([(did * 7 + i * 13) % 256 for i in range(n)], dtype=np.int64) - 128
        r = rows[did]
        assert r["sample_rate"] == 8000 and r["n_samples"] == n
        assert r["duration_ms"] == n * 1000.0 / 8000
        assert r["mean_amp"] == float(c.sum()) / n
        assert r["rms_amp"] == float(np.sqrt(float((c * c).sum()) / n))
        neg = c < 0
        assert r["zero_crossings"] == int((neg[1:] != neg[:-1]).sum())


def test_zorder_bounds_both_dimensions_where_single_sort_cannot(spark):
    """Morton-key bucketing must keep BOTH dimensions' spans near 1/4 of
    their global range across all 16 buckets; bucketing by one dimension
    alone leaves the other unbounded (span ~ global). This is the footer
    min/max locality that makes multi-dim file skipping work."""
    from pyspark.sql import functions as F

    from rca_data_tools_spark.operators.layout import bin_to, zorder_key

    from tests.conftest import SF_CORRECTNESS
    from rca_data_tools_spark.sources.readers import load_table

    li = load_table(spark, SF_CORRECTNESS, "lineitem").select(
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1995-01-01").cast("date")).alias("d"),
        F.col("l_partkey").alias("p"),
    )
    stats = li.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"),
                   F.min("p").alias("pmin"), F.max("p").alias("pmax"))
    srow = stats.collect()[0]
    d_global = srow["dmax"] - srow["dmin"]
    p_global = srow["pmax"] - srow["pmin"]
    j = li.crossJoin(F.broadcast(stats))
    da = bin_to(F.col("d"), F.col("dmin"), F.col("dmax"), 8)
    pa = bin_to(F.col("p"), F.col("pmin"), F.col("pmax"), 8)

    def spans(bucket_col):
        rows = (
            j.select("d", "p", bucket_col.alias("b"))
            .groupBy("b")
            .agg((F.max("d") - F.min("d")).alias("ds"), (F.max("p") - F.min("p")).alias("ps"))
            .collect()
        )
        n = len(rows)
        return sum(r["ds"] for r in rows) / n, sum(r["ps"] for r in rows) / n

    zd, zp = spans(F.shiftright(zorder_key(da, pa, 8), 12))       # 16 Morton buckets
    sd, sp_ = spans(F.shiftright(pa, 4))                          # 16 partkey-only buckets
    # Morton: both dims ~1/4 of global
    assert zd <= 0.3 * d_global and zp <= 0.3 * p_global, (zd, zp, d_global, p_global)
    # single-dim: own dim tight, the OTHER dim stays ~global
    assert sp_ <= 0.1 * p_global
    assert sd >= 0.9 * d_global, (sd, d_global)


def test_ivf_pq_batch_matches_literal_path(spark):
    """The broadcast-LUT batch face returns EXACTLY the literal-LUT face's
    rows (same index, same rounding, same IEEE fold order) — so swapping
    faces by batch size can never change results."""
    from rca_data_tools_spark.operators.similarity import ivf_pq_batch_topk, ivf_pq_topk
    from rca_data_tools_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "embeddings")
    q = e.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    kw = dict(id_col="vec_id", vec_col="embedding", k=5,
              n_lists=16, stride=29, nprobe=4, n_candidates=32)
    lit = sorted(map(tuple, ivf_pq_topk(e, q, **kw).collect()))
    bat = sorted(map(tuple, ivf_pq_batch_topk(e, q, **kw).collect()))
    assert bat == lit
    assert len(bat) == 25 * 5


def test_ivf_pq_batch_plan_is_query_count_independent(spark):
    """The batch face's physical plan must not grow with the query count
    (the literal face embeds one LUT per query in the plan): a 20x larger
    batch compiles to essentially the same plan text."""
    from rca_data_tools_spark.operators.similarity import ivf_pq_batch_topk
    from rca_data_tools_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "embeddings")

    def plan_len(nq: int) -> int:
        q = e.filter(F.col("vec_id") < nq).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        df = ivf_pq_batch_topk(
            e, q, id_col="vec_id", vec_col="embedding", k=5,
            n_lists=16, stride=29, nprobe=4, n_candidates=32,
        )
        return len(df._jdf.queryExecution().executedPlan().toString())

    small, large = plan_len(10), plan_len(200)
    assert large <= small * 1.2, (small, large)


def test_salted_join_matches_plain_and_exchanges_on_salt(spark):
    """salted_equi_join must return exactly the plain join's rows, and its
    physical plan must exchange on (key, salt) — the whole point: a hot
    key's rows spread across n_salts partitions instead of one."""
    from pyspark.sql import functions as F

    from rca_data_tools_spark.operators.skew import SALT_COL, salted_equi_join

    left = spark.range(5000).select(
        (F.col("id") % 3).cast("string").alias("k"),  # 3 hot keys
        F.col("id").alias("lv"),
    )
    right = spark.range(300).select(
        (F.col("id") % 3).cast("string").alias("k"),
        F.col("id").alias("rv"),
    )
    salted = salted_equi_join(left, right, ["k"], n_salts=8)
    plain = left.join(right, "k")
    assert salted.exceptAll(plain).isEmpty() and plain.exceptAll(salted).isEmpty()

    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert SALT_COL in plan.split("Exchange hashpartitioning", 1)[-1][:200], plan[:2000]

    # left join: unmatched left rows survive exactly once
    l2 = left.unionByName(
        spark.createDataFrame([("zz", -1)], "k string, lv long")
    )
    s2 = salted_equi_join(l2, right, ["k"], n_salts=8, how="left")
    p2 = l2.join(right, "k", "left")
    assert s2.exceptAll(p2).isEmpty() and p2.exceptAll(s2).isEmpty()
