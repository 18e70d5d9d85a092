"""Object-store data plane (sources/kv_table.py): the version chain's DML
run against the conditional-PUT key-value store — pointer-link carry, blob
dedup across versions, cache-independence of the bytes, and refcount GC."""

from __future__ import annotations

import os
import tempfile

import pytest

from rca_data_tools_spark.sources.commit_store import MemoryKVCommitStore
from rca_data_tools_spark.sources.kv_table import KVTable, table_totals
from rca_data_tools_spark.sources.sinks import merge_upsert

DDL = "k bigint, v double"


def _df(spark, n=4096):
    return spark.createDataFrame([(i, float(i % 100)) for i in range(n)], DDL)


def _mk(spark, tmp=None):
    store = MemoryKVCommitStore()
    t = KVTable(store, tmp or tempfile.mkdtemp(prefix="kvt_"))
    t.create(_df(spark), zone_key="k", n_files=8)
    return store, t


def test_kv_chain_content_roundtrip(spark):
    store, t = _mk(spark)
    src = spark.createDataFrame(
        [(i, 9999.0) for i in range(0, 100, 3)] + [(10_000, 1.0)], DDL
    )
    t.merge(spark, src, ["k"], DDL, zone_key="k")
    t.delete_where(spark, "k % 13 = 0", DDL)
    got = sorted(map(tuple, t.read(spark, DDL).collect()))
    exp = sorted(
        (k, v)
        for k, v in map(tuple, merge_upsert(_df(spark), src, ["k"]).collect())
        if k % 13 != 0
    )
    assert got == exp
    assert [h["op"] for h in t.history()] == ["create", "merge", "delete"]


def test_kv_merge_carries_by_pointer_not_bytes(spark):
    store, t = _mk(spark)
    # narrow merge: one key -> at most 1-2 files rewrite, the rest must be
    # pointer links with ZERO re-uploaded bytes
    src = spark.createDataFrame([(3, 12345.0)], DDL)
    stats = t.merge(spark, src, ["k"], DDL, zone_key="k")
    assert stats["pointer_links"] >= 6  # >= files_total - rewritten
    assert stats["files_rewritten"] <= 2
    # a pointer-linked file is the SAME blob object in both versions
    v0, v1 = store.list_files(0), store.list_files(1)
    shared = {n for n in v0 if n in v1 and v0[n] == v1[n]}
    assert len(shared) >= 6
    tot = table_totals(store)
    assert tot["physical_bytes"] < tot["logical_bytes"]  # dedup is real


def test_kv_delete_uploads_only_vectors(spark):
    store, t = _mk(spark)
    stats = t.delete_where(spark, "k % 7 = 0", DDL)
    # every data file and the manifest ride pointer links; only the DV
    # sidecar parts are new bytes
    assert stats["files_rewritten"] == 0
    assert stats["pointer_links"] >= 8 + 1  # 8 data files + manifest
    new_names = [
        n for n, b in store.list_files(1).items() if b.startswith("v1/")
    ]
    assert new_names and all(n.startswith("__deletes__/") for n in new_names)
    got = t.read(spark, DDL).filter("k % 7 = 0").count()
    assert got == 0


def test_kv_bytes_live_in_store_not_cache(spark):
    store, t = _mk(spark)
    t.merge(
        spark, spark.createDataFrame([(5, 1.0), (9000, 2.0)], DDL),
        ["k"], DDL, zone_key="k",
    )
    t.delete_where(spark, "k = 10", DDL)
    expected = sorted(map(tuple, t.read(spark, DDL).collect()))
    # a FRESH adapter with an EMPTY cache on the same store must reproduce
    # the table exactly — proof the cache holds no authoritative state
    t2 = KVTable(store, tempfile.mkdtemp(prefix="kvt_fresh_"))
    got = sorted(map(tuple, t2.read(spark, DDL).collect()))
    assert got == expected


def test_kv_materialize_is_cached(spark):
    store, t = _mk(spark)
    d1 = t.materialize(0)
    ino = {f: os.stat(os.path.join(d1, f)).st_ino for f in os.listdir(d1)}
    d2 = t.materialize(0)
    assert d1 == d2
    assert {f: os.stat(os.path.join(d2, f)).st_ino for f in os.listdir(d2)} == ino


def test_kv_vacuum_refcounts_blobs(spark):
    store, t = _mk(spark)
    src = spark.createDataFrame([(3, 12345.0)], DDL)
    t.merge(spark, src, ["k"], DDL, zone_key="k")
    # every blob referenced by v0 or v1 -> nothing to collect
    assert t.vacuum_blobs()["removed"] == []
    # drop v0's pointer list (retention expiring the old version), then the
    # file v1 REWROTE (v0-only blob) is garbage; shared blobs survive
    n_before = table_totals(store)["n_blobs"]
    store.release_claim(0)
    removed = t.vacuum_blobs()["removed"]
    assert removed  # at least the rewritten file's old blob + old manifest
    assert table_totals(store)["n_blobs"] == n_before - len(removed)
    got = t.read(spark, DDL).filter("k = 3").collect()
    assert [(r["k"], r["v"]) for r in got] == [(3, 12345.0)]


def test_kv_create_refuses_existing(spark):
    store, t = _mk(spark)
    with pytest.raises(RuntimeError, match="already exists"):
        KVTable(store, t.cache_dir).create(_df(spark, 10))


def test_kv_restore_is_pointer_surgery(spark):
    store, t = _mk(spark)
    v0_content = sorted(map(tuple, t.read(spark, DDL, ver=0).collect()))
    t.merge(spark, spark.createDataFrame([(3, 12345.0)], DDL), ["k"], DDL,
            zone_key="k")
    t.delete_where(spark, "k % 10 = 0", DDL)
    n_blobs_before = table_totals(store)["n_blobs"]
    out = t.restore(0)
    assert out["restored_to"] == 0 and out["version"] == 3
    # zero new blobs: restore copied pointers, never bytes
    assert table_totals(store)["n_blobs"] == n_blobs_before
    # the restored tip reads exactly like v0 (a fresh cache proves the
    # pointers alone carry it)
    t2 = KVTable(store, tempfile.mkdtemp(prefix="kvt_r_"))
    assert sorted(map(tuple, t2.read(spark, DDL).collect())) == v0_content
    # v0's pointer list and v3's name the same blobs
    assert store.list_files(3) == store.list_files(0)
    with pytest.raises(ValueError, match="not a committed version"):
        t.restore(99)
