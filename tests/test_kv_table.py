"""Object-store data plane (sources/kv_table.py): the version chain's DML
run against the conditional-PUT key-value store — pointer-link carry, blob
dedup across versions, cache-independence of the bytes, and refcount GC."""

from __future__ import annotations

import os
import tempfile

import pytest

from rca_data_tools_spark.sources.commit_store import MemoryKVCommitStore
from rca_data_tools_spark.sources.kv_http import HttpKVCommitStore, LocalKVServer
from rca_data_tools_spark.sources.kv_table import KVTable, table_totals
from rca_data_tools_spark.sources.sinks import merge_upsert

DDL = "k bigint, v double"


@pytest.fixture(params=["memory", "http"])
def kv_store(request):
    """Every test runs against BOTH substrates: the in-memory conditional-
    PUT model and the live HTTP object store (VERDICT r10 item 5's done
    criterion) — same protocol code, five object primitives swapped."""
    if request.param == "memory":
        yield MemoryKVCommitStore()
    else:
        with LocalKVServer(tempfile.mkdtemp(prefix="kvsrv_")) as srv:
            yield HttpKVCommitStore(srv.url)


def _df(spark, n=4096):
    return spark.createDataFrame([(i, float(i % 100)) for i in range(n)], DDL)


def _mk(spark, store, tmp=None):
    t = KVTable(store, tmp or tempfile.mkdtemp(prefix="kvt_"))
    t.create(_df(spark), zone_key="k", n_files=8)
    return store, t


def test_kv_chain_content_roundtrip(spark, kv_store):
    store, t = _mk(spark, kv_store)
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


def test_kv_merge_carries_by_pointer_not_bytes(spark, kv_store):
    store, t = _mk(spark, kv_store)
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


def test_kv_delete_uploads_only_vectors(spark, kv_store):
    store, t = _mk(spark, kv_store)
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


def test_kv_bytes_live_in_store_not_cache(spark, kv_store):
    store, t = _mk(spark, kv_store)
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


def test_kv_materialize_is_cached(spark, kv_store):
    store, t = _mk(spark, kv_store)
    d1 = t.materialize(0)
    ino = {f: os.stat(os.path.join(d1, f)).st_ino for f in os.listdir(d1)}
    d2 = t.materialize(0)
    assert d1 == d2
    assert {f: os.stat(os.path.join(d2, f)).st_ino for f in os.listdir(d2)} == ino


def test_kv_vacuum_refcounts_blobs(spark, kv_store):
    store, t = _mk(spark, kv_store)
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


def test_kv_create_refuses_existing(spark, kv_store):
    store, t = _mk(spark, kv_store)
    with pytest.raises(RuntimeError, match="already exists"):
        KVTable(store, t.cache_dir).create(_df(spark, 10))


def test_kv_restore_is_pointer_surgery(spark, kv_store):
    store, t = _mk(spark, kv_store)
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


def test_kv_create_releases_claim_on_failure(spark, kv_store):
    """A failed initial write must not leave the store permanently
    uncreatable (VERDICT r10: create leaked its v0 claim)."""
    t = KVTable(kv_store, tempfile.mkdtemp(prefix="kvt_fail_"))
    bad = _df(spark, 10).selectExpr("k", "v / (k - k) as v")  # div by zero -> NaN ok
    # force a real failure: a DataFrame whose write raises (bad column ref)
    import pyspark.sql.utils

    class Boom(Exception):
        pass

    orig = t._publish_dir

    def _boom(ver, out_dir):
        raise Boom("upload exploded")

    t._publish_dir = _boom
    with pytest.raises(Boom):
        t.create(_df(spark, 10), zone_key="k", n_files=2)
    t._publish_dir = orig
    # claim released: the retry succeeds without manual surgery
    out = t.create(_df(spark, 10), zone_key="k", n_files=2)
    assert out["version"] == 0
    assert kv_store.committed() == [0]


def test_kv_pointer_carry_survives_process_restart(spark, kv_store):
    """ADVICE r10: a NEW KVTable instance over an EXISTING cache dir must
    re-learn inode->blob mappings — carried files stay pointer links with
    zero re-uploaded bytes, not silent re-uploads."""
    cache = tempfile.mkdtemp(prefix="kvt_restart_")
    store, t = _mk(spark, kv_store, tmp=cache)
    # "restart": fresh adapter, SAME cache dir (materialized v0 present)
    t2 = KVTable(store, cache)
    src = spark.createDataFrame([(3, 777.0)], DDL)
    stats = t2.merge(spark, src, ["k"], DDL, zone_key="k")
    assert stats["pointer_links"] >= 6
    assert stats["new_blobs"] <= 3  # rewritten part(s) + manifest only
    # and the carried entries resolve to the ORIGINAL v0 blobs
    v0, v1 = store.list_files(0), store.list_files(1)
    assert sum(1 for n in v0 if v1.get(n) == v0[n]) >= 6


def test_kv_lease_takeover_unwedges_crashed_writer(spark, kv_store):
    """VERDICT r10 item 7: a killed writer's claim is taken over via the
    lease (conditional PUT of the successor generation) without manual
    surgery."""
    import time as _time

    from rca_data_tools_spark.sources.commit_store import advance

    store, t = _mk(spark, kv_store)
    # a writer claims v1 then dies (no publish, no release)
    assert store.try_claim(1)
    _time.sleep(0.15)
    src = spark.createDataFrame([(3, 555.0)], DDL)

    def _build(base, ver):
        base_dir = t.materialize(base)
        out_dir = os.path.join(t.cache_dir, f"v{ver}")
        import shutil as _sh

        _sh.rmtree(out_dir, ignore_errors=True)
        from rca_data_tools_spark.sources.sinks import merge_upsert_pruned

        stats = merge_upsert_pruned(
            spark, base_dir, out_dir, src, ["k"], DDL, zone_key="k"
        )
        return {**stats, **t._publish_dir(ver, out_dir)}

    out = advance(store, _build, op="merge", lease_ttl=0.1)
    assert out["version"] == 1
    marker = store.read_marker(1)
    assert marker["op"] == "merge" and marker["gen"] == 1  # the takeover gen
    got = t.read(spark, DDL).filter("k = 3").collect()
    assert [(r["k"], r["v"]) for r in got] == [(3, 555.0)]
    # a FRESH cache resolves the taken-over version's manifest correctly
    t2 = KVTable(store, tempfile.mkdtemp(prefix="kvt_to_"))
    assert t2.read(spark, DDL).filter("k = 3").collect()[0]["v"] == 555.0


def test_kv_executor_side_blob_fetch(spark):
    """VERDICT r10 item 6: a cold-cache materialize on a URL-capable store
    fetches blobs in PARALLEL EXECUTOR TASKS (streaming GETs into the
    shared pool); the driver moves only the pointer list."""
    with LocalKVServer(tempfile.mkdtemp(prefix="kvsrv_x_")) as srv:
        store = HttpKVCommitStore(srv.url)
        t = KVTable(store, tempfile.mkdtemp(prefix="kvt_w_"))
        t.create(_df(spark), zone_key="k", n_files=8)
        expected = sorted(map(tuple, t.read(spark, DDL).collect()))
        # cold cache: fresh adapter, executor-side fetch
        t2 = KVTable(store, tempfile.mkdtemp(prefix="kvt_cold_"))
        files = store.list_files(0)
        records = t2._fetch_missing_distributed(spark, files)
        assert records is not None and len(records) == len(set(files.values()))
        parts = {p for (_, _, p) in records}
        assert len(parts) >= 4  # genuinely parallel tasks, not one loop
        assert all(n > 0 for (_, n, _) in records)  # each task fetched bytes
        # the materialize that follows is pure hardlinks + zero re-fetch
        vdir = t2.materialize(0, spark=spark)
        again = t2._fetch_missing_distributed(spark, files)
        assert again is None  # warm pool: nothing to fetch
        got = sorted(map(tuple, t2.read(spark, DDL).collect()))
        assert got == expected


def test_kv_range_scan_prunes_from_manifest(spark, kv_store):
    """The manifest-pruned range read composes with the data plane: the
    zone-map sidecar rides the pointer list, pruning opens only candidate
    files, and the result matches the full-scan filter exactly."""
    store, t = _mk(spark, kv_store)
    rows, stats = t.range_scan(spark, "k", 100, 200, DDL)
    assert stats["files_scanned"] < stats["files_total"]
    exp = sorted(
        map(tuple, t.read(spark, DDL).filter("k between 100 and 200").collect())
    )
    assert sorted(map(tuple, rows.collect())) == exp
