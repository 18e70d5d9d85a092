"""Per-file bloom index (sources/bloom_index.py): pruning with zero false
negatives, DV composition, sidecar carry through the chain DMLs, and the
always-candidate rule for unindexed files."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rca_data_tools_spark.sources.bloom_index import (
    bloom_candidate_files,
    build_bloom_index,
    has_bloom_index,
    point_lookup,
)
from rca_data_tools_spark.sources.sinks import (
    create_table,
    delete_into_table,
    latest_committed,
    merge_into_table,
    read_version,
)

DDL = "k bigint, grp string, val double"


def _write(spark, path, n=4000, parts=8):
    spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("g"), (F.col("id") % 7).cast("string")).alias("grp"),
        (F.col("id") * 0.5).alias("val"),
    ).repartition(parts).write.parquet(path)


def test_lookup_prunes_files_and_misses_nothing(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path)
    n_indexed = build_bloom_index(spark, path, "k", schema_ddl=DDL)
    assert n_indexed == 8 and has_bloom_index(path)

    values = [3, 1777, 3999]
    cands, total = bloom_candidate_files(spark, path, "k", values)
    assert total == 8
    # each value lives in exactly one of 8 hash-partitioned files; with
    # 64 Kbit filters over ~500 keys/file the fp rate is ~0 — pruning must
    # actually bite (deterministic: fixed data + fixed seeds)
    assert len(cands) < total

    df, stats = point_lookup(spark, path, "k", values, DDL)
    assert stats["files_scanned"] == len(cands)
    assert sorted(r["k"] for r in df.collect()) == values

    # absent keys return empty, never an error
    df2, _ = point_lookup(spark, path, "k", [10**12], DDL)
    assert df2.count() == 0


def test_lookup_composes_with_deletion_vectors(spark, tmp_path):
    root = str(tmp_path / "chain")
    base = spark.range(1000).select(
        F.col("id").alias("k"),
        F.lit("g").alias("grp"),
        F.col("id").cast("double").alias("val"),
    )
    create_table(base.repartition(4), root)
    v0 = os.path.join(root, "v0")
    build_bloom_index(spark, v0, "k", schema_ddl=DDL)
    delete_into_table(spark, root, "k = 42", DDL)  # v1: DV + carried bloom

    v1 = os.path.join(root, "v1")
    assert has_bloom_index(v1)  # hardlink carry
    df, stats = point_lookup(spark, v1, "k", [41, 42, 43], DDL)
    assert sorted(r["k"] for r in df.collect()) == [41, 43]  # 42 stays deleted
    assert stats["files_scanned"] <= stats["files_total"]


def test_merge_drops_rewritten_files_from_index(spark, tmp_path):
    root = str(tmp_path / "chain")
    base = spark.range(1000).select(
        F.col("id").alias("k"),
        F.lit("g").alias("grp"),
        F.col("id").cast("double").alias("val"),
    )
    create_table(base, root, zone_key="k", n_files=4)
    build_bloom_index(spark, os.path.join(root, "v0"), "k", schema_ddl=DDL)

    batch = spark.range(10).select(
        F.col("id").alias("k"), F.lit("gM").alias("grp"), F.lit(-1.0).alias("val")
    )
    merge_into_table(spark, root, batch, ["k"], DDL, zone_key="k")
    v1 = os.path.join(root, f"v{latest_committed(root)}")

    # the rewritten file's row is gone; its replacement part is unindexed
    # and therefore an always-candidate — lookups stay exact either way
    df, stats = point_lookup(spark, v1, "k", [5, 700], DDL)
    got = {r["k"]: r["grp"] for r in df.collect()}
    assert got == {5: "gM", 700: "g"}
    assert stats["files_scanned"] <= stats["files_total"]
    assert read_version(spark, root, DDL).count() == 1000


def test_unindexed_table_scans_everything(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path, n=100, parts=3)
    cands, total = bloom_candidate_files(spark, path, "k", [1])
    assert cands == sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    df, stats = point_lookup(spark, path, "k", [1], DDL)
    assert stats["files_scanned"] == total == 3
    assert df.count() == 1


def test_multiple_key_indexes_compose(spark, tmp_path):
    """Building an index on a second key must keep the first key's rows
    (per-key rebuild, never a destroy), and lookups pick the right filter
    by key — a key with no index falls back to scanning every file."""
    path = str(tmp_path / "t")
    _write(spark, path, n=2000, parts=6)
    build_bloom_index(spark, path, "k", schema_ddl=DDL)
    build_bloom_index(spark, path, "grp", schema_ddl=DDL)

    # both keys prune and both lookups are exact
    df_k, st_k = point_lookup(spark, path, "k", [7, 1234], DDL)
    assert sorted(r["k"] for r in df_k.collect()) == [7, 1234]
    assert st_k["files_scanned"] < st_k["files_total"]
    df_g, st_g = point_lookup(spark, path, "grp", ["g3"], DDL)
    assert df_g.count() == 2000 // 7 + (1 if 3 < 2000 % 7 else 0)
    # low-cardinality key: every file contains g3, no pruning expected —
    # but correctness must hold either way
    assert st_g["files_scanned"] <= st_g["files_total"]

    # a key with no index scans everything, exactly
    df_v, st_v = point_lookup(spark, path, "val", [3.5], DDL)
    assert st_v["files_scanned"] == st_v["files_total"]
    assert df_v.count() == 1


def test_chain_schema_evolution_reads_old_files_as_null(spark, tmp_path):
    """Schema evolution on the version chain: merging with an EVOLVED
    schema_ddl (new column) reads pre-evolution files as NULL for the new
    column — carried hardlinks included — and the merge lands source
    values for its rows. Old versions keep reading with their own DDL."""
    from pyspark.sql import functions as F

    from rca_data_tools_spark.sources.sinks import (
        create_table, merge_into_table, read_version,
    )

    old_ddl = "k bigint, grp string, val double"
    new_ddl = "k bigint, grp string, val double, score double"
    base = spark.range(100).select(
        F.col("id").alias("k"),
        F.lit("g").alias("grp"),
        F.col("id").cast("double").alias("val"),
    )
    root = str(tmp_path / "chain")
    create_table(base, root, zone_key="k", n_files=4)

    batch = spark.range(90, 105).select(
        F.col("id").alias("k"), F.lit("gN").alias("grp"),
        F.lit(0.0).alias("val"), F.lit(0.9).alias("score"),
    )
    merge_into_table(spark, root, batch, ["k"], new_ddl, zone_key="k")

    tip = read_version(spark, root, new_ddl)
    assert tip.count() == 105
    assert tip.filter(F.col("score").isNotNull()).count() == 15  # batch rows
    assert tip.filter((F.col("k") < 90) & F.col("score").isNotNull()).count() == 0
    # the pre-evolution version still reads with its own schema
    assert read_version(spark, root, old_ddl, n=0).count() == 100


def test_bloom_rebuild_parallelizes_and_touches_only_its_key(spark, tmp_path):
    """VERDICT r09 item 8: the sidecar rebuild must (a) write multiple
    part files when the sidecar exceeds the per-part byte target (the
    million-file table's 8 GB sidecar must not serialize on one task),
    and (b) replace ONLY the rebuilt key's parts — the other key's part
    files stay byte-identical (same inode, never read or rewritten)."""
    import os

    from rca_data_tools_spark.sources.bloom_index import (
        bloom_candidate_files, build_bloom_index,
    )

    tdir = str(tmp_path / "t")
    df = spark.range(4000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("u")
    )
    df.repartition(8).write.parquet(tdir)

    # tiny per-part target forces a multi-part write: 8 files x ~8KB
    # filters / 16KB target -> >= 4 parts
    n = build_bloom_index(spark, tdir, "k", m_bits=1 << 16,
                          target_bytes=1 << 14)
    bdir = os.path.join(tdir, "_bloom")
    k_parts = [f for f in os.listdir(bdir)
               if f.startswith("key-k-") and f.endswith(".parquet")]
    assert n == 8 and len(k_parts) > 1

    # second key: k's parts must survive untouched (inode identity)
    k_inodes = {f: os.stat(os.path.join(bdir, f)).st_ino for f in k_parts}
    build_bloom_index(spark, tdir, "u", m_bits=1 << 16)
    assert {
        f: os.stat(os.path.join(bdir, f)).st_ino
        for f in os.listdir(bdir)
        if f.startswith("key-k-") and f.endswith(".parquet")
    } == k_inodes

    # both keys probe correctly after the split-part layout
    ck, tot = bloom_candidate_files(spark, tdir, "k", [17])
    cu, _ = bloom_candidate_files(spark, tdir, "u", [51])
    assert tot == 8 and 0 < len(ck) < 8 and 0 < len(cu) < 8

    # rebuild of k replaces its parts, leaves u's alone
    u_inodes = {
        f: os.stat(os.path.join(bdir, f)).st_ino
        for f in os.listdir(bdir) if f.startswith("key-u-")
    }
    build_bloom_index(spark, tdir, "k", m_bits=1 << 16)
    assert {
        f: os.stat(os.path.join(bdir, f)).st_ino
        for f in os.listdir(bdir) if f.startswith("key-u-")
    } == u_inodes
