"""Full-clause MERGE (merge_full / merge_full_pruned / merge_table_full):
conditional WHEN MATCHED UPDATE/DELETE, conditional INSERT, and the
NOT-MATCHED-BY-SOURCE clauses — semantics vs a hand model, pruning of the
two candidate halves, deletion-vector composition, and the chain DML's
constraint/claim behavior."""

from __future__ import annotations

import os
import tempfile

import pytest
import pyspark.sql.functions as F

from rca_data_tools_spark.sources.sinks import (
    create_table,
    committed_versions,
    merge_full,
    merge_full_pruned,
    merge_table_full,
    merge_upsert,
    table_history,
)

DDL = "k long, u long, v double"


def _tgt(spark, n=40):
    return spark.createDataFrame(
        [(i, i % 7, float(i * 10)) for i in range(n)], DDL
    )


def _src(spark):
    rows = [(k, 50, float(k * 10 + (5 if k % 2 == 0 else -5))) for k in range(10)]
    rows += [(11, 50, -1.0), (13, 50, -1.0)]  # matched deletes (sentinel)
    rows += [(100 + i, 9, float(i * 40)) for i in range(5)]  # inserts
    return spark.createDataFrame(rows, DDL)


CLAUSES = dict(
    matched_update_cond="s.v > t.v",
    matched_delete_cond="s.v = -1.0",
    insert_cond="v > 50",
    nmbs_update_set={"u": "u + 1000"},
    nmbs_update_cond="v >= 250",
    nmbs_delete_cond="v < 110 and v > 100",
)


def _model(tgt_rows, src_rows):
    """The clause semantics, row at a time."""
    src = {r[0]: r for r in src_rows}
    tkeys = {r[0] for r in tgt_rows}
    out = []
    for k, u, v in tgt_rows:
        if k in src:
            _, su, sv = src[k]
            if sv == -1.0:
                continue  # matched delete (checked first)
            out.append((k, su, sv) if sv > v else (k, u, v))
        else:
            if 100 < v < 110:
                continue  # nmbs delete
            out.append((k, u + 1000 if v >= 250 else u, v))
    for k, (_, su, sv) in src.items():
        if k not in tkeys and sv > 50:
            out.append((k, su, sv))
    return sorted(out)


def test_merge_full_matches_model(spark):
    tgt, src = _tgt(spark), _src(spark)
    got = sorted(
        (r["k"], r["u"], r["v"])
        for r in merge_full(tgt, src, ["k"], **CLAUSES).collect()
    )
    exp = _model(
        [(r["k"], r["u"], r["v"]) for r in tgt.collect()],
        [(r["k"], r["u"], r["v"]) for r in src.collect()],
    )
    assert got == exp
    # every clause actually fired in this fixture
    ks = {k for k, _, _ in got}
    assert 11 not in ks and 13 not in ks            # matched deletes
    assert (0, 50, 5.0) in got                      # improving update took source
    assert (1, 1, 10.0) in got                      # non-improving kept target
    assert 100 not in ks and 102 in ks              # insert_cond: v=0 no, v=80 yes
    assert any(u > 1000 for _, u, _ in got)         # nmbs update fired
    assert all(not (100 < v < 110) for k, _, v in got if k not in range(10))


def test_merge_full_default_is_upsert(spark):
    tgt, src = _tgt(spark), _src(spark)
    a = sorted(map(tuple, merge_upsert(tgt, src, ["k"]).collect()))
    b = sorted(map(tuple, merge_full(tgt, src, ["k"]).collect()))
    assert a == b


def test_merge_full_null_conditions_never_fire(spark):
    # NULL comparison results keep the target row / skip the insert on
    # BOTH engines (SQL WHEN semantics)
    tgt = spark.createDataFrame([(1, 1, None), (2, 2, 5.0)], DDL)
    src = spark.createDataFrame([(1, 9, 99.0), (3, 9, None)], DDL)
    got = sorted(
        (r["k"], r["u"], r["v"])
        for r in merge_full(
            tgt, src, ["k"],
            matched_update_cond="s.v > t.v", insert_cond="v > 0",
        ).collect()
    )
    # k=1: t.v NULL -> cond NULL -> target kept; k=3: insert_cond NULL -> dropped
    assert got == [(1, 1, None), (2, 2, 5.0)]


def test_merge_full_validation(spark):
    tgt, src = _tgt(spark), _src(spark)
    with pytest.raises(ValueError, match="nmbs_update_cond"):
        merge_full(tgt, src, ["k"], nmbs_update_cond="v > 0")
    with pytest.raises(ValueError, match="value columns"):
        merge_full(tgt, src, ["k"], nmbs_update_set={"k": "k + 1"})
    dup = src.union(src.limit(1))
    with pytest.raises(Exception, match="duplicate keys"):
        merge_full(tgt, dup, ["k"]).collect()


def _chain(spark, tmp, n=4096, n_files=8):
    root = os.path.join(tmp, "t")
    os.makedirs(root)
    df = spark.createDataFrame(
        [(i, i % 7, float(i % 1000)) for i in range(n)], DDL
    )
    create_table(df, root, zone_key="k", n_files=n_files)
    return root, df


def test_merge_full_pruned_matches_unpruned(spark):
    tmp = tempfile.mkdtemp(prefix="mf_")
    root, df = _chain(spark, tmp)
    src = spark.createDataFrame(
        [(i, 50, float(i + 2000)) for i in range(0, 200, 3)]
        + [(9000 + i, 9, float(i)) for i in range(20)],
        DDL,
    )
    clauses = dict(
        matched_update_cond="s.v > t.v",
        insert_cond="v >= 5",
        nmbs_update_set={"u": "u + 1000"},
        nmbs_update_cond="v = 999",
        nmbs_delete_cond="v = 998",
    )
    out = os.path.join(root, "v1")
    stats = merge_full_pruned(
        spark, os.path.join(root, "v0"), out, src, ["k"], DDL,
        zone_key="k", **clauses,
    )
    got = sorted(map(tuple, spark.read.schema(DDL).parquet(out).collect()))
    exp = sorted(map(tuple, merge_full(df, src, ["k"], **clauses).collect()))
    assert got == exp
    # the nmbs predicate (v in {998, 999}) appears in ~every value-cycle
    # file, so the nmbs half forces a wide rewrite; still bounded by total
    assert stats["files_nmbs"] >= 1
    assert stats["files_rewritten"] <= stats["files_total"]


def test_merge_full_pruned_carries_untouched_files(spark):
    # narrow nmbs predicate + narrow key range: most files must hardlink
    tmp = tempfile.mkdtemp(prefix="mf_")
    root, df = _chain(spark, tmp)
    src = spark.createDataFrame([(3, 50, 9999.0)], DDL)
    out = os.path.join(root, "v1")
    stats = merge_full_pruned(
        spark, os.path.join(root, "v0"), out, src, ["k"], DDL, zone_key="k",
        matched_update_cond="s.v > t.v",
        nmbs_delete_cond="k = 4090 and v = 90.0",
    )
    assert 1 <= stats["files_rewritten"] <= 2
    v0 = os.path.join(root, "v0")
    shared = [
        f for f in os.listdir(out)
        if f.endswith(".parquet") and os.path.exists(os.path.join(v0, f))
        and os.path.samestat(
            os.stat(os.path.join(v0, f)), os.stat(os.path.join(out, f))
        )
    ]
    assert len(shared) == stats["files_total"] - stats["files_rewritten"]
    got = sorted(map(tuple, spark.read.schema(DDL).parquet(out).collect()))
    exp = sorted(map(tuple, merge_full(
        df, src, ["k"],
        matched_update_cond="s.v > t.v",
        nmbs_delete_cond="k = 4090 and v = 90.0",
    ).collect()))
    assert got == exp


def test_merge_full_pruned_dv_composition(spark):
    # a row already deleted by a deletion vector neither matches nor
    # triggers an nmbs rewrite, and never resurrects
    from rca_data_tools_spark.sources.sinks import delete_into_table, read_with_deletes

    tmp = tempfile.mkdtemp(prefix="mf_")
    root, df = _chain(spark, tmp)
    delete_into_table(spark, root, "k = 7", DDL)  # DV delete, no rewrite
    base = os.path.join(root, f"v{committed_versions(root)[-1]}")
    src = spark.createDataFrame([(7, 50, 12345.0)], DDL)
    out = os.path.join(root, "v_test")
    stats = merge_full_pruned(
        spark, base, out, src, ["k"], DDL, zone_key="k",
        matched_update_cond="s.v > t.v",
        nmbs_delete_cond="k = 7",  # satisfied only by the deleted row
    )
    # the dead row's DV entry carried with its hardlinked file: a reader
    # that subtracts the vectors sees ONLY the fresh insert
    back = read_with_deletes(spark, out, DDL)
    rows = back.filter("k = 7").collect()
    assert [(r["k"], r["v"]) for r in rows] == [(7, 12345.0)]
    assert stats["files_nmbs"] == 0  # the dead row forces no rewrite


def test_merge_table_full_commits_and_enforces_constraints(spark):
    from rca_data_tools_spark.sources.commit_store import VersionConflict  # noqa: F401

    tmp = tempfile.mkdtemp(prefix="mf_")
    root = os.path.join(tmp, "t")
    os.makedirs(root)
    df = spark.createDataFrame([(i, i % 7, float(i)) for i in range(100)], DDL)
    create_table(df, root, zone_key="k", constraints={"v_nonneg": "v >= 0"})
    stats = merge_table_full(
        spark, root, spark.createDataFrame([(1, 50, 500.0)], DDL), ["k"], DDL,
        zone_key="k", matched_update_cond="s.v > t.v",
    )
    assert stats["version"] == 1
    ops = [r["op"] for r in table_history(spark, root).collect()]
    assert "merge_full" in ops
    # an nmbs UPDATE SET that violates the persisted constraint fails the
    # build, releases the claim, and leaves the tip unchanged
    with pytest.raises(Exception, match="constraint violated"):
        merge_table_full(
            spark, root,
            spark.createDataFrame([(2, 50, 600.0)], DDL), ["k"], DDL,
            zone_key="k",
            nmbs_update_set={"v": "-v - 1"}, nmbs_update_cond="v > 400",
        )
    assert committed_versions(root)[-1] == 1
    assert not os.path.exists(os.path.join(root, "v2"))


def test_merge_full_changes_replay_reproduces_table(spark):
    from rca_data_tools_spark.sources.sinks import merge_full_changes, replay_changes

    tgt, src = _tgt(spark), _src(spark)
    feed = merge_full_changes(tgt, src, ["k"], **CLAUSES)
    ops = {r["op"] for r in feed.select("op").distinct().collect()}
    assert ops == {"insert", "update", "delete"}
    replica = replay_changes(tgt, feed.withColumn("_version", F.lit(1)), ["k"])
    got = sorted(map(tuple, replica.collect()))
    exp = sorted(map(tuple, merge_full(tgt, src, ["k"], **CLAUSES).collect()))
    assert got == exp
    # untouched rows emit nothing: feed is O(touched), not O(table)
    assert feed.count() < tgt.count() + src.count()


def test_merge_table_full_feed_crosses_ranges(spark):
    from rca_data_tools_spark.sources.sinks import (
        read_changes, read_version, replay_changes,
    )

    tmp = tempfile.mkdtemp(prefix="mf_")
    root = os.path.join(tmp, "t")
    os.makedirs(root)
    df = spark.createDataFrame([(i, i % 7, float(i)) for i in range(500)], DDL)
    create_table(df, root, zone_key="k", n_files=4)
    merge_table_full(
        spark, root,
        spark.createDataFrame([(1, 50, 900.0), (9001, 9, 9.0)], DDL),
        ["k"], DDL, zone_key="k", changes_feed=True,
        matched_update_cond="s.v > t.v",
        nmbs_delete_cond="v = 499",
    )
    feed = read_changes(spark, root, 0)  # raises if the version has no feed
    replica = replay_changes(df, feed, ["k"])
    tip = read_version(spark, root, DDL)
    assert sorted(map(tuple, replica.collect())) == sorted(
        map(tuple, tip.collect())
    )


def test_merge_full_pruned_fallback_validates(spark):
    """ADVICE r10 (medium): the no-matched-files fallback must run the same
    schema / clause / duplicate-source-key validation as the non-empty path
    — a first-batch merge is not a validation holiday."""
    tmp = tempfile.mkdtemp(prefix="mf_")
    root, _ = _chain(spark, tmp, n=64, n_files=2)
    v0 = os.path.join(root, "v0")
    # source keys far outside every file's zone range -> pure-insert path
    far = spark.createDataFrame([(10**7, 1, 1.0), (10**7 + 1, 1, 2.0)], DDL)
    # (a) clause misconfiguration refused eagerly, before any pruning pass
    with pytest.raises(ValueError, match="nmbs_update_cond"):
        merge_full_pruned(
            spark, v0, os.path.join(root, "bad1"), far, ["k"], DDL,
            zone_key="k", nmbs_update_cond="v > 0",
        )
    # (b) schema drift refused eagerly
    drifted = far.withColumnRenamed("v", "w")
    with pytest.raises(ValueError, match="identical schemas"):
        merge_full_pruned(
            spark, v0, os.path.join(root, "bad2"), drifted, ["k"], DDL,
            zone_key="k",
        )
    # (c) duplicate source keys trip the in-plan guard on the insert set —
    # even when one copy fails the insert condition (merge_full order)
    dup = spark.createDataFrame(
        [(10**7, 1, 1.0), (10**7, 1, 100.0)], DDL
    )
    out = os.path.join(root, "bad3")
    with pytest.raises(Exception, match="duplicate keys"):
        merge_full_pruned(
            spark, v0, out, dup, ["k"], DDL, zone_key="k", insert_cond="v > 50",
        )


def test_merge_upsert_pruned_fallback_validates(spark):
    from rca_data_tools_spark.sources.sinks import merge_upsert_pruned

    tmp = tempfile.mkdtemp(prefix="mu_")
    root, _ = _chain(spark, tmp, n=64, n_files=2)
    v0 = os.path.join(root, "v0")
    far_dup = spark.createDataFrame([(10**7, 1, 1.0), (10**7, 1, 2.0)], DDL)
    with pytest.raises(Exception, match="duplicate keys"):
        merge_upsert_pruned(
            spark, v0, os.path.join(root, "o1"), far_dup, ["k"], DDL,
            zone_key="k",
        )
    drifted = spark.createDataFrame([(10**7, 1)], "k long, u long")
    with pytest.raises(ValueError, match="identical schemas"):
        merge_upsert_pruned(
            spark, v0, os.path.join(root, "o2"), drifted, ["k"], DDL,
            zone_key="k",
        )
    # delete_col fallback: flagged keys are no-op deletes, the REST are
    # dup-guarded inserts
    flagged = spark.createDataFrame(
        [(10**7, 1, 1.0, False), (10**7, 1, 2.0, False), (10**7 + 5, 1, 3.0, True)],
        "k long, u long, v double, del boolean",
    )
    with pytest.raises(Exception, match="duplicate keys"):
        merge_upsert_pruned(
            spark, v0, os.path.join(root, "o3"), flagged, ["k"], DDL,
            zone_key="k", delete_col="del",
        )
