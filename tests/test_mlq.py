"""Quality-classifier trainer: convergence and separation behavior (oracle
parity is covered by the all-registry gate in test_parity.py)."""

from __future__ import annotations

from rca_data_tools_spark.queries import QUERIES


def test_gd_mse_monotone_and_weights_stabilize(spark):
    out = (
        QUERIES["quality_classifier_train"](spark, "/root/testdata/sf0.01")
        .orderBy("iter")
        .collect()
    )
    assert len(out) == 12
    mses = [r["mse"] for r in out]
    # full-batch GD on a convex loss with a sane lr: training MSE never rises
    assert all(a >= b - 1e-12 for a, b in zip(mses, mses[1:]))
    # and it actually learns: below the all-zero-weights baseline MSE (=P(y=1))
    assert mses[-1] < 0.25
    # successive weight deltas shrink (stable, not oscillating)
    wcols = ["w_bias", "w_len", "w_toklen", "w_stop", "w_ttr"]
    d_early = sum(abs(out[1][c] - out[0][c]) for c in wcols)
    d_late = sum(abs(out[-1][c] - out[-2][c]) for c in wcols)
    assert d_late < d_early


def test_gd_weights_deterministic_across_partitionings(spark):
    a = QUERIES["quality_classifier_train"](spark, "/root/testdata/sf0.001").collect()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = QUERIES["quality_classifier_train"](spark, "/root/testdata/sf0.001").collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_score_face_shape_and_bounds(spark):
    rows = {
        r["is_quality"]: r
        for r in QUERIES["quality_classifier_score"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {0, 1}
    assert rows[0]["n_docs"] + rows[1]["n_docs"] == 500
    for r in rows.values():
        assert r["min_score"] <= r["mean_score"] <= r["max_score"]
