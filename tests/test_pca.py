"""Distributed PCA (operators/pca.py): the Gram accumulation must be
partitioning-invariant and match a single-node replay exactly; the
eigen/projection stages must satisfy the PCA invariants."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from rca_data_tools_spark.operators.pca import (
    _round_half_away,
    gram_matrix,
    pca_components,
    pca_project,
)
from rca_data_tools_spark.sources.readers import load_table
from tests.conftest import SF_CORRECTNESS


def _local_gram(arrs: np.ndarray, scale: int = 6) -> np.ndarray:
    acc = np.zeros((arrs.shape[1], arrs.shape[1]), dtype=np.int64)
    for row in arrs:
        acc += _round_half_away(np.outer(row, row), scale).astype(np.int64)
    return acc / 10.0**scale


def _embeddings_np(spark):
    rows = (
        load_table(spark, SF_CORRECTNESS, "embeddings")
        .select("embedding")
        .collect()
    )
    return np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])


def test_gram_matches_local_replay_and_partitioning_invariant(spark):
    df = load_table(spark, SF_CORRECTNESS, "embeddings")
    want = _local_gram(_embeddings_np(spark))
    got1 = gram_matrix(df.repartition(1), "embedding", dim=64)
    got17 = gram_matrix(df.repartition(17), "embedding", dim=64)
    assert np.array_equal(got1, want)
    assert np.array_equal(got17, want)  # exact int accumulation: bit-equal


def test_round_half_away_matches_sql_round():
    v = np.array([2.5e-6, -2.5e-6, 1.4999e-6, -1.4999e-6, 0.0])
    got = _round_half_away(v, 6)
    assert got.tolist() == [3.0, -3.0, 1.0, -1.0, 0.0]


def test_components_orthonormal_descending(spark):
    g = gram_matrix(
        load_table(spark, SF_CORRECTNESS, "embeddings"), "embedding", dim=64
    )
    vals, comps = pca_components(g, 8)
    assert np.all(np.diff(vals) <= 1e-9)  # descending
    assert np.allclose(comps @ comps.T, np.eye(8), atol=1e-9)
    # sign convention: max-|coordinate| positive
    for c in comps:
        assert c[np.argmax(np.abs(c))] > 0


def test_projection_preserves_variance_ordering(spark):
    df = load_table(spark, SF_CORRECTNESS, "embeddings")
    g = gram_matrix(df, "embedding", dim=64)
    vals, comps = pca_components(g, 4)
    proj = pca_project(df, "embedding", comps).select("proj").toPandas()
    p = np.stack(proj["proj"].to_numpy())
    # uncentered second moment along each component tracks its eigenvalue
    moments = (p**2).sum(axis=0)
    n_expected = np.asarray(vals)
    assert np.allclose(moments, n_expected, rtol=1e-3)
    assert np.all(np.diff(moments) <= 1e-6)


def test_reconstruction_error_decreases(spark):
    x = _embeddings_np(spark)
    g = _local_gram(x)
    errs = []
    for k in (2, 8, 32, 64):
        _, comps = pca_components(g, k)
        recon = (x @ comps.T) @ comps
        errs.append(float(((x - recon) ** 2).sum()))
    assert errs == sorted(errs, reverse=True)
    assert errs[-1] < 1e-6 * errs[0] + 1e-6  # full rank reconstructs
