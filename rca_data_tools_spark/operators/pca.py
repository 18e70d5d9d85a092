"""Distributed PCA over an embedding column: exact Gram-matrix accumulation,
driver-side eigendecomposition, Arrow-batched projection.

The scale decomposition is the textbook one (the d x d Gram matrix is tiny;
the n x d data is huge): executors each reduce their partitions to a d x d
partial Gram, the partials sum, and only the d x d matrix ever reaches the
driver — the same bounded-driver-state shape as IVF centroids. numpy.linalg
(shipped with numpy, no scipy needed) eigendecomposes the d x d symmetric
matrix; the component matrix broadcasts back for the projection pass.

Determinism: float summation order differs across partitionings, so the Gram
entries are accumulated as SCALED INT64 — each per-row product rounds to
``scale`` decimals half-away-from-zero (matching Spark/DuckDB ROUND, NOT
numpy's banker's rounding) and sums exactly. The resulting matrix is
bit-identical at any parallelism and replayable in SQL (see
embed_gram_entries' oracle), so the eigensystem downstream is deterministic
too. Overflow bound: |entry| <= n * max|x_i x_j| * 10^scale — at 1e9 rows,
unit-scale embeddings and scale=6 that is ~1e15, far inside int64.

Public-knowledge method: PCA via eigendecomposition of X^T X (Pearson 1901,
Jolliffe); sign convention fixed by forcing each component's
largest-magnitude coordinate positive (the standard reproducibility trick).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _round_half_away(v: np.ndarray, scale: int) -> np.ndarray:
    s = 10.0**scale
    return np.sign(v) * np.floor(np.abs(v) * s + 0.5)


def gram_matrix(df: DataFrame, emb_col: str, dim: int, scale: int = 6) -> np.ndarray:
    """Exact d x d Gram matrix sum_rows round(x_i * x_j, scale), computed as
    one mapInPandas pass emitting ONE scaled-int64 partial matrix per Arrow
    batch, then summed (exact integer arithmetic, partitioning-invariant)."""
    import pandas as pd

    def _partial(batches):
        for pdf in batches:
            mats = np.zeros((dim, dim), dtype=np.int64)
            arrs = np.stack(
                [np.asarray(a, dtype=np.float64) for a in pdf[emb_col]]
            ) if len(pdf) else np.zeros((0, dim))
            for row in arrs:
                mats += _round_half_away(np.outer(row, row), scale).astype(np.int64)
            yield pd.DataFrame({"flat": [mats.ravel().tolist()]})

    partials = df.select(emb_col).mapInPandas(_partial, schema="flat array<long>")
    # Reduce the per-batch partials as (cell index, value) pairs: a d*d-key
    # map-side-combined groupBy, never a d*d-column aggregate (which chokes
    # codegen) and never an unbounded driver collect of partials.
    cells = (
        partials.select(F.posexplode("flat").alias("idx", "v"))
        .groupBy("idx")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    g = np.zeros(dim * dim, dtype=np.float64)
    for r in cells:
        g[r["idx"]] = r["s"] or 0
    return (g / 10.0**scale).reshape(dim, dim)


def pca_components(gram: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k eigenpairs of the symmetric Gram matrix, eigenvalues descending,
    sign-fixed (largest-|coordinate| positive). Returns (eigvals[k],
    components[k, d])."""
    vals, vecs = np.linalg.eigh(gram)  # ascending
    order = np.argsort(vals)[::-1][:k]
    vals = vals[order]
    comps = vecs[:, order].T
    for c in comps:
        j = np.argmax(np.abs(c))
        if c[j] < 0:
            c *= -1.0
    return vals, comps


def pca_project(
    df: DataFrame, emb_col: str, components: np.ndarray, out_col: str = "proj"
) -> DataFrame:
    """Project each embedding onto the component rows (Arrow-batched matmul
    against the broadcast component matrix)."""
    import pandas as pd

    comps = components.astype(np.float64)
    sess = df.sparkSession
    bc = sess.sparkContext.broadcast(comps)

    def _proj(batches):
        m = bc.value
        for pdf in batches:
            pdf[out_col] = [
                list(m @ np.asarray(v, dtype=np.float64)) for v in pdf[emb_col]
            ]
            yield pdf

    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema)
    return df.mapInPandas(_proj, schema=f"{fields}, `{out_col}` array<double>")
