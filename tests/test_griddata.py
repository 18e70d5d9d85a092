"""2-D griddata (operators/griddata.py): triangulation invariants, exact
reproduction properties, hull masking, and the grouped Spark operator."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rca_data_tools_spark.operators.griddata import (
    delaunay_triangulate,
    grid_surface,
    interpolate_linear,
)


def _cloud(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((n, 2))


def test_triangulation_euler_invariant():
    """For n points with h on the hull, a Delaunay triangulation has exactly
    2n - h - 2 triangles."""
    pts = np.vstack([_cloud(200, 1), [[0, 0], [0, 1], [1, 0], [1, 1]]])
    tri = delaunay_triangulate(pts)
    # Hull vertices: walk the boundary edges (edges used by exactly one tri).
    edge_count: dict[tuple[int, int], int] = {}
    for a, b, c in tri:
        for u, v in ((a, b), (b, c), (c, a)):
            k = (min(u, v), max(u, v))
            edge_count[k] = edge_count.get(k, 0) + 1
    hull_edges = [k for k, n_uses in edge_count.items() if n_uses == 1]
    hull_vertices = {v for e in hull_edges for v in e}
    assert len(tri) == 2 * len(pts) - len(hull_vertices) - 2


def test_empty_circumcircle_property():
    """No point may lie strictly inside any triangle's circumcircle — the
    defining Delaunay invariant."""
    pts = _cloud(60, 3)
    tri = delaunay_triangulate(pts)
    for a, b, c in tri:
        ax, ay = pts[a]
        bx, by = pts[b]
        cx, cy = pts[c]
        d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        a2, b2, c2 = ax * ax + ay * ay, bx * bx + by * by, cx * cx + cy * cy
        ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
        uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
        r2 = (ax - ux) ** 2 + (ay - uy) ** 2
        d2 = (pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
        inside = d2 < r2 * (1 - 1e-9)
        inside[[a, b, c]] = False
        assert not inside.any()


def test_reproduces_values_at_data_points():
    pts = _cloud(300, 5)
    vals = np.sin(7 * pts[:, 0]) * np.cos(5 * pts[:, 1])  # non-planar
    got = interpolate_linear(pts, vals, pts)
    assert np.nanmax(np.abs(got - vals)) < 1e-12


def test_affine_field_exact_and_hull_masking():
    pts = np.vstack([_cloud(250, 7), [[0, 0], [0, 1], [1, 0], [1, 1]]])
    vals = 4.0 * pts[:, 0] + 2.5 * pts[:, 1] - 1.0
    q_in = _cloud(100, 11)
    got = interpolate_linear(pts, vals, q_in)
    want = 4.0 * q_in[:, 0] + 2.5 * q_in[:, 1] - 1.0
    assert np.nanmax(np.abs(got - want)) < 1e-10
    q_out = np.array([[5.0, 5.0], [-2.0, 0.3], [0.5, 1.8]])
    assert np.isnan(interpolate_linear(pts, vals, q_out)).all()


def test_interpolation_within_local_range():
    """Linear interpolation never extrapolates beyond the data's value range."""
    pts = np.vstack([_cloud(150, 13), [[0, 0], [0, 1], [1, 0], [1, 1]]])
    vals = np.cos(9 * pts[:, 0] + 3 * pts[:, 1])
    q = _cloud(200, 17)
    got = interpolate_linear(pts, vals, q)
    assert np.nanmin(got) >= vals.min() - 1e-12
    assert np.nanmax(got) <= vals.max() + 1e-12


def test_degenerate_inputs():
    assert len(delaunay_triangulate(np.array([[0.0, 0.0], [1.0, 1.0]]))) == 0
    # collinear points: no valid triangle, everything NaN
    pts = np.column_stack([np.linspace(0, 1, 10), np.linspace(0, 1, 10)])
    out = interpolate_linear(pts, np.ones(10), np.array([[0.5, 0.4]]))
    assert np.isnan(out).all()


def test_grouped_surfaces_independent(spark):
    """Two groups with different planar fields grid independently and each
    reproduces its own plane."""
    import pandas as pd

    rows = []
    rng = np.random.default_rng(23)
    for g, (a, b, c) in (("s1", (1.0, 2.0, 0.0)), ("s2", (-3.0, 0.5, 10.0))):
        p = np.vstack([rng.random((80, 2)), [[0, 0], [0, 1], [1, 0], [1, 1]]])
        for x, y in p:
            rows.append((g, float(x), float(y), float(a * x + b * y + c)))
    df = spark.createDataFrame(rows, "g string, x double, y double, v double")
    grid = [i / 10.0 for i in range(1, 10)]
    out = grid_surface(df, ["g"], "x", "y", "v", grid, grid).toPandas()
    assert len(out) == 2 * 81
    for g, (a, b, c) in (("s1", (1.0, 2.0, 0.0)), ("s2", (-3.0, 0.5, 10.0))):
        sub = out[out["g"] == g]
        want = a * sub["gx"] + b * sub["gy"] + c
        assert np.nanmax(np.abs(sub["v"] - want)) < 1e-5  # rounded to 6dp
