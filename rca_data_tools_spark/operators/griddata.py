"""2-D scattered-data -> grid linear interpolation (the engine-side
equivalent of the reference's ``scipy.interpolate.griddata(method='linear')``
over (time, depth) meshes, qaqc/dashboard.py:944-967 and the climatology
surface :825-833).

scipy is not available in this runtime, so the geometry is implemented from
the public algorithms directly:

- Delaunay triangulation: Bowyer-Watson incremental insertion (Bowyer 1981,
  Watson 1981) with a vectorized circumcircle containment test per insertion
  — numpy does the O(#triangles) test, Python only walks the (small) cavity
  boundary.
- Interpolation: barycentric coordinates in the containing triangle; NaN
  outside the convex hull (scipy's fill_value semantics).

Scale shape: one surface is one group (site x span in the reference);
``grid_surface`` runs the whole geometry inside ``applyInPandas`` so every
group triangulates independently on its executor — the 100 TB path is many
surfaces in parallel, never one giant triangulation. Inputs per group are
plot-sized by construction (the reference grids AFTER decimation), which is
the same contract scipy ran under.

Correctness contract: for values sampled from any affine field
v = a*x + b*y + c, linear barycentric interpolation reproduces the field
EXACTLY (up to fp rounding) at every in-hull point, for ANY valid
triangulation — which makes the operator hash-checkable against a plain SQL
oracle (see calc_griddata_surface) without depending on triangulation
tie-breaking. Non-planar behavior is covered by unit tests (exact
reproduction at the data points themselves, hull masking, NaN outside).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


def delaunay_triangulate(pts: np.ndarray) -> np.ndarray:
    """Bowyer-Watson Delaunay triangulation. pts: (n, 2) float64 (n >= 3).
    Returns (m, 3) int32 vertex-index triangles."""
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), dtype=np.int32)
    # Super-triangle comfortably containing the data's bounding box.
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    span = float(max(hi[0] - lo[0], hi[1] - lo[1], 1e-9))
    cx, cy = (lo[0] + hi[0]) / 2.0, (lo[1] + hi[1]) / 2.0
    sp = np.array(
        [
            [cx - 20.0 * span, cy - 10.0 * span],
            [cx + 20.0 * span, cy - 10.0 * span],
            [cx, cy + 20.0 * span],
        ]
    )
    allp = np.vstack([pts, sp])
    s0, s1, s2 = n, n + 1, n + 2

    # Live triangle store with per-triangle circumcenter/radius^2, grown
    # amortized; the containment test per insertion is one vectorized pass.
    cap = max(16, 4 * n)
    tris = np.empty((cap, 3), dtype=np.int32)
    centers = np.empty((cap, 2), dtype=np.float64)
    rad2 = np.empty(cap, dtype=np.float64)
    alive = np.zeros(cap, dtype=bool)
    count = 0

    def _grow() -> None:
        nonlocal cap, tris, centers, rad2, alive
        cap *= 2
        tris = np.resize(tris, (cap, 3))
        centers = np.resize(centers, (cap, 2))
        rad2 = np.resize(rad2, cap)
        alive = np.resize(alive, cap)
        alive[cap // 2 :] = False

    def _add(a: int, b: int, c: int) -> None:
        nonlocal count
        if count == cap:
            _grow()
        ax, ay = allp[a]
        bx, by = allp[b]
        cx_, cy_ = allp[c]
        d = 2.0 * (ax * (by - cy_) + bx * (cy_ - ay) + cx_ * (ay - by))
        if abs(d) < 1e-30:
            # Degenerate (collinear) — store with infinite circumcircle so it
            # is always re-cut by later insertions.
            ux, uy, r2 = 0.0, 0.0, np.inf
        else:
            a2 = ax * ax + ay * ay
            b2 = bx * bx + by * by
            c2 = cx_ * cx_ + cy_ * cy_
            ux = (a2 * (by - cy_) + b2 * (cy_ - ay) + c2 * (ay - by)) / d
            uy = (a2 * (cx_ - bx) + b2 * (ax - cx_) + c2 * (bx - ax)) / d
            r2 = (ax - ux) ** 2 + (ay - uy) ** 2
        tris[count] = (a, b, c)
        centers[count] = (ux, uy)
        rad2[count] = r2
        alive[count] = True
        count += 1

    _add(s0, s1, s2)

    order = np.lexsort((pts[:, 1], pts[:, 0]))
    for pi in order:
        px, py = allp[pi]
        live = np.flatnonzero(alive[:count])
        d2 = (centers[live, 0] - px) ** 2 + (centers[live, 1] - py) ** 2
        bad = live[d2 <= rad2[live] * (1.0 + 1e-12)]
        if len(bad) == 0:
            # Numerically orphaned point (should not happen inside the super
            # triangle) — skip rather than corrupt the mesh.
            continue
        # Cavity boundary: edges of bad triangles that appear exactly once.
        edges: dict[tuple[int, int], tuple[int, int]] = {}
        for t in bad:
            a, b, c = tris[t]
            for u, v in ((a, b), (b, c), (c, a)):
                key = (u, v) if u < v else (v, u)
                if key in edges:
                    del edges[key]
                else:
                    edges[key] = (u, v)
            alive[t] = False
        for u, v in edges.values():
            _add(u, v, pi)

    live = np.flatnonzero(alive[:count])
    out = tris[live]
    keep = (out < n).all(axis=1)
    return np.ascontiguousarray(out[keep], dtype=np.int32)


def interpolate_linear(
    pts: np.ndarray, vals: np.ndarray, query: np.ndarray
) -> np.ndarray:
    """Barycentric linear interpolation of scattered (pts, vals) at ``query``
    points; NaN outside the convex hull. Vectorized over query x triangle."""
    out = np.full(len(query), np.nan)
    tri = delaunay_triangulate(pts)
    if len(tri) == 0:
        return out
    a, b, c = pts[tri[:, 0]], pts[tri[:, 1]], pts[tri[:, 2]]
    # Affine transform per triangle for barycentric coords.
    det = (b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0]) + (c[:, 0] - b[:, 0]) * (
        a[:, 1] - c[:, 1]
    )
    ok = np.abs(det) > 1e-30
    eps = 1e-9
    qx = query[:, 0][:, None]
    qy = query[:, 1][:, None]
    l1 = ((b[:, 1] - c[:, 1]) * (qx - c[:, 0]) + (c[:, 0] - b[:, 0]) * (qy - c[:, 1])) / det
    l2 = ((c[:, 1] - a[:, 1]) * (qx - c[:, 0]) + (a[:, 0] - c[:, 0]) * (qy - c[:, 1])) / det
    l3 = 1.0 - l1 - l2
    inside = ok & (l1 >= -eps) & (l2 >= -eps) & (l3 >= -eps)
    # First containing triangle per query point (ties on shared edges give
    # identical interpolated values for a consistent mesh).
    has = inside.any(axis=1)
    idx = inside.argmax(axis=1)
    rows = np.flatnonzero(has)
    t = idx[rows]
    v = (
        l1[rows, t] * vals[tri[t, 0]]
        + l2[rows, t] * vals[tri[t, 1]]
        + l3[rows, t] * vals[tri[t, 2]]
    )
    out[rows] = v
    return out


def grid_surface(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    v_col: str,
    grid_x: list[float],
    grid_y: list[float],
    out_col: str = "v",
    scale: int = 6,
) -> DataFrame:
    """Per-group scattered->grid interpolation: one independent triangulation
    per group inside applyInPandas (Arrow-batched). Returns one row per
    (group, gx, gy) with the interpolated value rounded to ``scale`` decimals
    (NaN -> NULL outside the hull)."""
    import pandas as pd

    spark = df.sparkSession
    gx, gy = np.meshgrid(np.asarray(grid_x), np.asarray(grid_y), indexing="ij")
    query = np.column_stack([gx.ravel(), gy.ravel()])

    group_fields = [df.schema[c] for c in group_cols]
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        list(group_fields)
        + [
            StructField("gx", DoubleType()),
            StructField("gy", DoubleType()),
            StructField(out_col, DoubleType()),
        ]
    )

    def _grid(pdf: pd.DataFrame) -> pd.DataFrame:
        pts = pdf[[x_col, y_col]].to_numpy(dtype=np.float64)
        vals = pdf[v_col].to_numpy(dtype=np.float64)
        v = interpolate_linear(pts, vals, query)
        out = pd.DataFrame(
            {"gx": query[:, 0], "gy": query[:, 1], out_col: np.round(v, scale)}
        )
        for c in group_cols:
            out.insert(0, c, pdf[c].iloc[0])
        return out

    return df.groupBy(*group_cols).applyInPandas(_grid, schema)
