"""Shared DuckDB oracle builder for the LTTB recurrence (operators/decimate.py).

Generates the WITH-RECURSIVE machinery that replays the sequential
bucket-argmax selection bit-exactly (epoch-ns float64 x values, numpy
linspace edge truncation with the endpoint pinned, next-bucket centroid
averages, NaN->-1 areas, first-hit ties, 10x pre-stride). Used by the
w4_lttb_decimation oracle and the full-pipeline oracle, which share the
selection but project different columns.
"""

from __future__ import annotations


def lttb_keep_ctes(source_sql: str, threshold: int = 50) -> str:
    """CTE chain from a ``(user_id, ts, value)`` source query to a ``keep``
    relation of (user_id, rn) selected rows plus the ``base`` relation they
    index into. Embed inside ``WITH RECURSIVE ...`` and join keep×base."""
    t = threshold
    interior = t - 2  # buckets over the interior points
    edges_hi = t - 1  # linspace point count - 1 (edge index j runs 0..t-2... see below)
    # edge indices run 0..t-2 inclusive (t-1 values); buckets i run 0..t-3.
    n_edges_last = t - 2  # last edge index
    cap = t * 10
    return f"""
raw0 AS (
  SELECT user_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS rn0,
         COUNT(*) OVER (PARTITION BY user_id) AS n0
  FROM ({source_sql})
),
strided AS (
  SELECT user_id, ts, value
  FROM raw0
  WHERE rn0 % GREATEST(1, CAST(FLOOR(n0 / {cap}.0) AS BIGINT)) = 0 OR rn0 = n0 - 1
),
base AS (
  SELECT user_id, ts, value,
         CAST(epoch_ns(ts) AS DOUBLE) AS x,
         CAST(value AS DOUBLE) AS y,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM strided
),
long_series AS (SELECT DISTINCT user_id, n FROM base WHERE n > {t}),
edges AS (
  SELECT ls.user_id, js.j,
         CASE WHEN js.j = {n_edges_last} THEN ls.n - 1
              ELSE CAST(FLOOR(1.0 + js.j * ((ls.n - 2.0) / {interior}.0)) AS BIGINT) END AS e,
         ls.n
  FROM long_series ls, range(0, {edges_hi}) js(j)
),
buckets AS (
  SELECT e1.user_id, e1.j AS i, e1.e AS lo, e2.e AS hi,
         e2.e AS nlo, CASE WHEN e1.j + 2 <= {n_edges_last} THEN e3.e ELSE e1.n END AS nhi
  FROM edges e1
  JOIN edges e2 ON e2.user_id = e1.user_id AND e2.j = e1.j + 1
  LEFT JOIN edges e3 ON e3.user_id = e1.user_id AND e3.j = e1.j + 2
  WHERE e1.j <= {interior - 1}
),
cent AS (
  SELECT bk.user_id, bk.i, bk.lo, bk.hi, AVG(p.x) AS avg_x, AVG(p.y) AS avg_y
  FROM buckets bk
  JOIN base p ON p.user_id = bk.user_id AND p.rn >= bk.nlo AND p.rn < bk.nhi
  GROUP BY 1, 2, 3, 4
),
sel AS (
  SELECT user_id, 0 AS i, CAST(0 AS BIGINT) AS a FROM long_series
  UNION ALL
  SELECT s.user_id, s.i + 1,
         (SELECT q.rn
          FROM base q, cent c, base pa
          WHERE c.user_id = s.user_id AND c.i = s.i
            AND q.user_id = s.user_id AND q.rn >= c.lo AND q.rn < c.hi
            AND pa.user_id = s.user_id AND pa.rn = s.a
          ORDER BY (CASE WHEN isnan(abs((pa.x - c.avg_x) * (q.y - pa.y)
                                        - (pa.x - q.x) * (c.avg_y - pa.y)))
                         THEN -1.0
                         ELSE abs((pa.x - c.avg_x) * (q.y - pa.y)
                                  - (pa.x - q.x) * (c.avg_y - pa.y)) END) DESC,
                   q.rn ASC
          LIMIT 1)
  FROM sel s WHERE s.i <= {interior - 1}
),
keep AS (
  SELECT user_id, a AS rn FROM sel
  UNION ALL
  SELECT user_id, n - 1 AS rn FROM long_series
  UNION ALL
  SELECT user_id, rn FROM base WHERE n <= {t}
)"""
