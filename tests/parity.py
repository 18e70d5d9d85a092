"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet tables,
canonicalizes (columns sorted by name, rows sorted, values stringified) and
compares exactly. Stricter than a fuzzy float compare on purpose: the engine's
aggregates are designed to be bit-deterministic.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from rca_data_tools_spark.sources.readers import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return f"t:{v.isoformat()}"
    if isinstance(v, dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    return f"s:{v}" if isinstance(v, str) else f"i:{v}"


def canonicalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    return sorted(out)


def compare(name: str, spark_df, oracle: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle, sf_dir)
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"{name}: column sets differ spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    sc, oc = canonicalize(s_cols, s_rows), canonicalize(o_cols, o_rows)
    if len(sc) != len(oc):
        problems.append(f"{name}: row counts differ spark={len(sc)} oracle={len(oc)}")
    if sc != oc:
        oc_set, sc_set = set(oc), set(sc)
        diff_s = [r for r in sc if r not in oc_set][:3]
        diff_o = [r for r in oc if r not in sc_set][:3]
        problems.append(f"{name}: values differ; spark-only={diff_s} oracle-only={diff_o}")
    return problems
