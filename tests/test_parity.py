"""The main correctness gate, mirroring the driver: every registered query
with an oracle must hash-match DuckDB on sf0.01; oracle-less queries must at
least run and return a stable schema."""

from __future__ import annotations

import pytest

from __spark_entry__ import oracle_sql, queries
from tests.conftest import SF_CORRECTNESS
from tests.parity import compare

QUERIES = queries()
ORACLES = oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(spark, name):
    df = QUERIES[name](spark, SF_CORRECTNESS)
    if name in ORACLES:
        problems = compare(name, df, ORACLES[name], SF_CORRECTNESS)
        assert not problems, "\n".join(problems)
    else:
        rows = df.count()
        assert rows >= 0
        assert df.schema is not None


def test_entry_smoke(spark):
    from __spark_entry__ import entry

    df = entry(spark)
    assert df.count() > 0


def test_approx_distinct_tracks_exact(spark):
    from rca_data_tools_spark.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    approx = {r["l_returnflag"]: r for r in QUERIES["agg_approx_distinct"](spark, sf).collect()}
    exact = {r["l_returnflag"]: r for r in QUERIES["agg_multi_distinct"](spark, sf).collect()}
    assert set(approx) == set(exact)
    for k, e in exact.items():
        a = approx[k]
        assert a["n_rows"] == e["n_rows"]
        for col in ("n_supp", "n_part"):
            assert abs(a[col] - e[col]) <= max(2, 0.05 * e[col]), (k, col, a[col], e[col])


def test_round_window_names_resolve():
    """Every name in the driver-window head list must exist in the registry
    and appear once — `_ordered` silently skips unknown names, so a typo
    would silently shrink the 50-query window the driver checks."""
    import __spark_entry__ as entry_mod

    win = entry_mod._ROUND_WINDOW
    assert len(win) == len(set(win)), "duplicate window entries"
    missing = [n for n in win if n not in QUERIES]
    assert not missing, f"window names not in registry: {missing}"
    assert len(win) == 50, f"driver checks 50 entries; window has {len(win)}"


def test_oracle_dtypes_driver_safe(spark):
    """Guard the dtype traps that caused every round-1/2 red row: the driver
    canonicalizes with pandas dtype-sensitive hashing, so (a) no oracle may
    emit HUGEINT (DuckDB SUM-of-integer widens to int128 -> pandas float64,
    mismatching Spark's int64), (b) no Spark query may emit DateType
    (pandas object-of-date vs DuckDB datetime64), and (c) no Spark query may
    emit ArrayType — list cells crash the driver's sort_values canonicalizer
    ("unhashable type: 'list'", the r01 a15 / r02 calc_* failure class).
    DESCRIBE-only on the DuckDB side; schema-only on the Spark side — no
    query execution."""
    import duckdb

    from pyspark.sql.types import ArrayType, DateType, MapType, StructType
    from rca_data_tools_spark.sources.readers import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_CORRECTNESS}/{t}.parquet')"
        )
    offenders = []
    for name, sql in ORACLES.items():
        desc = con.execute(f"DESCRIBE ({sql.rstrip().rstrip(';')})").fetchall()
        hug = [c for c, typ, *_ in desc if "HUGEINT" in typ]
        if hug:
            offenders.append((name, "oracle HUGEINT", hug))
    for name, fn in QUERIES.items():
        schema = fn(spark, SF_CORRECTNESS).schema
        dates = [f.name for f in schema.fields if isinstance(f.dataType, DateType)]
        if dates:
            offenders.append((name, "spark DateType", dates))
        nested = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if nested:
            offenders.append((name, "spark nested type (list/map/struct cell)", nested))
    assert not offenders, offenders
