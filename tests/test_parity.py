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
