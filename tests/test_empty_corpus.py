"""Empty-input robustness gate: every registered query must return an
empty-but-well-typed result — never raise — when every source table has zero
rows. This is the reference's "No Data Available" contract
(qaqc/dashboard.py:657-662,1427-1432: empty windows produce empty artifacts,
not errors), and at 100 TB it is the common case: most (site, span) jobs hit
at least one empty slice.

The sweep writes a schema-preserving zero-row copy of each sf0.001 table
once per session and runs EVERY query in the registry against it. Queries
whose algorithms are meaningless without data (quantizer seeding) may return
zero rows via an internal empty-config path, but they still must not raise.
"""

from __future__ import annotations

import pytest

from rca_data_tools_spark.queries import QUERIES
from rca_data_tools_spark.sources.readers import TABLES, load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="session")
def empty_sf_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        load_table(spark, SF_SMOKE, t).limit(0).write.mode("overwrite").parquet(
            str(out / f"{t}.parquet")
        )
    return str(out)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_corpus(spark, empty_sf_dir, name):
    df = QUERIES[name](spark, empty_sf_dir)
    rows = df.collect()
    assert rows == [] or len(rows) >= 0  # no raise is the contract
    assert len(df.schema.fields) > 0
