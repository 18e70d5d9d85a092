#!/usr/bin/env python
"""Rebuild the gitignored 10x scale corpus (.scale/sf1) from sf0.1.

Fact tables are 10 key-shifted replicas (orderkeys / event+user ids /
doc ids / vec ids shifted per replica); dimension tables copy through
unchanged — dims grow slower than facts, which is the realistic shape.
Documents come in two variants (see SCALING.md): duplicate-dense
(replicas differ by one token — adversarial for near-dup detection) and
distinct (100 varied filler tokens, Jaccard ~0.4 vs the original).

Usage: python tools/build_scale_corpus.py [src_dir] [out_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else ".scale/sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW reps AS SELECT unnest(range({R})) AS rep")


def build(table: str, select: str, dup: bool = True, out_name: str | None = None):
    name = out_name or table
    body = (
        f"SELECT {select} FROM read_parquet('{src}/{table}.parquet'), reps"
        if dup
        else f"SELECT * FROM read_parquet('{src}/{table}.parquet')"
    )
    con.execute(f"COPY ({body}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{out}/{name}.parquet')").fetchone()[0]
    print(f"{name}: {n} rows")


for dim in ("region", "nation", "customer", "supplier", "part"):
    build(dim, "*", dup=False)

K = 10_000_000  # orderkey shift stride, beyond sf0.1's key range
build("orders", f"o_orderkey + rep * {K} AS o_orderkey, o_custkey, o_orderstatus, "
                "o_totalprice, o_orderdate, o_orderpriority")
build("lineitem", f"l_orderkey + rep * {K} AS l_orderkey, l_partkey, l_suppkey, "
                  "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
                  "l_returnflag, l_linestatus, l_shipdate")
build("events", "event_id + rep * 100000000 AS event_id, ts, "
                "user_id + rep * 100000 AS user_id, event_type, value, props")
build("embeddings", "vec_id + rep * 1000000 AS vec_id, embedding, label")
# duplicate-dense: replicas differ by ONE appended token
build("documents", "doc_id + rep * 1000000 AS doc_id, "
                   "text || ' r' || rep AS text, lang, source, "
                   "n_chars + 2 + LENGTH(CAST(rep AS VARCHAR)) AS n_chars")
# distinct replicas: ~100 varied filler tokens push Jaccard below threshold
filler = ("list_aggregate([ 'f' || CAST(rep AS VARCHAR) || '_' || CAST(j AS VARCHAR) "
          "FOR j IN range(100)], 'string_agg', ' ')")
build(
    "documents",
    f"doc_id + rep * 1000000 AS doc_id, text || ' ' || {filler} AS text, "
    f"lang, source, n_chars + 1 + LENGTH({filler}) AS n_chars",
    out_name="documents_distinct",
)

# CLONE-DENSE knob (VERDICT r10 item 3): documents_dense.parquet replicates
# 5% of the base docs CLUSTER times each (near-identical — one trailing
# token differs), the rest stay singletons. Cluster size is the axis the
# capped-vs-exact crossover lives on: exact pair faces pay m(m-1)/2 per
# cluster, capped faces pay m-1 star edges.  Set via 4th arg or
# SPARK_GRAFT_DENSE_CLUSTER (default 64).
CLUSTER = int(
    sys.argv[4] if len(sys.argv) > 4 else os.environ.get("SPARK_GRAFT_DENSE_CLUSTER", "64")
)
con.execute(f"CREATE VIEW crep AS SELECT unnest(range({CLUSTER})) AS crep")
dense_body = f"""
SELECT doc_id * {CLUSTER} + crep AS doc_id,
       text || ' r' || crep AS text, lang, source,
       n_chars + 2 + LENGTH(CAST(crep AS VARCHAR)) AS n_chars
FROM read_parquet('{src}/documents.parquet'), crep
WHERE doc_id % 20 = 0
UNION ALL
SELECT doc_id * {CLUSTER} AS doc_id, text, lang, source, n_chars
FROM read_parquet('{src}/documents.parquet')
WHERE doc_id % 20 <> 0
"""
con.execute(
    f"COPY ({dense_body}) TO '{out}/documents_dense.parquet' (FORMAT PARQUET)"
)
n = con.sql(
    f"SELECT COUNT(*) FROM read_parquet('{out}/documents_dense.parquet')"
).fetchone()[0]
print(f"documents_dense: {n} rows (cluster={CLUSTER})")
print("done:", out)
