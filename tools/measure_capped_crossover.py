#!/usr/bin/env python
"""Measure the capped-vs-exact crossover on clone density (VERDICT r10
item 3): the capped faces (star-edge routing over a bucket cap) trade a
bucket-size aggregate for pair work LINEAR in corpus size; the exact faces
pay m(m-1)/2 pairs per clone cluster. This sweeps cluster size and times
both members of each pair of faces, printing the SCALING.md table.

Corpora are derived from sf0.1's documents table (5,000 docs):
- sparse: the base table itself (organic near-dup density);
- dense-C: 5% of docs replicated C times (one trailing token differs),
  the rest singletons — the build_scale_corpus.py clone-dense knob.

Usage: python tools/measure_capped_crossover.py [src_sf_dir] [out_root]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else ".scale/xover"
CLUSTERS = [16, 64, 256]
RUNS = 3


def build_corpora() -> dict:
    con = duckdb.connect()
    dirs = {}
    sparse = os.path.join(OUT, "sparse")
    os.makedirs(sparse, exist_ok=True)
    if not os.path.exists(os.path.join(sparse, "documents.parquet")):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/documents.parquet')) "
            f"TO '{sparse}/documents.parquet' (FORMAT PARQUET)"
        )
    dirs["sparse"] = sparse
    for c in CLUSTERS:
        d = os.path.join(OUT, f"dense{c}")
        os.makedirs(d, exist_ok=True)
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            con.execute(f"CREATE OR REPLACE VIEW crep AS SELECT unnest(range({c})) AS crep")
            con.execute(f"""
COPY (
  SELECT doc_id * {c} + crep AS doc_id,
         text || ' r' || crep AS text, lang, source,
         n_chars + 2 + LENGTH(CAST(crep AS VARCHAR)) AS n_chars
  FROM read_parquet('{SRC}/documents.parquet'), crep
  WHERE doc_id % 20 = 0
  UNION ALL
  SELECT doc_id * {c} AS doc_id, text, lang, source, n_chars
  FROM read_parquet('{SRC}/documents.parquet')
  WHERE doc_id % 20 <> 0
) TO '{d}/documents.parquet' (FORMAT PARQUET)
""")
        dirs[f"dense{c}"] = d
    return dirs


def main() -> None:
    from rca_data_tools_spark.queries import QUERIES
    from rca_data_tools_spark.session import get_spark

    spark = get_spark("capped-crossover")
    spark.range(1).count()
    dirs = build_corpora()
    faces = [
        ("edit_exact", "dedup_edit_distance"),
        ("edit_capped", "dedup_edit_distance_capped"),
        ("split_exact", "split_leakage_safe"),
        ("split_capped", "split_leakage_capped"),
    ]
    results: dict[str, dict[str, float]] = {}
    rows: dict[str, dict[str, int]] = {}
    for corpus, d in dirs.items():
        results[corpus] = {}
        rows[corpus] = {}
        for label, qname in faces:
            fn = QUERIES[qname]
            spark.catalog.clearCache()
            fn(spark, d).count()  # untimed warm-up (codegen)
            samples = []
            n = 0
            for _ in range(RUNS):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n = fn(spark, d).count()
                samples.append(time.perf_counter() - t0)
            results[corpus][label] = round(sorted(samples)[len(samples) // 2], 2)
            rows[corpus][label] = n
            print(
                f"# {corpus} {label}: {results[corpus][label]}s "
                f"of {[round(s, 2) for s in samples]} rows={n}",
                file=sys.stderr,
            )
    # markdown table for SCALING.md
    print("| corpus | docs | edit exact | edit capped | split exact | split capped |")
    print("|---|---|---|---|---|---|")
    import pyarrow.parquet as pq

    for corpus, d in dirs.items():
        ndocs = pq.read_metadata(os.path.join(d, "documents.parquet")).num_rows
        r = results[corpus]
        print(
            f"| {corpus} | {ndocs} | {r['edit_exact']}s | {r['edit_capped']}s "
            f"| {r['split_exact']}s | {r['split_capped']}s |"
        )
    print(json.dumps({"results": results, "rows": rows}))


if __name__ == "__main__":
    main()
