#!/usr/bin/env python
"""Oracle-check a subset of queries fast (the quick-tier compare, scoped).

Usage: python tools/check_queries.py [--sf /root/testdata/sf0.01] name [name...]

Runs each named query against its DuckDB oracle with the same canonical
compare the driver uses (tests/parity.py). For optimization work: any
restructured query MUST pass here (at sf0.001 AND sf0.01) before its change
is considered done.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    names = args

    from __spark_entry__ import oracle_sql, queries
    from tests.parity import compare
    from rca_data_tools_spark.session import get_spark

    QUERIES = queries()
    ORACLES = oracle_sql()
    spark = get_spark("rca-check")
    problems = []
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            if name in ORACLES:
                problems.extend(compare(name, df, ORACLES[name], sf_dir))
                print(f"{name}: ok" if not problems else f"{name}: PROBLEM", file=sys.stderr)
            else:
                n = df.count()
                print(f"{name}: no oracle, rows={n}", file=sys.stderr)
        except Exception as ex:
            problems.append(f"{name}: {type(ex).__name__}: {str(ex)[:400]}")
            print(f"{name}: EXC {ex}", file=sys.stderr)
    if problems:
        print("\n".join(problems))
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
