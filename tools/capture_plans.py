#!/usr/bin/env python
"""Capture .explain('formatted') for headline queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [suffix] [names...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix defaults to 'before').
Lifecycle faces execute their chain DML when invoked; their returned frame
is a scalar summary, so for those the file records that plus the plan of
the returned frame. Guide §1: plan shape (Exchange count, join strategy,
PushedFilters, BatchEvalPython nodes) is the evidence base for every
optimization claim.
"""

from __future__ import annotations

import io
import os
import sys
import contextlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from rca_data_tools_spark.queries import QUERIES
    from rca_data_tools_spark.session import get_spark
    import bench

    if not names:
        names = [n for n in bench.HEADLINE if n in QUERIES]

    spark = get_spark("rca-plan-capture")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"plan-capture:{name}")
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as ex:
            text = f"FAILED to build: {type(ex).__name__}: {ex}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"{name}: {len(text)} bytes", file=sys.stderr)


if __name__ == "__main__":
    main()
