"""Command-line entry point: ``python -m rca_data_tools_spark <cmd>``.

The reference is operated through flow/CLI entry points (qaqc/flow.py
``qaqc_pipeline_flow``, qaqc/index.py ``main``); this is the engine's
equivalent operational surface:

  list                         registered queries (one per SURVEY §2 op)
  query NAME [--sf-dir D]      run one registered query, print rows
  qaqc --site S --span P       run a QA/QC job lifecycle to a partitioned sink
  index --out-dir D            write the JSON output index (reference index.py)
  convert-zarr SRC OUT         one-pass Zarr (v2/v3) -> Parquet ingest
  to-zarr TABLE OUT            parquet table -> Zarr v2 store (distributed)
  to-netcdf TABLE OUT          parquet table -> classic NetCDF (CDF-2/5)
  to-zarr3 TABLE OUT           parquet table -> Zarr v3 store (sharded)
  to-hdf5 TABLE OUT            parquet table -> HDF5/NetCDF-4 container
  convert-nc SRC OUT           one-pass NetCDF (classic/NetCDF-4) -> Parquet
  bench                        the headline benchmark (same as bench.py)

Every command builds the standard session (AQE, UTC, Arrow — session.py) and
runs a declarative plan; nothing here is logic, only wiring.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="rca_data_tools_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    q = sub.add_parser("query", help="run one registered query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=20)

    j = sub.add_parser("qaqc", help="run one (site, span) QA/QC job")
    j.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    j.add_argument("--site", default="SITE01")
    j.add_argument("--span", default="week", choices=["day", "week", "month", "year", "deploy"])
    j.add_argument("--table", default="events")
    j.add_argument("--key-col", default="user_id")
    j.add_argument("--ts-col", default="ts")
    j.add_argument("--value-col", default="value")
    j.add_argument("--window-end", default=None)
    j.add_argument("--threshold", type=int, default=5_000_000)
    j.add_argument("--out-dir", default=None)
    j.add_argument(
        "--compute-exceptions", default=None, metavar="YAML",
        help="per-(site,span) resource-hint catalog (the reference's "
        "params/compute_exceptions.yaml schema {site: {span: tier}}); a "
        "hit routes this job onto the tier's SQLConf (pipeline.py "
        "COMPUTE_TIER_CONF), a miss runs the default tier",
    )
    j.add_argument(
        "--status-url", default=None,
        help="operational-status JSON feed; failures degrade to an empty "
        "dim and every row reads UNAVAILABLE (dashboard.py:290-302 contract)",
    )

    ix = sub.add_parser("index", help="write the output-directory JSON index")
    ix.add_argument("--out-dir", required=True)

    cz = sub.add_parser("convert-zarr", help="Zarr store -> Parquet ingest")
    cz.add_argument(
        "src",
        help="store root: local directory or http(s):// base URL "
        "(per-key ranged GETs via sources/bytes_io.HttpStore)",
    )
    cz.add_argument("out")
    cz.add_argument("--variables", nargs="+", required=True)
    cz.add_argument("--time-var", default=None)
    def _bound(s: str):
        # int64 ns-epoch coordinates exceed float64's 2^53 integer range;
        # parse integers as integers so slice edges stay exact
        try:
            return int(s)
        except ValueError:
            return float(s)

    cz.add_argument(
        "--time-range", nargs=2, type=_bound, default=None, metavar=("LO", "HI"),
        help="convert only rows with LO <= time-var < HI (raw coordinate "
        "units); the scan prunes to the overlapping chunks",
    )

    tz = sub.add_parser("to-zarr", help="parquet table -> Zarr v2 store")
    tz.add_argument("table", help="table name in --sf-dir (e.g. events)")
    tz.add_argument("out", help="store root directory to create")
    tz.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    tz.add_argument("--columns", nargs="+", required=True)
    tz.add_argument("--order-by", nargs="+", required=True,
                    help="total order defining dim-0 (include a tiebreaker)")
    tz.add_argument("--chunk-rows", type=int, default=16384)

    tn = sub.add_parser("to-netcdf", help="parquet table -> classic NetCDF file")
    tn.add_argument("table")
    tn.add_argument("out")
    tn.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    tn.add_argument("--columns", nargs="+", required=True)
    tn.add_argument("--order-by", nargs="+", required=True)

    tz3 = sub.add_parser("to-zarr3", help="parquet table -> Zarr v3 store (sharded)")
    tz3.add_argument("table")
    tz3.add_argument("out")
    tz3.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    tz3.add_argument("--columns", nargs="+", required=True)
    tz3.add_argument("--order-by", nargs="+", required=True)
    tz3.add_argument("--chunk-rows", type=int, default=16384,
                     help="rows per shard (store object)")
    tz3.add_argument("--inner-rows", type=int, default=None,
                     help="rows per inner chunk; omit for plain (unsharded) chunks")

    th = sub.add_parser("to-hdf5", help="parquet table -> HDF5 (NetCDF-4 container)")
    th.add_argument("table")
    th.add_argument("out")
    th.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    th.add_argument("--columns", nargs="+", required=True)
    th.add_argument("--order-by", nargs="+", required=True)

    cn = sub.add_parser("convert-nc", help="NetCDF file -> Parquet ingest")
    cn.add_argument("src", help="local .nc path or http(s):// URL")
    cn.add_argument("out")
    cn.add_argument("--variables", nargs="+", required=True)
    cn.add_argument("--time-var", default=None)
    cn.add_argument("--epoch", default="1900-01-01")
    cn.add_argument(
        "--time-range", nargs=2, type=_bound, default=None, metavar=("LO", "HI"),
        help="convert only rows with LO <= time-var < HI (raw coordinate "
        "units); NetCDF-4 inputs prune to the overlapping blocks",
    )

    sub.add_parser("bench", help="run the headline benchmark")

    args = ap.parse_args(argv)

    if args.cmd == "bench":
        # bench.py lives at the repo root beside this package; resolve it
        # relative to the installed package so the subcommand works from any
        # cwd (and can never import an unrelated bench.py off sys.path).
        import importlib.util
        from pathlib import Path

        bench_path = Path(__file__).resolve().parents[1] / "bench.py"
        if not bench_path.exists():
            print(f"bench.py not found at {bench_path}", file=sys.stderr)
            return 2
        spec = importlib.util.spec_from_file_location("_rca_bench", bench_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
        return 0

    from rca_data_tools_spark.queries import QUERIES
    from rca_data_tools_spark.session import get_spark

    if args.cmd == "list":
        for name in QUERIES:
            print(name)
        return 0

    spark = get_spark("rca-cli")
    if args.cmd == "query":
        if args.name not in QUERIES:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        QUERIES[args.name](spark, args.sf_dir).show(args.limit, truncate=False)
        return 0

    if args.cmd == "qaqc":
        from pyspark.sql import functions as F

        from rca_data_tools_spark.pipeline import QAQCJobSpec, run_qaqc_job
        from rca_data_tools_spark.sources.readers import load_table

        exceptions = None
        if args.compute_exceptions:
            from rca_data_tools_spark.pipeline import load_compute_exceptions

            exceptions = load_compute_exceptions(args.compute_exceptions)
        spec = QAQCJobSpec(
            site=args.site, span=args.span, table=args.table,
            key_col=args.key_col, ts_col=args.ts_col, value_col=args.value_col,
            window_end=args.window_end, threshold=args.threshold,
            compute_exceptions=exceptions,
        )
        if exceptions is not None:
            print(f"compute tier: {spec.compute_tier}")
        # default gross-range dim: per-key fail span from observed min/max
        # padded 10% (a stand-in for the QARTOD config CSVs; pass real spans
        # through sources/readers.read_csv in production)
        keys = load_table(spark, args.sf_dir, args.table).groupBy(args.key_col).agg(
            F.min(args.value_col).alias("lo"), F.max(args.value_col).alias("hi")
        )
        span_pad = (F.col("hi") - F.col("lo")) * 0.1
        dim = keys.select(
            args.key_col,
            (F.col("lo") - span_pad).alias("fail_lo"),
            (F.col("hi") + span_pad).alias("fail_hi"),
            F.col("lo").alias("sus_lo"),
            F.col("hi").alias("sus_hi"),
        )
        status_dim = None
        if args.status_url:
            from rca_data_tools_spark.sources.ingest import ingest_status_json

            status_dim = ingest_status_json(spark, args.status_url)
        out = run_qaqc_job(
            spark, args.sf_dir, spec, dim, out_dir=args.out_dir, status_dim=status_dim
        )
        print(f"rows: {out.count()}"
              + (f" -> {args.out_dir} (site={args.site}/span={args.span})" if args.out_dir else ""))
        return 0

    if args.cmd == "index":
        from rca_data_tools_spark.sources.sinks import file_listing, write_index_json

        write_index_json(file_listing(spark, args.out_dir), args.out_dir)
        print(f"index written under {args.out_dir}")
        return 0

    if args.cmd == "convert-zarr":
        from rca_data_tools_spark.sources.zarr import zarr_to_parquet

        df = zarr_to_parquet(
            spark, args.src, args.variables, args.out, time_var=args.time_var,
            time_range=tuple(args.time_range) if args.time_range else None,
        )
        print(f"rows: {df.count()} -> {args.out}")
        return 0

    if args.cmd == "to-zarr":
        from pyspark.sql import functions as F

        from rca_data_tools_spark.operators.ranking import global_row_number
        from rca_data_tools_spark.sources.readers import load_table
        from rca_data_tools_spark.sources.zarr_sink import write_zarr_v2

        t = load_table(spark, args.sf_dir, args.table)
        staged = global_row_number(
            t, [F.col(c) for c in args.order_by], rank_col="__rank"
        ).withColumn("idx", F.col("__rank") - 1)
        n = write_zarr_v2(
            staged, args.out, "idx", args.columns, chunk_rows=args.chunk_rows
        )
        print(f"rows: {n} -> {args.out} (vars: {', '.join(args.columns)})")
        return 0

    if args.cmd == "to-netcdf":
        from pyspark.sql import functions as F

        from rca_data_tools_spark.operators.ranking import global_row_number
        from rca_data_tools_spark.sources.readers import load_table
        from rca_data_tools_spark.sources.netcdf_sink import write_cdf

        t = load_table(spark, args.sf_dir, args.table)
        staged = global_row_number(
            t, [F.col(c) for c in args.order_by], rank_col="__rank"
        ).withColumn("idx", F.col("__rank") - 1)
        n = write_cdf(staged, args.out, "idx", args.columns)
        print(f"rows: {n} -> {args.out} (vars: {', '.join(args.columns)})")
        return 0

    if args.cmd == "to-zarr3":
        from pyspark.sql import functions as F

        from rca_data_tools_spark.operators.ranking import global_row_number
        from rca_data_tools_spark.sources.readers import load_table
        from rca_data_tools_spark.sources.zarr_sink import write_zarr_v3

        t = load_table(spark, args.sf_dir, args.table)
        staged = global_row_number(
            t, [F.col(c) for c in args.order_by], rank_col="__rank"
        ).withColumn("idx", F.col("__rank") - 1)
        n = write_zarr_v3(
            staged, args.out, "idx", args.columns,
            chunk_rows=args.chunk_rows, inner_rows=args.inner_rows,
        )
        print(f"rows: {n} -> {args.out} (vars: {', '.join(args.columns)})")
        return 0

    if args.cmd == "to-hdf5":
        from pyspark.sql import functions as F

        from rca_data_tools_spark.operators.ranking import global_row_number
        from rca_data_tools_spark.sources.readers import load_table
        from rca_data_tools_spark.sources.hdf5_sink import write_hdf5

        t = load_table(spark, args.sf_dir, args.table)
        staged = global_row_number(
            t, [F.col(c) for c in args.order_by], rank_col="__rank"
        ).withColumn("idx", F.col("__rank") - 1)
        n = write_hdf5(staged, args.out, "idx", args.columns)
        print(f"rows: {n} -> {args.out} (vars: {', '.join(args.columns)})")
        return 0

    if args.cmd == "convert-nc":
        from rca_data_tools_spark.sources.netcdf import netcdf_to_parquet

        df = netcdf_to_parquet(
            spark, args.src, args.variables, args.out,
            time_var=args.time_var, epoch=args.epoch,
            time_range=tuple(args.time_range) if args.time_range else None,
        )
        print(f"rows: {df.count()} -> {args.out}")
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
