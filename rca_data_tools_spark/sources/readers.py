"""Table readers.

The reference reads Zarr/NetCDF/CSV-over-HTTP/JSON (rca_data_tools/qaqc/
dashboard.py:305-313, :231-286, :49-60); our engine's canonical storage is
columnar Parquet read through Spark's vectorized reader so Catalyst gets
predicate pushdown, column pruning and (on a partitioned layout) partition
pruning for free. CSV/JSON readers are provided for the config/annotation
shaped inputs.

At 100 TB the fact tables are expected to be laid out as
``<root>/<table>/date=YYYY-MM-DD/part-*.parquet`` (or Iceberg/Delta when the
runtime has the jars); ``load_table`` works identically on a single file or a
partitioned directory — time predicates then prune partitions, not just row
groups.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Canonical table set of the driver's synthetic corpus (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects. Detected from the footer (cheap, metadata-only)."""
    try:
        import glob

        import pyarrow.parquet as pq

        f = path if os.path.isfile(path) else next(iter(sorted(glob.glob(os.path.join(path, "*.parquet")))), None)
        if f is None:
            return []
        pf = pq.ParquetFile(f)
        # Arrow reports BOTH real TIMESTAMP(NANOS) columns and legacy INT96
        # timestamps (Spark's own default parquet output) as timestamp[ns].
        # Only the INT64-backed NANOS kind trips Spark's vectorized reader —
        # INT96 scans natively — so require the physical type to match, or a
        # Spark-written table would be mis-rebuilt as epoch-nanos longs.
        ns_cols = {fld.name for fld in pf.schema_arrow if str(fld.type) == "timestamp[ns]"}
        phys = {
            pf.schema.column(i).name: pf.schema.column(i).physical_type
            for i in range(len(pf.schema))
        }
        return [n for n in sorted(ns_cols) if phys.get(n) == "INT64"]
    except Exception:
        return []


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    time_filters: dict | None = None,
    partition_time_col: str = "ts",
) -> DataFrame:
    """Load one table from a scale-factor directory.

    Accepts either ``<sf_dir>/<name>.parquet`` (single file, the test corpus)
    or ``<sf_dir>/<name>/`` (partitioned directory, the at-scale layout).

    Nanosecond-precision timestamp columns (which Spark cannot scan natively)
    are read as epoch-nanos longs via the legacy conf and rebuilt as
    microsecond timestamps with integer division — no precision loss, and the
    cast happens inside codegen, so scan speed is unaffected.

    ``time_filters`` maps column name → ``(lo, hi)`` timestamp strings (either
    bound may be ``None``), selecting the half-open window ``[lo, hi)``.
    Passing the bounds here instead of filtering the returned frame matters at
    scale: a filter written against the *rebuilt* timestamp column sits above
    a Project and can never reach the parquet scan, but here the bounds are
    translated to epoch-nanos literals and applied to the raw int64 column, so
    they arrive as ``PushedFilters`` and prune row groups (and, on a
    date-partitioned layout, whole partitions). For native-timestamp columns
    the filter is applied directly and pushes down as-is.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    # The NTZ->TIMESTAMP normalization below is instant-preserving only under
    # a UTC session; a reused non-UTC session would silently shift values.
    session_tz = spark.conf.get("spark.sql.session.timeZone")
    if session_tz != "UTC":
        raise ValueError(
            f"load_table requires spark.sql.session.timeZone=UTC (got {session_tz!r}); "
            "the engine pins UTC so naive-timestamp columns keep their instants."
        )

    file_path = os.path.join(sf_dir, f"{name}.parquet")
    dir_path = os.path.join(sf_dir, name)
    path = file_path if os.path.exists(file_path) else dir_path
    nanos = _nanos_timestamp_cols(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    # timestamp[us] parquet columns without a timezone arrive as
    # TIMESTAMP_NTZ; the engine's time functions (unix_millis, window, ...)
    # expect TIMESTAMP. With the session timezone pinned to UTC the cast is a
    # wall-clock no-op, so normalize here — but only after the raw-column
    # filters below, which must sit under the Project to reach the scan.
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]

    # On the at-scale layout (<table>/date=YYYY-MM-DD/...) a timestamp
    # predicate alone prunes row groups but NOT partitions — Spark cannot
    # infer date = to_date(ts). The layout contract is that `date` is the
    # UTC date of ``partition_time_col`` (default ``ts``) — and ONLY that
    # column: deriving the partition predicate from a filter on some other
    # timestamp column (e.g. an ingest-time column on a table partitioned by
    # observation time) would silently over-prune partitions and drop rows.
    has_date_partition = "date" in df.columns

    for col, (lo, hi) in (time_filters or {}).items():
        if has_date_partition and col == partition_time_col and col != "date":
            if lo is not None:
                df = df.filter(F.col("date") >= F.to_date(F.lit(lo).cast("timestamp")))
            if hi is not None:
                df = df.filter(F.col("date") <= F.to_date(F.lit(hi).cast("timestamp")))
        if col in nanos:
            # Foldable expression: constant-folds to a long literal before
            # predicate pushdown, matching Spark's own literal→timestamp
            # semantics (session timezone) exactly.
            def bound(s):
                return F.unix_micros(F.lit(s).cast("timestamp")) * F.lit(1000)

        elif col in ntz:
            # Route through TIMESTAMP first so a bound string carrying an
            # explicit zone offset selects the same instant as the TIMESTAMP
            # and nanos branches (a direct NTZ cast would drop the offset);
            # for naive strings under the UTC session the two casts are a
            # wall-clock no-op.
            def bound(s):
                return F.lit(s).cast("timestamp").cast("timestamp_ntz")

        else:
            def bound(s):
                return F.lit(s).cast("timestamp")

        if lo is not None:
            df = df.filter(F.col(col) >= bound(lo))
        if hi is not None:
            df = df.filter(F.col(col) < bound(hi))

    for c in nanos:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so operators can be written in SQL."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """CSV source (reference: HTTP CSV scans, qaqc/dashboard.py:231-286).

    Schema should be supplied in production — ``inferSchema`` triggers an
    extra full scan, which is unacceptable on large inputs.
    """
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON source (reference: annotation scans, qaqc/dashboard.py:49-60)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
