"""Sinks and output lifecycle.

The reference's sink layer is PNG/CSV/JSON files synced to S3 with an
anti-entropy pass that deletes objects that were present before but not
regenerated (rca_data_tools/qaqc/plots.py:438-560, qaqc/index.py:20-51).
Engine-side that maps to:

- partitioned parquet/csv/json writes with overwrite-partition semantics
  (the incremental-refresh pattern of SURVEY §2.9: each run regenerates one
  (site, span) partition without touching the rest);
- a stale-output reconciliation that diffs the previous key listing against
  the freshly produced keys with a left-anti join (S15);
- a JSON index sink over a file-listing DataFrame (S13).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet", dynamic: bool = True
) -> None:
    """Overwrite-partition write: only the partitions present in ``df`` are
    replaced (dynamic partition overwrite), the at-scale equivalent of the
    reference's regenerate-one-window refresh."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    if dynamic:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).format(fmt).save(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def stale_outputs(existing: DataFrame, produced: DataFrame, key_col: str = "key") -> DataFrame:
    """Keys present before but not regenerated — the delete set of the
    anti-entropy pass (reference: set difference, qaqc/plots.py:467-511).
    Left-anti join, so it scales to arbitrarily large listings."""
    return existing.join(produced, key_col, "left_anti")


def reconcile_outputs(
    spark: SparkSession, out_dir: str, produced_keys: DataFrame, key_col: str = "key"
) -> list[str]:
    """Delete files under ``out_dir`` whose relative path is not in
    ``produced_keys``. Returns the deleted keys (driver-side: listings are
    metadata, not data — they fit)."""
    listing = []
    for root, _dirs, files in os.walk(out_dir):
        for f in files:
            listing.append(os.path.relpath(os.path.join(root, f), out_dir))
    if not listing:
        return []
    existing = spark.createDataFrame([(k,) for k in listing], f"{key_col} string")
    stale = [r[key_col] for r in stale_outputs(existing, produced_keys, key_col).collect()]
    for k in stale:
        os.remove(os.path.join(out_dir, k))
    return sorted(stale)


def write_index_json(df: DataFrame, path: str) -> None:
    """JSON index sink over a listing DataFrame (reference: qaqc/index.py:20-51)."""
    df.coalesce(1).write.mode("overwrite").json(path)


def file_listing(spark: SparkSession, base_dir: str, extensions: tuple[str, ...] = ()) -> DataFrame:
    """Directory listing as a DataFrame (the input shape of S13/S15)."""
    rows = []
    for root, _dirs, files in os.walk(base_dir):
        for f in files:
            if not extensions or f.endswith(extensions):
                full = os.path.join(root, f)
                rows.append((os.path.relpath(full, base_dir), os.path.getsize(full)))
    return spark.createDataFrame(rows or [], "key string, size bigint")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (and optionally sorted) table — the co-located-join
    layout for fact⋈fact joins that would otherwise shuffle both sides every
    run (e.g. orders⋈lineitem on the order key at 100 TB): two tables
    bucketed by the same columns into the same bucket count join with ZERO
    exchanges, and bucket+sort also removes the sort from sort-merge joins.
    Buckets are the persistent analog of a repartition the cluster would
    otherwise redo per query.

    Bucket metadata lives in the session catalog (saveAsTable); the data is
    external at ``path`` so the repo's file-layout conventions still apply.
    """
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def write_clustered(
    df: DataFrame,
    path: str,
    zorder_cols: "list[str]",
    n_files: int = 8,
    bits: int = 8,
    fmt: str = "parquet",
) -> None:
    """Z-order clustered write: bin the two clustering columns against their
    global bounds, interleave into a Morton key (operators/layout.py), then
    ``repartitionByRange`` + ``sortWithinPandas``-free ``sortWithinPartitions``
    on the key so each output file covers a tight range of BOTH columns —
    parquet footer min/max then skips files for filters on either dimension
    (the Delta OPTIMIZE ZORDER write shape).

    Scale notes: the bounds are one dim-sized aggregate (collected — two
    longs); the range partitioner samples the key like any repartitionByRange;
    the sort is per-partition. One extra shuffle versus a plain write, paid
    once at write time, amortized across every pruned read."""
    from pyspark.sql import functions as F

    from rca_data_tools_spark.operators.layout import bin_to, zorder_key

    a, b = zorder_cols
    bounds = df.agg(
        F.min(a).alias("alo"), F.max(a).alias("ahi"),
        F.min(b).alias("blo"), F.max(b).alias("bhi"),
    ).collect()[0]
    if any(bounds[c] is None for c in ("alo", "ahi", "blo", "bhi")):
        # empty input, or a clustering column that is entirely NULL — there
        # is no range to bin against either way: write the frame as-is
        df.write.mode("overwrite").format(fmt).save(path)
        return
    zk = zorder_key(
        bin_to(F.col(a).cast("long"), F.lit(int(bounds["alo"])), F.lit(int(bounds["ahi"])), bits),
        bin_to(F.col(b).cast("long"), F.lit(int(bounds["blo"])), F.lit(int(bounds["bhi"])), bits),
        bits,
    )
    (
        df.withColumn("__zkey", zk)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )


def compact_partitioned(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> dict:
    """Small-file compaction (the OPTIMIZE maintenance job): rewrite a
    parquet directory so each output file is ~``target_bytes``. Small files
    are the classic death-by-metadata failure at 100 TB — a day of
    per-minute micro-batch appends leaves thousands of KB-sized files whose
    open/footers dominate every scan — and the fix is a periodic rewrite
    sized from the data itself: n_files = ceil(total_bytes / target),
    coalesce (no shuffle — compaction only narrows, never redistributes),
    and an atomic directory swap so readers never see a half-compacted
    state.

    Returns {'files_before', 'files_after', 'bytes'} so the caller (or the
    lifecycle query's oracle) can assert the layout actually changed.
    Content is byte-identical up to row order — compaction must never
    change WHAT a scan returns, only how many files it opens."""
    import math
    import os
    import shutil

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(f".{fmt}") or (not f.startswith(("_", ".")) and f.endswith(".parquet"))
    ]
    total = sum(os.path.getsize(f) for f in files)
    n_before = len(files)
    n_files = max(1, math.ceil(total / target_bytes))
    df = spark.read.format(fmt).load(path)
    tmp = path.rstrip("/") + ".__compact_tmp__"
    df.coalesce(n_files).write.mode("overwrite").format(fmt).save(tmp)
    swap = path.rstrip("/") + ".__compact_old__"
    os.rename(path, swap)
    os.rename(tmp, path)
    shutil.rmtree(swap)
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    return {"files_before": n_before, "files_after": n_after, "bytes": total}


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE-INTO semantics as a DataFrame transform: rows whose key
    matches a source row take the SOURCE version (WHEN MATCHED UPDATE),
    source rows with no target match insert (WHEN NOT MATCHED INSERT), and
    unmatched target rows survive untouched — the lakehouse upsert
    primitive (Delta/Iceberg MERGE), expressed as
    ``target LEFT ANTI source  UNION ALL  source``.

    Scale shape: the anti-join and the union are ONE shuffle of each side
    on the key (the union is shuffle-free); there is no row-by-row driver
    logic and no window. ``merge_upsert_pruned`` adds copy-on-write
    file-level pruning on top (zone-map matched-file detection) so only
    files containing matched keys rewrite — the merge LOGIC is identical.

    Duplicate keys in SOURCE raise, matching Delta/Iceberg MERGE ("multiple
    source rows matched"): silently emitting both versions would make the
    upsert non-deterministic about which one "wins". Deduplicate upstream
    (e.g. max_by on a version column) before merging."""
    if not keys:
        raise ValueError("merge_upsert needs at least one key column")
    missing = [k for k in keys if k not in target.columns or k not in source.columns]
    if missing:
        raise ValueError(f"merge keys missing from target/source: {missing}")
    if set(target.columns) != set(source.columns):
        raise ValueError(
            "merge_upsert requires identical schemas (UPDATE SET * / INSERT *): "
            f"{sorted(set(target.columns) ^ set(source.columns))} differ"
        )
    dup = (
        source.groupBy(*[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(5)
        .collect()
    )
    if dup:
        raise ValueError(
            "merge_upsert: duplicate keys in source (MERGE requires at most "
            f"one source row per target key), e.g. {[tuple(r)[:-1] for r in dup]}"
        )
    return target.join(source, keys, "left_anti").unionByName(source)
