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

    A deletion-vector sidecar (``_deletes``) on the input is MATERIALIZED
    and cleared — the rewrite reads through ``read_with_deletes`` so
    deleted rows stay deleted, and the compacted output carries no sidecar
    (Delta's OPTIMIZE-on-DV-bearing-files semantics; before round 9 this
    path silently resurrected deleted rows — VERDICT r08 item 1). A
    non-parquet format with a sidecar refuses loudly (DVs are a parquet
    lifecycle).

    Returns {'files_before', 'files_after', 'bytes'} so the caller (or the
    lifecycle query's oracle) can assert the layout actually changed.
    Content is identical to the DV-subtracted scan up to row order —
    compaction must never change WHAT a scan returns, only how many files
    it opens."""
    import math
    import os
    import shutil

    if os.path.exists(os.path.join(path, COMMIT_NAME)):
        # a COMMITTED version of a chain: the in-place directory swap would
        # destroy its _commit marker (the version silently vanishes from
        # committed_versions / read_version) and any _changes feed — the
        # chain's compaction is optimize_table, which writes a NEW version
        raise ValueError(
            f"compact_partitioned: {path} is a committed version of a table "
            "chain (it carries a _commit marker); compact the chain with "
            "optimize_table instead — in-place compaction would destroy the "
            "commit marker and the version's change feed"
        )
    dv_present = has_deletes(path)
    if dv_present and fmt != "parquet":
        raise ValueError(
            f"compact_partitioned: {path} carries a {DELETES_NAME} deletion-"
            f"vector sidecar but fmt={fmt!r}; deletion vectors are a parquet "
            "lifecycle — compact the parquet table instead"
        )
    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(f".{fmt}") or (not f.startswith(("_", ".")) and f.endswith(".parquet"))
    ]
    total = sum(os.path.getsize(f) for f in files)
    n_before = len(files)
    n_files = max(1, math.ceil(total / target_bytes))
    if dv_present:
        # merge-on-read materialization: subtract the vectors in the same
        # rewrite that compacts — the output needs (and gets) no sidecar
        df = read_with_deletes(spark, path)
    else:
        df = spark.read.format(fmt).load(path)
    tmp = path.rstrip("/") + ".__compact_tmp__"
    df.coalesce(n_files).write.mode("overwrite").format(fmt).save(tmp)
    swap = path.rstrip("/") + ".__compact_old__"
    os.rename(path, swap)
    os.rename(tmp, path)
    shutil.rmtree(swap)
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    return {"files_before": n_before, "files_after": n_after, "bytes": total}


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    delete_col: "str | None" = None,
    schema_evolution: bool = False,
) -> DataFrame:
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
    (e.g. max_by on a version column) before merging.

    ``delete_col`` names a boolean source column (excluded from the output
    schema): WHEN MATCHED AND <flag> THEN DELETE — flagged keys remove
    their target rows and insert nothing (a flagged key with no target
    match is a no-op, like SQL MERGE). ``schema_evolution=True`` lets the
    source carry NEW columns (added to the table, pre-existing target rows
    read NULL) and OMIT target columns (matched rows PRESERVE their target
    values for unmentioned columns; inserts read NULL) — Delta's
    autoMerge/UPDATE SET * semantics. The evolved path costs one inner
    join + one anti-join instead of one anti-join; the plain path keeps
    the original two-operator plan."""
    if delete_col is not None:
        if delete_col not in source.columns:
            raise ValueError(f"delete_col {delete_col!r} not in source")
        deletes = source.filter(F.col(delete_col)).select(*keys)
        source = source.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
        # no broadcast hint: AQE picks broadcast for batch-sized delete
        # sets and falls back to a shuffled anti-join for a pathological
        # one instead of OOMing on a forced build side (ADVICE r08)
        target = target.join(deletes, keys, "left_anti")
    if not schema_evolution:
        _check_merge_inputs(target, source, keys)
        source = _dup_guarded(source, keys)
        return target.join(source, keys, "left_anti").unionByName(source)
    bad = [c for c in keys if c not in target.columns or c not in source.columns]
    if bad:
        raise ValueError(f"merge keys missing from target/source: {bad}")
    source = _dup_guarded(source, keys)
    t_only = [c for c in target.columns if c not in source.columns]
    matched = target.select(*keys, *t_only).join(source, keys, "inner")
    unmatched = target.join(source, keys, "left_anti")
    inserts = source.join(target, keys, "left_anti")
    return (
        unmatched.unionByName(matched, allowMissingColumns=True)
        .unionByName(inserts, allowMissingColumns=True)
    )


def _check_merge_inputs(target: DataFrame, source: DataFrame, keys: list[str]) -> None:
    """Shared MERGE metadata validation (driver-side, schema-only — cheap
    and eager): key presence and identical schemas. The duplicate-source-
    key refusal is enforced IN-PLAN by ``_dup_guarded`` so the merge stays
    a lazy transform (the old collect() probe made every merge eager and
    computed a non-deterministic source twice — ADVICE r08)."""
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


def _validate_full_clauses(
    value_cols: list,
    nmbs_update_set: "dict[str, str] | None",
    nmbs_update_cond: "str | None",
) -> None:
    """merge_full's clause-combination validation, shared so the pruned
    path can run it EAGERLY even when no target file matches (the
    fallback used to skip straight to the insert set, committing a
    mis-specified clause combination silently — ADVICE r10)."""
    if nmbs_update_cond is not None and not nmbs_update_set:
        raise ValueError(
            "merge_full: nmbs_update_cond without nmbs_update_set does nothing"
        )
    bad_set = sorted(set(nmbs_update_set or ()) - set(value_cols))
    if bad_set:
        raise ValueError(
            f"merge_full: nmbs_update_set may only assign value columns; "
            f"{bad_set} are keys or unknown"
        )


def _dup_guarded(source: DataFrame, keys: list[str]) -> DataFrame:
    """The Delta/Iceberg MERGE duplicate-source-key refusal, enforced inside
    the merge job itself: the first key column is wrapped in a guarded
    expression that raises at EXECUTION time when its key group holds more
    than one source row. Because the guard lives on a join key it can never
    be pruned out of the plan, the check runs on exactly the rows being
    merged (a non-deterministic source cannot pass validation yet merge
    different rows), and the merge remains a lazy transform — no extra
    job, one batch-sized window shuffle on the same keys the merge joins
    on (AQE reuses the partitioning)."""
    from pyspark.sql.window import Window

    n = F.count(F.lit(1)).over(Window.partitionBy(*[F.col(k) for k in keys]))
    msg = F.concat(
        F.lit(
            "merge_upsert: duplicate keys in source (MERGE requires at most "
            "one source row per target key), e.g. "
        ),
        F.concat_ws("|", *[F.col(k).cast("string") for k in keys]),
    )
    guard = F.when(n > 1, F.raise_error(msg)).otherwise(F.col(keys[0]))
    return source.withColumn(keys[0], guard.cast(source.schema[keys[0]].dataType))


def merge_full(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    matched_update_cond: "str | None" = None,
    matched_delete_cond: "str | None" = None,
    insert_cond: "str | None" = None,
    nmbs_update_set: "dict[str, str] | None" = None,
    nmbs_update_cond: "str | None" = None,
    nmbs_delete_cond: "str | None" = None,
) -> DataFrame:
    """The COMPLETE SQL MERGE clause surface (Delta/Iceberg ``MERGE INTO``)
    as one DataFrame transform — ``merge_upsert`` covers the plain upsert;
    this adds every conditional clause:

    - ``WHEN MATCHED AND <matched_delete_cond> THEN DELETE`` — checked
      FIRST (documented clause order: delete, then update);
    - ``WHEN MATCHED AND <matched_update_cond> THEN UPDATE SET *`` — an
      unsatisfied condition KEEPS the target row (with no condition every
      match updates, = merge_upsert);
    - ``WHEN NOT MATCHED AND <insert_cond> THEN INSERT *`` — an unsatisfied
      (or NULL) condition drops the source row;
    - ``WHEN NOT MATCHED BY SOURCE AND <nmbs_delete_cond> THEN DELETE`` /
      ``... THEN UPDATE SET <nmbs_update_set>`` — target rows with NO
      source match, the clause Delta added for sync-style merges (purge
      rows absent from the feed, flag stale rows); delete checked first.

    Condition language: ``matched_*`` conditions see BOTH rows and use the
    ``t.``/``s.`` prefixes (e.g. ``"s.value > t.value"`` — only upgrade);
    ``insert_cond`` sees bare SOURCE columns; ``nmbs_*`` conditions and
    ``nmbs_update_set`` expressions see bare TARGET columns. A NULL
    condition never fires its clause (SQL WHEN semantics, both engines).

    Scale shape: ONE full-outer shuffle join on the keys — single-side
    conditions are precomputed as boolean columns before the join (no
    ambiguity, no re-evaluation), both-side conditions resolve against the
    ``t``/``s`` dataset aliases. No windows beyond merge's in-plan
    duplicate-source-key guard, no driver loops. ``merge_full_pruned``
    adds copy-on-write file pruning: files containing source keys PLUS
    files holding a row satisfying a not-matched-by-source condition
    rewrite; everything else hardlinks."""
    j, fl, value_cols = _merge_full_join(
        target, source, keys,
        matched_update_cond, matched_delete_cond, insert_cond,
        nmbs_update_set, nmbs_update_cond, nmbs_delete_cond,
    )
    keep = (
        (fl["is_m"] & ~fl["m_del"])
        | (fl["s_only"] & fl["ins_ok"])
        | (fl["t_only"] & ~fl["nm_del"])
    )
    out_cols = [
        F.coalesce(F.col(f"t.{k}"), F.col(f"s.{k}")).alias(k) for k in keys
    ]
    for c in value_cols:
        col = (
            F.when(fl["s_only"], F.col(f"s.{c}"))
            .when(fl["is_m"] & fl["m_upd"], F.col(f"s.{c}"))
        )
        if nmbs_update_set and c in nmbs_update_set:
            col = col.when(fl["t_only"] & fl["nm_upd"], F.col(f"t.__set_{c}"))
        out_cols.append(col.otherwise(F.col(f"t.{c}")).alias(c))
    return j.filter(keep).select(*out_cols)


def _merge_full_join(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    matched_update_cond: "str | None",
    matched_delete_cond: "str | None",
    insert_cond: "str | None",
    nmbs_update_set: "dict[str, str] | None",
    nmbs_update_cond: "str | None",
    nmbs_delete_cond: "str | None",
) -> tuple:
    """merge_full's validated full-outer join plus its clause flags —
    shared by the row output (``merge_full``) and the change-data-feed
    (``merge_full_changes``) so the two can never drift. Returns
    (joined, flags, value_cols); flags are Columns over the ``t``/``s``
    aliased join: is_m/t_only/s_only row classes and
    m_del/m_upd/ins_ok/nm_del/nm_upd clause verdicts."""
    _check_merge_inputs(target, source, keys)
    value_cols = [c for c in target.columns if c not in keys]
    _validate_full_clauses(value_cols, nmbs_update_set, nmbs_update_cond)
    source = _dup_guarded(source, keys)

    # single-side conditions evaluate BEFORE the join, where bare column
    # names are unambiguous; the results ride the join as boolean columns
    s = source.withColumn("__s", F.lit(True))
    if insert_cond is not None:
        s = s.withColumn("__ins", F.expr(insert_cond))
    t = target.withColumn("__t", F.lit(True))
    if nmbs_delete_cond is not None:
        t = t.withColumn("__nmdel", F.expr(nmbs_delete_cond))
    if nmbs_update_set:
        t = t.withColumn(
            "__nmupd",
            F.expr(nmbs_update_cond) if nmbs_update_cond is not None else F.lit(True),
        )
        for c, expr in nmbs_update_set.items():
            t = t.withColumn(
                f"__set_{c}", F.expr(expr).cast(target.schema[c].dataType)
            )
    j = t.alias("t").join(
        s.alias("s"),
        [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys],
        "full_outer",
    )

    is_m = F.col("t.__t").isNotNull() & F.col("s.__s").isNotNull()
    fl = {
        "is_m": is_m,
        "t_only": F.col("s.__s").isNull(),
        "s_only": F.col("t.__t").isNull(),
        "m_del": (
            is_m & F.coalesce(F.expr(matched_delete_cond), F.lit(False))
            if matched_delete_cond is not None
            else F.lit(False)
        ),
        "m_upd": (
            F.coalesce(F.expr(matched_update_cond), F.lit(False))
            if matched_update_cond is not None
            else F.lit(True)
        ),
        "ins_ok": (
            F.coalesce(F.col("s.__ins"), F.lit(False))
            if insert_cond is not None
            else F.lit(True)
        ),
        "nm_del": (
            F.coalesce(F.col("t.__nmdel"), F.lit(False))
            if nmbs_delete_cond is not None
            else F.lit(False)
        ),
        "nm_upd": (
            F.coalesce(F.col("t.__nmupd"), F.lit(False))
            if nmbs_update_set
            else F.lit(False)
        ),
    }
    return j, fl, value_cols


def merge_full_changes(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    matched_update_cond: "str | None" = None,
    matched_delete_cond: "str | None" = None,
    insert_cond: "str | None" = None,
    nmbs_update_set: "dict[str, str] | None" = None,
    nmbs_update_cond: "str | None" = None,
    nmbs_delete_cond: "str | None" = None,
) -> DataFrame:
    """The change-data-feed a FULL-CLAUSE merge produces, in merge_changes'
    exact schema (keys, op, before_*/after_* per value column) so
    ``read_changes`` unions it into the one replayable stream: matched
    deletes and not-matched-by-source deletes emit op='delete' (after_*
    NULL), applied updates emit op='update' with both images, accepted
    inserts emit op='insert' (before_* NULL) — and rows no clause touched
    (unmatched-kept targets, condition-failed updates/inserts) emit
    NOTHING, which is what makes the feed O(touched rows), not O(table).
    Shares merge_full's join/flag construction so feed and table can never
    disagree about which clause fired."""
    j, fl, value_cols = _merge_full_join(
        target, source, keys,
        matched_update_cond, matched_delete_cond, insert_cond,
        nmbs_update_set, nmbs_update_cond, nmbs_delete_cond,
    )
    upd_m = fl["is_m"] & ~fl["m_del"] & fl["m_upd"]
    upd_nm = fl["t_only"] & ~fl["nm_del"] & fl["nm_upd"]
    op = (
        F.when(fl["m_del"], F.lit("delete"))
        .when(upd_m, F.lit("update"))
        .when(fl["s_only"] & fl["ins_ok"], F.lit("insert"))
        .when(fl["t_only"] & fl["nm_del"], F.lit("delete"))
        .when(upd_nm, F.lit("update"))
    )
    cols = [
        *[F.coalesce(F.col(f"t.{k}"), F.col(f"s.{k}")).alias(k) for k in keys],
        op.alias("op"),
    ]
    for c in value_cols:
        dt = target.schema[c].dataType
        cols.append(
            F.when(fl["s_only"], F.lit(None).cast(dt))
            .otherwise(F.col(f"t.{c}"))
            .alias(f"before_{c}")
        )
        after = (
            F.when(fl["m_del"] | (fl["t_only"] & fl["nm_del"]), F.lit(None).cast(dt))
            .when(upd_m | fl["s_only"], F.col(f"s.{c}"))
        )
        if nmbs_update_set and c in nmbs_update_set:
            after = after.when(upd_nm, F.col(f"t.__set_{c}"))
        cols.append(after.otherwise(F.col(f"t.{c}")).alias(f"after_{c}"))
    return j.filter(op.isNotNull()).select(*cols)


def merge_changes(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """The change-data-feed a MERGE produces (Delta CDF shape, no deletes):
    one row per SOURCE key — op = 'update' when the key exists in the
    target (before_* carries the replaced target values), 'insert' when it
    does not (before_* NULL); after_* always carries the source values.
    Unmatched target rows are untouched and emit nothing.

    Downstream consumers replay this feed instead of diffing table
    versions — at 100 TB the feed is O(source batch), the diff is O(table).
    Scale shape: one left join of the batch-sized source against the
    target on the key (broadcastable when the batch is small), zero
    windows. Same validation contract as merge_upsert (duplicate source
    keys raise at execution time via the in-plan guard)."""
    _check_merge_inputs(target, source, keys)
    source = _dup_guarded(source, keys)
    value_cols = [c for c in source.columns if c not in keys]
    t = target.select(
        *keys,
        F.lit(1).alias("__matched"),
        *[F.col(c).alias(f"before_{c}") for c in value_cols],
    )
    s = source.select(*keys, *[F.col(c).alias(f"after_{c}") for c in value_cols])
    joined = s.join(t, keys, "left")
    op = F.when(F.col("__matched").isNotNull(), F.lit("update")).otherwise(F.lit("insert"))
    cols = [*keys, op.alias("op")]
    for c in value_cols:
        cols += [F.col(f"before_{c}"), F.col(f"after_{c}")]
    return joined.select(*cols)


def _ensure_out_dir(out_dir: str) -> None:
    """A new version's out_dir must be fresh — but an EMPTY pre-created
    directory is fine: the chain-advancing DML (``_advance_table``) claims
    the version number by creating the directory (its O_EXCL mutex) before
    delegating the build here."""
    if os.path.isdir(out_dir):
        if os.listdir(out_dir):
            raise FileExistsError(f"out_dir {out_dir} already has content")
    else:
        os.makedirs(out_dir)


MANIFEST_NAME = "_manifest.json"


def _read_manifest_doc(target_dir: str) -> "dict | None":
    import json

    path = os.path.join(target_dir, MANIFEST_NAME)
    if not os.path.exists(path):
        return None
    return json.loads(open(path).read())


def _read_manifest(target_dir: str, zone_key: str) -> "dict | None":
    """The version's persisted zone map for ``zone_key`` ({basename:
    {mn, mx}}), or None when absent (then the caller scans). The primary
    ``zone_key`` map answers first; a SECONDARY per-column map
    (``columns`` — written by OPTIMIZE ZORDER for both clustering
    dimensions, VERDICT r09 item 5) answers for any other column it
    covers, so a pruned MERGE keyed on the second Z-order dimension stays
    metadata-only instead of paying a key-column scan."""
    doc = _read_manifest_doc(target_dir)
    if doc is None:
        return None
    if doc.get("zone_key") == zone_key:
        return doc["files"]
    return doc.get("columns", {}).get(zone_key)


def _write_manifest(
    out_dir: str,
    zone_key: str,
    entries: dict,
    col_entries: "dict[str, dict] | None" = None,
) -> bool:
    """Persist the zone map next to the data: the primary ``zone_key`` map
    plus optional per-column maps ({col: {basename: {mn, mx}}}) for other
    prunable columns. Zone values that don't JSON-serialize (exotic types)
    drop that map — the next merge falls back to the scan path, never to
    wrong pruning."""
    import json

    body = {"zone_key": zone_key, "files": entries}
    if col_entries:
        safe = {}
        for c, m in col_entries.items():
            try:
                json.dumps(m)
            except TypeError:
                continue
            safe[c] = m
        if safe:
            body["columns"] = safe
    try:
        doc = json.dumps(body)
    except TypeError:
        return False
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        f.write(doc)
    return True


def manifest_candidate_files(
    table_dir: str, key_col: str, values: list
) -> "list[str] | None":
    """Metadata-only file pruning by the persisted zone-map manifest: the
    data-file basenames whose [mn, mx] range for ``key_col`` could contain
    ANY of ``values`` — or None when the manifest has no bounds for that
    column or fails the disk cross-check (then every file is a candidate;
    staleness costs opens, never answers). NULL-bounded entries (0-row or
    all-NULL files) can never contain a match and always prune."""
    doc = _read_manifest_doc(table_dir)
    if doc is None:
        return None
    if doc.get("zone_key") == key_col:
        m = doc.get("files")
    else:
        m = doc.get("columns", {}).get(key_col)
    if m is None:
        return None
    disk = {f for f in os.listdir(table_dir) if f.endswith(".parquet")}
    if set(m) != disk:
        return None
    out = []
    for name, e in m.items():
        mn, mx = e.get("mn"), e.get("mx")
        if mn is None or mx is None:
            continue
        try:
            if any(mn <= v <= mx for v in values):
                out.append(name)
        except TypeError:
            return None  # incomparable types: no pruning, never wrong
    return sorted(out)


def merge_upsert_pruned(
    spark: SparkSession,
    target_dir: str,
    out_dir: str,
    source: DataFrame,
    keys: list[str],
    schema_ddl: str,
    zone_key: str | None = None,
    delete_col: "str | None" = None,
) -> dict:
    """Copy-on-write MERGE with zone-map FILE pruning — the table-format
    shape (Delta/Iceberg copy-on-write): instead of rewriting the whole
    target, only files that actually CONTAIN a matched key are rewritten;
    every untouched file carries over to the new table version as-is
    (hardlinked here — a format would re-point metadata at the same object).

    Three metadata-sized passes pick the rewrite set:

    1. zone map: per-file (min, max) of ``zone_key`` — read from the
       version's persisted MANIFEST (``_manifest.json``, written by the
       previous merge) when present, exactly as a format reads its
       manifest/parquet footers: KBs of metadata, ZERO data scan. A target
       with no manifest (the initial version) pays one key-column scan and
       every version this function writes carries one forward, so merge
       chains scan at most once;
    2. candidates: source keys range-join the files-sized zone map
       (broadcast) — files whose key range could contain a match;
    3. exact: candidate files only are opened and semi-joined with the
       source keys — files with no actual match fall back out (zone maps
       over-approximate; correctness never depends on pruning).

    The rewrite itself is ``merge_upsert`` (anti-join + union, MERGE
    duplicate-source-key check included) over ONLY the matched files' rows;
    source rows matching nothing are inserts and land in the new parts.
    Every target row with a source match lives in a matched file by
    construction, so no update can be missed by pruning.

    A deletion-vector sidecar on ``target_dir`` composes correctly: the
    matched-file rewrite reads THROUGH the vectors (deleted rows do not
    resurrect — VERDICT r08 item 1), the exact-containment pass ignores
    deleted rows (a file whose only "matches" are deleted rows is not
    rewritten), and the sidecar entries of carried-over (hardlinked) files
    follow them into the new version; rewritten files drop their entries
    (their deletes are now physical).

    ``delete_col`` names a boolean source column with merge_upsert's WHEN
    MATCHED AND <flag> THEN DELETE semantics — flagged keys count as
    matches for pruning (their files must rewrite to drop the rows).

    Returns {"files_total", "files_candidates", "files_rewritten",
    "manifest_used"}. ``out_dir`` must not exist; the new version is built
    there (hardlinks + new parquet parts + its own manifest), leaving
    ``target_dir`` immutable — the snapshot isolation a format gives via
    its log."""
    zone_key = zone_key or keys[0]
    # Eager validation BEFORE the pruning passes: the no-matched-files
    # fallback (first batch of a feed) used to set merged = source without
    # ever running the schema check or the duplicate-source-key guard,
    # silently committing a permanent one-row-per-key violation (ADVICE
    # r10, medium). The probe frame is empty — schema-only, driver-side.
    if delete_col is not None and delete_col not in source.columns:
        raise ValueError(f"delete_col {delete_col!r} not in source")
    _check_merge_inputs(
        spark.createDataFrame([], schema_ddl),
        source.drop(delete_col) if delete_col is not None else source,
        keys,
    )
    stats, manifest_used = _zone_file_stats(spark, target_dir, zone_key, schema_ddl)
    dv = read_deletion_vectors(spark, target_dir)
    all_files = sorted(stats)
    # persist the SOURCE and its distinct key set: the source plan (often an
    # aggregate at sf-scale) is consumed by THREE jobs per merge — the
    # zone-map range join, the exact-containment semi-join (via skeys), and
    # the rewrite union itself — and each would otherwise recompute it from
    # scratch (guide §5: cache only what is reused and more expensive to
    # recompute than to hold; a merge batch is both, and holding it costs at
    # most one batch spill where recomputing costs a full source pass per
    # job). Both are released in the finally.
    source = source.persist()
    skeys = source.select(*keys).distinct().persist()
    try:
        cand_files, matched = _source_matched_files(
            spark, stats, skeys, zone_key, schema_ddl, dv
        )
        if matched:
            mdf = spark.read.schema(schema_ddl).parquet(*matched)
            if dv is not None:
                mdf = _subtract_deletes(mdf, dv)  # rewrite through the vectors
            merged = merge_upsert(mdf, source, keys, delete_col=delete_col)
        elif delete_col is not None:
            # no target file contains any source key: flagged rows are no-op
            # deletes (SQL MERGE), the rest are plain inserts — still
            # dup-guarded (same in-plan guard merge_upsert applies after its
            # own delete-flag split)
            merged = _dup_guarded(
                source.filter(
                    ~F.coalesce(F.col(delete_col), F.lit(False))
                ).drop(delete_col),
                keys,
            )
        else:
            merged = _dup_guarded(source, keys)
        return _finish_cow_version(
            spark, target_dir, out_dir, merged, matched, all_files, stats, dv,
            zone_key, schema_ddl, len(cand_files), manifest_used,
        )
    finally:
        skeys.unpersist()
        source.unpersist()


def _local_path(uri: str) -> str:
    """``input_file_name``/``_metadata.file_path`` return ``file:`` URIs on
    a local filesystem; strip back to a plain path (pass-through for real
    object-store URIs)."""
    from urllib.parse import unquote, urlparse

    p = urlparse(uri)
    return unquote(p.path) if p.scheme in ("file", "") else uri


def _footer_file_stats(
    paths: "list[str]", cols: "list[str]"
) -> "dict | None":
    """Exact per-file (min, max) for integer-typed columns straight from the
    parquet FOOTERS — KB metadata reads on the driver, zero data scan, zero
    Spark jobs (what a real format reads from its manifest instead of
    re-scanning data it just wrote — guide §6). Returns
    {path: {col: (mn, mx)}} or None when any file lacks trustworthy stats
    for any requested column; callers then fall back to the one-pass column
    scan, so staleness costs a scan, never a wrong bound.

    Integer columns only, on purpose: INT32/INT64 footer min/max are exact
    by spec, while double stats are unreliable around NaN (writers order it
    inconsistently and Spark ranks NaN greatest) and binary stats may be
    truncated. A file whose rows are all NULL in ``col`` reports
    (None, None) — the same never-a-candidate bound the scan path yields."""
    try:
        import pyarrow.parquet as pq
    except ImportError:
        return None
    out: dict = {}
    for p in paths:
        try:
            md = pq.ParquetFile(p).metadata
        except Exception:
            return None
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        per_col: dict = {}
        for c in cols:
            if c not in names:
                return None
            i = names.index(c)
            sc = md.schema.column(i)
            lt = str(sc.logical_type)
            if sc.physical_type not in ("INT32", "INT64") or not (
                lt == "None" or (lt.startswith("Int(") and "isSigned=true" in lt)
            ):
                return None
            mn = mx = None
            for rg in range(md.num_row_groups):
                cm = md.row_group(rg).column(i)
                s = cm.statistics
                if s is None:
                    return None
                if not s.has_min_max:
                    # an all-NULL group legitimately has no bounds; a group
                    # with live values but no bounds is untrustworthy
                    if s.null_count is not None and s.null_count == cm.num_values:
                        continue
                    return None
                smn, smx = s.min, s.max
                if not isinstance(smn, int) or not isinstance(smx, int):
                    return None
                mn = smn if mn is None else min(mn, smn)
                mx = smx if mx is None else max(mx, smx)
            per_col[c] = (mn, mx)
        out[p] = per_col
    return out


def _zone_file_stats(
    spark: SparkSession, target_dir: str, zone_key: str, schema_ddl: str
) -> "tuple[dict, bool]":
    """Per-file (min, max) of ``zone_key`` for every data file of a version:
    read from the persisted MANIFEST when present AND consistent with the
    directory listing (a data file the manifest doesn't know about — e.g.
    appended by a plain Spark write — must not silently vanish from the next
    version, so an inconsistent manifest falls back to the scan path), else
    one key-column scan. Returns ({path: (mn, mx)}, manifest_used)."""
    disk_files = sorted(
        os.path.join(target_dir, f)
        for f in os.listdir(target_dir)
        if f.endswith(".parquet")
    )
    manifest = _read_manifest(target_dir, zone_key)
    if manifest is not None and {
        os.path.join(target_dir, n) for n in manifest
    } != set(disk_files):
        manifest = None
    if manifest is not None:
        stats = {
            os.path.join(target_dir, name): (e["mn"], e["mx"])
            for name, e in manifest.items()
        }
        return stats, True
    # no manifest: parquet footers answer without a data scan (integer zone
    # keys; anything else falls back to the one-column Spark scan)
    footer = _footer_file_stats(disk_files, [zone_key])
    if footer is not None:
        return {p: footer[p][zone_key] for p in disk_files}, False
    back = spark.read.schema(schema_ddl).parquet(target_dir)
    stats = {
        _local_path(r["__f"]): (r["mn"], r["mx"])
        for r in back.groupBy(F.input_file_name().alias("__f"))
        .agg(F.min(zone_key).alias("mn"), F.max(zone_key).alias("mx"))
        .collect()
    }
    return stats, False


def _source_matched_files(
    spark: SparkSession,
    stats: dict,
    skeys: DataFrame,
    zone_key: str,
    schema_ddl: str,
    dv: "DataFrame | None",
) -> "tuple[list, list]":
    """The COW rewrite set driven by SOURCE KEYS: a files-sized broadcast
    range join of the distinct source keys against the zone stats picks
    range candidates, then ONLY those files are opened and semi-joined with
    the keys — through the deletion vectors, so a file whose only containing
    rows are deleted stays a carried hardlink. Returns (cand_files, matched);
    zone maps over-approximate, the exact pass never does."""
    keys = skeys.columns
    # files with NULL zone bounds (0-row parts, all-NULL zone column) can
    # never contain a match: they skip the candidate join entirely and stay
    # hardlinks — also keeps createDataFrame from inferring an all-None column
    zrows = [
        (f, mn, mx) for f, (mn, mx) in stats.items()
        if mn is not None and mx is not None
    ]
    if zrows:
        zdf = spark.createDataFrame(zrows, ["__f", "mn", "mx"])
        cand_files = [
            r["__f"]
            for r in skeys.join(
                F.broadcast(zdf),
                (F.col(zone_key) >= F.col("mn")) & (F.col(zone_key) <= F.col("mx")),
            )
            .select("__f")
            .distinct()
            .collect()
        ]
    else:
        cand_files = []
    if not cand_files:
        return [], []
    cdf = spark.read.schema(schema_ddl).parquet(*cand_files)
    if dv is not None:
        # deleted rows are not matches: a file whose only containing
        # rows are deleted must stay a hardlink, not a rewrite. The
        # file path is captured from _metadata BEFORE the anti-join
        # (input_file_name cannot sit above a multi-source join).
        keyed = cdf.select(
            *keys,
            F.col("_metadata.file_path").alias("__f"),
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("__fb"),
            F.col("_metadata.row_index").alias("__pos"),
        )
        fdf = keyed.join(
            dv,
            (keyed["__fb"] == dv["f"]) & (keyed["__pos"] == dv["pos"]),
            "left_anti",
        )
    else:
        fdf = cdf.withColumn("__f", F.input_file_name())
    matched = sorted(
        _local_path(r["__f"])
        for r in fdf.join(F.broadcast(skeys), keys, "left_semi")
        .select("__f")
        .distinct()
        .collect()
    )
    return cand_files, matched


def _finish_cow_version(
    spark: SparkSession,
    target_dir: str,
    out_dir: str,
    merged: DataFrame,
    matched: list,
    all_files: list,
    stats: dict,
    dv: "DataFrame | None",
    zone_key: str,
    schema_ddl: str,
    n_candidates: int,
    manifest_used: bool,
) -> dict:
    """Materialize a copy-on-write version: hardlink every unmatched file,
    carry its deletion-vector and bloom-index sidecar rows, append the
    rewrite as ~one part per rewritten file, and persist the new version's
    manifest (carried entries copied, new parts paying one batch-sized
    stats scan — secondary per-column maps ride the same scan). Shared by
    every merge flavor (``merge_upsert_pruned``, ``merge_full_pruned``)."""
    _ensure_out_dir(out_dir)
    matched_set = set(matched)
    carried = {}
    for f in all_files:
        if f not in matched_set:
            name = os.path.basename(f)
            os.link(f, os.path.join(out_dir, name))
            mn, mx = stats[f]
            carried[name] = {"mn": mn, "mx": mx}
    from pyspark.sql import Observation

    if dv is not None and carried:
        # carried files keep their deletion vectors (same immutable bytes);
        # rewritten files drop theirs — the rewrite materialized them.
        # Executor-side filter + write, same as delete_where's sidecar.
        # The survivor count rides the write job as an Observation — the
        # old read-back count() was a whole extra Spark job per version
        # (guide §1.4: measure on the action you already pay for).
        carried_names = F.array(*[F.lit(n) for n in sorted(carried)])
        survivors = dv.filter(F.array_contains(carried_names, F.col("f")))
        obs_dv = Observation()
        survivors.observe(obs_dv, F.count(F.lit(1)).alias("n")).coalesce(
            8
        ).write.parquet(_deletes_dir(out_dir))
        if obs_dv.get["n"] == 0:  # every vector belonged to a rewritten file
            import shutil

            shutil.rmtree(_deletes_dir(out_dir), ignore_errors=True)
    bdir = os.path.join(target_dir, BLOOM_NAME)
    if os.path.isdir(bdir) and carried:
        # bloom index follows the same carry rule as the deletion vectors:
        # carried (byte-identical) files keep their row, rewritten files
        # drop theirs (stale bits would still be one-sided, but dropping is
        # exact: unindexed files are always-candidates in point_lookup)
        bl = spark.read.parquet(bdir)
        carried_arr = F.array(*[F.lit(n) for n in sorted(carried)])
        surv = bl.filter(F.array_contains(carried_arr, F.col("f")))
        obs_bl = Observation()
        surv.observe(obs_bl, F.count(F.lit(1)).alias("n")).coalesce(
            8
        ).write.parquet(os.path.join(out_dir, BLOOM_NAME))
        if obs_bl.get["n"] == 0:
            import shutil

            shutil.rmtree(os.path.join(out_dir, BLOOM_NAME), ignore_errors=True)
        elif os.path.exists(os.path.join(bdir, "_key_type")):
            os.link(
                os.path.join(bdir, "_key_type"),
                os.path.join(out_dir, BLOOM_NAME, "_key_type"),
            )
    # new parts append alongside the carried-over files; a format would make
    # this visible atomically via its commit log — here the new DIRECTORY is
    # the new version, so readers of out_dir only ever see a complete table.
    # Coalesce to ~one part per rewritten file: the rewrite volume is
    # (matched files + the batch), and letting it scatter over every
    # shuffle partition would turn each merge into a small-file factory
    # (compact_partitioned exists, but not creating the problem is cheaper)
    merged.coalesce(max(1, len(matched))).write.mode("append").parquet(out_dir)
    # manifest for the NEW version: carried entries are copied (their files
    # are byte-identical), new parts pay one batch-sized stats scan.
    # SECONDARY per-column maps (OPTIMIZE ZORDER's second dimension) carry
    # the same way when they pass the disk cross-check, and the new parts'
    # stats for them ride the SAME single scan
    col_entries: dict = {}
    prior_doc = _read_manifest_doc(target_dir)
    if prior_doc is not None:
        maps = dict(prior_doc.get("columns", {}))
        zk0 = prior_doc.get("zone_key")
        if zk0 is not None and zk0 not in maps:
            maps[zk0] = prior_doc.get("files", {})
        maps.pop(zone_key, None)  # the primary map covers the merge key
        disk_names = {os.path.basename(f) for f in all_files}
        carried_names = set(carried)
        for c, m in maps.items():
            if set(m) == disk_names:  # complete (trustworthy) maps only
                col_entries[c] = {
                    n: e for n, e in m.items() if n in carried_names
                }
    new_parts = [
        f for f in os.listdir(out_dir)
        if f.endswith(".parquet") and f not in carried
    ]
    if new_parts:
        # footer-first: the new parts were just written by this very job, so
        # their min/max is already sitting in their footers — read THAT (KB
        # metadata, no Spark job) instead of re-scanning bytes we just wrote
        part_paths = [os.path.join(out_dir, f) for f in new_parts]
        footer = _footer_file_stats(
            part_paths, [zone_key, *col_entries]
        )
        if footer is not None:
            for p in part_paths:
                name = os.path.basename(p)
                mn, mx = footer[p][zone_key]
                carried[name] = {"mn": mn, "mx": mx}
                for c in col_entries:
                    cmn, cmx = footer[p][c]
                    col_entries[c][name] = {"mn": cmn, "mx": cmx}
        else:
            ndf = spark.read.schema(schema_ddl).parquet(*part_paths)
            col_entries = {c: m for c, m in col_entries.items() if c in ndf.columns}
            aggs = [F.min(zone_key).alias("mn"), F.max(zone_key).alias("mx")]
            for c in col_entries:
                aggs += [F.min(c).alias(f"mn__{c}"), F.max(c).alias(f"mx__{c}")]
            for r in (
                ndf.groupBy(F.input_file_name().alias("__f")).agg(*aggs).collect()
            ):
                name = os.path.basename(_local_path(r["__f"]))
                carried[name] = {"mn": r["mn"], "mx": r["mx"]}
                for c in col_entries:
                    col_entries[c][name] = {"mn": r[f"mn__{c}"], "mx": r[f"mx__{c}"]}
    _write_manifest(out_dir, zone_key, carried, col_entries or None)
    return {
        "files_total": len(all_files),
        "files_candidates": n_candidates,
        "files_rewritten": len(matched),
        "manifest_used": manifest_used,
    }


def merge_full_pruned(
    spark: SparkSession,
    target_dir: str,
    out_dir: str,
    source: DataFrame,
    keys: list[str],
    schema_ddl: str,
    zone_key: "str | None" = None,
    matched_update_cond: "str | None" = None,
    matched_delete_cond: "str | None" = None,
    insert_cond: "str | None" = None,
    nmbs_update_set: "dict[str, str] | None" = None,
    nmbs_update_cond: "str | None" = None,
    nmbs_delete_cond: "str | None" = None,
    constraints: "dict[str, str] | None" = None,
) -> dict:
    """Copy-on-write ``merge_full`` with file pruning. The rewrite set is
    the UNION of two halves:

    1. files actually containing a SOURCE-KEY match (zone-map candidates →
       exact semi-join containment, through the deletion vectors — the
       same three metadata-sized passes as ``merge_upsert_pruned``);
    2. when a NOT-MATCHED-BY-SOURCE clause is present, files holding at
       least one row satisfying its condition — those rows' keys are by
       definition NOT in the source, so key pruning alone would miss them
       (the reason Delta scans the whole target when this clause appears).
       One exact predicate scan through the deletion vectors finds them;
       the scan over-approximates per FILE, never per row (a satisfying
       row that turns out to be source-matched just means the file
       rewrites, and the rewrite applies the exact clause semantics).

    Everything else hardlinks, with deletion-vector / bloom / manifest
    sidecar carry identical to ``merge_upsert_pruned``. ``constraints``
    (rule → SQL predicate) are enforced in-plan on the REWRITTEN output —
    every new byte is validated; carried files were validated when
    written. Returns merge_upsert_pruned's stats plus {"files_nmbs"}."""
    zone_key = zone_key or keys[0]
    # Eager schema + clause validation (ADVICE r10, medium): the
    # no-matched-files fallback must refuse the same inputs the non-empty
    # path refuses — a first-batch merge is not a validation holiday.
    probe = spark.createDataFrame([], schema_ddl)
    _check_merge_inputs(probe, source, keys)
    _validate_full_clauses(
        [c for c in probe.columns if c not in keys],
        nmbs_update_set, nmbs_update_cond,
    )
    stats, manifest_used = _zone_file_stats(spark, target_dir, zone_key, schema_ddl)
    dv = read_deletion_vectors(spark, target_dir)
    all_files = sorted(stats)
    # same reuse argument as merge_upsert_pruned: the source plan feeds the
    # two pruning passes AND the clause join — persist once, release at the
    # end (guide §5)
    source = source.persist()
    skeys = source.select(*keys).distinct().persist()
    try:
        cand_files, key_matched = _source_matched_files(
            spark, stats, skeys, zone_key, schema_ddl, dv
        )
        nmbs_files: list = []
        nmbs_parts = []
        if nmbs_delete_cond is not None:
            nmbs_parts.append(f"({nmbs_delete_cond})")
        if nmbs_update_set:
            nmbs_parts.append(
                f"({nmbs_update_cond})" if nmbs_update_cond is not None else "true"
            )
        if nmbs_parts and all_files:
            pred = " OR ".join(nmbs_parts)
            base = spark.read.schema(schema_ddl).parquet(*all_files)
            keyed = base.select(
                F.col("_metadata.file_path").alias("__f"),
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ).alias("__fb"),
                F.col("_metadata.row_index").alias("__pos"),
                F.coalesce(F.expr(pred), F.lit(False)).alias("__hit"),
            )
            if dv is not None:
                # a deleted row satisfying the condition must not force a
                # rewrite: it is already gone from every read
                keyed = keyed.join(
                    dv,
                    (keyed["__fb"] == dv["f"]) & (keyed["__pos"] == dv["pos"]),
                    "left_anti",
                )
            nmbs_files = sorted(
                _local_path(r["__f"])
                for r in keyed.filter("__hit").select("__f").distinct().collect()
            )
        matched = sorted(set(key_matched) | set(nmbs_files))
        if matched:
            mdf = spark.read.schema(schema_ddl).parquet(*matched)
            if dv is not None:
                mdf = _subtract_deletes(mdf, dv)
            merged = merge_full(
                mdf,
                source,
                keys,
                matched_update_cond=matched_update_cond,
                matched_delete_cond=matched_delete_cond,
                insert_cond=insert_cond,
                nmbs_update_set=nmbs_update_set,
                nmbs_update_cond=nmbs_update_cond,
                nmbs_delete_cond=nmbs_delete_cond,
            )
        else:
            # no target file contains any source key: every source row is an
            # insert, subject only to the insert condition — dup-guarded on the
            # FULL source (merge_full guards before the insert filter, so a
            # duplicate key raises even when one copy fails the condition)
            guarded = _dup_guarded(source, keys)
            merged = (
                guarded.filter(F.coalesce(F.expr(insert_cond), F.lit(False)))
                if insert_cond is not None
                else guarded
            )
        if constraints:
            from rca_data_tools_spark.operators.expectations import check_constraints

            merged = check_constraints(merged, constraints)
        out = _finish_cow_version(
            spark, target_dir, out_dir, merged, matched, all_files, stats, dv,
            zone_key, schema_ddl, len(set(cand_files) | set(nmbs_files)),
            manifest_used,
        )
    finally:
        skeys.unpersist()
        source.unpersist()
    return {**out, "files_nmbs": len(nmbs_files)}


def merge_table_full(
    spark: SparkSession,
    table_root: str,
    source: DataFrame,
    keys: list[str],
    schema_ddl: str,
    zone_key: "str | None" = None,
    retries: int = 3,
    constraints: "dict[str, str] | None" = None,
    txn: "dict | None" = None,
    changes_feed: bool = False,
    **clauses,
) -> dict:
    """Full-clause MERGE as a chain-advancing DML (the ``merge_into_table``
    of ``merge_full``): claim → ``merge_full_pruned`` build → publish via
    the substrate-agnostic commit protocol, with rebase-and-retry on
    collision. Persisted table CHECK constraints (plus any call-site
    ``constraints``) are enforced in-plan on the rewritten output — a
    violating update/insert (including one produced by a
    not-matched-by-source UPDATE SET) fails the build and releases the
    claim; no partial version commits. ``txn`` records the idempotent-
    writer tag in the commit marker like merge_into_table.

    ``changes_feed=True`` persists the version's FULL-FIDELITY change-data-
    feed (``merge_full_changes`` — insert/update/delete rows including the
    not-matched-by-source clauses' effects), computed against the base
    read THROUGH its deletion vectors, so ``read_changes`` ranges and
    streaming CDF consumers cross full-clause merges instead of raising.
    ``clauses`` are merge_full's keyword conditions."""
    effective = {**table_constraints(table_root), **(constraints or {})}

    def _build(base_dir: str, out_dir: str) -> dict:
        stats = merge_full_pruned(
            spark, base_dir, out_dir, source, keys, schema_ddl,
            zone_key=zone_key, constraints=effective or None, **clauses,
        )
        if changes_feed:
            feed = merge_full_changes(
                read_with_deletes(spark, base_dir, schema_ddl),
                source, keys, **clauses,
            )
            feed.coalesce(8).write.parquet(os.path.join(out_dir, CHANGES_NAME))
        return stats

    return _advance_table(
        table_root, _build, retries, op="merge_full",
        extra_info=({"txn": txn} if txn else None),
    )


def _carry_bloom_links(target_dir: str, out_dir: str) -> None:
    """Hardlink the bloom-index sidecar into the next version (the pure
    hardlink DMLs — DELETE/UPDATE — change no data-file bytes, so every
    file's bloom stays valid as-is)."""
    sdir = os.path.join(target_dir, BLOOM_NAME)
    if os.path.isdir(sdir):
        os.makedirs(os.path.join(out_dir, BLOOM_NAME), exist_ok=True)
        for f in os.listdir(sdir):
            if os.path.isfile(os.path.join(sdir, f)):
                os.link(
                    os.path.join(sdir, f), os.path.join(out_dir, BLOOM_NAME, f)
                )


def vacuum_versions(table_root: str, keep_last: int = 2) -> dict:
    """Retention for the copy-on-write version chain (the VACUUM half of
    the merge lifecycle): delete every ``v{N}`` directory older than the
    newest ``keep_last``. Hardlink sharing makes this pure ``rm`` — a data
    file referenced by any surviving version keeps its inode alive no
    matter how many old versions unlink it, so there is no reference
    counting and no data copy: the filesystem IS the refcount, exactly the
    role a format's manifest plays for object-store files.

    Commit-protocol aware (r09): retention counts COMMITTED versions only —
    an uncommitted directory NEWER than the latest committed version is a
    mid-flight (or crashed) writer's claim and is left untouched, never
    counted as "the newest version" (before r09 a crashed claim could push
    the real current version out of the retention window); an uncommitted
    directory OLDER than the latest committed version is an aborted claim
    that can never be read — vacuum reaps it like any old version. Chains
    with no markers at all (pre-protocol) retain by plain version number.

    Returns {"removed": [names], "kept": [names], "bytes_freed"} where
    bytes_freed counts only bytes whose LAST link was in a removed version
    (shared files free nothing — the honest number)."""
    import shutil

    all_vs = sorted(
        (int(d[1:]), d)
        for d in os.listdir(table_root)
        if d.startswith("v") and d[1:].isdigit()
        and os.path.isdir(os.path.join(table_root, d))
    )
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1: a table needs a current version")
    marked = [
        (n, d) for n, d in all_vs
        if os.path.exists(os.path.join(table_root, d, COMMIT_NAME))
    ]
    if marked:
        latest_marked = marked[-1][0]
        keep = {d for _, d in marked[-keep_last:]}
        # in-flight claims beyond the committed tip stay untouched
        keep |= {d for n, d in all_vs if n > latest_marked}
        doomed = [(n, d) for n, d in all_vs if d not in keep]
        kept = sorted(d for _, d in all_vs if d in keep)
    else:
        versions = all_vs
        doomed = versions[:-keep_last] if keep_last < len(versions) else []
        kept = [d for _, d in versions[len(doomed):]]
    # METADATA CONTINUITY: a doomed version may be the one carrying the
    # _meta.json that governs the survivors (a rename at v5 vacuumed while
    # v6+ plain-DML versions survive would make the walk fall back to an
    # OLDER doc and silently revert the logical schema). Pin the oldest
    # surviving committed version's EFFECTIVE doc into its own directory
    # before anything is deleted — resolution-neutral for every survivor
    # (versions after it either carry their own doc or inherited exactly
    # this one), the versioned-metadata analogue of a Delta checkpoint.
    if doomed and marked:
        survivors = sorted(n for n, d in marked if d in keep)
        if survivors:
            oldest = survivors[0]
            sdir = os.path.join(table_root, f"v{oldest}")
            if not os.path.exists(os.path.join(sdir, VERSION_META_NAME)):
                _write_version_meta(sdir, _effective_meta(table_root, oldest))
    freed = 0
    for _, d in doomed:
        vdir = os.path.join(table_root, d)
        # recurse: sidecar DIRECTORIES (_deletes/, _changes/, _bloom/) hold
        # parquet parts whose bytes free too when their last link goes
        for sub, _dirs, fs in os.walk(vdir):
            for f in fs:
                st = os.stat(os.path.join(sub, f))
                if st.st_nlink == 1:  # last reference: these bytes actually free
                    freed += st.st_size
        shutil.rmtree(vdir)
    return {"removed": [d for _, d in doomed], "kept": kept, "bytes_freed": freed}


COMMIT_NAME = "_commit"


def _json_safe(stats: dict) -> dict:
    """Marker entries hold op-sized scalars only; anything that does not
    JSON-serialize is dropped rather than failing the commit."""
    import json

    out = {}
    for k, v in stats.items():
        try:
            json.dumps(v)
        except TypeError:
            continue
        out[k] = v
    return out


# the conflict type is substrate-agnostic (commit_store.advance raises it
# for any store); re-exported here because the chain DML API lives in sinks
from rca_data_tools_spark.sources.commit_store import VersionConflict  # noqa: E402


def mark_committed(version_dir: str, info: "dict | None" = None) -> None:
    """Publish a version: create its ``_commit`` marker (idempotent). A
    version directory WITHOUT the marker is invisible to
    ``latest_committed`` / ``read_version`` — the snapshot-isolation read
    side of the optimistic-concurrency protocol (a crashed writer's
    half-built directory is never read as the table).

    ``info`` (op name + op-sized stats) is recorded INSIDE the marker —
    the commit-log entry DESCRIBE HISTORY reads (``table_history``). An
    empty marker stays valid (legacy/caller-built chains read as op NULL).
    An info-less re-publish of an already-committed version is a no-op —
    it must NOT blank the recorded commit-log entry."""
    path = os.path.join(version_dir, COMMIT_NAME)
    if info is None:
        if not os.path.exists(path):
            open(path, "w").close()
        return
    import json

    with open(path, "w") as f:
        f.write(json.dumps(info))


def committed_versions(table_root: str) -> "list[int]":
    """Version numbers under ``table_root`` visible to readers. Versions
    carrying a ``_commit`` marker are committed; when NO version carries
    one the chain predates the protocol (or was caller-built) and every
    complete directory counts — legacy tables keep reading."""
    all_vs = [
        (int(d[1:]), d)
        for d in os.listdir(table_root)
        if d.startswith("v") and d[1:].isdigit()
        and os.path.isdir(os.path.join(table_root, d))
    ]
    marked = [
        n for n, d in all_vs
        if os.path.exists(os.path.join(table_root, d, COMMIT_NAME))
    ]
    return sorted(marked) if marked else sorted(n for n, _ in all_vs)


def latest_committed(table_root: str) -> int:
    vs = committed_versions(table_root)
    if not vs:
        raise ValueError(f"no table version in {table_root}")
    return vs[-1]


TABLE_META_NAME = "_table.json"
VERSION_META_NAME = "_meta.json"


def _read_table_meta(table_root: str) -> dict:
    import json

    path = os.path.join(table_root, TABLE_META_NAME)
    if not os.path.exists(path):
        return {}
    return json.load(open(path))


def _write_version_meta(version_dir: str, doc: dict) -> None:
    """Persist a version's OWN metadata document (constraints / column
    mapping / drop list) inside the version directory — committed
    atomically WITH the version by the marker publish, exactly like data
    content. Temp-write + rename so a concurrent reader never sees a torn
    doc, and so writing never mutates a hardlink-shared inode."""
    import json

    path = os.path.join(version_dir, VERSION_META_NAME)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, path)


def _effective_meta(table_root: str, n: "int | None" = None) -> dict:
    """Version-``n``'s OWN metadata document (Delta semantics — VERDICT r10
    item 4: time travel resolves the schema the version was committed
    under, so a read of v4 after a rename at v5 shows the OLD names).

    Resolution: the newest committed version ≤ n carrying a
    ``_meta.json`` wins (metadata commits write one; plain DML versions
    inherit by the walk — no per-version copies needed). Chains with NO
    version docs at all fall back to the root ``_table.json`` (legacy
    chains from before metadata was versioned: their history never
    recorded per-version docs, so the current doc is the only truth
    available — the documented pre-r11 behavior). Empty dict when neither
    exists."""
    import json

    vs = committed_versions(table_root)
    if n is None and vs:
        n = vs[-1]
    for k in sorted((v for v in vs if n is None or v <= n), reverse=True):
        path = os.path.join(table_root, f"v{k}", VERSION_META_NAME)
        if os.path.exists(path):
            return json.load(open(path))
    return _read_table_meta(table_root)


def _write_table_meta(
    table_root: str,
    constraints: "dict[str, str] | None" = None,
    column_mapping: "dict[str, str] | None" = None,
    dropped: "list[str] | None" = None,
) -> None:
    import json

    # read-merge-write so one field's update never erases another's
    # (constraints, column_mapping and the drop list are independent
    # contracts); temp-write + rename: atomic for concurrent readers, and
    # never truncates an inode another table might share (clones COPY this
    # file, but rename is the defensive half of that contract)
    doc = _read_table_meta(table_root)
    if constraints is not None:
        doc["constraints"] = constraints
    if column_mapping is not None:
        doc["column_mapping"] = column_mapping
    if dropped is not None:
        doc["dropped_columns"] = dropped
    path = os.path.join(table_root, TABLE_META_NAME)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, path)


def table_constraints(table_root: str, n: "int | None" = None) -> "dict[str, str]":
    """The CHECK constraints in force at version ``n`` (default: the tip —
    what every future write enforces). Versioned with the chain: an ALTER
    CONSTRAINT at v5 does not govern a time-travel read of v4. Empty dict
    when none were declared."""
    return _effective_meta(table_root, n).get("constraints", {})


def column_mapping(table_root: str, n: "int | None" = None) -> "dict[str, str]":
    """The LOGICAL → PHYSICAL column-name mapping at version ``n``
    (default: the tip). Data files keep their creation-time physical names
    forever; a RENAME only commits new metadata — and the metadata is
    per-version, so time travel to before the rename resolves the OLD
    logical names (VERDICT r10 item 4). Empty dict = identity. Only
    renamed columns appear."""
    return _effective_meta(table_root, n).get("column_mapping", {})


def dropped_columns(table_root: str, n: "int | None" = None) -> "list[str]":
    """PHYSICAL names of columns logically dropped as of version ``n``
    (default: the tip). The bytes stay in the files until a rewrite;
    readers of PRE-drop versions still see the column (per-version
    metadata, Delta drop-column shape)."""
    return _effective_meta(table_root, n).get("dropped_columns", [])


def alter_table_constraints(
    spark: SparkSession,
    table_root: str,
    add: "dict[str, str] | None" = None,
    drop: "list[str] | None" = None,
    schema_ddl: "str | None" = None,
    retries: int = 3,
) -> dict:
    """ALTER TABLE ADD/DROP CONSTRAINT as a CHAIN OPERATION (the Delta
    shape — a constraint change is a commit in the log, never a silent
    metadata overwrite): the new version hardlinks the tip's content
    (O(files), zero data bytes, content-neutral for CDF ranges) and its
    commit marker records the op with the rule names, so DESCRIBE HISTORY
    shows exactly WHEN the table's contract changed.

    ADD validates ALL existing data first — the tip read through its
    deletion vectors, the rules evaluated in one scan — and any violating
    row fails the ALTER with the rule names and a sample row; the claim
    releases and the persisted metadata stays untouched (a constraint is
    a promise about the data already in the table, so the promise must be
    checked before it is made). DROP is metadata-only. Dropping an
    unknown rule refuses. Returns the advance stats plus
    {"added", "dropped"}."""
    add = dict(add or {})
    drop = list(drop or [])
    if not add and not drop:
        raise ValueError("alter_table_constraints: nothing to add or drop")
    current = table_constraints(table_root)
    unknown = [r for r in drop if r not in current]
    if unknown:
        raise ValueError(
            f"alter_table_constraints: cannot drop unknown constraints "
            f"{unknown} (have {sorted(current)})"
        )
    clash = [r for r in add if r in current and r not in drop]
    if clash:
        raise ValueError(
            f"alter_table_constraints: constraints already exist: {clash} "
            "(drop them in the same call to replace)"
        )
    new_rules = {k: v for k, v in current.items() if k not in drop}
    new_rules.update(add)

    def _build(base_dir: str, out_dir: str) -> dict:
        if add:
            from rca_data_tools_spark.operators.expectations import (
                violations_array,
            )

            existing = read_with_deletes(spark, base_dir, schema_ddl)
            bad = existing.withColumn(
                "__viol", violations_array(add)
            ).filter(F.size("__viol") > 0)
            sample = bad.limit(3).collect()
            if sample:
                rows = "; ".join(
                    f"{r['__viol']} on {tuple(r[c] for c in existing.columns)}"
                    for r in sample
                )
                raise ValueError(
                    "alter_table_constraints: existing data violates the "
                    f"added constraints — {rows}"
                )
        n = _link_version_content(base_dir, out_dir)
        # content-neutral: read_changes ranges cross the ALTER cleanly
        open(os.path.join(out_dir, CHANGES_EMPTY_NAME), "w").close()
        # the new contract is THIS VERSION's metadata document — committed
        # atomically with the version by the marker publish (a crash before
        # the publish leaves an invisible claim, never an applied-but-
        # uncommitted contract — ADVICE r10); earlier versions keep their
        # own docs, so time travel resolves the constraints then in force
        _write_version_meta(
            out_dir, {**_effective_meta(table_root), "constraints": new_rules}
        )
        return {
            "files_linked": n,
            "added": sorted(add),
            "dropped": sorted(drop),
        }

    out = _advance_table(table_root, _build, retries, op="alter_constraints")
    # root _table.json is a non-authoritative CACHE for legacy readers,
    # refreshed only after the version published
    _write_table_meta(table_root, new_rules)
    return out


def alter_table_rename_column(
    table_root: str,
    renames: "dict[str, str]",
    schema_ddl: str,
    retries: int = 3,
) -> dict:
    """RENAME COLUMN without rewriting a byte of data (Delta column
    mapping): the parquet files keep their creation-time PHYSICAL column
    names forever; a rename only updates the table's logical→physical map
    in ``_table.json`` — as a CHAIN COMMIT (hardlink content, content-
    neutral for CDF ranges, op + renames recorded in DESCRIBE HISTORY), so
    time travel shows when the contract changed and a crashed rename never
    half-applies.

    ``renames`` maps CURRENT logical name → new logical name;
    ``schema_ddl`` is the PHYSICAL schema (what the files hold), used to
    validate against the full logical domain. Chained renames compose
    (a→b then b→c leaves physical a mapped to logical c). A rename refuses
    when the source name is not a current logical column, or the target
    collides with another current logical column. Readers use
    ``read_version_logical``; structured DML goes through
    ``merge_table_logical`` (logical frames translated to physical at the
    boundary); STRING predicates (delete_into_table / range_scan) address
    PHYSICAL names — the documented seam, same as engines that resolve
    mapping in the analyzer layer this repo does not own."""
    from pyspark.sql.types import StructType

    physical_cols = [f.name for f in StructType.fromDDL(schema_ddl).fields]

    state = {}

    def _build(base_dir: str, out_dir: str) -> dict:
        doc = _effective_meta(table_root)
        mapping = dict(doc.get("column_mapping", {}))
        dead = set(doc.get("dropped_columns", []))
        log_of = {p: l for l, p in mapping.items()}
        # logical -> physical over the LIVE column domain (identity
        # included; DROPPED physical columns are not renameable — a rename
        # of a dead slot would let merge_table_logical silently NULL-fill
        # the caller's data into it, ADVICE r10)
        phys_of = {
            log_of.get(p, p): p for p in physical_cols if p not in dead
        }
        for old, new in renames.items():
            if old == new:
                raise ValueError(f"rename_column: {old!r} -> itself")
            if old not in phys_of:
                raise ValueError(
                    f"rename_column: {old!r} is not a current logical column "
                    f"(have {sorted(phys_of)})"
                )
            if new in phys_of:
                raise ValueError(
                    f"rename_column: target {new!r} collides with an "
                    "existing logical column"
                )
            phys_of[new] = phys_of.pop(old)
        n = _link_version_content(base_dir, out_dir)
        open(os.path.join(out_dir, CHANGES_EMPTY_NAME), "w").close()
        # the new mapping is THIS VERSION's metadata doc, committed by the
        # marker publish (never applied without a committed version —
        # ADVICE r10); identity entries dropped
        state["mapping"] = {l: p for l, p in phys_of.items() if l != p}
        _write_version_meta(
            out_dir, {**doc, "column_mapping": state["mapping"]}
        )
        return {"files_linked": n, "renames": dict(renames)}

    out = _advance_table(table_root, _build, retries, op="rename_column")
    # refresh the legacy root cache only after the publish
    _write_table_meta(table_root, column_mapping=state["mapping"])
    return out


def alter_table_drop_column(
    table_root: str,
    cols: "list[str]",
    schema_ddl: str,
    retries: int = 3,
) -> dict:
    """DROP COLUMN without rewriting a byte (the Delta drop-column shape):
    the physical bytes stay in the files until some rewrite naturally
    replaces them; this commit only records the column's PHYSICAL name in
    ``_table.json``'s drop list — ``read_version_logical`` stops projecting
    it and ``merge_table_logical`` refuses sources that still carry it
    (rewritten rows NULL the dead slot; OPTIMIZE materializes the drop).
    Chain commit like rename: hardlinked content, content-neutral for CDF,
    op + columns in DESCRIBE HISTORY, refusals release the claim.

    Refuses: unknown logical names; dropping the zone-map key (pruned
    merges address files by it); dropping a column a persisted CHECK
    constraint references (the constraint would silently evaluate against
    NULLs on rewritten rows — drop the constraint first)."""
    import re

    from pyspark.sql.types import StructType

    physical_cols = [f.name for f in StructType.fromDDL(schema_ddl).fields]

    state = {}

    def _build(base_dir: str, out_dir: str) -> dict:
        doc = _effective_meta(table_root)
        mapping = doc.get("column_mapping", {})
        log_of = {p: l for l, p in mapping.items()}
        already = set(doc.get("dropped_columns", []))
        live = {
            log_of.get(p, p): p for p in physical_cols if p not in already
        }
        doc = _read_manifest_doc(base_dir)
        zone_physical = doc.get("zone_key") if doc else None
        rules = table_constraints(table_root)
        phys_drop = []
        for c in cols:
            if c not in live:
                raise ValueError(
                    f"drop_column: {c!r} is not a current logical column "
                    f"(have {sorted(live)})"
                )
            p = live[c]
            if p == zone_physical:
                raise ValueError(
                    f"drop_column: {c!r} is the table's zone-map key — "
                    "pruned merges address files by it; re-cluster first"
                )
            hit = [
                name for name, expr in rules.items()
                if re.search(rf"\b{re.escape(p)}\b", expr)
            ]
            if hit:
                raise ValueError(
                    f"drop_column: {c!r} is referenced by CHECK "
                    f"constraint(s) {hit} — drop the constraint first"
                )
            phys_drop.append(p)
        n = _link_version_content(base_dir, out_dir)
        open(os.path.join(out_dir, CHANGES_EMPTY_NAME), "w").close()
        # the dropped column's rename entry (if any) is spent; the new doc
        # is THIS VERSION's metadata, committed by the marker publish
        state["mapping"] = {
            l: p for l, p in mapping.items() if p not in phys_drop
        }
        state["dropped"] = sorted(already | set(phys_drop))
        _write_version_meta(
            out_dir,
            {
                **doc,
                "column_mapping": state["mapping"],
                "dropped_columns": state["dropped"],
            },
        )
        return {"files_linked": n, "dropped": sorted(cols)}

    out = _advance_table(table_root, _build, retries, op="drop_column")
    # refresh the legacy root cache only after the publish
    _write_table_meta(
        table_root, column_mapping=state["mapping"], dropped=state["dropped"]
    )
    return out


def read_version_logical(
    spark: SparkSession,
    table_root: str,
    schema_ddl: "str | None" = None,
    n: "int | None" = None,
) -> DataFrame:
    """``read_version`` presented under the LOGICAL column names OF THAT
    VERSION: the physical scan (deletion vectors subtracted) with the
    version's own dropped columns projected OUT and its own column-mapping
    aliases applied on top — a pure projection, zero cost at any scale.
    Time travel resolves the metadata the version was committed under
    (Delta semantics): reading v4 after a rename at v5 shows the OLD name.
    ``schema_ddl`` is the PHYSICAL schema (what the files actually hold)."""
    df = read_version(spark, table_root, schema_ddl, n=n)
    mapping = column_mapping(table_root, n=n)
    dead = set(dropped_columns(table_root, n=n))
    if not mapping and not dead:
        return df
    log_of = {p: l for l, p in mapping.items()}
    return df.select(
        *[F.col(c).alias(log_of.get(c, c)) for c in df.columns if c not in dead]
    )


def merge_table_logical(
    spark: SparkSession,
    table_root: str,
    source: DataFrame,
    keys: list[str],
    schema_ddl: str,
    **kwargs,
) -> dict:
    """``merge_into_table`` addressed in LOGICAL column names: the source
    frame and the merge keys arrive as the user sees the table (post-
    rename), get translated to the files' physical names at this boundary
    (a projection), and the unchanged physical merge runs — the thin
    analyzer shim Delta's column mapping performs inside the engine.
    ``schema_ddl`` stays PHYSICAL (it describes the bytes). On a table
    with DROPPED columns the source must not carry them (logically they no
    longer exist); the dead physical slots are NULL-filled so rewritten
    files keep the physical schema — reads never project them, and the
    next OPTIMIZE materializes the drop."""
    from pyspark.sql.types import StructType

    mapping = column_mapping(table_root)
    dead = set(dropped_columns(table_root))
    bad = [c for c in source.columns if c in mapping.values() or c in dead]
    if bad:
        # a physical name that has been renamed away — or any dropped
        # column — is no longer a valid logical column: accepting it would
        # silently write the wrong (or a dead) slot
        raise ValueError(
            f"merge_table_logical: {bad} are renamed-away physical names "
            "or dropped columns; use the current logical names"
        )
    phys_source = source.select(
        *[F.col(c).alias(mapping.get(c, c)) for c in source.columns]
    )
    if dead:
        phys_types = {
            f.name: f.dataType for f in StructType.fromDDL(schema_ddl).fields
        }
        for p in sorted(dead):
            phys_source = phys_source.withColumn(
                p, F.lit(None).cast(phys_types[p])
            )
    phys_keys = [mapping.get(k, k) for k in keys]
    zk = kwargs.pop("zone_key", None)
    if zk is not None:
        zk = mapping.get(zk, zk)
    return merge_into_table(
        spark, table_root, phys_source, phys_keys, schema_ddl,
        zone_key=zk, **kwargs,
    )


def manifest_range_files(
    table_dir: str, col: str, lo, hi
) -> "list[str] | None":
    """Metadata-only pruning for a RANGE predicate ``col BETWEEN lo AND
    hi``: the data-file basenames whose manifest [mn, mx] intersects the
    range — None when the manifest has no bounds for the column or fails
    the disk cross-check (every file is then a candidate)."""
    doc = _read_manifest_doc(table_dir)
    if doc is None:
        return None
    m = (
        doc.get("files")
        if doc.get("zone_key") == col
        else doc.get("columns", {}).get(col)
    )
    if m is None:
        return None
    disk = {f for f in os.listdir(table_dir) if f.endswith(".parquet")}
    if set(m) != disk:
        return None
    out = []
    for name, e in m.items():
        mn, mx = e.get("mn"), e.get("mx")
        if mn is None or mx is None:
            continue  # 0-row / all-NULL file: can never match
        try:
            if not (mx < lo or mn > hi):
                out.append(name)
        except TypeError:
            return None  # incomparable types: no pruning, never wrong
    return sorted(out)


def range_scan(
    spark: SparkSession,
    table_dir: str,
    col: str,
    lo,
    hi,
    schema_ddl: "str | None" = None,
) -> "tuple[DataFrame, dict]":
    """The READ face of the zone-map manifest (completes VERDICT r09
    item 5): scan ``col BETWEEN lo AND hi`` opening only the files the
    manifest cannot rule out — after OPTIMIZE ZORDER(a, b) a range on
    EITHER dimension prunes from KB metadata before a single footer is
    read — subtracting the version's deletion vectors and re-applying the
    exact predicate on the survivors (pruning over-approximates;
    correctness never depends on it). Returns (rows, {"files_total",
    "files_scanned"})."""
    data_files = sorted(
        f for f in os.listdir(table_dir) if f.endswith(".parquet")
    )
    cands = manifest_range_files(table_dir, col, lo, hi)
    if cands is None:
        cands = data_files
    stats = {"files_total": len(data_files), "files_scanned": len(cands)}
    reader = spark.read if schema_ddl is None else spark.read.schema(schema_ddl)
    pred = F.col(col).between(F.lit(lo), F.lit(hi))
    if not cands:
        return reader.parquet(table_dir).filter(pred).limit(0), stats
    df = reader.parquet(*[os.path.join(table_dir, f) for f in cands])
    dv = read_deletion_vectors(spark, table_dir)
    if dv is not None:
        df = _subtract_deletes(df, dv)
    return df.filter(pred), stats


def create_table(
    df: DataFrame,
    table_root: str,
    zone_key: "str | None" = None,
    n_files: int = 8,
    constraints: "dict[str, str] | None" = None,
) -> str:
    """Initialize a version chain: write ``df`` as the committed ``v0`` —
    range-clustered on ``zone_key`` when given (each file covers a tight
    key range, so the FIRST merge already prunes) with the zone-map
    manifest persisted alongside (the first merge is metadata-only too).
    Returns the v0 path. Every later statement goes through the
    chain-advancing DML (merge_into_table / delete_into_table /
    update_into_table / optimize_table).

    ``constraints`` (rule name → SQL predicate) PERSISTS with the table
    (``_table.json`` at the root — the Delta CHECK-constraint shape:
    constraints belong to the table, not the call site): the initial data
    is checked in-plan at this write, and every later
    ``merge_into_table`` / ``update_into_table`` enforces them on its
    incoming/updated rows automatically."""
    if constraints:
        from rca_data_tools_spark.operators.expectations import check_constraints

        df = check_constraints(df, constraints)
    v0 = os.path.join(table_root, "v0")
    out = df
    if zone_key is not None:
        out = df.repartitionByRange(n_files, zone_key).sortWithinPartitions(zone_key)
    out.write.parquet(v0)
    if zone_key is not None:
        spark = df.sparkSession
        # the manifest is built directly from the fresh files (v0 has no
        # predecessor to carry entries from)
        names = [f for f in os.listdir(v0) if f.endswith(".parquet")]
        entries = {n: {"mn": None, "mx": None} for n in names}
        if zone_key in df.columns:
            # footer-first (guide §6): the freshly written files' min/max is
            # in their footers — KB metadata reads instead of a full re-scan
            footer = _footer_file_stats(
                [os.path.join(v0, n) for n in names], [zone_key]
            )
            if footer is not None:
                for n in names:
                    mn, mx = footer[os.path.join(v0, n)][zone_key]
                    entries[n] = {"mn": mn, "mx": mx}
            else:
                from urllib.parse import unquote, urlparse

                ndf = spark.read.parquet(v0)
                for r in (
                    ndf.groupBy(F.input_file_name().alias("__f"))
                    .agg(F.min(zone_key).alias("mn"), F.max(zone_key).alias("mx"))
                    .collect()
                ):
                    p = urlparse(r["__f"])
                    nm = os.path.basename(
                        unquote(p.path) if p.scheme in ("file", "") else r["__f"]
                    )
                    entries[nm] = {"mn": r["mn"], "mx": r["mx"]}
            _write_manifest(v0, zone_key, entries)
    # v0 carries its OWN metadata doc from birth (possibly empty), so the
    # chain is fully versioned: a later ALTER at v5 cannot retroactively
    # change what a time-travel read of v0-v4 resolves (VERDICT r10 item 4)
    _write_version_meta(v0, {"constraints": constraints} if constraints else {})
    if constraints:
        _write_table_meta(table_root, constraints)
    mark_committed(v0, {"op": "create"})
    return v0


def merge_into_table(
    spark: SparkSession,
    table_root: str,
    source: DataFrame,
    keys: list[str],
    schema_ddl: str,
    zone_key: "str | None" = None,
    delete_col: "str | None" = None,
    retries: int = 3,
    changes_feed: bool = False,
    constraints: "dict[str, str] | None" = None,
    txn: "dict | None" = None,
) -> dict:
    """MERGE with OPTIMISTIC CONCURRENCY on the version chain (VERDICT r08
    item 4): the writer reads the latest committed version, claims the next
    version number by atomically creating its directory (``os.makedirs``
    with no exist_ok — the O_EXCL mutex; on an object store this is the
    conditional-PUT of a commit marker), merges into it with
    ``merge_upsert_pruned``, and publishes via ``mark_committed``. A
    concurrent writer that claimed the number first surfaces as
    FileExistsError → this writer re-reads the (possibly advanced) latest
    committed version and retries onto the NEXT number, so its merge is
    re-based on the winner's output — no lost update, no double-publish.

    A claimed-but-uncommitted competitor (crashed, or mid-merge) blocks the
    number without advancing ``latest_committed``; the retry loop backs off
    briefly and gives up with ``VersionConflict`` after ``retries`` —
    refusing loudly rather than either basing on uncommitted bytes or
    skipping a number whose content it never saw.

    ``changes_feed=True`` additionally PERSISTS the merge's change-data-feed
    (``merge_changes`` — op insert/update with before/after values) as a
    parquet ``_changes/`` sidecar inside the new version directory, written
    by executors: downstream incremental consumers then replay
    ``read_changes(root, from_v, to_v)`` — O(sum of batch sizes) — instead
    of diffing O(table) snapshots. The feed is computed against the base
    version read THROUGH its deletion vectors (a before-image must not be a
    deleted row). Not supported together with ``delete_col`` (merge_changes
    models upserts; CDC deletes already carry their own op column upstream).

    ``constraints`` maps rule name → SQL predicate and enforces the table's
    CHECK constraints on the incoming batch IN-PLAN (operators/expectations
    .check_constraints): a violating source row fails the merge at execution
    time with the rule name and offending row in the error — no partial
    version is ever committed (the claim directory is built only by a
    successful job, and an uncommitted claim is invisible to readers).

    ``txn`` ({"app": ..., "batch": ...}) is recorded in the version's
    commit marker — the Delta idempotent-writer shape: a streaming writer
    tags each batch's merge with its (app id, batch id) so a crash-replay
    can detect an already-applied batch via ``applied_txns`` and skip it
    instead of double-merging (streaming/joins.stream_merge_concurrent).

    Returns merge_upsert_pruned's stats plus {"version", "attempts"}."""
    if changes_feed and delete_col is not None:
        raise ValueError(
            "merge_into_table: changes_feed models upsert feeds; a delete_col "
            "source is already a change feed — persist it upstream instead"
        )
    effective = {**table_constraints(table_root), **(constraints or {})}
    if effective:
        from rca_data_tools_spark.operators.expectations import check_constraints

        source = check_constraints(source, effective)

    def _build(base_dir: str, out_dir: str) -> dict:
        stats = merge_upsert_pruned(
            spark, base_dir, out_dir, source, keys, schema_ddl,
            zone_key=zone_key, delete_col=delete_col,
        )
        if changes_feed:
            feed = merge_changes(
                read_with_deletes(spark, base_dir, schema_ddl), source, keys
            )
            feed.coalesce(8).write.parquet(os.path.join(out_dir, CHANGES_NAME))
        return stats

    return _advance_table(table_root, _build, retries, op="merge", extra_info=({"txn": txn} if txn else None))


def applied_txns(table_root: str) -> "set[tuple]":
    """The (app, batch) transaction tags recorded in the chain's commit
    markers — the read side of the idempotent-writer contract: a streaming
    writer checks its (app_id, batch_id) here before merging, so a batch
    whose merge COMMITTED but whose checkpoint write was lost replays as a
    no-op instead of a double-apply. One directory listing + KB marker
    reads (the cost of reading the log)."""
    import json

    out = set()
    for v in committed_versions(table_root):
        marker = os.path.join(table_root, f"v{v}", COMMIT_NAME)
        if not os.path.exists(marker):
            continue
        body = open(marker).read().strip()
        if not body:
            continue
        try:
            doc = json.loads(body)
        except ValueError:
            continue
        t = doc.get("txn")
        if isinstance(t, dict) and "app" in t and "batch" in t:
            out.add((t["app"], t["batch"]))
    return out


CHANGES_NAME = "_changes"
CHANGES_EMPTY_NAME = "_changes_empty"


def read_changes(
    spark: SparkSession, table_root: str, from_v: int, to_v: "int | None" = None
) -> DataFrame:
    """The persisted change-data-feed of versions ``(from_v, to_v]`` — what
    an incremental consumer replays instead of diffing snapshots (Delta's
    ``table_changes``). Each row carries ``_version`` so consumers can
    checkpoint. CONTENT-NEUTRAL versions (OPTIMIZE — marked
    ``_changes_empty``) contribute nothing and ranges cross them cleanly;
    a content-CHANGING version with no sidecar (DELETE/UPDATE, or a merge
    run without changes_feed) raises loudly — a silent gap would make the
    replayed state diverge from the table, the repo's refuse-don't-guess
    standard."""
    import functools

    vs = committed_versions(table_root)
    to_v = vs[-1] if to_v is None else to_v
    want = [v for v in vs if from_v < v <= to_v]
    if not want:
        raise ValueError(
            f"read_changes: no committed versions in ({from_v}, {to_v}] of {table_root}"
        )
    parts = []
    for v in want:
        vdir = os.path.join(table_root, f"v{v}")
        cdir = os.path.join(vdir, CHANGES_NAME)
        if os.path.isdir(cdir):
            parts.append(
                spark.read.parquet(cdir).withColumn("_version", F.lit(v).cast("int"))
            )
        elif not os.path.exists(os.path.join(vdir, CHANGES_EMPTY_NAME)):
            raise ValueError(
                f"read_changes: v{v} of {table_root} has no {CHANGES_NAME} "
                "sidecar and is not marked content-neutral (merge without "
                "changes_feed, or a DELETE/UPDATE version) — the feed would "
                "be silently incomplete"
            )
    if not parts:
        raise ValueError(
            f"read_changes: every version in ({from_v}, {to_v}] of "
            f"{table_root} is content-neutral — there is no feed schema to "
            "return an empty frame in; widen the range"
        )
    return functools.reduce(DataFrame.unionByName, parts)


def read_changes_logical(
    spark: SparkSession, table_root: str, from_v: int, to_v: "int | None" = None
) -> DataFrame:
    """``read_changes`` presented under the LOGICAL column names of the
    range's END version — a consumer that tracked the table across a
    RENAME addresses the whole feed by its current schema (the physical
    sidecars keep their creation-time names forever, exactly like data
    files; this is the same pure projection ``read_version_logical``
    applies to snapshots). Columns dropped as of the end version are
    projected out of the feed; ``op``/``_version`` pass through."""
    vs = committed_versions(table_root)
    end = vs[-1] if to_v is None else to_v
    df = read_changes(spark, table_root, from_v, to_v)
    mapping = column_mapping(table_root, n=end)
    dead = set(dropped_columns(table_root, n=end))
    log_of = {p: l for l, p in mapping.items()}
    out = []
    for c in df.columns:
        if c in ("op", "_version"):
            out.append(F.col(c))
            continue
        for pre in ("before_", "after_"):
            if c.startswith(pre):
                p = c[len(pre):]
                if p not in dead:
                    out.append(F.col(c).alias(pre + log_of.get(p, p)))
                break
        else:
            if c not in dead:
                out.append(F.col(c).alias(log_of.get(c, c)))
    return df.select(*out)


def replay_changes(base: DataFrame, feed: DataFrame, keys: list[str]) -> DataFrame:
    """Materialize a DOWNSTREAM REPLICA from a base snapshot plus a
    change-data-feed (read_changes' output: keys, op, before_*/after_*,
    ``_version``) — the consumer half of the CDF contract: a replica
    maintained this way must equal the table itself at the feed's last
    version (proven by ``sink_changes_replay``'s oracle and the lifecycle
    tests).

    Semantics: per key, the HIGHEST-version event wins (at most one event
    per key per version — the merge dup guard and the DML predicates
    guarantee it); a winning 'delete' is a tombstone (the key disappears),
    a winning insert/update contributes its after-image; keys the feed
    never touched survive from the base.

    Scale shape: one map-combined max_by per key over the feed (O(feed)),
    one anti-join of the base against the touched keys — never a snapshot
    diff, never a per-version loop."""
    after_cols = [c for c in feed.columns if c.startswith("after_")]
    value_cols = [c[len("after_"):] for c in after_cols]
    missing = [c for c in (*keys, *value_cols) if c not in base.columns]
    if missing:
        raise ValueError(f"replay_changes: feed columns not in base: {missing}")
    winner = feed.groupBy(*keys).agg(
        F.max_by("op", "_version").alias("__op"),
        *[
            F.max_by(f"after_{c}", "_version").alias(c)
            for c in value_cols
        ],
    )
    survivors = base.join(winner.select(*keys), keys, "left_anti")
    upserts = winner.filter(F.col("__op") != "delete").select(*keys, *value_cols)
    return survivors.select(*keys, *value_cols).unionByName(upserts)


class LocalFSCommitStore:
    """The production local-FS implementation of the commit protocol's
    three primitives (sources/commit_store.py documents the contract and
    the object-store port): claim = atomic ``os.makedirs`` of the version
    directory (O_EXCL mutex), publish = the ``_commit`` marker file,
    link = hardlink (done by the builds themselves — the filesystem IS
    the refcount vacuum relies on). A hard crash between claim and the
    failure-path release leaves a claim at tip+1 that blocks every writer
    (``VersionConflict`` names it) — vacuum cannot reap a claim AHEAD of
    the committed tip, so recovery is manual removal; the object-store
    port's conditional-PUT claim gets a real TTL/lease, local-FS mkdir
    does not."""

    def __init__(self, table_root: str) -> None:
        self.table_root = table_root

    def __repr__(self) -> str:
        return self.table_root

    def try_claim(self, ver: int) -> bool:
        try:
            os.makedirs(os.path.join(self.table_root, f"v{ver}"))
            return True
        except FileExistsError:
            return False

    def release_claim(self, ver: int) -> None:
        # releasing on build failure (constraint violation, executor loss)
        # un-wedges the chain for the next writer
        import shutil

        shutil.rmtree(
            os.path.join(self.table_root, f"v{ver}"), ignore_errors=True
        )

    def publish(self, ver: int, info: "dict | None") -> None:
        mark_committed(os.path.join(self.table_root, f"v{ver}"), info)

    def latest_committed(self) -> int:
        return latest_committed(self.table_root)

    def committed(self) -> "list[int]":
        return committed_versions(self.table_root)


def _advance_table(
    table_root: str,
    build,
    retries: int = 3,
    op: str = "write",
    extra_info: "dict | None" = None,
) -> dict:
    """The claim → build → publish loop every chain-advancing DML shares
    (MERGE, DELETE, UPDATE, OPTIMIZE, RESTORE): the substrate-agnostic
    ``commit_store.advance`` protocol over the local-FS store —
    ``build(base_dir, out_dir)`` runs between the claim and the publish,
    collisions rebase onto the advanced chain and retry, a
    claimed-but-uncommitted competitor gets capped-exponential backoff
    then ``VersionConflict``. The same ``advance`` loop runs against the
    in-memory conditional-PUT store in tests/test_commit_store.py — the
    protocol itself has no filesystem dependence."""
    from rca_data_tools_spark.sources.commit_store import advance

    def _fs_build(base: int, ver: int) -> dict:
        out_dir = os.path.join(table_root, f"v{ver}")
        stats = build(os.path.join(table_root, f"v{base}"), out_dir)
        # every version pins its effective metadata doc (builds that set
        # their own — the ALTERs, RESTORE — already wrote one): the
        # _effective_meta walk stays O(1) instead of O(versions since the
        # last metadata commit), for one KB write per version — the
        # metadata checkpoint Delta pays every 10 commits, paid every time
        if not os.path.exists(os.path.join(out_dir, VERSION_META_NAME)):
            _write_version_meta(out_dir, _effective_meta(table_root, base))
        return stats

    return advance(
        LocalFSCommitStore(table_root), _fs_build, retries, op, extra_info
    )


def _dml_feed(
    base: DataFrame, keys: list[str], op: str, set_exprs: "dict[str, str] | None" = None
) -> DataFrame:
    """A DELETE/UPDATE version's change-data-feed rows in merge_changes'
    exact schema (keys, op, before_*/after_* per value column) so
    ``read_changes`` unions every DML's feed into ONE replayable stream:
    deletes carry the removed image in before_* with after_* NULL; updates
    carry old image in before_* and the ``set_exprs``-applied image in
    after_*. ``base`` must already be the matched rows read THROUGH the
    version's deletion vectors — a feed must never report a change to a
    row that did not exist."""
    value_cols = [c for c in base.columns if c not in keys]
    cols: list = [*[F.col(k) for k in keys], F.lit(op).alias("op")]
    for c in value_cols:
        cols.append(F.col(c).alias(f"before_{c}"))
        if op == "delete":
            cols.append(
                F.lit(None).cast(base.schema[c].dataType).alias(f"after_{c}")
            )
        else:
            after = F.expr(set_exprs[c]) if set_exprs and c in set_exprs else F.col(c)
            cols.append(after.cast(base.schema[c].dataType).alias(f"after_{c}"))
    return base.select(*cols)


def delete_into_table(
    spark: SparkSession,
    table_root: str,
    predicate: str,
    schema_ddl: str,
    retries: int = 3,
    changes_feed_keys: "list[str] | None" = None,
) -> dict:
    """Row-level DELETE on the version chain: ``delete_where`` (merge-on-read
    deletion vectors, zero data files rewritten) through the same
    claim/commit protocol as ``merge_into_table`` — concurrent deletes and
    merges serialize instead of silently double-publishing a version.

    ``changes_feed_keys`` additionally persists the version's change-data-
    feed (op='delete' rows with the removed images in before_*, after_*
    NULL — merge_changes' schema keyed on those columns), so ``read_changes``
    ranges cross DELETE versions instead of raising: the full-fidelity CDF
    a CDC consumer replays. The feed is computed from the base read THROUGH
    its deletion vectors (already-deleted rows emit no second delete
    event) and costs one extra predicate scan of the matched rows."""

    def _build(base: str, out: str) -> dict:
        stats = delete_where(spark, base, out, predicate, schema_ddl)
        if changes_feed_keys is not None:
            feed = _dml_feed(
                read_with_deletes(spark, base, schema_ddl).where(predicate),
                changes_feed_keys,
                "delete",
            )
            feed.coalesce(8).write.parquet(os.path.join(out, CHANGES_NAME))
        return stats

    return _advance_table(table_root, _build, retries, op="delete")


def update_into_table(
    spark: SparkSession,
    table_root: str,
    predicate: str,
    set_exprs: "dict[str, str]",
    schema_ddl: str,
    retries: int = 3,
    changes_feed_keys: "list[str] | None" = None,
) -> dict:
    """Row-level UPDATE on the version chain (``update_where`` + the
    claim/commit protocol). ``changes_feed_keys`` persists the version's
    change-data-feed (op='update', before_* = old image, after_* = the
    ``set_exprs``-applied image) exactly as delete_into_table does — with
    it, every content-changing DML on the chain carries a feed and
    ``read_changes`` replays end to end. The table's persisted CHECK
    constraints (create_table(constraints=)) are enforced on the UPDATED
    images in-plan — an UPDATE cannot write a row the table's contract
    forbids."""
    persisted = table_constraints(table_root)

    def _build(base: str, out: str) -> dict:
        stats = update_where(spark, base, out, predicate, set_exprs, schema_ddl,
                             constraints=persisted)
        if changes_feed_keys is not None:
            feed = _dml_feed(
                read_with_deletes(spark, base, schema_ddl).where(predicate),
                changes_feed_keys,
                "update",
                set_exprs,
            )
            feed.coalesce(8).write.parquet(os.path.join(out, CHANGES_NAME))
        return stats

    return _advance_table(table_root, _build, retries, op="update")


def _link_version_content(src: str, out_dir: str) -> int:
    """Hardlink a version's full content — data files, deletion-vector
    sidecar, zone-map manifest, bloom index — into ``out_dir`` (which must
    already exist and be empty apart from the claim). Returns the number of
    DATA files linked. The new directory is an independent version: the
    filesystem refcounts shared inodes, so vacuuming either side never
    corrupts the other."""
    n = 0
    for f in os.listdir(src):
        full = os.path.join(src, f)
        if f.endswith(".parquet") and os.path.isfile(full):
            os.link(full, os.path.join(out_dir, f))
            n += 1
    for side in (DELETES_NAME, BLOOM_NAME):
        sdir = os.path.join(src, side)
        if os.path.isdir(sdir):
            os.makedirs(os.path.join(out_dir, side), exist_ok=True)
            for f in os.listdir(sdir):
                # everything in a sidecar carries (parquet parts AND small
                # metadata like the bloom index's _key_type marker)
                if os.path.isfile(os.path.join(sdir, f)):
                    os.link(
                        os.path.join(sdir, f), os.path.join(out_dir, side, f)
                    )
    if os.path.exists(os.path.join(src, MANIFEST_NAME)):
        os.link(
            os.path.join(src, MANIFEST_NAME), os.path.join(out_dir, MANIFEST_NAME)
        )
    return n


def _snapshot_diff_feed(
    spark: SparkSession,
    base_dir: str,
    new_dir: str,
    keys: list[str],
    schema_ddl: str,
) -> DataFrame:
    """The EFFECTIVE CHANGE SET between two snapshots of one keyed table,
    in ``merge_changes``' exact feed schema (keys, op, before_*/after_* per
    value column): keys only in ``base_dir`` emit 'delete' (before-image,
    NULL after), keys only in ``new_dir`` emit 'insert', keys whose value
    images differ emit 'update'; identical rows emit nothing — the output
    is O(changed keys) no matter how big the table is.

    Compute prunes too, not just output: data files SHARED BY INODE between
    the two snapshots (the hardlink chain's sharing) hold byte-identical
    rows, so when both versions' deletion-vector sidecars are also
    inode-identical, shared files can't contribute a change and only the
    DIFFERING files scan on either side (per-version key uniqueness — the
    merge contract — means a key in a shared file is that key's row in
    BOTH snapshots). A restore that touched 3 of 1,000 files diffs 3
    files. When the DV sidecars differ the prune is unsound (a shared
    file's row can be dead on one side only) and both sides scan in full —
    never wrong pruning."""
    def _data_inos(d: str) -> "dict[str, int]":
        return {
            f: os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    def _dv_inos(d: str) -> frozenset:
        dd = _deletes_dir(d)
        if not os.path.isdir(dd):
            return frozenset()
        return frozenset(
            os.stat(os.path.join(dd, f)).st_ino
            for f in os.listdir(dd)
            if f.endswith(".parquet")
        )

    b_files, n_files = _data_inos(base_dir), _data_inos(new_dir)
    if _dv_inos(base_dir) == _dv_inos(new_dir):
        shared = set(b_files.values()) & set(n_files.values())
    else:
        shared = set()
    b_paths = [
        os.path.join(base_dir, f) for f, i in sorted(b_files.items())
        if i not in shared
    ]
    n_paths = [
        os.path.join(new_dir, f) for f, i in sorted(n_files.items())
        if i not in shared
    ]

    def _scan(paths: list, vdir: str) -> DataFrame:
        if not paths:
            return spark.createDataFrame([], schema_ddl)
        df = spark.read.schema(schema_ddl).parquet(*paths)
        dv = read_deletion_vectors(spark, vdir)
        return _subtract_deletes(df, dv) if dv is not None else df

    b, n = _scan(b_paths, base_dir), _scan(n_paths, new_dir)
    value_cols = [c for c in b.columns if c not in keys]
    bb = b.select(
        *keys,
        F.lit(1).alias("__in_b"),
        *[F.col(c).alias(f"before_{c}") for c in value_cols],
    )
    nn = n.select(
        *keys,
        F.lit(1).alias("__in_n"),
        *[F.col(c).alias(f"after_{c}") for c in value_cols],
    )
    j = bb.join(nn, keys, "full_outer")
    changed = F.lit(False)
    for c in value_cols:
        changed = changed | ~F.col(f"before_{c}").eqNullSafe(F.col(f"after_{c}"))
    op = (
        F.when(F.col("__in_b").isNull(), F.lit("insert"))
        .when(F.col("__in_n").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    cols: list = [*keys, op.alias("op")]
    for c in value_cols:
        cols += [F.col(f"before_{c}"), F.col(f"after_{c}")]
    return j.filter(
        F.col("__in_b").isNull() | F.col("__in_n").isNull() | changed
    ).select(*cols)


def restore_table(
    table_root: str,
    to_version: int,
    retries: int = 3,
    spark: "SparkSession | None" = None,
    changes_feed_keys: "list[str] | None" = None,
    schema_ddl: "str | None" = None,
) -> dict:
    """RESTORE: roll the table back to an earlier version AS A NEW VERSION
    (the Delta RESTORE shape — history is immutable, a rollback is one more
    commit whose content equals the old snapshot). The new version hardlinks
    the restored version's data files, deletion vectors, and manifest — a
    restore is O(files) metadata, zero data bytes, and every intermediate
    version stays readable via read_version (time travel across the
    rollback included).

    Runs under the same optimistic-concurrency claim/commit protocol as
    every chain DML, so a restore racing a merge serializes.

    CHANGE FEED (VERDICT r09 item 3): with ``changes_feed_keys`` (plus
    ``spark`` and ``schema_ddl``), the restore version persists its
    EFFECTIVE change set — the keyed diff of the restored snapshot against
    the prior tip (``_snapshot_diff_feed``: O(changed keys) events, scan
    pruned to the files the two snapshots do NOT share by inode) — so
    ``read_changes`` ranges and streaming CDF consumers cross the rollback
    instead of being stranded by it. Without the option the restored
    version carries NO feed and a read_changes range crossing it raises
    loudly rather than replaying a silent gap (consumers re-seed from the
    restored snapshot). Returns {"restored_from", "files_linked",
    "version", "attempts"}."""
    if to_version not in committed_versions(table_root):
        raise ValueError(
            f"restore_table: v{to_version} is not a committed version of "
            f"{table_root} (have {committed_versions(table_root)})"
        )
    if changes_feed_keys is not None and (spark is None or schema_ddl is None):
        raise ValueError(
            "restore_table: changes_feed_keys needs spark and schema_ddl "
            "(the feed is a keyed snapshot diff)"
        )

    def _build(base: str, out: str) -> dict:
        src = os.path.join(table_root, f"v{to_version}")
        n = _link_version_content(src, out)
        # metadata restores WITH the data (Delta RESTORE semantics): the
        # new version pins the restored version's effective doc, so a
        # rollback across a rename/drop also rolls the logical schema back
        _write_version_meta(out, _effective_meta(table_root, to_version))
        if changes_feed_keys is not None:
            feed = _snapshot_diff_feed(
                spark, base, src, changes_feed_keys, schema_ddl
            )
            cdir = os.path.join(out, CHANGES_NAME)
            feed.coalesce(8).write.parquet(cdir)
            # a no-op restore's diff is empty; Spark writes no part files
            # for empty partitions, and a part-less parquet dir cannot be
            # schema-inferred by read_changes — mark content-neutral instead
            if not any(f.endswith(".parquet") for f in os.listdir(cdir)):
                import shutil

                shutil.rmtree(cdir)
                open(os.path.join(out, CHANGES_EMPTY_NAME), "w").close()
        return {"restored_from": to_version, "files_linked": n}

    return _advance_table(table_root, _build, retries, op="restore")


def clone_table(
    src_root: str,
    dest_root: str,
    version: "int | None" = None,
) -> str:
    """SHALLOW CLONE: a new table chain whose committed ``v0`` hardlinks one
    version of the source (default: its latest committed) — data files,
    deletion vectors, manifest, bloom index — with ZERO data copied. The
    clone then evolves independently: its DML writes its own versions and
    never touches the source.

    Unlike an object-store shallow clone (which dangles when the source
    VACUUMs the files it borrowed), hardlinks refcount at the filesystem:
    vacuuming the source unlinks ITS names, the clone's links keep every
    shared inode alive — clone-then-vacuum is safe by construction and
    proven in the lifecycle tests. Returns the clone's v0 path."""
    v = latest_committed(src_root) if version is None else version
    if v not in committed_versions(src_root):
        raise ValueError(
            f"clone_table: v{v} is not a committed version of {src_root}"
        )
    if os.path.isdir(dest_root) and os.listdir(dest_root):
        raise FileExistsError(f"clone_table: dest {dest_root} already has content")
    out = os.path.join(dest_root, "v0")
    os.makedirs(out)
    _link_version_content(os.path.join(src_root, f"v{v}"), out)
    # table metadata is part of what a clone is — the cloned VERSION's
    # effective doc (constraints, column mapping, drop list) becomes the
    # clone's own v0 doc, COPIED not hardlinked: metadata is mutable (a
    # future ALTER on either table writes its own doc), and a shared inode
    # would alias one table's change onto the other
    doc = _effective_meta(src_root, v)
    _write_version_meta(out, doc)
    if doc:
        import json as _json

        tmp = os.path.join(dest_root, TABLE_META_NAME + ".tmp")
        with open(tmp, "w") as f:
            _json.dump(doc, f)
        os.replace(tmp, os.path.join(dest_root, TABLE_META_NAME))
    mark_committed(out, {"op": "clone", "source": f"{src_root}/v{v}"})
    return out


def optimize_table(
    spark: SparkSession,
    table_root: str,
    target_bytes: int = 128 * 1024 * 1024,
    retries: int = 3,
    zorder_cols: "list[str] | None" = None,
) -> dict:
    """OPTIMIZE as a chain-advancing version (the table-format shape —
    Delta OPTIMIZE writes a new snapshot, it never mutates one): the new
    version is the latest committed version rewritten to ~``target_bytes``
    files THROUGH its deletion vectors (materialize + clear, compaction
    semantics), leaving every old version — including its sidecar —
    untouched for time travel. History reclaim stays ``vacuum_versions``'s
    job.

    ``zorder_cols`` (exactly two columns) makes it OPTIMIZE ZORDER: the
    rewrite range-partitions + sorts on the Morton interleave of both
    columns (write_clustered's layout), so each output file covers a tight
    range of BOTH dimensions and parquet footer min/max prunes filters on
    either — the periodic re-cluster a maintained table runs after enough
    merges have scattered its layout. Costs the same one shuffle the plain
    rewrite pays (repartitionByRange instead of round-robin).

    Returns {"files_before", "files_after", "bytes", "version",
    "attempts"}."""
    import math

    def _build(base_dir: str, out_dir: str) -> dict:
        files = [
            os.path.join(base_dir, f)
            for f in os.listdir(base_dir)
            if f.endswith(".parquet")
        ]
        total = sum(os.path.getsize(f) for f in files)
        n_files = max(1, math.ceil(total / target_bytes))
        df = read_with_deletes(spark, base_dir)
        # materialize column DROPS: logically dropped columns' bytes stop
        # here (the drop_column contract — rewritten files shed the dead
        # slots; explicit-schema readers of mixed files see NULLs, and the
        # logical read never projects them anyway)
        dead = set(dropped_columns(table_root))
        if dead:
            df = df.drop(*[c for c in df.columns if c in dead])
        # repartition, NOT coalesce: coalesce(n) would collapse the whole
        # scan+DV-subtract stage to n tasks (a 1000-file table compacted to
        # 8 files would read on 8 tasks); one round-robin shuffle keeps the
        # scan at full parallelism and the write at the target file count —
        # the right trade for the chain's owed rewrite (compact_partitioned
        # keeps coalesce: its contract is the zero-shuffle maintenance pass)
        if zorder_cols is not None:
            from rca_data_tools_spark.operators.layout import bin_to, zorder_key

            a, b = zorder_cols
            bounds = df.agg(
                F.min(a).alias("alo"), F.max(a).alias("ahi"),
                F.min(b).alias("blo"), F.max(b).alias("bhi"),
            ).collect()[0]
            if any(bounds[c] is None for c in ("alo", "ahi", "blo", "bhi")):
                df.repartition(n_files).write.mode("append").parquet(out_dir)
            else:
                zk = zorder_key(
                    bin_to(F.col(a).cast("long"), F.lit(int(bounds["alo"])),
                           F.lit(int(bounds["ahi"])), 8),
                    bin_to(F.col(b).cast("long"), F.lit(int(bounds["blo"])),
                           F.lit(int(bounds["bhi"])), 8),
                    8,
                )
                (
                    df.withColumn("__zkey", zk)
                    .repartitionByRange(n_files, "__zkey")
                    .sortWithinPartitions("__zkey")
                    .drop("__zkey")
                    .write.mode("append")
                    .parquet(out_dir)
                )
        else:
            df.repartition(n_files).write.mode("append").parquet(out_dir)
        # OPTIMIZE is CONTENT-NEUTRAL: its change feed is EMPTY, not
        # missing — mark it so read_changes ranges cross it cleanly
        # (Delta's table_changes likewise skips data-neutral commits)
        with open(os.path.join(out_dir, CHANGES_EMPTY_NAME), "a"):
            pass
        # all-new files: rebuild the manifest for them on the prior zone key
        # (one stats scan of the compacted output) so OPTIMIZE doesn't cost
        # the next merge its metadata-only pruning; ZORDER additionally
        # records BOTH clustering dimensions as secondary column maps, so
        # the second dimension is metadata-prunable too (not just
        # footer-readable)
        _extend_manifest(
            spark, base_dir, out_dir, None, set(), extra_cols=zorder_cols
        )
        return {
            "files_before": len(files),
            "files_after": len(
                [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
            ),
            "bytes": total,
        }

    return _advance_table(
        table_root, _build, retries,
        op="optimize_zorder" if zorder_cols is not None else "optimize",
    )


def update_where(
    spark: SparkSession,
    target_dir: str,
    out_dir: str,
    predicate: str,
    set_exprs: "dict[str, str]",
    schema_ddl: str,
    constraints: "dict[str, str] | None" = None,
) -> dict:
    """Row-level UPDATE as merge-on-read (the Iceberg MOR-upsert shape):
    matched rows' positions join the DELETION VECTORS (their old images
    disappear from scans) and their UPDATED images — ``set_exprs`` maps
    column → SQL expression over the old row, unmentioned columns carry
    over — append as new parquet parts; every existing data file hardlinks
    unchanged. An UPDATE therefore costs O(matched rows) writes + O(matched
    positions) metadata, never a file rewrite — the same economics as
    ``delete_where`` plus the new images.

    Rows already deleted by the version's vectors are NOT updated (they do
    not exist); everything runs executor-side like delete_where. Returns
    {"files_total", "files_rewritten" (always 0), "rows_updated"}."""
    base = spark.read.schema(schema_ddl).parquet(target_dir)
    cols = base.columns
    missing = [c for c in set_exprs if c not in cols]
    if missing:
        raise ValueError(f"update_where: set columns not in schema: {missing}")
    keyed = base.select(
        "*",
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias("__f"),
        F.col("_metadata.row_index").alias("__pos"),
    ).where(predicate)
    dv = read_deletion_vectors(spark, target_dir)
    if dv is not None:
        # a row the vectors already deleted must not be updated back to life
        keyed = keyed.join(
            dv,
            (keyed["__f"] == dv["f"]) & (keyed["__pos"] == dv["pos"]),
            "left_anti",
        )
    hits = keyed.select(F.col("__f").alias("f"), F.col("__pos").alias("pos"))
    combined = (dv.unionByName(hits) if dv is not None else hits).distinct()
    updated = keyed.select(
        *[F.expr(set_exprs[c]).alias(c) if c in set_exprs else F.col(c) for c in cols]
    )
    if constraints:
        # the table's CHECK constraints apply to the NEW images: an UPDATE
        # must not be able to write what a MERGE would have refused
        from rca_data_tools_spark.operators.expectations import check_constraints

        updated = check_constraints(updated, constraints)

    _ensure_out_dir(out_dir)
    data_files = [f for f in os.listdir(target_dir) if f.endswith(".parquet")]
    for f in data_files:
        os.link(os.path.join(target_dir, f), os.path.join(out_dir, f))
    if dv is not None:
        prior_n = _parquet_dir_rows(_deletes_dir(target_dir))
        if prior_n is None:
            prior_n = dv.count()
    else:
        prior_n = 0
    # new images first (they read target_dir, not out_dir), then the sidecar.
    # coalesce(8), not (1): a wide UPDATE (10% of a 100 TB table) must not
    # funnel through one writer task; a production MoR writer bin-packs by
    # bytes — here optimize_table reclaims whatever small parts remain
    updated.coalesce(8).write.mode("append").parquet(out_dir)
    from pyspark.sql import Observation

    obs = Observation()
    combined.observe(obs, F.count(F.lit(1)).alias("n")).coalesce(8).write.parquet(
        _deletes_dir(out_dir)
    )
    # hardlinked files keep valid blooms; the new image parts have none and
    # a bloom-pruned lookup treats unindexed files as always-candidates
    _carry_bloom_links(target_dir, out_dir)
    total_n = obs.get["n"]
    # keep the zone-map manifest alive: hardlinked files carry their entries
    # (byte-identical; vectored rows only ever over-approximate the range),
    # new image parts pay one batch-sized stats scan — without this the
    # next pruned merge would fall back to a full key-column scan
    _extend_manifest(spark, target_dir, out_dir, schema_ddl, set(data_files))
    return {
        "files_total": len(data_files),
        "files_rewritten": 0,
        "rows_updated": int(total_n - prior_n),
    }


def _extend_manifest(
    spark: SparkSession,
    target_dir: str,
    out_dir: str,
    schema_ddl: "str | None",
    carried_names: "set[str]",
    extra_cols: "list[str] | None" = None,
) -> None:
    """Carry the previous version's zone-map manifest — primary map AND
    secondary per-column maps — into ``out_dir`` and add entries for any
    NEW parquet parts (one stats scan of just those files, all columns
    aggregated together). ``extra_cols`` adds columns to the secondary
    maps (OPTIMIZE ZORDER passes its two clustering dimensions so BOTH are
    metadata-prunable afterwards — VERDICT r09 item 5); with no prior
    manifest and no extra_cols the function quietly skips (the next merge
    scans; correctness never depends on the manifest)."""
    from urllib.parse import unquote, urlparse

    doc = _read_manifest_doc(target_dir)
    if doc is None and not extra_cols:
        return
    zone_key = doc.get("zone_key") if doc is not None else extra_cols[0]
    entries = (
        {n: e for n, e in doc["files"].items() if n in carried_names}
        if doc is not None
        else {}
    )
    col_maps = {
        c: {n: e for n, e in m.items() if n in carried_names}
        for c, m in (doc.get("columns", {}) if doc is not None else {}).items()
    }
    for c in extra_cols or []:
        if c != zone_key:
            col_maps.setdefault(c, {})
    new_parts = [
        f for f in os.listdir(out_dir)
        if f.endswith(".parquet") and f not in carried_names
    ]
    if new_parts:
        part_paths = [os.path.join(out_dir, f) for f in new_parts]
        # footer-first (guide §6): stats of parts this chain just wrote come
        # from their own footers when the columns are integer-typed — no job
        footer = _footer_file_stats(part_paths, [zone_key, *col_maps])
        if footer is not None:
            for f, p in zip(new_parts, part_paths):
                mn, mx = footer[p][zone_key]
                entries[f] = {"mn": mn, "mx": mx}
                for c in col_maps:
                    cmn, cmx = footer[p][c]
                    col_maps[c][f] = {"mn": cmn, "mx": cmx}
            _write_manifest(out_dir, zone_key, entries, col_maps or None)
            return
        reader = spark.read if schema_ddl is None else spark.read.schema(schema_ddl)
        ndf = reader.parquet(*part_paths)
        if zone_key not in ndf.columns:
            return
        col_maps = {c: m for c, m in col_maps.items() if c in ndf.columns}
        # pre-seed EVERY new part: a 0-row part yields no stats group, and a
        # name missing from the manifest would trip the cross-check; NULL
        # bounds make it a never-candidate (nothing to match in 0 rows)
        for f in new_parts:
            entries[f] = {"mn": None, "mx": None}
            for m in col_maps.values():
                m[f] = {"mn": None, "mx": None}
        aggs = [F.min(zone_key).alias("mn"), F.max(zone_key).alias("mx")]
        for c in col_maps:
            aggs += [F.min(c).alias(f"mn__{c}"), F.max(c).alias(f"mx__{c}")]
        for r in (
            ndf.groupBy(F.input_file_name().alias("__f")).agg(*aggs).collect()
        ):
            p = urlparse(r["__f"])
            name = os.path.basename(unquote(p.path) if p.scheme in ("file", "") else r["__f"])
            entries[name] = {"mn": r["mn"], "mx": r["mx"]}
            for c in col_maps:
                col_maps[c][name] = {"mn": r[f"mn__{c}"], "mx": r[f"mx__{c}"]}
    _write_manifest(out_dir, zone_key, entries, col_maps or None)


def table_history(spark: SparkSession, table_root: str) -> DataFrame:
    """DESCRIBE HISTORY for the version chain: one row per committed
    version — (version, op, committed_ts, stats_json) — read from the
    ``_commit`` markers, where every chain-advancing DML records its op
    name and op-sized stats at publish time. Empty (pre-history / caller-
    built) markers read as op NULL; resolution is one directory listing +
    KB-sized marker reads, the cost a format pays reading its log."""
    import json

    rows = []
    for v in committed_versions(table_root):
        marker = os.path.join(table_root, f"v{v}", COMMIT_NAME)
        op = stats = None
        ts = None
        if os.path.exists(marker):
            ts = float(os.stat(marker).st_mtime)
            body = open(marker).read().strip()
            if body:
                try:
                    doc = json.loads(body)
                    op = doc.get("op")
                    stats = json.dumps(doc.get("stats")) if "stats" in doc else None
                except ValueError:
                    pass
        rows.append((v, op, ts, stats))
    return spark.createDataFrame(
        rows, "version int, op string, committed_ts double, stats_json string"
    )


def read_version(
    spark: SparkSession,
    table_root: str,
    schema_ddl: "str | None" = None,
    n: "int | None" = None,
    as_of_ts: "float | None" = None,
) -> DataFrame:
    """TIME TRAVEL read over the version chain (VERDICT r08 item 7): resolve
    a version — ``n`` explicitly, ``as_of_ts`` as the newest version
    committed at or before that POSIX timestamp (marker mtime; directory
    mtime for pre-protocol versions), default the latest committed — and
    scan it THROUGH its deletion vectors (``read_with_deletes``), so a DV
    in the chain is honored at every point in history it applies to.

    Versions are directories; resolution is one listing — the metadata
    cost a format pays reading its log."""
    if n is not None and as_of_ts is not None:
        raise ValueError("read_version: pass n or as_of_ts, not both")
    vs = committed_versions(table_root)
    if not vs:
        raise ValueError(f"no table version in {table_root}")
    if n is not None:
        if n not in vs:
            raise ValueError(f"version v{n} not in {table_root} (have {vs})")
        pick = n
    elif as_of_ts is not None:
        def _commit_ts(v: int) -> float:
            vdir = os.path.join(table_root, f"v{v}")
            marker = os.path.join(vdir, COMMIT_NAME)
            return os.stat(marker if os.path.exists(marker) else vdir).st_mtime

        eligible = [v for v in vs if _commit_ts(v) <= as_of_ts]
        if not eligible:
            raise ValueError(
                f"no version of {table_root} committed at or before {as_of_ts}"
            )
        pick = eligible[-1]
    else:
        pick = vs[-1]
    return read_with_deletes(
        spark, os.path.join(table_root, f"v{pick}"), schema_ddl
    )


DELETES_NAME = "_deletes"
DELETES_DDL = "f string, pos long"
# per-file bloom index sidecar (sources/bloom_index.py builds and probes it);
# defined here because the chain DML carries it between versions like the
# deletion vectors: data files are immutable, so a file's bloom stays valid
# for as long as the file itself is carried
BLOOM_NAME = "_bloom"


def _deletes_dir(table_dir: str) -> str:
    return os.path.join(table_dir, DELETES_NAME)


def has_deletes(table_dir: str) -> bool:
    """True when the version carries a deletion-vector sidecar (a parquet
    DIRECTORY named ``_deletes`` — the underscore keeps Spark's default
    path filter from ever reading it as table data)."""
    d = _deletes_dir(table_dir)
    return os.path.isdir(d) and any(f.endswith(".parquet") for f in os.listdir(d))


def _parquet_dir_rows(dir_path: str) -> "int | None":
    """Total row count of a parquet directory from its FOOTERS — one KB
    metadata read per file, no Spark job (guide §6). None when unreadable;
    callers then fall back to a count() job."""
    try:
        import pyarrow.parquet as pq
    except ImportError:
        return None
    total = 0
    try:
        for f in os.listdir(dir_path):
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(dir_path, f)).metadata.num_rows
    except Exception:
        return None
    return total


def read_deletion_vectors(spark: SparkSession, table_dir: str) -> "DataFrame | None":
    """The version's deletion vectors as a DataFrame ``(f, pos)`` — file
    basename + row position — or None when the version carries none. The
    sidecar is parquet written BY EXECUTORS (delete_where), so a
    billion-position GDPR sweep never materializes driver-side; this read
    is a plain distributed scan."""
    if not has_deletes(table_dir):
        return None
    return spark.read.schema(DELETES_DDL).parquet(_deletes_dir(table_dir))


def _subtract_deletes(df: DataFrame, dv: DataFrame) -> DataFrame:
    """Merge-on-read subtraction: anti-join the scan against the deletion
    vectors on (file basename, ``_metadata.row_index``). No broadcast hint
    — the sidecar is usually KBs and AQE will broadcast it, but a huge
    vector set degrades to a shuffled anti-join instead of OOMing a forced
    build side."""
    out_cols = df.columns
    keyed = df.select(
        "*",
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias("__f"),
        F.col("_metadata.row_index").alias("__pos"),
    )
    return (
        keyed.join(
            dv,
            (keyed["__f"] == dv["f"]) & (keyed["__pos"] == dv["pos"]),
            "left_anti",
        )
        .select(*out_cols)
    )


def delete_where(
    spark: SparkSession,
    target_dir: str,
    out_dir: str,
    predicate: str,
    schema_ddl: str,
) -> dict:
    """Row-level DELETE as DELETION VECTORS (merge-on-read — the Delta DV /
    Iceberg position-delete shape): instead of rewriting every file that
    contains a matching row (copy-on-write would), record the matching
    rows' (file basename, row position) in a parquet sidecar and hardlink
    EVERY data file unchanged into the new version. ``read_with_deletes``
    subtracts the vectors at scan time. The write cost of a delete becomes
    O(matched positions) bytes of metadata — zero data bytes — which is
    why formats grew DVs for GDPR-style scattered deletes over 100 TB.

    Positions come from the parquet reader's own ``_metadata.row_index``
    (stable per file), found with ONE predicate scan, and the sidecar is
    written END-TO-END BY EXECUTORS: predicate scan → union with the prior
    version's vectors → distinct → parquet write, never a driver collect —
    a delete matching a billion rows stays a distributed job (VERDICT r08
    item 2). Sidecars compose: a version that already carries vectors gets
    the distinct union (prior vectors apply to the same immutable files).
    Returns {"files_total", "files_rewritten" (always 0 — the point),
    "rows_deleted"} — the count is two metadata aggregations (single
    numbers to the driver, not positions)."""
    df = spark.read.schema(schema_ddl).parquet(target_dir)
    hits = df.where(predicate).select(
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias("f"),
        F.col("_metadata.row_index").alias("pos"),
    )
    prior = read_deletion_vectors(spark, target_dir)
    if prior is not None:
        # the prior sidecar's row count sits in its parquet footers (its
        # rows are distinct by construction) — no count() job needed
        prior_n = _parquet_dir_rows(_deletes_dir(target_dir))
        if prior_n is None:
            prior_n = prior.count()
    else:
        prior_n = 0
    combined = (prior.unionByName(hits) if prior is not None else hits).distinct()

    _ensure_out_dir(out_dir)
    data_files = [f for f in os.listdir(target_dir) if f.endswith(".parquet")]
    for f in data_files:
        os.link(os.path.join(target_dir, f), os.path.join(out_dir, f))
    # sidecar rows are 16-byte (f, pos) pairs: a handful of writer tasks
    # keeps the file count constant while still absorbing billions of
    # positions; the distinct's shuffle did the heavy lifting upstream.
    # The new total rides the write as an Observation — the old read-back
    # count() was one more job per delete (guide §1.4)
    from pyspark.sql import Observation

    obs = Observation()
    combined.observe(obs, F.count(F.lit(1)).alias("n")).coalesce(8).write.parquet(
        _deletes_dir(out_dir)
    )
    total_n = obs.get["n"]
    # manifest and bloom index (if any) carry over untouched: deletes change
    # no file bytes (a vectored row's set bits over-approximate — one-sided,
    # so still correct)
    if os.path.exists(os.path.join(target_dir, MANIFEST_NAME)):
        os.link(
            os.path.join(target_dir, MANIFEST_NAME),
            os.path.join(out_dir, MANIFEST_NAME),
        )
    _carry_bloom_links(target_dir, out_dir)
    return {
        "files_total": len(data_files),
        "files_rewritten": 0,
        "rows_deleted": int(total_n - prior_n),
    }


def read_with_deletes(
    spark: SparkSession, table_dir: str, schema_ddl: "str | None" = None
) -> DataFrame:
    """Merge-on-read scan: parquet scan minus the version's deletion
    vectors. The vectors are a distributed parquet sidecar anti-joined on
    (file, position) — position comes from the reader's
    ``_metadata.row_index``, so no data column is sacrificed to row ids,
    and no position ever touches the driver. A version without a sidecar
    scans plain. ``schema_ddl=None`` infers the schema (the maintenance
    jobs' path — compact_partitioned)."""
    reader = spark.read if schema_ddl is None else spark.read.schema(schema_ddl)
    df = reader.parquet(table_dir)
    dv = read_deletion_vectors(spark, table_dir)
    if dv is None:
        return df
    return _subtract_deletes(df, dv)
