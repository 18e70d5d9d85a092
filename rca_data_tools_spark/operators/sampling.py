"""Deterministic sampling and sequence-packing operators for training-data
pipelines.

Everything here is hash-deterministic (md5-derived uniforms, no RNG state), so
results are reproducible across runs, partitionings, and engines — the same
predicate evaluates identically in DuckDB, which is what makes these
oracle-checkable. At 100 TB these are the workhorse corpus operators: keep
rates per language, per-domain caps, and packing documents into
fixed-token-budget training sequences.

Scale notes:
- `hash_uniform` compiles to pure Catalyst expressions (md5 + conv), so
  sampling predicates push down to the scan — a 1% sample of 100 TB reads all
  rows but shuffles nothing and materializes ~1 TB.
- `group_cap` is one hash shuffle on the capped key (window row_number). Hot
  keys are bounded by the cap itself: the window only ever buffers one key's
  rows per partition, and AQE skew handling splits oversized partitions.
- `pack_greedy` packs within shards (partitionBy), never globally — a global
  ordered cumsum would serialize onto one task. Shard by whatever the
  training job shards by (language, source, hash bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_uniform",
    "hash_sample",
    "stratified_sample",
    "group_cap",
    "pack_greedy",
    "importance_weights",
]

# 2^32: hash_uniform yields an integer in [0, 2^32); rate predicates compare
# against floor(rate * 2^32) so no floating point is involved.
_HASH_SPACE = 1 << 32


def hash_uniform(key: Column, salt: str) -> Column:
    """Deterministic uniform integer in [0, 2^32) from md5(salt || key).

    Reference analogue: the reference has no sampling (it plots everything);
    this is the scale-path primitive the 100 TB corpus needs.
    """
    return F.conv(F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8), 16, 10).cast("long")


def rate_threshold(rate: float) -> int:
    """Integer acceptance threshold for a keep-rate in [0, 1]."""
    return int(rate * _HASH_SPACE)


def hash_sample(df: DataFrame, key_col: str, rate: float, salt: str = "s") -> DataFrame:
    """Keep a deterministic `rate` fraction of rows keyed by `key_col`.

    The predicate is a pure projection — no shuffle, no RNG; the same row set
    survives regardless of partitioning or engine.
    """
    return df.filter(hash_uniform(F.col(key_col), salt) < F.lit(rate_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float,
    salt: str = "s",
) -> DataFrame:
    """Per-stratum keep rates (e.g. language rebalancing: downsample English,
    keep all low-resource languages).

    The rate table compiles to a literal CASE expression — strata maps are
    tiny config, so this stays shuffle-free and fully pushed down instead of
    paying a broadcast join.
    """
    thresh: Column = F.lit(rate_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thresh = F.when(F.col(strata_col) == value, F.lit(rate_threshold(rate))).otherwise(thresh)
    return df.filter(hash_uniform(F.col(key_col), salt) < thresh)


def group_cap(
    df: DataFrame,
    group_col: str,
    n: int,
    order_col: str,
    descending: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Keep at most `n` rows per group, by deterministic priority.

    The domain-cap operator: bound any single source's contribution to the
    corpus. One shuffle on `group_col`; the row_number window needs no full
    sort of the data, only per-group ordering.
    """
    order = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
    )


def pack_greedy(
    df: DataFrame,
    shard_col: str,
    order_col: str | list[str],
    length_col: str,
    target: int,
) -> DataFrame:
    """Assign documents to fixed-budget training bins by running token count.

    Within each shard (ordered by `order_col` — a column name or a list of
    names forming a composite key), a document starting at running offset
    `cum - len` goes to bin `floor((cum - len) / target)` — the streaming
    first-fit packing a sequential packer would produce when bins are closed
    in order. Integer arithmetic throughout: bit-exact across engines.

    The order key must be unique within a shard: the running sum uses the
    default RANGE frame (ties share one cumulative value), so a colliding
    key silently merges rows into the same offset. Pass a composite list
    (e.g. ``["doc_id", "chunk_id"]``) rather than an arithmetic encoding
    that can overflow into collisions.

    One shuffle (partitionBy shard + sort within); bins never cross shards,
    so no global ordering is required and shards pack in parallel.
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(shard_col).orderBy(*order_cols)
    cum = F.sum(F.col(length_col)).over(w)
    return df.withColumn(
        "bin_id", F.floor((cum - F.col(length_col)) / F.lit(target)).cast("long")
    )


def importance_weights(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    n_buckets: int = 128,
    scale: int = 6,
) -> DataFrame:
    """DSIR-shaped importance weights (Xie et al. 2023, arXiv:2302.03169):
    hash every token into ``n_buckets`` features, build add-1-smoothed unigram
    models of the TARGET slice (rows where ``target_pred``) and the full
    SOURCE corpus, and score each document by its mean per-token
    log-likelihood ratio ln(p_target/p_source) — the importance weight used
    to resample a generic corpus toward a target domain.

    Scale shape: one exploded-token pass feeds ONE map-side-combinable
    groupBy onto ``n_buckets`` keys (target counts ride along as a
    conditional sum — no second corpus scan); the resulting feature-weight
    table is dim-sized and broadcast back onto the token stream, so the
    per-doc aggregation is the only data-sized shuffle. Hash features are
    md5-derived — engine-independent, no vocabulary state — and the weight
    sum is an exact decimal fold, so the ranking replays bit-for-bit in SQL.

    Returns (id, n_feats, importance) for every document with ≥1 token.
    """
    from rca_data_tools_spark.functions.numeric import dsum
    from rca_data_tools_spark.functions.text import normalize, tokens

    feat = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10).cast("long")
        % n_buckets
    ).alias("feat")
    feats = docs.select(
        id_col, target_pred.alias("is_tgt"), F.explode(tokens(normalize(text_col))).alias("tok")
    ).select(id_col, "is_tgt", feat)
    counts = feats.groupBy("feat").agg(
        F.count(F.lit(1)).alias("src_n"),
        F.sum(F.when(F.col("is_tgt"), 1).otherwise(0)).alias("tgt_n"),
    )
    logr = F.round(
        F.log((F.col("tgt_n") + F.lit(1.0)) / (F.col("tgt_tot") + F.lit(float(n_buckets))))
        - F.log((F.col("src_n") + F.lit(1.0)) / (F.col("src_tot") + F.lit(float(n_buckets)))),
        scale,
    )
    # Corpus totals as a broadcast 1-row join, not a partitionBy(lit(1))
    # window — same math, but nothing in the plan funnels rows through a
    # single-partition WindowExec (the shape the plan sweep bans).
    totals = counts.agg(
        F.sum("src_n").alias("src_tot"), F.sum("tgt_n").alias("tgt_tot")
    )
    wts = counts.crossJoin(F.broadcast(totals)).select("feat", logr.alias("logr"))
    scored = feats.join(F.broadcast(wts), "feat").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_feats"),
        (dsum("logr", scale) / F.count(F.lit(1))).alias("_imp"),
    )
    return scored.select(id_col, "n_feats", F.round("_imp", scale).alias("importance"))
