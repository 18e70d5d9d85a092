"""Count-Min sketch as a DataFrame aggregation (Cormode & Muthukrishnan
2005) — the classic streaming frequency sketch, built deterministically so
any engine (including the DuckDB oracle) reproduces it cell-for-cell.

Design: d independent hash rows × w buckets. Each row of each hash table
accumulates the count of every key mapping into it; a key's estimate is the
MIN over its d cells — always an overestimate, with error ≤ εN at
probability 1-δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Hashing is the engine's salted-md5 integer (operators/sampling.hash_uniform
family): bucket_i(key) = md5('cms{i}|' || key) first 8 hex digits as int,
mod w — no RNG state, bit-identical across engines and reruns.

Scale shape (the whole point of a sketch): the ONLY corpus-sized operation
is the initial map-side-combined key count; everything after runs on
dimension-sized data (distinct keys → d·w cells). The d×w cell table is tiny
(KBs) and broadcast for estimation. At 100 TB this is one shuffle of
(key, count) partials — and the cell table the reducers produce is the same
few KB regardless of corpus size. Sketches from disjoint corpus shards merge
by cell-wise addition (the groupBy(i, bucket) SUM already IS that merge).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 64


def cms_bucket(key: Column, i: int, width: int = CMS_WIDTH) -> Column:
    """Deterministic bucket of `key` in hash row `i`."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{i}|"), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return h % width


def cms_build(
    df: DataFrame, key_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Build the (i, bucket, c) cell table from a corpus of key occurrences.

    One corpus-sized map-side-combined groupBy(key), then dim-sized
    explode × re-aggregate into d·w cells.

    NULL keys are dropped up front: md5(NULL) is NULL, so a NULL key would
    otherwise form a phantom cell that COUNT(DISTINCT)/exact-count semantics
    exclude — the sketch counts occurrences of *values*, like COUNT(key).
    """
    keyc = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rows = keyc.select(
        "key",
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        cms_bucket(F.col("key"), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell"),
    )
    return rows.groupBy("cell.i", "cell.bucket").agg(F.sum("cnt").alias("c"))


def cms_estimate(
    keys: DataFrame,
    cells: DataFrame,
    key_col: str = "key",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query estimates for every key in `keys`: MIN over the key's d
    cells. `cells` is d·w rows — broadcast; the probe is d equi-joins'
    worth of rows expressed as one explode + broadcast join + min."""
    probes = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        cms_bucket(F.col(key_col), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("*", "cell.i", "cell.bucket")
    # LEFT join + zero-fill: a probed key whose bucket received no mass has a
    # true cell count of 0 — an inner join would silently drop that probe and
    # overestimate unseen keys (min over only the nonzero cells).
    joined = probes.join(F.broadcast(cells), ["i", "bucket"], "left").withColumn(
        "c", F.coalesce(F.col("c"), F.lit(0))
    )
    others = [c for c in keys.columns]
    return joined.groupBy(*others).agg(F.min("c").alias("cms_estimate"))


HLL_M = 64  # registers (b = 6 index bits); alpha_64 = 0.709
_HLL_WBITS = 26  # 32-bit hash minus 6 index bits


def hll_hash_cols(key_col: str) -> tuple[Column, Column]:
    """(register index, rho) expressions for one key column — the single
    definition shared by the batch build and the streaming build, so the two
    register tables cannot silently diverge."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll|"), F.col(key_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    idx = h % HLL_M
    w = F.floor(h / HLL_M)
    rho = F.when(w > 0, F.lit(_HLL_WBITS + 1) - F.length(F.bin(w))).otherwise(
        F.lit(_HLL_WBITS + 1)
    )
    return idx, rho


def hll_register_rows(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Per-(group, register) max patterns for a deterministic HyperLogLog
    (Flajolet et al. 2007): salted-md5 32-bit hash, low 6 bits pick the
    register, rho = leading-zero rank of the remaining 26 bits.

    Unlike the engine's HLL++ (whose sketch layout is engine-private), every
    step here is a plain Column expression, so the DuckDB oracle replays the
    register table bit-for-bit and the estimate is hash-checkable.

    Scale shape: one map-side-combined groupBy to (groups x 64) rows —
    constant-size state per group; shard sketches merge by register-wise MAX.

    NULL keys are dropped up front (md5(NULL) is NULL → a NULL register index
    would inflate n_regs and skew both the raw and small-range estimates);
    COUNT(DISTINCT key) excludes NULLs, so the sketch must too.
    """
    idx, rho = hll_hash_cols(key_col)
    return (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"), idx.alias("idx"))
        .agg(F.max(rho).alias("r"))
    )


def hll_estimate(regs: DataFrame) -> DataFrame:
    """Group cardinality estimates from the register rows.

    Exact integer harmonic-sum trick: sum of 2^-r scaled by 2^27 is an
    integer (r <= 27, so every exponent 27-r is >= 0), so the only floating-
    point steps are one division and the final alpha multiply / small-range
    log — identical IEEE expression trees on both engines, rounded to 4
    decimals.
    """
    scale = 1 << (_HLL_WBITS + 1)
    per = regs.groupBy("grp").agg(
        F.sum(
            F.pow(F.lit(2.0), F.lit(_HLL_WBITS + 1) - F.col("r")).cast("long")
        ).alias("s_present"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    v = F.lit(HLL_M) - F.col("n_regs")  # registers never touched
    z_num = F.col("s_present") + v * F.lit(scale)
    raw = (F.lit(0.709) * F.lit(HLL_M) * F.lit(HLL_M) * F.lit(float(scale))) / z_num
    est = F.when(
        (raw <= 2.5 * HLL_M) & (v > 0), F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v)
    ).otherwise(raw)
    return per.select("grp", F.round(est, 4).alias("hll_estimate"))
