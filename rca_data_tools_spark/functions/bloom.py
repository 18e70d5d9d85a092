"""Pure-Column Bloom filter: build a bitmap from a small key set, probe it
JVM-side on a big scan.

PySpark exposes no DataFrame.stat.bloomFilter (the Scala API does), so this
implements the classic k-hash Bloom filter (Bloom 1970) with public
primitives only:

- positions: ``pmod(xxhash64(seed_i, key), m)`` for k fixed seeds — k
  independent-enough hashes from Spark's built-in xxhash64.
- build: the set positions are aggregated distributed (groupBy position) and
  only the <= m distinct positions are collected — driver state is bounded by
  the filter size (m/8 bytes), never by the key count, same class as
  collecting IVF centroids.
- probe: the bitmap becomes a foldable array<bigint> literal; the membership
  test is ``element_at`` + ``shiftright`` + ``& 1`` per seed, AND-ed — whole
  plan stays inside WholeStageCodegen, no Python on the probe path.

The filter is one-sided (false positives only), so callers follow the probe
with an exact join on the survivors; the Bloom stage just cuts the rows that
reach that join. At 100 TB this is the standard "broadcast a sketch of the
small side into the big scan" pattern Spark itself uses for runtime row-group
filtering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Fixed seeds -> k hash functions. Any fixed distinct ints work.
BLOOM_SEEDS = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F)


def _positions(key: Column, m_bits: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(F.lit(seed), key), F.lit(m_bits)).cast("int")
        for seed in BLOOM_SEEDS
    ]


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = 1 << 16) -> list[int]:
    """Aggregate the key set's bit positions distributed, collect the bounded
    position list, and pack it into m_bits/64 signed-long words."""
    pos_rows = (
        keys.select(
            F.explode(F.array(*_positions(F.col(key_col), m_bits))).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for row in pos_rows:
        words[row["pos"] // 64] |= 1 << (row["pos"] % 64)
    # Python ints -> signed 64-bit literals for Spark's LongType.
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(bitmap_words: list[int], key: Column, m_bits: int = 1 << 16) -> Column:
    """Codegen'd membership probe: every seed's bit must be set."""
    bitmap = F.array(*[F.lit(w) for w in bitmap_words])
    cond = F.lit(True)
    for pos in _positions(key, m_bits):
        word = F.element_at(bitmap, (pos / F.lit(64)).cast("int") + F.lit(1))
        # The Python shiftleft() wrapper only takes an int shift amount; the
        # underlying SQL function accepts any expression.
        bit_mask = F.call_function("shiftleft", F.lit(1).cast("long"), pos % F.lit(64))
        cond = cond & (word.bitwiseAND(bit_mask) != F.lit(0))
    return cond
