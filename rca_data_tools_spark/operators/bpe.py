"""Distributed BPE tokenizer training + application.

Byte-pair-encoding training for a training-data pipeline: learn the top-K
merge rules from corpus word frequencies, then tokenize every document with
the learned merges. The design follows the standard two-level decomposition
every production BPE trainer uses (Sennrich et al. 2016; HuggingFace
``tokenizers`` does the same):

1. **Word-frequency aggregation** (distributed): one map-side-combined
   ``groupBy(word).count()`` over the exploded corpus, then a
   ``TakeOrderedAndProject`` of the top-V words. The word-frequency table is
   *dimension-sized* (Heaps' law: ~O(corpus^0.5) distinct words; the explicit
   V cap bounds it regardless), so collecting it to the driver is the same
   config-sized collect the IVF quantizer uses — NOT a data-sized collect.
   At 100 TB the only full-corpus pass is this one shuffle of (word, count)
   pairs, map-side combined to vocabulary size per partition.

2. **Merge loop** (driver, pure Python over the dim-sized table): K
   iterations of count-adjacent-pairs → pick argmax → apply merge. O(V·L·K)
   on ≤V short strings — milliseconds. Ties break deterministically:
   highest pair count, then lexicographically smallest (left, right).

3. **Application** (distributed): merges become K literal ``replace``
   patterns applied JVM-side to the *distinct-word* dimension (never once
   per document occurrence), which is then broadcast-joined back to the
   exploded corpus. Documents are never shuffled; the corpus-sized work is
   one scan + one broadcast hash join.

Symbol sequences use an overlap-safe text representation shared verbatim by
the Python trainer, the Spark plan, and the DuckDB oracle, so all three are
bit-identical:

    seq(word) = ' ' + '  '.join(chars) + ' '

Each symbol is bounded by single spaces; adjacent symbols are separated by a
DOUBLE space. Merging (l, r) is then the plain substring replacement
``' l  r ' -> ' lr '``: left-to-right non-overlapping replacement is exactly
BPE's greedy merge order, the double separator keeps consecutive matches
from stealing each other's boundary space, and the space anchoring prevents
a pattern from matching inside a longer symbol (``'a  b'`` never matches
within ``'xa  b'`` because the leading space is part of the pattern).

Reference scope: the reference repo tokenizes text only incidentally; this
operator is part of the training-data-pipeline family (BASELINE.json north
star), built from the public BPE literature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_MERGES = 20
TOP_V = 1000

_WS = r"\s+"


def to_seq(word: str) -> str:
    """The shared symbol-sequence representation of a word."""
    return " " + "  ".join(word) + " "


def seq_symbols(seq: str) -> list[str]:
    return seq.strip().split("  ")


def apply_merge(seq: str, left: str, right: str) -> str:
    return seq.replace(f" {left}  {right} ", f" {left}{right} ")


def word_frequencies(
    docs: DataFrame, text_col: str = "text", top_v: int = TOP_V
) -> list[tuple[str, int]]:
    """Top-V (word, freq) pairs, deterministically ordered (freq desc, word asc).

    One shuffle (map-side combined to vocab size), one top-V collect.
    """
    wf = (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), _WS)).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .count()
        .orderBy(F.col("count").desc(), F.col("word").asc())
        .limit(top_v)
    )
    return [(r["word"], r["count"]) for r in wf.collect()]


def train_merges(
    word_freqs: list[tuple[str, int]], n_merges: int = N_MERGES
) -> list[tuple[int, str, str, int]]:
    """Greedy BPE merge rules: [(rank, left, right, pair_count_at_merge)].

    Stops early when no adjacent pair remains (every word fully merged).
    Pure Python over the dim-sized word-frequency table; operations are the
    exact string replacements the SQL oracle replays.
    """
    seqs = [(to_seq(w), f) for w, f in word_freqs]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for seq, freq in seqs:
            syms = seq_symbols(seq)
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + freq
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, cnt))
        seqs = [(apply_merge(seq, left, right), f) for seq, f in seqs]
    return merges


def merged_seq_col(col: Column, merges: list[tuple[int, str, str, int]]) -> Column:
    """Column expression: word -> symbol sequence after all merges.

    K chained JVM ``replace`` calls over the seq representation — pure
    codegen'd string ops, no Python in the executor path.
    """
    # ' ' || array_join(chars, '  ') || ' '. Java's Pattern.split('', -1)
    # (what F.split compiles to) emits a trailing empty element, so filter
    # empties rather than relying on split-edge behavior.
    chars = F.filter(F.split(col, ""), lambda c: c != F.lit(""))
    seq = F.concat(F.lit(" "), F.array_join(chars, "  "), F.lit(" "))
    for _, left, right, _ in merges:
        seq = F.replace(seq, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} "))
    return seq


def token_count_from_seq(seq: Column) -> Column:
    return F.size(F.split(F.trim(seq), "  "))
