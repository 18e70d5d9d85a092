"""BPE tokenizer queries: train merge rules on the corpus, tokenize with them.

The DuckDB oracles replay the ENTIRE training loop — K unrolled CTE stages of
(count adjacent pairs -> argmax with deterministic tie-break -> substring-
replace merge) over the same overlap-safe symbol representation the Spark
path and the Python trainer share (operators/bpe.py docstring) — so the
learned merge table and the per-document token counts are hash-compared
end-to-end, not just spot-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from rca_data_tools_spark.operators.bpe import (
    N_MERGES,
    TOP_V,
    merged_seq_col,
    token_count_from_seq,
    train_merges,
    word_frequencies,
)
from rca_data_tools_spark.queries._registry import query
from rca_data_tools_spark.sources.readers import load_table

_WORDS = r"list_filter(str_split_regex(trim(lower(text)), '\s+'), t -> t <> '')"


def _train_ctes(n_merges: int = N_MERGES, top_v: int = TOP_V) -> str:
    """CTE chain w0, s0, (p{k}, m{k}, s{k})*K replaying the merge loop."""
    parts = [
        f"""w0 AS MATERIALIZED (
  SELECT w AS word, COUNT(*) AS freq
  FROM (SELECT unnest({_WORDS}) AS w FROM documents) u
  GROUP BY w ORDER BY freq DESC, word ASC LIMIT {top_v}
),
s0 AS MATERIALIZED (SELECT word, freq,
       ' ' || array_to_string(str_split(word, ''), '  ') || ' ' AS seq FROM w0)"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f"""p{k} AS MATERIALIZED (
  SELECT pr.l AS l, pr.r AS r, SUM(freq)::BIGINT AS cnt FROM (
    SELECT freq,
           unnest([{{'l': sym[i], 'r': sym[i+1]}} FOR i IN range(1, len(sym))]) AS pr
    FROM (SELECT freq, str_split(trim(seq), '  ') AS sym FROM s{k - 1})
  ) GROUP BY 1, 2
),
t{k} AS MATERIALIZED (SELECT l, r, cnt
         FROM p{k} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
m{k} AS MATERIALIZED (
  -- Never empty: when training exhausts merges early (no adjacent pairs
  -- left), emit a chr(1) sentinel whose replace pattern cannot match any
  -- real symbol, so later apply stages are no-ops instead of being
  -- annihilated by a cross join with zero rows. Sentinels carry cnt = 0 and
  -- are filtered out of the merge-table result.
  SELECT {k} AS merge_rank,
         COALESCE((SELECT l FROM t{k}), chr(1)) AS l,
         COALESCE((SELECT r FROM t{k}), chr(1)) AS r,
         COALESCE((SELECT cnt FROM t{k}), 0) AS cnt
),
s{k} AS MATERIALIZED (SELECT word, freq,
         replace(seq, ' ' || m.l || '  ' || m.r || ' ',
                      ' ' || m.l || m.r || ' ') AS seq
         FROM s{k - 1}, m{k} m)"""
        )
    return ",\n".join(parts)


_MERGES_UNION = "\nUNION ALL\n".join(
    f"SELECT merge_rank, l, r, cnt FROM m{k}" for k in range(1, N_MERGES + 1)
)

_TRAIN_ORACLE = f"""
WITH {_train_ctes()}
SELECT merge_rank, l AS lhs, r AS rhs, l || r AS merged, cnt AS freq
FROM ({_MERGES_UNION})
WHERE cnt > 0
ORDER BY merge_rank
"""

_MERGES_SCHEMA = StructType(
    [
        StructField("merge_rank", IntegerType()),
        StructField("lhs", StringType()),
        StructField("rhs", StringType()),
        StructField("merged", StringType()),
        StructField("freq", LongType()),
    ]
)


@query("bpe_train_merges", oracle=_TRAIN_ORACLE)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the top-20 BPE merge rules from the documents corpus.

    Distributed word-frequency aggregation (one map-side-combined shuffle,
    top-V collect of the dim-sized vocabulary), then the driver-side merge
    loop over that table — the same decomposition HuggingFace tokenizers
    uses. The result IS the merge table (20 rows), so materializing it from
    the driver is returning the answer, not collecting data.
    """
    docs = load_table(spark, sf_dir, "documents")
    merges = train_merges(word_frequencies(docs))
    rows = [(rank, l, r, l + r, cnt) for rank, l, r, cnt in merges]
    return spark.createDataFrame(rows, _MERGES_SCHEMA)


_APPLY_STAGES = ",\n".join(
    f"a{k} AS MATERIALIZED (SELECT word, replace(seq, ' ' || m.l || '  ' || m.r || ' ', "
    f"' ' || m.l || m.r || ' ') AS seq FROM a{k - 1}, m{k} m)"
    for k in range(1, N_MERGES + 1)
)

_APPLY_ORACLE = f"""
WITH {_train_ctes()},
words AS MATERIALIZED (SELECT doc_id, unnest({_WORDS}) AS word FROM documents),
dim AS MATERIALIZED (SELECT DISTINCT word FROM words),
a0 AS MATERIALIZED (SELECT word,
       ' ' || array_to_string(str_split(word, ''), '  ') || ' ' AS seq FROM dim),
{_APPLY_STAGES},
tok AS MATERIALIZED (SELECT word, len(str_split(trim(seq), '  ')) AS n_tok FROM a{N_MERGES})
SELECT w.doc_id,
       COUNT(*) AS n_words,
       SUM(t.n_tok)::BIGINT AS n_bpe_tokens
FROM words w JOIN tok t USING (word)
GROUP BY w.doc_id
"""


@query("bpe_apply_tokens", oracle=_APPLY_ORACLE)
def bpe_apply_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize every document with the learned merges; per-doc token counts.

    Scale shape: merges are applied to the DISTINCT-word dimension (vocab-
    sized) as K chained JVM literal `replace` calls, then broadcast-joined
    back to the exploded corpus — documents are never shuffled by content;
    the corpus-sized cost is one scan + one broadcast join + the doc_id agg.
    """
    docs = load_table(spark, sf_dir, "documents")
    merges = train_merges(word_frequencies(docs))
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    dim = (
        words.select("word")
        .distinct()
        .withColumn(
            "n_tok", token_count_from_seq(merged_seq_col(F.col("word"), merges))
        )
    )
    return (
        words.join(F.broadcast(dim), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tok").alias("n_bpe_tokens"),
        )
    )
