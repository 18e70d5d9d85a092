"""Sparse text retrieval: BM25 scoring and top-k ranking over the corpus.

Complements the dense ANN family (operators/similarity.py) with the classic
lexical scorer — the retrieval half a training-data pipeline needs for query
-based corpus mining and contamination auditing. Everything is exact-SQL
expressible, so the full pipeline (document stats -> idf -> per-term scores
-> decimal-summed doc scores -> top-k per query) is hash-checked against
DuckDB.

Scale shape: the query-term table is a literal broadcast dim; document
length and term frequencies come from ONE corpus scan (explode -> two
map-side-combined aggregations); the score join is tf ⋈ broadcast(idf) ⋈
dl co-shuffled on doc_id; the final top-k per query is a window over the
qid-partitioned (tiny) score set. Documents are shuffled once, by doc_id.

Determinism: per-term scores are IEEE expression trees evaluated identically
in both engines, rounded to 6 decimals and summed as DECIMAL (numeric.dsum),
and ranking orders by the ROUNDED score with doc_id tie-breaks — so rank
boundaries are exact, never at the mercy of float summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rca_data_tools_spark.functions.numeric import dsum, dsum_sql
from rca_data_tools_spark.queries._registry import query
from rca_data_tools_spark.sources.readers import load_table

K1 = 1.2
B = 0.75
TOP_K = 5

# (query_id, term) literal dim — vocabulary terms from the synthetic corpus.
BM25_QUERIES: list[tuple[str, str]] = [
    ("q_storage", "table"),
    ("q_storage", "scan"),
    ("q_window", "window"),
    ("q_window", "agg"),
    ("q_join", "hash"),
    ("q_join", "join"),
    ("q_join", "merge"),
]

_WORDS = r"list_filter(str_split_regex(trim(lower(text)), '\s+'), t -> t <> '')"

_QUERY_VALUES = ", ".join(f"('{q}', '{t}')" for q, t in BM25_QUERIES)

_BM25_ORACLE = f"""
WITH words AS MATERIALIZED (
  SELECT doc_id, unnest({_WORDS}) AS term FROM documents
),
qterms(qid, term) AS (VALUES {_QUERY_VALUES}),
dl AS (SELECT doc_id, COUNT(*)::BIGINT AS dl FROM words GROUP BY doc_id),
stats AS (SELECT COUNT(*)::BIGINT AS n_docs, SUM(dl)::BIGINT AS sum_dl FROM dl),
tf AS (
  SELECT w.doc_id, q.qid, q.term, COUNT(*)::BIGINT AS tf
  FROM words w JOIN qterms q USING (term)
  GROUP BY 1, 2, 3
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id)::BIGINT AS df FROM words
  WHERE term IN (SELECT term FROM qterms)
  GROUP BY term
),
term_scores AS (
  SELECT t.qid, t.doc_id,
         ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
         * (t.tf * ({K1} + 1.0))
         / (t.tf + {K1} * (1.0 - {B} + {B} * l.dl / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))
         AS sc
  FROM tf t
  JOIN df d USING (term)
  JOIN dl l USING (doc_id)
  CROSS JOIN stats s
),
doc_scores AS (
  SELECT qid, doc_id, {dsum_sql("sc")} AS score
  FROM term_scores GROUP BY qid, doc_id
),
ranked AS (
  SELECT qid, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS rk
  FROM doc_scores
)
SELECT qid, doc_id, score, rk FROM ranked WHERE rk <= {TOP_K}
"""


@query("text_bm25_topk", oracle=_BM25_ORACLE)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 documents per query over the documents corpus."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    qterms = F.broadcast(
        spark.createDataFrame(BM25_QUERIES, ["qid", "term"])
    )
    dl = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        words.join(qterms, "term")
        .groupBy("doc_id", "qid", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = (
        words.join(qterms.select("term").distinct(), "term")
        .select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    term_scores = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "qid",
            "doc_id",
            (
                F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * F.lit(K1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(K1)
                    * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / avgdl)
                )
            ).alias("sc"),
        )
    )
    doc_scores = term_scores.groupBy("qid", "doc_id").agg(dsum("sc").alias("score"))
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        doc_scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("qid", "doc_id", "score", "rk")
    )


RRF_K = 60          # the standard reciprocal-rank-fusion constant
RRF_POOL = 20       # per-ranker candidate pool fused
RRF_TOP_K = 5

_RRF_ORACLE = f"""
WITH words AS MATERIALIZED (
  SELECT doc_id, unnest({_WORDS}) AS term FROM documents
),
qterms(qid, term) AS (VALUES {_QUERY_VALUES}),
dl AS (SELECT doc_id, COUNT(*)::BIGINT AS dl FROM words GROUP BY doc_id),
stats AS (SELECT COUNT(*)::BIGINT AS n_docs, SUM(dl)::BIGINT AS sum_dl FROM dl),
tf AS (
  SELECT w.doc_id, q.qid, q.term, COUNT(*)::BIGINT AS tf
  FROM words w JOIN qterms q USING (term)
  GROUP BY 1, 2, 3
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id)::BIGINT AS df FROM words
  WHERE term IN (SELECT term FROM qterms)
  GROUP BY term
),
term_scores AS (
  SELECT t.qid, t.doc_id,
         ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
         * (t.tf * ({K1} + 1.0))
         / (t.tf + {K1} * (1.0 - {B} + {B} * l.dl / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))
         AS sc
  FROM tf t
  JOIN df d USING (term)
  JOIN dl l USING (doc_id)
  CROSS JOIN stats s
),
doc_scores AS (
  SELECT qid, doc_id, {dsum_sql("sc")} AS score
  FROM term_scores GROUP BY qid, doc_id
),
bm AS (
  SELECT qid, doc_id,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rk
  FROM doc_scores
),
dens_scores AS (
  SELECT t.qid, t.doc_id,
         ROUND(CAST(SUM(t.tf) AS DOUBLE) / MAX(l.dl), 6) AS dscore
  FROM tf t JOIN dl l USING (doc_id) GROUP BY 1, 2
),
dn AS (
  SELECT qid, doc_id,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dscore DESC, doc_id) AS rk
  FROM dens_scores
),
fused AS (
  SELECT qid, doc_id,
         ROUND(COALESCE(1.0 / ({RRF_K} + b.rk), 0.0)
               + COALESCE(1.0 / ({RRF_K} + d.rk), 0.0), 6) AS rrf_score,
         b.rk AS bm25_rank, d.rk AS density_rank
  FROM (SELECT * FROM bm WHERE rk <= {RRF_POOL}) b
  FULL JOIN (SELECT * FROM dn WHERE rk <= {RRF_POOL}) d USING (qid, doc_id)
)
SELECT qid, doc_id, rrf_score, bm25_rank, density_rank, fused_rank FROM (
  SELECT qid, doc_id, rrf_score, bm25_rank, density_rank,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf_score DESC, doc_id) AS fused_rank
  FROM fused
) WHERE fused_rank <= {RRF_TOP_K}
"""


@query("retrieval_rrf_fusion", oracle=_RRF_ORACLE)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two retrieval
    rankings per query — BM25 and query-term density (tf mass / doc
    length) — the standard hybrid-retrieval combiner: rrf(d) = sum over
    rankers of 1/(60 + rank_r(d)) on each ranker's top-20 pool, fused
    top-5 returned with the contributing ranks (NULL when a ranker didn't
    surface the doc). RRF is ranker-agnostic, which is why it's THE fusion
    used between lexical and dense legs in production RAG stacks; both
    legs here are exact-SQL so the whole fusion is hash-checked.

    Scale shape: both rankers share ONE corpus scan (words CTE -> tf/dl
    aggregates, map-side combined); ranking windows partition by qid (a
    handful of queries, each pool <= corpus); the fusion join keys on
    (qid, doc_id) over two <= 20-row-per-qid pools — trivially
    broadcastable, and the full-outer preserves single-ranker hits."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    qterms = F.broadcast(spark.createDataFrame(BM25_QUERIES, ["qid", "term"]))
    dl = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl"))
    tf = (
        words.join(qterms, "term")
        .groupBy("doc_id", "qid", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = (
        words.join(qterms.select("term").distinct(), "term")
        .select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    term_scores = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "qid",
            "doc_id",
            (
                F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * F.lit(K1 + 1.0))
                / (F.col("tf") + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / avgdl))
            ).alias("sc"),
        )
    )
    doc_scores = term_scores.groupBy("qid", "doc_id").agg(dsum("sc").alias("score"))
    w_bm = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    bm = (
        doc_scores.withColumn("rk", F.row_number().over(w_bm))
        .filter(F.col("rk") <= RRF_POOL)
        .select("qid", "doc_id", F.col("rk").alias("bm25_rank"))
    )
    dens = (
        tf.join(dl, "doc_id")
        .groupBy("qid", "doc_id")
        .agg(
            F.round(
                F.sum("tf").cast("double") / F.max("dl"), 6
            ).alias("dscore")
        )
    )
    w_dn = Window.partitionBy("qid").orderBy(F.col("dscore").desc(), F.col("doc_id").asc())
    dn = (
        dens.withColumn("rk", F.row_number().over(w_dn))
        .filter(F.col("rk") <= RRF_POOL)
        .select("qid", "doc_id", F.col("rk").alias("density_rank"))
    )
    fused = bm.join(dn, ["qid", "doc_id"], "full").select(
        "qid",
        "doc_id",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("bm25_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("density_rank")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
        "bm25_rank",
        "density_rank",
    )
    w_f = Window.partitionBy("qid").orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("fused_rank", F.row_number().over(w_f))
        .filter(F.col("fused_rank") <= RRF_TOP_K)
        .select("qid", "doc_id", "rrf_score", "bm25_rank", "density_rank", "fused_rank")
    )
