"""Deduplication queries over the documents table (training-data pipeline
operators: exact dedup here; MinHash/SimHash/Jaccard variants in this module
as they land)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rca_data_tools_spark.functions.text import normalize
from rca_data_tools_spark.queries._registry import query
from rca_data_tools_spark.sources.readers import load_table


@query(
    "dedup_exact",
    oracle=r"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm_text
  FROM documents
), grouped AS (
  SELECT norm_text, MIN(doc_id) AS keep_id, COUNT(*) AS group_size
  FROM norm GROUP BY norm_text
)
SELECT keep_id AS doc_id, group_size FROM grouped
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by normalized text, keep the lowest doc_id.

    At scale this is one hash shuffle on a fingerprint; we group on
    md5(norm_text) semantics via the normalized string itself (the parquet
    scan prunes to the two needed columns).
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("norm_text", normalize("text"))
        .groupBy("norm_text")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("group_size"))
        .select("doc_id", "group_size")
    )
