"""Multimodal column queries: opaque binary payloads processed through
Arrow-batched mapInPandas. The pseudo-decode is deterministic arithmetic on
the bytes, so the DuckDB oracle can replay it in SQL — which proves the
Spark-side plumbing (binary column, batch iteration, schema) end-to-end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rca_data_tools_spark.operators.multimodal import attach_binary, extract_media_features
from rca_data_tools_spark.queries._registry import query
from rca_data_tools_spark.sources.readers import load_table


@query(
    "media_feature_extract",
    oracle="""
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n, ascii(substr(text, 1, 1)) AS first_byte
           FROM documents)
SELECT doc_id,
       CAST(n AS INT) AS byte_len,
       CAST(64 + (n % 512) AS INT) AS width,
       CAST(64 + (first_byte % 256) AS INT) AS height,
       CAST(1 + (n % 7) AS INT) AS n_frames,
       ((n * 31 + first_byte) % 25600) / 100.0 AS mean_luma
FROM b
""",
)
def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column -> mapInPandas feature extraction (decode stub).

    The Spark side genuinely carries bytes through an Arrow kernel
    (operators/multimodal.py); the oracle recomputes the same features from
    byte length / first byte arithmetically.
    """
    d = load_table(spark, sf_dir, "documents")
    media = attach_binary(d, "doc_id", "text")
    return extract_media_features(media)


@query(
    "media_batch_stats",
    oracle="""
SELECT CAST(FLOOR(octet_length(encode(text)) / 100) AS BIGINT) AS size_bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS total_bytes
FROM documents
GROUP BY 1
""",
)
def media_batch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload size distribution — the partition-sizing input for media
    pipelines (how many blobs per Arrow batch / task)."""
    d = load_table(spark, sf_dir, "documents")
    blob_len = F.length(F.encode(F.col("text"), "UTF-8")).cast("long")
    return (
        d.select(F.floor(blob_len / 100).cast("long").alias("size_bucket"), blob_len.alias("bl"))
        .groupBy("size_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("bl").alias("total_bytes"))
    )


@query(
    "media_frame_sample",
    oracle="""
WITH m AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents
), geo AS (
  SELECT doc_id, hx, n, 1 + (n % 7) AS n_frames, n // (1 + (n % 7)) AS fsize FROM m
), frames AS (
  SELECT doc_id, hx, fsize, CAST(f AS INT) AS frame_idx
  FROM geo, unnest(generate_series(0, n_frames - 1, 2)) AS t(f)
)
SELECT doc_id, frame_idx, CAST(fsize AS INT) AS frame_len,
       md5(substring(hx, frame_idx * fsize * 2 + 1, fsize * 2)) AS frame_md5
FROM frames
""",
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd-frame sampling over the opaque media blob with per-frame
    md5 fingerprints — the video-pipeline plumbing shape (kernel-side
    fan-out, no shuffle of frame bytes). The oracle replays the byte slicing
    on the hex-string view of the same blob."""
    from rca_data_tools_spark.operators.multimodal import attach_binary, sample_frames

    d = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_binary(d, "doc_id", "text"), stride=2)


@query(
    "media_audio_features",
    oracle="""
WITH d AS (
  SELECT doc_id, 50 + (octet_length(encode(text)) % 200) AS n FROM documents
), s AS (
  SELECT doc_id, n, i, ((doc_id * 7 + i * 13) % 256) - 128 AS c
  FROM d, unnest(generate_series(0, n - 1, 1)) AS t(i)
), z AS (
  SELECT doc_id, n, c,
         CASE WHEN (c < 0) <> (lag(c < 0) OVER (PARTITION BY doc_id ORDER BY i))
              THEN 1 ELSE 0 END AS flip
  FROM s
)
SELECT doc_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(MAX(n) AS BIGINT) AS n_samples,
       MAX(n) * 1000.0 / 8000 AS duration_ms,
       SUM(c) / CAST(MAX(n) AS DOUBLE) AS mean_amp,
       sqrt(SUM(c * c) / CAST(MAX(n) AS DOUBLE)) AS rms_amp,
       CAST(SUM(flip) AS BIGINT) AS zero_crossings
FROM z
GROUP BY doc_id
""",
)
def media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode in-plan: executor-side kernels WRITE genuine WAV
    blobs (stdlib ``wave`` encoder over a deterministic PCM sequence), a
    second mapInPandas kernel RIFF-parses them back and computes amplitude
    statistics on the decoded samples (operators/multimodal.py:decode_audio
    — audio needs no optional codec, unlike images). The oracle replays the
    sample arithmetic in SQL, so every decoded statistic is hash-checked:
    a header mis-parse, channel/width mix-up, or sample truncation breaks
    parity. Scale shape: blobs are born and die inside one Arrow task —
    nothing but the dim-sized feature rows ever shuffles."""
    from rca_data_tools_spark.operators.multimodal import (
        attach_audio,
        extract_audio_features,
    )

    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        (F.lit(50) + F.length(F.encode(F.col("text"), "UTF-8")) % 200).alias("n_samples"),
    )
    return extract_audio_features(attach_audio(docs, "doc_id", "n_samples"))


@query(
    "media_audio_frames",
    oracle="""
WITH d AS (
  SELECT doc_id, 50 + (octet_length(encode(text)) % 200) AS n FROM documents
  WHERE doc_id % 10 = 0
), s AS (
  SELECT doc_id, n, i, CAST(i // 20 AS INT) AS frame_idx,
         ((doc_id * 7 + i * 13) % 256) - 128 AS c
  FROM d, unnest(generate_series(0, n - 1, 1)) AS t(i)
), z AS (
  SELECT doc_id, frame_idx, i, c,
         CASE WHEN (c < 0) <> (lag(c < 0) OVER
              (PARTITION BY doc_id, frame_idx ORDER BY i))
              THEN 1 ELSE 0 END AS flip
  FROM s
)
SELECT doc_id, frame_idx,
       CAST(COUNT(*) AS INT) AS n_in_frame,
       sqrt(SUM(c * c) / CAST(COUNT(*) AS DOUBLE)) AS frame_rms,
       CAST(MAX(ABS(c)) AS INT) AS frame_peak,
       CAST(SUM(flip) AS BIGINT) AS n_flips
FROM z
GROUP BY doc_id, frame_idx
""",
)
def media_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame audio statistics (20-sample frames) over REAL WAV blobs:
    encode -> RIFF decode -> kernel-side frame fan-out, every decoded
    statistic replayed arithmetically by the oracle. One in ten documents
    (deterministic doc_id gate) keeps the frame fan-out bounded at sf0.01
    while exercising full-length and ragged tail frames."""
    from rca_data_tools_spark.operators.multimodal import (
        attach_audio,
        extract_audio_frames,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    docs = d.select(
        "doc_id",
        (F.lit(50) + F.length(F.encode(F.col("text"), "UTF-8")) % 200).alias("n_samples"),
    )
    return extract_audio_frames(attach_audio(docs, "doc_id", "n_samples"), frame_len=20)
