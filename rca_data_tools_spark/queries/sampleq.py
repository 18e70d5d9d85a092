"""Corpus-sampling and sequence-packing queries over the documents table.

The training-data-pipeline operators the reference never needed (it plots
every point) but a 100 TB corpus build does: deterministic uniform and
stratified sampling, per-domain caps, fixed-budget sequence packing. All
hash-deterministic — the same rows survive in Spark and DuckDB, so every
query here is oracle-checked exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rca_data_tools_spark.functions.text import token_count
from rca_data_tools_spark.operators.sampling import (
    group_cap,
    hash_sample,
    hash_uniform,
    pack_greedy,
    rate_threshold,
    stratified_sample,
)
from rca_data_tools_spark.queries._registry import query
from rca_data_tools_spark.sources.readers import load_table

# DuckDB twin of operators.sampling.hash_uniform, parameterized by salt so
# oracles can never silently diverge from the Spark side's salt argument.
def _u_sql(salt: str, key: str = "doc_id") -> str:
    return f"CAST(('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8)) AS BIGINT)"


_U_SQL = _u_sql("s")
_TOK_SQL = r"len(list_filter(str_split_regex(trim(text), '\s+'), t -> t <> ''))"

_STRATA_RATES = {"en": 0.25, "zh": 0.5}
_DEFAULT_RATE = 0.9


@query(
    "sample_hash_fraction",
    oracle=f"""
SELECT doc_id, lang, source
FROM documents
WHERE {_U_SQL} < {rate_threshold(0.1)}
""",
)
def sample_hash_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% uniform sample: md5-derived integer < rate * 2^32.

    Pure projection+filter — no shuffle, no RNG state; at 100 TB this is a
    single scan whose predicate rides inside whole-stage codegen.
    """
    d = load_table(spark, sf_dir, "documents")
    return hash_sample(d, "doc_id", 0.1).select("doc_id", "lang", "source")


@query(
    "sample_stratified",
    oracle=f"""
SELECT doc_id, lang
FROM documents
WHERE {_U_SQL} < CASE
  WHEN lang = 'zh' THEN {rate_threshold(0.5)}
  WHEN lang = 'en' THEN {rate_threshold(0.25)}
  ELSE {rate_threshold(0.9)} END
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language rebalancing: downsample English to 25%, Chinese to 50%, keep
    90% of everything else. The rate map compiles to a literal CASE — zero
    joins, zero shuffles."""
    d = load_table(spark, sf_dir, "documents")
    return stratified_sample(d, "doc_id", "lang", _STRATA_RATES, _DEFAULT_RATE).select(
        "doc_id", "lang"
    )


@query(
    "sample_uniform_topk",
    oracle=f"""
SELECT doc_id, lang
FROM documents
ORDER BY {_U_SQL}, doc_id
LIMIT 100
""",
)
def sample_uniform_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size uniform sample without replacement: the 100 smallest hash
    values. Spark plans this as TakeOrderedAndProject — per-partition top-k
    then a driver merge of k-row heads, never a full sort."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("u", hash_uniform(F.col("doc_id"), "s"))
        .orderBy("u", "doc_id")
        .limit(100)
        .select("doc_id", "lang")
    )


@query(
    "sample_domain_cap",
    oracle="""
SELECT doc_id, source, rank FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS rank
  FROM documents)
WHERE rank <= 5
""",
)
def sample_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution cap: keep the 5 longest documents per source
    (deterministic doc_id tie-break). One shuffle on source."""
    d = load_table(spark, sf_dir, "documents")
    return group_cap(d, "source", 5, "n_chars", descending=True, tiebreak_col="doc_id").select(
        "doc_id", "source", "rank"
    )


@query(
    "pack_sequences",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, {_TOK_SQL} AS n_tok FROM documents)
SELECT doc_id, lang, n_tok,
       CAST(floor((SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id) - n_tok) / 128.0) AS BIGINT) AS bin_id
FROM t
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into 128-token training bins per language shard: bin =
    floor(running-offset / target). One shuffle (shard partition + in-shard
    sort); shards pack independently, so no global order is ever needed."""
    d = load_table(spark, sf_dir, "documents").withColumn("n_tok", token_count("text"))
    return pack_greedy(d, "lang", "doc_id", "n_tok", target=128).select(
        "doc_id", "lang", "n_tok", "bin_id"
    )


_NORM_TOKS_SQL = (
    r"list_filter(str_split_regex(trim(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')),"
    r" '\s+'), t -> t <> '')"
)


@query(
    "sample_importance",
    oracle=f"""
WITH f AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(t), 1, 4)) AS BIGINT) % 128 AS feat
  FROM (SELECT doc_id, lang, UNNEST({_NORM_TOKS_SQL}) AS t FROM documents)
), counts AS (
  SELECT feat, COUNT(*) AS src_n,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tgt_n
  FROM f GROUP BY 1
), w AS (
  SELECT feat,
         ROUND(ln((tgt_n + 1.0) / (SUM(tgt_n) OVER () + 128.0))
             - ln((src_n + 1.0) / (SUM(src_n) OVER () + 128.0)), 6) AS logr
  FROM counts
), scored AS (
  SELECT f.doc_id, COUNT(*) AS n_feats,
         CAST(SUM(CAST(ROUND(w.logr, 6) AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS imp
  FROM f JOIN w ON f.feat = w.feat GROUP BY 1
)
SELECT doc_id, n_feats, ROUND(imp, 6) AS importance
FROM scored
ORDER BY importance DESC, doc_id
LIMIT 100
""",
)
def sample_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling toward a target domain (here: English
    documents): hashed-token unigram models of target vs source, per-doc mean
    log-likelihood ratio, top-100 by importance. One exploded-token pass, one
    dim-sized (128-bucket) count shuffle, broadcast weights back — the only
    data-sized shuffle is the per-doc aggregation (see
    operators/sampling.importance_weights)."""
    from rca_data_tools_spark.operators.sampling import importance_weights

    d = load_table(spark, sf_dir, "documents")
    scored = importance_weights(
        d, "doc_id", "text", target_pred=(F.col("lang") == "en"), n_buckets=128
    )
    return scored.orderBy(F.col("importance").desc(), "doc_id").limit(100)


@query(
    "sample_split_assign",
    oracle=f"""
SELECT doc_id, lang,
       CASE WHEN {_U_SQL} < {rate_threshold(0.8)} THEN 'train'
            WHEN {_U_SQL} < {rate_threshold(0.9)} THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
)
def sample_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10) from the salted
    md5 integer — every engine and every rerun lands each doc in the same
    split, no RNG state, no shuffle; downstream writers partition by the
    split column so each split lands in its own directory tree."""
    d = load_table(spark, sf_dir, "documents")
    u = hash_uniform(F.col("doc_id"), "s")
    split = (
        F.when(u < rate_threshold(0.8), F.lit("train"))
        .when(u < rate_threshold(0.9), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return d.select("doc_id", "lang", split.alias("split"))


# A-ES weighted reservoir key (Efraimidis-Spirakis 2006): each row draws
# u ~ U(0,1) from the salted md5 integer and competes with key ln(u)/w —
# the k largest keys are a weighted-without-replacement sample. ln(u)/w is
# the log of the classic u^(1/w) key, monotone in it, and numerically safer.
# Rounded to 9 decimals on BOTH sides so the rank boundary is exact; doc_id
# breaks residual ties deterministically.
_UW_SQL = _u_sql("w")


@query(
    "sample_weighted_topk",
    oracle=f"""
SELECT doc_id, n_chars,
       ROUND(ln(({_UW_SQL} + 0.5) / 4294967296.0) / n_chars, 9) AS sel_key
FROM documents
ORDER BY sel_key DESC, doc_id ASC
LIMIT 25
""",
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement: top-25 docs by A-ES key with
    weight = n_chars (longer docs proportionally likelier).

    Scale shape: the key is a pure codegen'd projection (md5 + ln), and the
    top-k is TakeOrderedAndProject — per-partition heaps, no shuffle, no
    single-partition window, no RNG state; identical winners at any
    parallelism or engine.
    """
    d = load_table(spark, sf_dir, "documents")
    u = (hash_uniform(F.col("doc_id"), "w") + F.lit(0.5)) / F.lit(4294967296.0)
    key = F.round(F.log(u) / F.col("n_chars"), 9)
    return (
        d.select("doc_id", "n_chars", key.alias("sel_key"))
        .orderBy(F.col("sel_key").desc(), F.col("doc_id").asc())
        .limit(25)
    )


@query(
    "sample_shuffle_order",
    oracle=f"""
WITH u AS (
  SELECT doc_id, lang, {_u_sql("sh")} AS uv
  FROM documents
)
SELECT doc_id, lang,
       uv % 16 AS shard,
       ROW_NUMBER() OVER (PARTITION BY uv % 16 ORDER BY uv, doc_id) AS pos
FROM u
""",
)
def sample_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle for training order: every doc gets
    a (shard, pos) address from its salted md5 integer — rerun-stable, engine
    -independent, no RNG state.

    Scale shape: shard count is the parallelism knob (16 here; thousands at
    100 TB) — one hash shuffle on shard, per-shard row_number windows run in
    parallel, and a training loader streams shards independently. Never a
    single-partition global sort.
    """
    d = load_table(spark, sf_dir, "documents")
    u = hash_uniform(F.col("doc_id"), "sh")
    w = Window.partitionBy(u % 16).orderBy(u, F.col("doc_id"))
    return d.select(
        "doc_id",
        "lang",
        (u % 16).alias("shard"),
        F.row_number().over(w).alias("pos"),
    )


# DoReMi-style domain mixture reweighting: per-domain resampling factor that
# moves the corpus from its observed source mix to a target mix.
_TARGET_MIX = {"web": 0.40, "books": 0.30, "code": 0.20, "wiki": 0.10}


@query(
    "sample_domain_mix",
    oracle=f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
total AS (SELECT COUNT(*) AS n_total FROM documents)
SELECT c.source, c.n_docs,
       ROUND(CAST(c.n_docs AS DOUBLE) / t.n_total, 6) AS actual_share,
       ROUND(CASE c.source
         {' '.join(f"WHEN '{s}' THEN {w}" for s, w in _TARGET_MIX.items())}
         ELSE 0.0 END / (CAST(c.n_docs AS DOUBLE) / t.n_total), 6) AS resample_weight
FROM counts c CROSS JOIN total t
""",
)
def sample_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain resampling weights toward a target corpus mixture
    (the DoReMi/Pile recipe: weight = target_share / actual_share; a
    downstream keep-rate or repetition factor applies it).

    Scale shape: one map-side-combined count per source (dim-sized), the
    1-row total crossed in as a broadcast scalar (the whitelisted 1-row
    BNLJ pattern, same as q11/q22), and the weight arithmetic is a literal
    CASE. One fact scan, one tiny shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    total = d.agg(F.count(F.lit(1)).alias("n_total"))
    target = F.create_map(
        *[x for s, w in _TARGET_MIX.items() for x in (F.lit(s), F.lit(w))]
    )
    joined = counts.crossJoin(F.broadcast(total))
    share = F.col("n_docs").cast("double") / F.col("n_total")
    weight = F.coalesce(target[F.col("source")], F.lit(0.0)) / share
    return joined.select(
        "source",
        "n_docs",
        F.round(share, 6).alias("actual_share"),
        F.round(weight, 6).alias("resample_weight"),
    )


@query(
    "sample_temperature_mix",
    oracle="""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
total AS (SELECT COUNT(*) AS n_total FROM documents),
scored AS (
  SELECT c.source, c.n_docs,
         CAST(c.n_docs AS DOUBLE) / t.n_total AS share,
         CAST(ROUND(POWER(CAST(c.n_docs AS DOUBLE) / t.n_total, 0.5), 9)
              AS DECIMAL(20,9)) AS sa
  FROM counts c CROSS JOIN total t
),
z AS (SELECT CAST(SUM(sa) AS DOUBLE) AS z FROM scored)
SELECT s.source, s.n_docs,
       ROUND(s.share, 6) AS share,
       ROUND(CAST(s.sa AS DOUBLE) / z.z, 6) AS temp_share,
       ROUND(CAST(s.sa AS DOUBLE) / z.z / s.share, 6) AS resample_weight
FROM scored s CROSS JOIN z
""",
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture (the multilingual-sampling recipe,
    alpha = 0.5: p_i ∝ share_i^alpha): flattens the source distribution so
    rare domains up-sample without fixing an explicit target mix — the
    complement of sample_domain_mix's DoReMi weights. The share^alpha terms
    are rounded to decimal BEFORE the normalizing sum so the denominator is
    order-insensitive and engine-exact.

    Scale shape: dim-sized counts, one broadcast 1-row total and one
    broadcast 1-row normalizer — the fact table is scanned once."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    total = d.agg(F.count(F.lit(1)).alias("n_total"))
    share = F.col("n_docs").cast("double") / F.col("n_total")
    scored = counts.crossJoin(F.broadcast(total)).select(
        "source", "n_docs",
        share.alias("share"),
        F.round(F.pow(share, 0.5), 9).cast("decimal(20,9)").alias("sa"),
    )
    z = scored.agg(F.sum("sa").cast("double").alias("z"))
    return scored.crossJoin(F.broadcast(z)).select(
        "source", "n_docs",
        F.round("share", 6).alias("share"),
        F.round(F.col("sa").cast("double") / F.col("z"), 6).alias("temp_share"),
        F.round(F.col("sa").cast("double") / F.col("z") / F.col("share"), 6).alias("resample_weight"),
    )


_DOMAIN_TOKEN_BUDGET = 600


@query(
    "sample_token_budget",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, {_TOK_SQL} AS n_tokens, {_u_sql('budget')} AS u
  FROM documents
), cum AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM toks
)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM cum WHERE cum_tokens <= {_DOMAIN_TOKEN_BUDGET}
""",
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed per-domain TOKEN budget selection — the mixture-building step
    where each domain contributes at most B tokens, not at most N docs
    (domain docs differ wildly in length, so doc caps misallocate the
    actual training budget): walk each domain in deterministic hash order
    and keep documents while the running token total stays within budget.
    A doc that would cross the boundary is dropped, as are all later ones
    (the greedy prefix rule — deterministic, engine-independent).

    Scale shape: one shuffle on source for the per-domain running-sum
    window (partitioned by domain, never global), token counting is a
    per-row expression, and the hash order makes the selection a stable
    uniform subsample within each domain. At 100 TB this is exactly one
    fact shuffle; skewed domains are bounded by the budget itself."""
    d = load_table(spark, sf_dir, "documents")
    u = hash_uniform(F.col("doc_id"), "budget")
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("__u"), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    toks = d.select(
        "doc_id", "source", token_count("text").alias("n_tokens"), u.alias("__u")
    )
    out = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return out.filter(F.col("cum_tokens") <= _DOMAIN_TOKEN_BUDGET).select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
    )
