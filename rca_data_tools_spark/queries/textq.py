"""Text-analysis queries over the documents table: quality scoring, token
counting, language ID, fingerprinting. All pure Column expressions — the scan
is the only cost, so these run at parquet speed on any corpus size."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rca_data_tools_spark.functions.text import (
    let_,
    BPE_TOKEN_RE,
    LANG_MARKERS,
    bpe_token_count,
    lang_id,
    lang_scores,
    md5_fingerprint,
    mean_token_length,
    normalize,
    punct_ratio,
    rolling_hash,
    stopword_ratio,
    token_count,
    tokens,
    word_ngrams,
)
from rca_data_tools_spark.functions.numeric import dsum
from rca_data_tools_spark.queries._registry import query
from rca_data_tools_spark.sources.readers import load_table

_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_TOKS_SQL = r"list_filter(str_split_regex(trim(text), '\s+'), t -> t <> '')"
_NTOKS_SQL = rf"list_filter(str_split_regex(trim({_NORM_SQL}), '\s+'), t -> t <> '')"


def _in_list(items: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in items)


@query(
    "text_token_stats",
    oracle=rf"""
SELECT doc_id,
       len({_TOKS_SQL}) AS n_tokens,
       len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS n_bpe_tokens,
       CASE WHEN length(text) > 0
            THEN (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) / length(text)
            ELSE 0.0 END AS punct_ratio,
       CASE WHEN len({_TOKS_SQL}) > 0
            THEN list_sum([length(t) FOR t IN {_TOKS_SQL}]) / len({_TOKS_SQL})
            ELSE 0.0 END AS mean_tok_len
FROM documents
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) and basic shape metrics."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_token_count("text").alias("n_bpe_tokens"),
        punct_ratio("text").alias("punct_ratio"),
        mean_token_length("text").alias("mean_tok_len"),
    )


@query(
    "text_quality_scores",
    oracle=rf"""
WITH m AS (
  SELECT doc_id, lang,
    LEAST(1.0, length(text) / 500.0) AS len_score,
    LEAST(1.0, CASE WHEN length(text) > 0
        THEN (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) / length(text)
        ELSE 0.0 END * 4.0) AS punct_penalty,
    LEAST(1.0, CASE WHEN len({_NTOKS_SQL}) > 0
        THEN len(list_filter({_NTOKS_SQL}, t -> t IN ({_in_list(LANG_MARKERS['en'])}))) / len({_NTOKS_SQL})
        ELSE 0.0 END * 4.0) AS stop_score
  FROM documents
)
SELECT doc_id, lang,
       ROUND(len_score * 0.4 + (1.0 - punct_penalty) * 0.3 + stop_score * 0.3, 6) AS quality
FROM m
""",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality heuristic (length / punctuation / stopword signal)."""
    from rca_data_tools_spark.functions.text import quality_score

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", quality_score("text").alias("quality"))


def _langid_case_sql() -> str:
    score = {
        lang: f"len(list_filter({_NTOKS_SQL}, t -> t IN ({_in_list(markers)})))"
        for lang, markers in LANG_MARKERS.items()
    }
    best = "GREATEST(" + ", ".join(score.values()) + ")"
    whens = " ".join(f"WHEN {score[lang]} = {best} THEN '{lang}'" for lang in LANG_MARKERS)
    return f"CASE WHEN {best} = 0 THEN 'und' {whens} ELSE 'und' END"


@query(
    "text_lang_id",
    oracle=f"""
SELECT lang, {_langid_case_sql()} AS lang_pred, COUNT(*) AS n
FROM documents
GROUP BY 1, 2
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID vs the labeled lang column (confusion
    counts). Marker sets cover en/fr/es/de; zh (no markers) -> 'und'."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", lang_id("text").alias("lang_pred")).agg(F.count(F.lit(1)).alias("n"))


@query(
    "text_fingerprints",
    oracle=f"""
SELECT doc_id,
       md5({_NORM_SQL}) AS md5_fp,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT), [CAST(ascii(c) AS BIGINT) FOR c IN str_split({_NORM_SQL}, '')]),
         (a, b) -> (a * 31 + b) % 1000000007
       ) AS rolling_fp
FROM documents
""",
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: md5 of normalized text + Rabin-Karp-style
    rolling hash (reference role: content identity for dedup/caching)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        md5_fingerprint("text").alias("md5_fp"),
        rolling_hash("text").alias("rolling_fp"),
    )


@query(
    "p9_regex_filter",
    oracle="""
SELECT doc_id, source, n_chars
FROM documents
WHERE regexp_matches(text, 'spark.*hash|merge.*sort') AND source LIKE 'src1%'
""",
)
def p9_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex/substring row filter (reference: HITL notes filtering,
    qaqc/notes.py:150-166)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(
        F.col("text").rlike("spark.*hash|merge.*sort") & F.col("source").startswith("src1")
    ).select("doc_id", "source", "n_chars")


@query(
    "text_tfidf_topk",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_NTOKS_SQL}) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks WHERE doc_id < 50 GROUP BY 1, 2
), dfreq AS (
  SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1
), total AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok, tf.tf,
         ROUND(tf.tf * LN(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
  FROM tf JOIN dfreq USING (tok), total
)
SELECT doc_id, tok, tf, tfidf, rank FROM (
  SELECT doc_id, tok, tf, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rank
  FROM scored
) WHERE rank <= 10
""",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 TF-IDF terms per document (corpus keyword extraction — the
    classic text-pipeline scoring pass).

    Scale shape: term frequencies for the queried docs are tiny and
    broadcast; document frequency is a map-side-combinable groupBy over the
    (doc, token) distinct pairs; the corpus-size scalar joins as a broadcast
    literal row, never a driver-side collect."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens(normalize("text"))).alias("tok"))
    tf = (
        toks.filter(F.col("doc_id") < 50)
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # Document frequency: dedup tokens INSIDE each row (array_distinct, no
    # shuffle) so one map-side-combined groupBy replaces the
    # distinct-then-group double shuffle.
    dfreq = (
        d.select(F.explode(F.array_distinct(tokens(normalize("text")))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    total = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        dfreq.join(F.broadcast(tf), "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id", "tok", "tf",
            F.round(F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("doc_id", "tok", "tf", "tfidf", "rank")
    )


@query(
    "corpus_curation",
    oracle=rf"""
WITH m AS (
  SELECT doc_id, lang, text,
    LEAST(1.0, length(text) / 500.0) AS len_score,
    LEAST(1.0, CASE WHEN length(text) > 0
        THEN (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) / length(text)
        ELSE 0.0 END * 4.0) AS punct_penalty,
    LEAST(1.0, CASE WHEN len({_NTOKS_SQL}) > 0
        THEN len(list_filter({_NTOKS_SQL}, t -> t IN ({_in_list(LANG_MARKERS['en'])}))) / len({_NTOKS_SQL})
        ELSE 0.0 END * 4.0) AS stop_score
  FROM documents
), scored AS (
  SELECT doc_id, lang,
         ROUND(len_score * 0.4 + (1.0 - punct_penalty) * 0.3 + stop_score * 0.3, 6) AS quality,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm_text
  FROM m
), kept AS (
  SELECT norm_text, MIN(doc_id) AS keep_id
  FROM scored WHERE quality >= 0.5 AND lang = 'en'
  GROUP BY norm_text
)
SELECT s.doc_id, s.quality
FROM scored s JOIN kept k ON s.doc_id = k.keep_id
""",
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation: quality gate (>= 0.5) + language gate
    (en) + exact-dedup keep (lowest doc_id per normalized text) in one
    declarative plan — the composition a training-data pipeline actually
    runs, here as a single Catalyst plan so the quality/lang filters prune
    BEFORE the dedup shuffle (only surviving fingerprints shuffle)."""
    from rca_data_tools_spark.functions.text import quality_score

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "lang",
        quality_score("text").alias("quality"),
        F.md5(normalize("text")).alias("fp"),
    )
    gated = scored.filter((F.col("quality") >= 0.5) & (F.col("lang") == "en"))
    keep = gated.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    return (
        gated.join(keep, gated.doc_id == keep.keep_id, "left_semi")
        .select("doc_id", "quality")
    )


# PII synthesis: the synthetic corpus carries no organic PII, so the queries
# plant deterministic emails/phones keyed on doc_id (the same synthesize-
# from-keys pattern as the nitrate spectra) — the redaction semantics under
# test are real; only the data is manufactured.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"


@query(
    "text_pii_redaction",
    oracle=rf"""
WITH raw AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' contact: user' || CAST(doc_id AS VARCHAR) || '@example.com'
              WHEN doc_id % 3 = 1
              THEN text || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE text END AS raw_text
  FROM documents
), red AS (
  SELECT doc_id, raw_text,
         len(regexp_extract_all(raw_text, '{_EMAIL_RE}')) AS n_emails,
         len(regexp_extract_all(raw_text, '{_PHONE_RE}')) AS n_phones,
         regexp_replace(regexp_replace(raw_text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                        '{_PHONE_RE}', '[PHONE]', 'g') AS redacted
  FROM raw
)
SELECT doc_id, n_emails, n_phones,
       length(redacted) AS redacted_len, md5(redacted) AS redacted_fp
FROM red
""",
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing, the curation step every training pipeline runs before
    release: count + mask emails and phone numbers with anchored regexes.
    Pure Column expressions (JVM regex, whole-stage codegen) — scan-speed at
    any corpus size; the redacted text is emitted as an md5 fingerprint so
    the oracle compares content without shipping megabyte strings."""
    d = load_table(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    raw = (
        F.when(
            doc_id % 3 == 0,
            F.concat(F.col("text"), F.lit(" contact: user"), doc_id.cast("string"), F.lit("@example.com")),
        )
        .when(
            doc_id % 3 == 1,
            F.concat(F.col("text"), F.lit(" call +1-555-"), F.lpad((doc_id % 10000).cast("string"), 4, "0")),
        )
        .otherwise(F.col("text"))
    )
    r = d.select("doc_id", raw.alias("raw_text"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("raw_text"), _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    return r.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("raw_text"), F.lit(_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("raw_text"), F.lit(_PHONE_RE), F.lit(0))).alias("n_phones"),
        F.length(redacted).alias("redacted_len"),
        F.md5(redacted).alias("redacted_fp"),
    )


_URL_DOMAINS = ("docs.example", "blog.example", "spam.example", "ads.test", "wiki.example")
_URL_DENYLIST = ("spam.example", "ads.test")


@query(
    "text_url_filter",
    oracle=rf"""
WITH tagged AS (
  SELECT doc_id, source,
         'https://' || ['{_URL_DOMAINS[0]}','{_URL_DOMAINS[1]}','{_URL_DOMAINS[2]}','{_URL_DOMAINS[3]}','{_URL_DOMAINS[4]}'][CAST(doc_id % 5 AS INTEGER) + 1]
           || '/p/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
), dom AS (
  SELECT doc_id, source, url,
         regexp_extract(url, 'https?://([^/]+)/', 1) AS domain
  FROM tagged
)
SELECT doc_id, source, domain
FROM dom
WHERE domain NOT IN ({_in_list(_URL_DENYLIST)})
""",
)
def text_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/domain filtering, the other standard curation gate: extract the
    domain from each document's source URL and drop denylisted domains via a
    broadcast anti-join (a denylist is a config-sized dim; NOT-IN per row
    would not scale and cannot handle a million-domain list — the anti-join
    shape does)."""
    d = load_table(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    url = F.concat(
        F.lit("https://"),
        F.element_at(F.array(*[F.lit(x) for x in _URL_DOMAINS]), (doc_id % 5).cast("int") + 1),
        F.lit("/p/"),
        doc_id.cast("string"),
    )
    tagged = d.select("doc_id", "source", url.alias("url")).withColumn(
        "domain", F.regexp_extract("url", r"https?://([^/]+)/", 1)
    )
    deny = tagged.sparkSession.createDataFrame([(x,) for x in _URL_DENYLIST], "domain string")
    return tagged.join(F.broadcast(deny), "domain", "left_anti").select(
        "doc_id", "source", "domain"
    )


@query(
    "text_repetition",
    oracle=rf"""
WITH t AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
), s AS (
  SELECT doc_id, toks, len(toks) AS n,
         len(list_distinct(toks)) AS n_distinct,
         CASE WHEN len(toks) >= 2
              THEN [toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))]
              ELSE [] END AS bigrams
  FROM t
)
SELECT doc_id, n AS n_tokens,
       CASE WHEN n > 0 THEN 1.0 - n_distinct / n ELSE 0.0 END AS dup_token_frac,
       CASE WHEN n > 0
            THEN list_max([len(list_filter(toks, x -> x = d)) FOR d IN list_distinct(toks)]) / n
            ELSE 0.0 END AS top_token_frac,
       CASE WHEN len(bigrams) > 0
            THEN 1.0 - len(list_distinct(bigrams)) / len(bigrams)
            ELSE 0.0 END AS dup_bigram_frac
FROM s
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signals (the Gopher-rules family): duplicate-token
    fraction, most-frequent-token share, duplicate-bigram fraction — the
    standard gates against degenerate/boilerplate documents. Pure Column
    expressions over token arrays (no explode, no shuffle: distinct/bigram
    counting happens per row inside the projection), so the corpus is one
    scan; every fraction is a single integer/integer division and therefore
    bit-identical across engines."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # let-bound (functions/text.let_): the captured token split would
    # otherwise re-run once per DISTINCT token inside the nested filter
    top_count = let_(
        toks,
        lambda tk: F.array_max(
            F.transform(
                F.array_distinct(tk),
                lambda dtok: F.size(F.filter(tk, lambda x: x == dtok)),
            )
        ),
    )
    s = d.select(
        "doc_id",
        n.alias("n"),
        n_distinct.alias("n_distinct"),
        F.size(bigrams).alias("n_bigrams"),
        F.size(F.array_distinct(bigrams)).alias("n_distinct_bigrams"),
        top_count.alias("top_count"),
    )
    nn = F.col("n")
    return s.select(
        "doc_id",
        nn.alias("n_tokens"),
        F.when(nn > 0, 1.0 - F.col("n_distinct") / nn).otherwise(0.0).alias("dup_token_frac"),
        F.when(nn > 0, F.col("top_count") / nn).otherwise(0.0).alias("top_token_frac"),
        F.when(F.col("n_bigrams") > 0, 1.0 - F.col("n_distinct_bigrams") / F.col("n_bigrams"))
        .otherwise(0.0)
        .alias("dup_bigram_frac"),
    )


@query(
    "text_perplexity",
    oracle=rf"""
WITH t AS (
  SELECT doc_id, {_NTOKS_SQL} AS toks FROM documents
  WHERE len({_NTOKS_SQL}) >= 2
), bg AS (
  SELECT doc_id, UNNEST([toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))]) AS bigram
  FROM t
), bgc AS (
  SELECT bigram, COUNT(*) AS c12 FROM bg GROUP BY 1
), hist AS (
  SELECT split_part(bigram, ' ', 1) AS w1, CAST(SUM(c12) AS BIGINT) AS c1
  FROM bgc GROUP BY 1
), v AS (
  SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS vocab
  FROM (SELECT UNNEST({_NTOKS_SQL}) AS tok FROM documents)
), scored AS (
  SELECT bg.doc_id, COUNT(*) AS n_bigrams,
         -(CAST(SUM(CAST(ROUND(ln((bgc.c12 + 1.0) / (hist.c1 + v.vocab)), 6)
                 AS DECIMAL(28,6))) AS DOUBLE)) / COUNT(*) AS nll
  FROM bg
  JOIN bgc ON bg.bigram = bgc.bigram
  JOIN hist ON split_part(bg.bigram, ' ', 1) = hist.w1
  CROSS JOIN v
  GROUP BY 1
)
SELECT doc_id, n_bigrams, ROUND(nll, 6) AS nll,
       CASE NTILE(3) OVER (ORDER BY ROUND(nll, 6) ASC, doc_id)
            WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS ppl_bucket
FROM scored
""",
)
def text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filtering (Wenzek et al. 2020): score every
    document under an add-1-smoothed bigram language model estimated from the
    corpus itself (the KenLM stand-in this container can express exactly),
    then split the corpus into head/middle/tail fluency buckets — the
    standard quality triage before sampling training data.

    Scale shape: one exploded-bigram pass feeds two map-side-combinable count
    aggregations (bigram and history tables — the LM); scoring re-joins the
    bigram stream to those tables on the bigram/history keys (shuffle joins
    on uniform hash keys, the honest LM-scoring shape) and reduces per doc.
    The final NTILE over doc-level rows is exact here; at 100 TB the bucket
    boundaries come from approx_percentile cutoffs broadcast as literals
    instead of a global window. The smoothed log-probs round to 6 decimals
    into an exact decimal fold, so scores and buckets replay bit-for-bit in
    the oracle."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(normalize("text"))
    t = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    n = F.size("toks")
    bigrams = F.zip_with(
        F.slice("toks", 1, n - 1),
        F.slice("toks", 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bg = t.select("doc_id", F.explode(bigrams).alias("bigram"))
    bgc = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c12"))
    hist = bgc.groupBy(F.substring_index("bigram", " ", 1).alias("w1")).agg(
        F.sum("c12").alias("c1")
    )
    vocab = (
        d.select(F.explode(toks).alias("tok"))
        .agg(F.count_distinct("tok").cast("double").alias("vocab"))
    )
    logp = F.round(F.log((F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("vocab"))), 6)
    scored = (
        bg.join(bgc, "bigram")
        .join(hist, F.substring_index(F.col("bigram"), " ", 1) == F.col("w1"))
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (-dsum(logp, 6) / F.count(F.lit(1))).alias("_nll"),
        )
    )
    from rca_data_tools_spark.operators.ranking import global_ntile

    # Exact NTILE(3) over the corpus-wide (nll, doc_id) order — but computed
    # distributed (range shuffle + per-partition windows + broadcast offsets,
    # operators/ranking.py), not via Spark's unpartitioned window that
    # funnels every row through ONE task.
    nll = F.round("_nll", 6)
    scored = scored.select("doc_id", "n_bigrams", nll.alias("nll"))
    tiled = global_ntile(
        scored, [F.col("nll").asc(), F.col("doc_id")], 3, bucket_col="__tile"
    )
    tile = F.col("__tile")
    bucket = (
        F.when(tile == 1, F.lit("head")).when(tile == 2, F.lit("middle")).otherwise(F.lit("tail"))
    )
    return tiled.select("doc_id", "n_bigrams", "nll", bucket.alias("ppl_bucket"))


@query(
    "text_ngram_freq",
    oracle=r"""
WITH norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')
           AS ws
  FROM documents
), idx AS (
  SELECT doc_id, ws,
         unnest(range(CAST(greatest(1, len(ws) - 2) AS BIGINT))) AS i
  FROM norm
), grams AS (
  SELECT DISTINCT doc_id, array_to_string(ws[(i+1):(i+3)], ' ') AS gram
  FROM idx
)
SELECT gram, COUNT(*) AS doc_freq
FROM grams
GROUP BY gram
ORDER BY doc_freq DESC, gram
LIMIT 20
""",
)
def text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicated-phrase census: the 20 word-3-grams present in
    the most documents (document frequency, counted once per doc). The
    cross-document complement of text_repetition's intra-document signal —
    the table a curation pipeline uses to spot boilerplate phrases worth
    stripping before training.

    Scale shape: word_ngrams dedupes per row (array_distinct) so the explode
    emits each (doc, gram) once; the DF count is a map-side-combined hash agg
    on the gram key; top-20 is TakeOrderedAndProject (per-partition heaps +
    driver merge of 20-row heads), never a global sort. Ties at the cut are
    broken by the gram string so the result is deterministic on both engines.
    """
    d = load_table(spark, sf_dir, "documents")
    grams = d.select(F.explode(word_ngrams("text", 3)).alias("gram"))
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("gram"))
        .limit(20)
    )


@query(
    "pipeline_pretrain_corpus",
    oracle=rf"""
WITH m AS (
  SELECT doc_id, lang, text,
    LEAST(1.0, length(text) / 500.0) AS len_score,
    LEAST(1.0, CASE WHEN length(text) > 0
        THEN (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) / length(text)
        ELSE 0.0 END * 4.0) AS punct_penalty,
    LEAST(1.0, CASE WHEN len({_NTOKS_SQL}) > 0
        THEN len(list_filter({_NTOKS_SQL}, t -> t IN ({_in_list(LANG_MARKERS['en'])}))) / len({_NTOKS_SQL})
        ELSE 0.0 END * 4.0) AS stop_score
  FROM documents
), scored AS (
  SELECT doc_id, lang,
         ROUND(len_score * 0.4 + (1.0 - punct_penalty) * 0.3 + stop_score * 0.3, 6) AS quality,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm_text
  FROM m
), kept AS (
  SELECT norm_text, MIN(doc_id) AS keep_id
  FROM scored WHERE quality >= 0.5 AND lang = 'en'
  GROUP BY norm_text
), survivors AS (
  SELECT s.doc_id, s.lang,
         list_filter(str_split(s.norm_text, ' '), t -> t <> '') AS ws
  FROM scored s JOIN kept k ON s.doc_id = k.keep_id
), chunks AS (
  SELECT doc_id, lang,
         doc_id % 8 AS shard_id,
         ch.k AS chunk_id,
         len(ch.c) AS n_tokens
  FROM (
    SELECT doc_id, lang,
           unnest([{{'k': k, 'c': ws[k*40+1 : k*40+50]}}
                   FOR k IN range(CAST(ceil(len(ws) / 40.0) AS BIGINT))]) AS ch
    FROM survivors
  )
), packed AS (
  SELECT lang, shard_id, doc_id, n_tokens,
         CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang, shard_id
                       ORDER BY doc_id, chunk_id) - n_tokens) / 256.0) AS BIGINT) AS bin_id
  FROM chunks
)
SELECT lang, shard_id, bin_id,
       COUNT(*) AS n_chunks,
       COUNT(DISTINCT doc_id) AS n_docs,
       SUM(n_tokens)::BIGINT AS bin_tokens
FROM packed GROUP BY 1, 2, 3
""",
)
def pipeline_pretrain_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM-data analogue of pipeline_qaqc_job: quality gate -> language
    gate -> exact dedup -> overlapping chunking -> fixed-budget sequence
    packing -> per-shard bin stats, all ONE declarative Catalyst plan.

    Scale shape: gates prune before the dedup shuffle; chunking is a flat
    projection; packing runs per (lang, hash-shard) so bins pack in parallel
    with no global order (operators/sampling.pack_greedy); the final agg is
    map-side combined. Two data-sized shuffles total (dedup fingerprints,
    shard packing) — each of 32-byte-hash or chunk-stat rows, never raw text.
    """
    from rca_data_tools_spark.operators.sampling import pack_greedy
    from rca_data_tools_spark.functions.text import quality_score

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "lang",
        quality_score("text").alias("quality"),
        normalize("text").alias("norm_text"),
    )
    gated = scored.filter((F.col("quality") >= 0.5) & (F.col("lang") == "en"))
    keep = gated.groupBy(F.md5("norm_text").alias("fp")).agg(
        F.min("doc_id").alias("keep_id")
    )
    survivors = gated.join(
        keep, gated.doc_id == keep.keep_id, "left_semi"
    ).select(
        "doc_id", "lang",
        F.filter(F.split("norm_text", " "), lambda t: t != "").alias("ws"),
    )
    n = F.size("ws")
    ks = F.when(
        n > 0, F.sequence(F.lit(0), F.ceil(n / F.lit(40.0)).cast("int") - 1)
    ).otherwise(F.array().cast("array<int>"))
    chunks = survivors.select(
        "doc_id", "lang",
        (F.col("doc_id") % 8).alias("shard_id"),
        F.explode(ks).alias("chunk_id"),
        F.col("ws"),
    ).select(
        "doc_id", "lang", "shard_id", "chunk_id",
        F.size(F.slice(F.col("ws"), F.col("chunk_id") * 40 + 1, 50)).alias("n_tokens"),
        F.concat_ws("|", "lang", "shard_id").alias("shard"),
    )
    # Composite (doc_id, chunk_id) order key: collision-free for any chunk
    # count, unlike an arithmetic doc_id*K+chunk_id encoding that would merge
    # cumsum offsets for >=K-chunk documents under RANGE-frame tie semantics.
    packed = pack_greedy(chunks, "shard", ["doc_id", "chunk_id"], "n_tokens", 256)
    return packed.groupBy("lang", "shard_id", "bin_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


@query(
    "text_pmi_cooccurrence",
    oracle=rf"""
WITH pres AS MATERIALIZED (
  SELECT DISTINCT doc_id, w FROM (
    SELECT doc_id, unnest({_NTOKS_SQL}) AS w FROM documents
  )
),
df AS MATERIALIZED (SELECT w, COUNT(*) AS dfreq FROM pres GROUP BY w),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
pairs AS (
  SELECT a.w AS w1, b.w AS w2, COUNT(*) AS c_xy
  FROM pres a JOIN pres b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY 1, 2
)
SELECT p.w1, p.w2, p.c_xy,
       ROUND(LN((p.c_xy * (SELECT n_docs FROM n))
                / (CAST(d1.dfreq AS DOUBLE) * d2.dfreq)), 6) AS pmi
FROM pairs p
JOIN df d1 ON d1.w = p.w1
JOIN df d2 ON d2.w = p.w2
ORDER BY pmi DESC, w1 ASC, w2 ASC
LIMIT 20
""",
)
def text_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word pairs by pointwise mutual information over document-level
    co-occurrence — collocation mining for corpus analysis.

    Scale shape: the presence table dedupes to (doc, word) with map-side
    partial distinct; the pair join is per-doc quadratic ONLY in the
    (vocabulary-capped) distinct words of each document — at corpus scale
    the standard cap is a broadcast top-V vocabulary filter before the
    join. df and N are dim-sized; the top-20 is TakeOrdered on the rounded
    PMI with deterministic pair tie-breaks.
    """
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # config-sized scalar, embedded as a plan literal
    pres = (
        d.select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
        .distinct()
    )
    df_ = pres.groupBy("w").agg(F.count(F.lit(1)).alias("dfreq"))
    a = pres.toDF("doc_id", "w1")
    b = pres.toDF("doc_id", "w2")
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    d1 = F.broadcast(df_.toDF("w1", "df1"))
    d2 = F.broadcast(df_.toDF("w2", "df2"))
    pmi = F.round(
        F.log(
            (F.col("c_xy") * F.lit(n_docs))
            / (F.col("df1").cast("double") * F.col("df2"))
        ),
        6,
    )
    return (
        pairs.join(d1, "w1")
        .join(d2, "w2")
        .select("w1", "w2", "c_xy", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(20)
    )


@query(
    "text_entropy",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, unnest({_NTOKS_SQL}) AS w FROM documents
), tf AS (
  SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY 1, 2
), per AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(SUM(CAST(ROUND(c * LN(c), 6) AS DECIMAL(28,6))) AS DOUBLE) AS s_clnc
  FROM tf GROUP BY 1
)
SELECT doc_id, n_tokens, n_distinct,
       ROUND(LN(n_tokens) - s_clnc / n_tokens, 6) AS entropy
FROM per WHERE n_tokens > 0
""",
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon token entropy — the information-density quality
    signal (low entropy = keyword stuffing / template spam; used alongside
    the Gopher repetition rules). Computed as ln(n) - (Σ c·ln c)/n over
    term frequencies, with the only order-sensitive sum (Σ c·ln c) rounded
    to decimal so the result is bit-identical across engines and
    partitionings.

    Scale shape: one explode + map-side-combined (doc, token) count, one
    per-doc agg — both shuffles carry token-hash-sized rows."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    tf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    per = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        dsum(F.col("c") * F.log("c")).alias("s_clnc"),
    )
    entropy = F.round(
        F.log("n_tokens") - F.col("s_clnc") / F.col("n_tokens"), 6
    )
    return per.filter(F.col("n_tokens") > 0).select(
        "doc_id", "n_tokens", "n_distinct", entropy.alias("entropy")
    )


@query(
    "text_vocab_growth",
    oracle=rf"""
WITH t AS (
  SELECT CAST(FLOOR(doc_id / 50) AS BIGINT) AS bucket, {_TOKS_SQL} AS toks
  FROM documents
), bg AS (
  SELECT bucket,
         UNNEST([toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))]) AS gram
  FROM t WHERE len(toks) >= 2
), first_seen AS (
  SELECT gram, MIN(bucket) AS b0 FROM bg GROUP BY gram
), newt AS (
  SELECT b0, COUNT(*) AS ng FROM first_seen GROUP BY b0
), spine AS (
  SELECT DISTINCT bucket AS bucket_id FROM t
)
SELECT s.bucket_id,
       CAST(COALESCE(n.ng, 0) AS BIGINT) AS new_grams,
       CAST(SUM(COALESCE(n.ng, 0)) OVER (ORDER BY s.bucket_id) AS BIGINT) AS cum_vocab
FROM spine s LEFT JOIN newt n ON n.b0 = s.bucket_id
""",
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: cumulative distinct word BIGRAMS per
    50-document bucket — the corpus-analytics curve that tells you whether
    more data still buys new vocabulary. Buckets with no new vocabulary
    still appear (bucket spine + zero-fill), so the curve's flat tail is
    visible, not silently dropped.

    Scale shape: the only corpus-sized operations are the bigram explode
    and one (gram -> min bucket) shuffle that carries GRAMS, not documents;
    the cumulative sum then runs on the bucket dimension (corpus_docs / 50
    rows) via a broadcast triangular join — no single-partition window, and
    the quadratic is confined to the dim."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bucket = F.floor(F.col("doc_id") / 50).cast("long")
    bg = d.select(bucket.alias("bucket"), F.explode(bigrams).alias("gram"))
    first_seen = bg.groupBy("gram").agg(F.min("bucket").alias("b0"))
    newt = first_seen.groupBy("b0").agg(F.count(F.lit(1)).alias("ng"))
    spine = d.select(bucket.alias("bucket_id")).distinct()
    base = spine.join(
        F.broadcast(newt), F.col("b0") == F.col("bucket_id"), "left"
    ).select("bucket_id", F.coalesce(F.col("ng"), F.lit(0)).alias("ng"))
    b = F.broadcast(base.select(F.col("bucket_id").alias("bb"), F.col("ng").alias("bn")))
    return (
        base.join(b, F.col("bb") <= F.col("bucket_id"))
        .groupBy("bucket_id")
        .agg(
            F.max(F.when(F.col("bb") == F.col("bucket_id"), F.col("bn"))).alias("new_grams"),
            F.sum("bn").alias("cum_vocab"),
        )
    )


_CHUNK_SIZE, _CHUNK_STRIDE = 64, 48  # 16-token overlap


@query(
    "text_chunk_windows",
    oracle=f"""
WITH norm AS (
  SELECT doc_id, string_split({_NORM_SQL}, ' ') AS ws FROM documents
), idx AS (
  SELECT doc_id, ws,
         unnest(range(CAST(CASE WHEN len(ws) <= {_CHUNK_SIZE} THEN 1
           ELSE ceil((len(ws) - {_CHUNK_SIZE}) / {_CHUNK_STRIDE}.0) + 1 END AS BIGINT)))
           AS chunk_idx
  FROM norm WHERE len(ws) > 0
)
SELECT doc_id, chunk_idx,
       array_to_string(ws[(chunk_idx * {_CHUNK_STRIDE} + 1):(chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_SIZE})], ' ')
         AS chunk_text,
       CAST(LEAST({_CHUNK_SIZE}, len(ws) - chunk_idx * {_CHUNK_STRIDE}) AS BIGINT)
         AS n_tokens
FROM idx
""",
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking — the retrieval/RAG ingestion
    shape (chunk size 64 tokens, stride 48 = 16-token overlap, final
    partial chunk kept): (doc_id, chunk_idx, chunk_text, n_tokens), with
    chunk count ceil((n-size)/stride)+1 so every token lands in >= 1 chunk
    and boundaries overlap for context continuity.

    Scale shape: tokenization is let-bound (once per row — see
    functions/text.let_), the chunk build is a per-row transform + explode
    (no shuffle at all: this is a pure reshaping scan), and the output
    partitions by whatever the sink needs. At 100 TB this is the
    throughput-bound pass it should be."""
    from rca_data_tools_spark.functions.text import let_

    d = load_table(spark, sf_dir, "documents")
    size, stride = _CHUNK_SIZE, _CHUNK_STRIDE

    def chunks_of(toks):
        n = F.size(toks)
        n_chunks = F.when(n <= size, F.lit(1)).otherwise(
            F.ceil((n - size) / F.lit(float(stride))) + 1
        )
        return F.transform(
            F.sequence(F.lit(0), n_chunks.cast("int") - F.lit(1)),
            lambda i: F.struct(
                i.cast("long").alias("chunk_idx"),
                F.concat_ws(" ", F.slice(toks, i * stride + 1, size)).alias("chunk_text"),
                F.least(F.lit(size), F.size(toks) - i * stride).cast("long").alias("n_tokens"),
            ),
        )

    out = d.select(
        "doc_id", F.explode(let_(tokens(normalize("text")), chunks_of)).alias("c")
    ).filter(F.col("c.n_tokens") > 0)
    return out.select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_tokens").alias("n_tokens"),
    )


# Gopher quality-rule thresholds (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", Appendix A1.1). The
# line-based rules (bullet-start / ellipsis-end fractions) don't apply to
# this corpus (single-line synthetic docs) and are omitted; the word-level
# rules are implemented verbatim.
_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS = 50, 100_000
_GOPHER_MIN_MEANLEN, _GOPHER_MAX_MEANLEN = 3.0, 10.0
_GOPHER_MAX_SYMBOL_RATIO = 0.1
_GOPHER_MIN_ALPHA_FRAC = 0.80
_GOPHER_MIN_STOPWORDS = 2


@query(
    "text_gopher_gate",
    oracle=rf"""
WITH t AS (
  SELECT doc_id, lang, {_NTOKS_SQL} AS ws FROM documents
), m AS (
  SELECT doc_id, lang,
         len(ws) AS n_words,
         ROUND(CASE WHEN len(ws) > 0 THEN
             CAST(list_aggregate(list_transform(ws, t -> length(t)), 'sum') AS DOUBLE) / len(ws)
           ELSE 0.0 END, 6) AS mean_word_len,
         ROUND(CASE WHEN len(ws) > 0 THEN
             CAST(len(list_filter(ws, t -> contains(t, '#') OR contains(t, '...'))) AS DOUBLE) / len(ws)
           ELSE 0.0 END, 6) AS symbol_ratio,
         ROUND(CASE WHEN len(ws) > 0 THEN
             CAST(len(list_filter(ws, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) / len(ws)
           ELSE 0.0 END, 6) AS alpha_frac,
         len(list_distinct(list_filter(ws, t -> t IN ({_in_list(LANG_MARKERS['en'])})))) AS n_stopwords
  FROM t
)
SELECT doc_id, lang, n_words, mean_word_len, symbol_ratio, alpha_frac, n_stopwords,
       (n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}) AS ok_n_words,
       (mean_word_len >= {_GOPHER_MIN_MEANLEN} AND mean_word_len <= {_GOPHER_MAX_MEANLEN}) AS ok_mean_len,
       (symbol_ratio <= {_GOPHER_MAX_SYMBOL_RATIO}) AS ok_symbols,
       (alpha_frac >= {_GOPHER_MIN_ALPHA_FRAC}) AS ok_alpha,
       (n_stopwords >= {_GOPHER_MIN_STOPWORDS}) AS ok_stopwords,
       ((n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
        AND mean_word_len >= {_GOPHER_MIN_MEANLEN} AND mean_word_len <= {_GOPHER_MAX_MEANLEN}
        AND symbol_ratio <= {_GOPHER_MAX_SYMBOL_RATIO}
        AND alpha_frac >= {_GOPHER_MIN_ALPHA_FRAC}
        AND n_stopwords >= {_GOPHER_MIN_STOPWORDS}) AS keep
FROM m
""",
)
def text_gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality gate (Rae et al. 2021 App. A1.1): per-document
    rule diagnostics plus the final keep flag — word-count bounds, mean
    word length in [3, 10], symbol-to-word ratio (# / ellipsis) <= 0.1,
    alphabetic-word fraction >= 0.8, >= 2 distinct stop words. The
    per-rule booleans are surfaced (not just `keep`) because a curation
    run needs the rejection census to tune thresholds.

    Scale shape: one projection over the corpus — every rule is a
    higher-order array expression (transform/filter/aggregate) inside
    whole-stage codegen, no explode, no shuffle, no Python. At 100 TB this
    gate runs at scan speed, which is the point: Gopher rules are the
    cheap first pass that spares the expensive dedup/classifier stages
    ~30-50% of the corpus."""
    from rca_data_tools_spark.functions.text import let_

    d = load_table(spark, sf_dir, "documents")
    stops = F.array(*[F.lit(s) for s in LANG_MARKERS["en"]])

    def metrics(ws):
        n = F.size(ws)
        nd = n.cast("double")
        safe = F.when(n > 0, 1.0 / nd).otherwise(F.lit(0.0))
        sum_len = F.aggregate(
            ws, F.lit(0), lambda acc, t: acc + F.length(t)
        ).cast("double")
        n_symbol = F.size(
            F.filter(ws, lambda t: t.contains("#") | t.contains("..."))
        ).cast("double")
        n_alpha = F.size(F.filter(ws, lambda t: t.rlike("[a-z]"))).cast("double")
        n_stop = F.size(F.array_intersect(F.array_distinct(ws), stops))
        return F.struct(
            n.cast("long").alias("n_words"),
            F.round(sum_len * safe, 6).alias("mean_word_len"),
            F.round(n_symbol * safe, 6).alias("symbol_ratio"),
            F.round(n_alpha * safe, 6).alias("alpha_frac"),
            n_stop.cast("long").alias("n_stopwords"),
        )

    m = d.select(
        "doc_id", "lang", let_(tokens(normalize("text")), metrics).alias("m")
    ).select("doc_id", "lang", "m.*")
    ok_n = F.col("n_words").between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS)
    ok_len = F.col("mean_word_len").between(_GOPHER_MIN_MEANLEN, _GOPHER_MAX_MEANLEN)
    ok_sym = F.col("symbol_ratio") <= _GOPHER_MAX_SYMBOL_RATIO
    ok_alpha = F.col("alpha_frac") >= _GOPHER_MIN_ALPHA_FRAC
    ok_stop = F.col("n_stopwords") >= _GOPHER_MIN_STOPWORDS
    return m.select(
        "doc_id", "lang", "n_words", "mean_word_len", "symbol_ratio",
        "alpha_frac", "n_stopwords",
        ok_n.alias("ok_n_words"),
        ok_len.alias("ok_mean_len"),
        ok_sym.alias("ok_symbols"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stopwords"),
        (ok_n & ok_len & ok_sym & ok_alpha & ok_stop).alias("keep"),
    )


_EXPECT_RULES = {
    "text_present": "text IS NOT NULL AND length(text) >= 1",
    "min_length": "n_chars >= 100",
    "lang_allowed": "lang IN ('en', 'de', 'fr', 'es')",
    "chars_consistent": "n_chars = length(text)",
}


@query(
    "quality_expectations",
    oracle="""
WITH evald AS (
  SELECT
    COALESCE(text IS NOT NULL AND length(text) >= 1, FALSE) AS p_text,
    COALESCE(n_chars >= 100, FALSE) AS p_len,
    COALESCE(lang IN ('en', 'de', 'fr', 'es'), FALSE) AS p_lang,
    COALESCE(n_chars = length(text), FALSE) AS p_chars
  FROM documents
)
SELECT 'text_present' AS rule, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN p_text THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN p_text THEN 0 ELSE 1 END) AS BIGINT) AS n_fail
FROM evald
UNION ALL
SELECT 'min_length', COUNT(*),
       CAST(SUM(CASE WHEN p_len THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN p_len THEN 0 ELSE 1 END) AS BIGINT) FROM evald
UNION ALL
SELECT 'lang_allowed', COUNT(*),
       CAST(SUM(CASE WHEN p_lang THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN p_lang THEN 0 ELSE 1 END) AS BIGINT) FROM evald
UNION ALL
SELECT 'chars_consistent', COUNT(*),
       CAST(SUM(CASE WHEN p_chars THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN p_chars THEN 0 ELSE 1 END) AS BIGINT) FROM evald
""",
)
def quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARATIVE EXPECTATIONS report (the DLT-expectations / Great-
    Expectations gate a training-data ingest runs before a batch reaches
    the curated table): four rules — presence, minimum length, language
    allow-list, metadata consistency — evaluated over the documents corpus
    in ONE scan, one row per rule with pass/fail counts. NULL predicate
    results count as violations (an ingest gate must not wave through rows
    it could not judge).

    Scale shape: the whole report is a single aggregate projection (one
    long per rule per task, map-side combined) + a constant-width unpivot
    — zero shuffles beyond the final 1-row exchange, all codegen
    (operators/expectations.py)."""
    from rca_data_tools_spark.operators.expectations import expectation_stats

    d = load_table(spark, sf_dir, "documents")
    return expectation_stats(d, _EXPECT_RULES)


@query(
    "quality_quarantine",
    oracle="""
SELECT doc_id, lang, n_chars,
       TRIM(TRAILING ',' FROM
         CONCAT(
           CASE WHEN NOT COALESCE(text IS NOT NULL AND length(text) >= 1, FALSE)
                THEN 'text_present,' ELSE '' END,
           CASE WHEN NOT COALESCE(n_chars >= 100, FALSE)
                THEN 'min_length,' ELSE '' END,
           CASE WHEN NOT COALESCE(lang IN ('en', 'de', 'fr', 'es'), FALSE)
                THEN 'lang_allowed,' ELSE '' END,
           CASE WHEN NOT COALESCE(n_chars = length(text), FALSE)
                THEN 'chars_consistent,' ELSE '' END
         )) AS violated
FROM documents
WHERE NOT (COALESCE(text IS NOT NULL AND length(text) >= 1, FALSE)
       AND COALESCE(n_chars >= 100, FALSE)
       AND COALESCE(lang IN ('en', 'de', 'fr', 'es'), FALSE)
       AND COALESCE(n_chars = length(text), FALSE))
""",
)
def quality_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The QUARANTINE side of the expectations gate (dead-letter table):
    every document violating at least one rule, carrying the comma-joined
    names of the rules it broke in DEFINITION order — the operator's
    violations array joined to a string so the oracle can state it
    literally. Silently dropping bad rows loses the signal a pipeline
    needs to fix its sources; the quarantine preserves both the row and
    the why.

    Scale shape: one projection + filter over one scan; the violations
    array is pure codegen column math (operators/expectations.py)."""
    from rca_data_tools_spark.operators.expectations import apply_expectations

    d = load_table(spark, sf_dir, "documents")
    _passed, bad = apply_expectations(d, _EXPECT_RULES)
    return bad.select(
        "doc_id", "lang", "n_chars",
        F.array_join(F.col("violations"), ",").alias("violated"),
    )


@query(
    "pipeline_curated_table",
    oracle=r"""
WITH gated AS (
  SELECT doc_id, lang, n_chars,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm_text
  FROM documents
  WHERE COALESCE(text IS NOT NULL AND length(text) >= 1, FALSE)
    AND COALESCE(n_chars >= 100, FALSE)
    AND COALESCE(lang IN ('en', 'de', 'fr', 'es'), FALSE)
    AND COALESCE(n_chars = length(text), FALSE)
), canonical AS (
  SELECT MIN(doc_id) AS doc_id, norm_text,
         COUNT(*) AS group_size
  FROM gated GROUP BY norm_text
), curated AS (
  SELECT c.doc_id, g.lang, g.n_chars, c.group_size
  FROM canonical c JOIN gated g ON g.doc_id = c.doc_id
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(group_size) AS BIGINT) AS sum_sources
FROM curated GROUP BY lang
""",
)
def pipeline_curated_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curated-table ingest — the lifecycle a training-data
    lakehouse actually runs, composed from this round's components: raw
    documents pass the EXPECTATIONS GATE (four rules, violating rows
    quarantined — never silently dropped), survivors EXACT-DEDUP to a
    canonical doc per normalized text (group_size counts the sources), and
    the curated batch MERGEs into a copy-on-write table chain under CHECK
    CONSTRAINTS (non-null key, positive length — enforced in-plan at the
    write). The hashed result reads the COMMITTED TABLE back through
    read_version, per-language: a leaky gate, a dedup that dropped a
    canonical row, a constraint that mutated data, or a merge that lost a
    row all hash-mismatch against the SQL replay of the same stages.

    Scale shape: gate = codegen predicates fused into the scan; dedup = one
    32-byte-fingerprint shuffle; merge = merge_upsert_pruned's O(touched
    files); the read-back is the committed version's plain scan."""
    import os
    import tempfile

    from rca_data_tools_spark.operators.expectations import apply_expectations
    from rca_data_tools_spark.sources.sinks import (
        create_table, merge_into_table, read_version,
    )

    d = load_table(spark, sf_dir, "documents")
    gated, _quarantine = apply_expectations(d, _EXPECT_RULES)
    norm = gated.select(
        "doc_id", "lang", "n_chars",
        F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias("fp"),
    )
    canonical = norm.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("group_size")
    )
    curated = canonical.join(norm, ["fp", "doc_id"]).select(
        "doc_id", "lang", "n_chars", "group_size"
    )

    ddl = "doc_id bigint, lang string, n_chars bigint, group_size bigint"
    root = tempfile.mkdtemp(prefix="rca_curated_")
    # constraints PERSIST with the table (create_table -> _table.json), so
    # the merge enforces them without being told — the Delta CHECK shape
    create_table(
        spark.createDataFrame([], ddl), root, zone_key="doc_id",
        constraints={
            "doc_id_present": "doc_id IS NOT NULL",
            "chars_positive": "n_chars > 0",
            "sources_positive": "group_size >= 1",
        },
    )
    merge_into_table(spark, root, curated, ["doc_id"], ddl, zone_key="doc_id")
    table = read_version(spark, root, ddl)
    return table.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum("group_size").cast("long").alias("sum_sources"),
    )
