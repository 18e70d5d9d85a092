"""Properties of the deterministic sampling / packing operators: rate
accuracy, run-to-run and partitioning invariance, cap enforcement, and
pack-bin budget semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from rca_data_tools_spark.functions.text import token_count
from rca_data_tools_spark.operators.sampling import (
    group_cap,
    hash_sample,
    pack_greedy,
    stratified_sample,
)
from rca_data_tools_spark.sources.readers import load_table
from tests.conftest import SF_CORRECTNESS


def _docs(spark):
    return load_table(spark, SF_CORRECTNESS, "documents")


def test_hash_sample_rate_and_determinism(spark):
    d = _docs(spark)
    n = d.count()
    kept = hash_sample(d, "doc_id", 0.2)
    k = kept.count()
    # Binomial(500, 0.2): allow 4 sigma around the mean.
    sigma = math.sqrt(n * 0.2 * 0.8)
    assert abs(k - 0.2 * n) < 4 * sigma
    # Determinism across partitionings: same surviving id set.
    ids1 = {r.doc_id for r in kept.collect()}
    ids2 = {r.doc_id for r in hash_sample(d.repartition(7), "doc_id", 0.2).collect()}
    assert ids1 == ids2
    # Nested rates: a 10% sample is a subset of the 20% sample (same salt).
    ids_small = {r.doc_id for r in hash_sample(d, "doc_id", 0.1).collect()}
    assert ids_small <= ids1


def test_stratified_rates_differ_by_stratum(spark):
    d = _docs(spark)
    kept = stratified_sample(d, "doc_id", "lang", {"en": 0.1}, default_rate=1.0)
    by_lang = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    tot = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["fr"] == tot["fr"]  # default rate 1.0 keeps everything
    assert by_lang.get("en", 0) < 0.3 * tot["en"]  # en downsampled hard


def test_group_cap_bounds_and_priority(spark):
    d = _docs(spark)
    capped = group_cap(d, "source", 3, "n_chars", descending=True, tiebreak_col="doc_id")
    counts = capped.groupBy("source").count().collect()
    assert all(r["count"] <= 3 for r in counts)
    # The kept rows per source are exactly the 3 longest (pandas replay).
    pdf = d.select("doc_id", "source", "n_chars").toPandas()
    for src, grp in pdf.groupby("source"):
        want = set(
            grp.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(3)["doc_id"]
        )
        got = {r.doc_id for r in capped.filter(F.col("source") == src).collect()}
        assert got == want, src


def test_pack_greedy_bins_are_contiguous_and_budgeted(spark):
    d = _docs(spark).withColumn("n_tok", token_count("text"))
    target = 128
    packed = pack_greedy(d, "lang", "doc_id", "n_tok", target=target)
    pdf = packed.select("lang", "doc_id", "n_tok", "bin_id").toPandas()
    for lang, grp in pdf.groupby("lang"):
        grp = grp.sort_values("doc_id")
        # bin ids are non-decreasing along the shard order
        assert grp["bin_id"].is_monotonic_increasing
        # each doc's bin is its starting offset / target, exactly
        start = grp["n_tok"].cumsum() - grp["n_tok"]
        assert (grp["bin_id"] == start // target).all()


def test_importance_weights_favor_target_vocabulary(spark):
    """DSIR weights: documents made of tokens that appear ONLY in the target
    slice must outrank documents made of tokens that appear only outside it,
    and shared-vocabulary docs must land between them."""
    from rca_data_tools_spark.operators.sampling import importance_weights

    rows = []
    # target slice (is_tgt True): vocabulary A
    for i in range(20):
        rows.append((i, "tgt", "alpha beta gamma delta alpha beta"))
    # source-only docs: vocabulary B
    for i in range(20, 40):
        rows.append((i, "src", "omega psi chi phi omega psi"))
    # probe docs (scored, outside the target slice)
    rows.append((100, "src", "alpha beta gamma delta"))  # pure target vocab
    rows.append((101, "src", "omega psi chi phi"))  # pure source vocab
    rows.append((102, "src", "alpha beta omega psi"))  # mixed
    d = spark.createDataFrame(rows, ["doc_id", "grp", "text"])
    out = {
        r.doc_id: r.importance
        for r in importance_weights(
            d, "doc_id", "text", target_pred=(F.col("grp") == "tgt"), n_buckets=64
        ).collect()
    }
    assert out[100] > out[102] > out[101]
    # rerun-stable (hash features, no RNG)
    out2 = {
        r.doc_id: r.importance
        for r in importance_weights(
            d, "doc_id", "text", target_pred=(F.col("grp") == "tgt"), n_buckets=64
        ).collect()
    }
    assert out == out2


def test_perplexity_buckets_separate_fluent_from_shuffled(spark):
    """The bigram-LM score must rank high-frequency-pattern documents as more
    fluent (lower NLL) than documents of rare bigrams, and the head/middle/
    tail split must cover the corpus in equal-sized buckets."""
    from rca_data_tools_spark.queries import QUERIES

    out = QUERIES["text_perplexity"](spark, SF_CORRECTNESS).collect()
    n = len(out)
    assert n > 0
    by_bucket: dict[str, list] = {}
    for r in out:
        by_bucket.setdefault(r.ppl_bucket, []).append(r.nll)
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert max(len(v) for v in by_bucket.values()) - min(len(v) for v in by_bucket.values()) <= 1
    assert max(by_bucket["head"]) <= min(by_bucket["middle"]) + 1e-9
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"]) + 1e-9


def test_pack_greedy_1500_chunk_document_strict_order(spark):
    """A single document with 1500 chunks (beyond any *1000 arithmetic
    encoding) must pack in strict (doc_id, chunk_id) order with no
    collision-merged offsets: every bin holds exactly target/len chunks,
    consecutively."""
    from rca_data_tools_spark.operators.sampling import pack_greedy

    rows = [(0, 7, c, 4) for c in range(1500)] + [(0, 2, c, 4) for c in range(10)]
    df = spark.createDataFrame(rows, "shard long, doc_id long, chunk_id long, n int")
    got = pack_greedy(df, "shard", ["doc_id", "chunk_id"], "n", 64).collect()
    by_key = {(r["doc_id"], r["chunk_id"]): r["bin_id"] for r in got}
    # sequential oracle: doc 2's 10 chunks first, then doc 7's 1500
    cum = 0
    for doc, n_chunks in ((2, 10), (7, 1500)):
        for c in range(n_chunks):
            assert by_key[(doc, c)] == cum // 64, (doc, c)
            cum += 4
    # 1510 chunks x 4 tokens / 64-token bins -> 95 distinct bins, 16 chunks each
    from collections import Counter

    sizes = Counter(by_key.values())
    assert len(sizes) == 95 and set(sizes.values()) <= {16, 6}
