"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, and n-gram Jaccard.

Design for 100 TB:
- The only heavy fan-out is doc -> shingles (explode). Everything downstream
  is hash aggregation on fixed-width keys (signatures, band hashes), which
  partial-aggregates map-side before shuffling.
- Candidate generation joins on band signature (equi-join, shuffle on a
  well-distributed md5 key); exact verification only touches candidate pairs,
  never the full cross product.
- Hashing is salted-md5 on strings, chosen deliberately: identical results in
  any engine (it's how the DuckDB oracles replay the pipeline bit-for-bit),
  no dependence on engine-private hash functions.

Public-knowledge algorithms: MinHash (Broder 1997), LSH banding (Mining of
Massive Datasets ch.3), SimHash (Charikar 2002).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rca_data_tools_spark.functions.text import char_ngrams, normalize, tokens, word_ngrams

# MinHash family: K universal-hash permutations, banded b x r for candidates.
MINHASH_K = 16
MINHASH_BANDS = 4
MINHASH_ROWS = MINHASH_K // MINHASH_BANDS
MINHASH_P = 1_000_000_007
# Fixed odd multipliers/offsets for the universal hash family
# h_i(x) = (A[i]*x + B[i]) mod P over the md5-derived base value.
MINHASH_A = [2654435761, 2246822519, 3266489917, 668265263, 374761393, 2869860233,
             1540483477, 2654435769, 2166136261, 16777619, 3141592653, 2718281829,
             1327217885, 2451336121, 1588635695, 3367900313]
MINHASH_B = [982451653, 57885161, 715827883, 479001599, 100000007, 998244353,
             805306457, 402653189, 201326611, 1610612741, 122949829, 976369,
             27644437, 87178291, 479001629, 15485867]


def shingle_table(docs: DataFrame, id_col: str, text_col: str, n: int = 5) -> DataFrame:
    """(id, shingle) rows — distinct char n-grams of normalized text.

    char_ngrams already dedupes within the row (array_distinct), so no
    cross-row distinct — and therefore no shuffle — is needed here."""
    return docs.select(F.col(id_col), F.explode(char_ngrams(text_col, n)).alias("sh"))


def shingle_arrays(docs: DataFrame, id_col: str, text_col: str, n: int = 5) -> DataFrame:
    """(id, shs: array<string>) — the same shingle set kept as one array row
    per document instead of exploded rows. Everything per-document downstream
    (signatures, exact Jaccard) runs on the array, so no shingle-level
    shuffle ever happens.

    Normalization stays JVM-side (regexp semantics must match the SQL
    oracle); the position slicing runs in an Arrow UDF — Python string
    slices with dict.fromkeys dedup reproduce char_ngrams' substr +
    array_distinct (first-occurrence order) exactly, without the
    interpreted per-position HOF that dominated the pipeline (~3x faster
    shingling at sf0.1)."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, StringType

    def _sh(texts):
        out = []
        for t in texts:
            t = t or ""
            out.append(list(dict.fromkeys(t[i : i + n] for i in range(max(1, len(t) - (n - 1))))))
        return pd.Series(out)

    shingle = F.pandas_udf(_sh, ArrayType(StringType()))
    return docs.select(F.col(id_col), shingle(normalize(text_col)).alias("shs"))


def shingle_base_hash(sh: Column | str) -> Column:
    """One md5 per shingle -> 32-bit base value (mod P). The K permutations
    derive from this arithmetically — 16x fewer digest computations than
    salting md5 per permutation, identical replayability in SQL."""
    c = F.col(sh) if isinstance(sh, str) else sh
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % MINHASH_P


def shingle_hashes(sh: DataFrame, id_col: str) -> DataFrame:
    """(id, bases, h60) from the (id, shs) array form — ONE md5 digest per
    shingle feeding both downstream consumers.

    ``bases`` (first 8 hex chars mod P) is the signature base the K
    permutations run over — bit-identical to hashing each path separately —
    and ``h60`` (first 15 hex chars = 60 bits, always inside a signed long)
    is the exact-verify key, so verify's set intersection runs on longs
    instead of shingle strings. 60-bit hashing is collision-free for any
    realistic document (P(collision in a 10^4-shingle doc) ~ 10^8/2^61 ~
    5e-11), so Jaccard over h60 equals Jaccard over the shingles themselves
    and the string-based SQL oracle still matches.

    This is the 'hash shingles to longs before exact verify' scale fix: the
    10x study measured exact verify as the dominant stage on dup-dense
    corpora, and the cost is per-element set hashing inside array_intersect
    — longs hash and compare several times cheaper than strings, and the
    persisted arrays shrink to 16 bytes per shingle.
    """
    digs = F.transform("shs", lambda s: F.md5(s))
    return sh.withColumn("digs", digs).select(
        F.col(id_col),
        F.transform(
            "digs",
            lambda d: F.conv(F.substring(d, 1, 8), 16, 10).cast("long") % MINHASH_P,
        ).alias("bases"),
        F.transform(
            "digs", lambda d: F.conv(F.substring(d, 1, 15), 16, 10).cast("long")
        ).alias("h60"),
    )


def minhash_signatures(
    sh: DataFrame, id_col: str, k: int = MINHASH_K, keep_cols: tuple = ()
) -> DataFrame:
    """Per-doc MinHash signature: k columns h0..h{k-1}, each
    min_i((A_i*base + B_i) mod P) over the doc's shingles — a classic
    universal-hash permutation family (Broder 1997).

    Explode-free: takes the (id, shs) array form and computes the signature
    in a narrow, shuffle-free projection. The old exploded groupBy needed a
    full shuffle of the shingle table (at 100 TB that shuffle IS the job);
    this needs none.

    Two-stage kernel split by what each engine is good at: the base hash is
    ONE JVM-side ``transform(shs, s -> conv(substr(md5(s),1,8),16,10) % P)``
    pass — bit-identical to the SQL the DuckDB oracle replays, and ~10x
    cheaper than a Python ``hashlib.md5`` per shingle, which profiling showed
    was the whole pipeline's dominant cost — and the K permutations run as
    one vectorized uint64 matmul-shaped pass in an Arrow-batched pandas UDF
    over the numeric base arrays (Arrow then ships longs, not strings). The
    earlier all-HOF formulation (K ``array_min(transform())`` passes) and the
    all-Python one (hashlib per shingle) were both ~3-4x slower at sf0.1."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    if "shs" not in sh.columns and "bases" not in sh.columns:
        # accept the exploded (id, sh) form too
        sh = sh.groupBy(id_col).agg(F.collect_list("sh").alias("shs"))

    A = np.array(MINHASH_A[:k], dtype=np.uint64)[:, None]
    B = np.array(MINHASH_B[:k], dtype=np.uint64)[:, None]
    P = np.uint64(MINHASH_P)

    def _perms(col):
        # flattened batch kernel (guide §4.2 — vectorize over the whole
        # Arrow batch, not per row): concatenate every doc's bases into one
        # array, run each permutation as ONE full-array pass, and take
        # per-doc segment minima with minimum.reduceat. Identical
        # arithmetic ((A_i*b+B_i) mod P, min over the same elements) — the
        # old per-doc loop paid ~10µs of Python/numpy dispatch per row,
        # which at corpus scale was most of the stage. One permutation at a
        # time keeps the temporary at 8 bytes x batch-shingles (~25 MB)
        # instead of k x that.
        out = [None] * len(col)  # array_min-over-empty ≙ null
        arrs = [
            (i, np.asarray(b, dtype=np.uint64))
            for i, b in enumerate(col)
            if b is not None and len(b) > 0
        ]
        if not arrs:
            return pd.Series(out)
        flat = np.concatenate([a for _, a in arrs])
        lens = np.fromiter((a.size for _, a in arrs), dtype=np.intp, count=len(arrs))
        offs = np.zeros(len(arrs), dtype=np.intp)
        np.cumsum(lens[:-1], out=offs[1:])
        sigs = np.empty((len(arrs), k), dtype=np.int64)
        for j in range(k):
            h = (A[j, 0] * flat + B[j, 0]) % P
            sigs[:, j] = np.minimum.reduceat(h, offs).astype(np.int64)
        for row, (i, _) in enumerate(arrs):
            out[i] = sigs[row]
        return pd.Series(out)

    perm_udf = F.pandas_udf(_perms, ArrayType(LongType()))
    keep = [F.col(c) for c in keep_cols]
    if "bases" in sh.columns:  # pre-hashed form (shingle_hashes): reuse as-is
        based = sh.select(F.col(id_col), *keep, F.col("bases").alias("__bases"))
    else:
        based = sh.select(
            F.col(id_col),
            *keep,
            F.transform("shs", shingle_base_hash).alias("__bases"),
        )
    tagged = based.select(
        F.col(id_col), *keep, perm_udf(F.col("__bases")).alias("__sig")
    )
    cols = [F.col("__sig").getItem(i).alias(f"h{i}") for i in range(k)]
    return tagged.select(id_col, *keep_cols, *cols)


def lsh_banded(
    sig: DataFrame,
    id_col: str,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    keep_cols: tuple = (),
) -> DataFrame:
    """(id, band_id, band_sig) rows: band signature = the first 60 bits of
    the md5 of the band's concatenated minhashes, as a LONG. The shared
    banding step behind candidate generation and bucket-size routing.

    60-bit longs, not the 32-char md5 string (guide §2.3 — narrower
    types): the band self-join and every bucket-size aggregate key on this
    column, so an 8-byte key shuffles and hashes several times cheaper
    than a 32-byte string; 60 bits keeps the value in a signed BIGINT on
    both engines (the same truncation ``shingle_hashes``' h60 uses —
    cross-bucket collision odds at ~10^5 buckets are ~10^-8, and the SQL
    oracle replays the identical truncation, so the two engines always
    agree on the bucketing)."""
    r = k // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", *[F.col(f"h{b * r + j}") for j in range(r)])),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long").alias("band_sig"),
        )
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_col), *[F.col(c) for c in keep_cols], F.explode(F.array(*band_structs)).alias("b")
    ).select(id_col, *keep_cols, "b.band_id", "b.band_sig")


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str, k: int = MINHASH_K, bands: int = MINHASH_BANDS
) -> DataFrame:
    """Band the signature and emit candidate pairs sharing any band hash.

    The self-join is an equi-join on (band_id, band_sig). A
    groupBy+collect_list pair expansion would be one shuffle fewer, but a
    boilerplate-heavy bucket then materializes its O(m²) pairs inside a
    single row/task; the self-join spreads the same quadratic work across the
    cluster, which is the shape that survives skew at corpus scale (measured
    3x faster at sf0.1 too).
    """
    banded = lsh_banded(sig, id_col, k, bands)
    a = banded.withColumnRenamed(id_col, "id1")
    c = banded.withColumnRenamed(id_col, "id2")
    return (
        a.join(c, ["band_id", "band_sig"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def jaccard_expr(a, b):
    """Exact Jaccard of two set-valued array columns, rounded at the
    engine-parity scale — THE verify formula: every face (batch pairwise,
    incremental batch-vs-corpus, streaming) composes this one expression,
    so a threshold/rounding change cannot silently drift between them and
    their SQL oracles."""
    n_inter = F.size(F.array_intersect(a, b))
    return F.round(n_inter / (F.size(a) + F.size(b) - n_inter), 6)


def signature_agreement_expr(k: int, a_name, b_name):
    """Estimated Jaccard = fraction of agreeing minhash components;
    ``a_name``/``b_name`` format the per-component column names (e.g.
    ``'a{i}'``). Shared by the batch estimate_filter and the streaming
    in-join residual predicate."""
    agree = sum(
        F.when(F.col(a_name.format(i=i)) == F.col(b_name.format(i=i)), 1).otherwise(0)
        for i in range(k)
    )
    return agree / F.lit(k)


#: Pair-list size above which verify/estimate stop broadcasting the
#: candidate pairs and fall back to a shuffle equi-join. The bound is
#: BYTE-derived, because broadcast safety depends on the pair list's
#: serialized size, not its row count: a pair is two longs = 16 bytes, so
#: ~100 MB of pairs (a HashedRelation a few times that — still far under
#: executor/driver budgets) is ~6.5M pairs. The r07 bench taught why the
#: old 1M-ROW limit was the wrong guard: at the sf1 dup-dense corpus the
#: pruned list (1.04M pairs ≈ 17 MB — trivially broadcastable) tripped it,
#: so BOTH the estimate and verify joins shuffled the big side instead —
#: the per-doc shingle-hash ARRAY table, whose shuffle is what the
#: broadcast design exists to avoid — and dedup_minhash_lsh went
#: 13.3s → 57.6s (SCALING.md "round-8: the r07 57.6s explained"). Past
#: the byte bound a forced broadcast really is the all-drivers-die
#: failure mode, so the shuffle fallback stays.
BROADCAST_PAIR_BYTES = 100 * 1024 * 1024
BROADCAST_PAIR_LIMIT = BROADCAST_PAIR_BYTES // 16  # 6_553_600 pairs

#: Sentinel: "caller did not choose" — the session conf
#: spark.rca.dedup.broadcastPairLimit (int, or 'force' to skip the count
#: and broadcast unconditionally) then overrides BROADCAST_PAIR_LIMIT.
#: An explicit keyword argument always wins over the conf.
PAIR_LIMIT_DEFAULT = object()

PAIR_LIMIT_CONF = "spark.rca.dedup.broadcastPairLimit"


def _pair_budget(cand: DataFrame, limit) -> "tuple[DataFrame, bool]":
    """Persist the candidate-pair list and decide broadcastability: True
    when the pair list is provably small (counted on the persisted list —
    the count materializes work the joins need anyway), False past
    ``limit`` so callers let Spark plan a shuffle equi-join (AQE may still
    runtime-broadcast if the actual bytes allow; the point is we never
    FORCE an unbounded driver-side broadcast). ``limit=None`` forces True
    unconditionally (no count job — legacy behavior, plan inspection)."""
    if limit is PAIR_LIMIT_DEFAULT:
        conf = cand.sparkSession.conf.get(PAIR_LIMIT_CONF, "")
        if conf == "force":
            limit = None
        elif conf:
            limit = int(conf)
        else:
            limit = BROADCAST_PAIR_LIMIT
    if limit is None:
        return cand, True
    from pyspark import StorageLevel

    if cand.storageLevel == StorageLevel(False, False, False, False):
        cand = cand.persist()
    return cand, cand.count() <= limit


def _pair_side(cand: DataFrame, limit):
    """The candidate-pair side for the verify/estimate joins:
    broadcast-hinted iff ``_pair_budget`` proves it small."""
    cand, bc = _pair_budget(cand, limit)
    return F.broadcast(cand) if bc else cand


def _length_pruned_pairs(
    cand: DataFrame, norm: DataFrame, id_col: str, max_edit: int, limit
) -> DataFrame:
    """Apply the |len(a)−len(b)| ≤ max_edit prune to the candidate PAIR
    LIST before any document text moves (guide §2.3 / §8: decide with
    small rows, move big rows once). The old plan attached both texts to
    every band candidate and filtered afterwards — on the sf1 dup-dense
    corpus that shipped ~4M pairs' worth of ~300-char texts through the
    verify joins so that 3M of them could be dropped by an integer
    comparison. Here the pair list joins a per-doc LENGTH table (8-byte
    rows) twice, the filter runs on integers, and only the surviving
    quarter of the pairs ever touches text bytes. Returns the pruned pair
    side, broadcast-hinted iff the UNPRUNED list already passed the byte
    budget (pruned ⊆ cand, so the hint stays safe)."""
    cand, bc = _pair_budget(cand, limit)
    lens = norm.select(F.col(id_col), F.length("__nt").alias("__l"))
    l1 = lens.select(F.col(id_col).alias("id1"), F.col("__l").alias("__l1"))
    l2 = lens.select(F.col(id_col).alias("id2"), F.col("__l").alias("__l2"))
    pruned = (
        l1.join(F.broadcast(cand) if bc else cand, "id1")
        .join(l2, "id2")
        .filter(F.abs(F.col("__l1") - F.col("__l2")) <= F.lit(max_edit))
        .select("id1", "id2")
    )
    return F.broadcast(pruned) if bc else pruned


def verify_jaccard(
    cand: DataFrame,
    sh: DataFrame,
    id_col: str,
    threshold: float,
    broadcast_pair_limit=PAIR_LIMIT_DEFAULT,
) -> DataFrame:
    """Exact Jaccard on candidate pairs: |A∩B| / (|A|+|B|-|A∩B|), keep >= threshold.

    Takes the hashed (id, h60) array form from shingle_hashes — the
    intersection then runs on 60-bit longs, several times cheaper per element
    than string hashing and the dominant-stage fix the 10x dup-dense study
    called for — or falls back to the (id, shs) string-array / exploded
    forms. Each side of a candidate pair picks up its array via one
    equi-join, then the intersection is a per-row array_intersect in codegen.
    Candidate pairs are usually the small side (LSH plus the estimate filter
    has already cut them to near-final size), so up to
    ``broadcast_pair_limit`` pairs both joins broadcast the pair list — the
    big shingle side is never shuffled. Past the limit (dup-dense corpora
    where even the pruned pair list is GBs) the pair list joins by shuffle
    instead: two exchanges of (id, array) rows, but no unbounded broadcast.
    """
    set_col = "h60" if "h60" in sh.columns else "shs"
    if set_col not in sh.columns:
        sh = sh.groupBy(id_col).agg(F.collect_list("sh").alias("shs"))
    s1 = sh.select(F.col(id_col).alias("id1"), F.col(set_col).alias("shs1"))
    s2 = sh.select(F.col(id_col).alias("id2"), F.col(set_col).alias("shs2"))
    jac = jaccard_expr(F.col("shs1"), F.col("shs2"))
    return (
        s1.join(_pair_side(cand, broadcast_pair_limit), "id1")
        .join(s2, "id2")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def estimate_filter(
    cand: DataFrame,
    sig: DataFrame,
    id_col: str,
    min_estimate: float,
    k: int = MINHASH_K,
    broadcast_pair_limit=PAIR_LIMIT_DEFAULT,
) -> DataFrame:
    """Cheap candidate pruning: estimated Jaccard = fraction of agreeing
    signature components. Banding over-generates on corpora with shared
    boilerplate; this cuts the candidate set to near-final size before the
    expensive exact verify.

    The broadcast side is the candidate pair list (two longs per row), never
    the signature table — the signatures stream through untouched, which is
    what survives a corpus whose signature table itself is tens of GB. The
    pair list itself is size-guarded like verify_jaccard's: past
    ``broadcast_pair_limit`` it shuffle-joins instead of broadcasting."""
    s1 = sig.select(F.col(id_col).alias("id1"), *[F.col(f"h{i}").alias(f"a{i}") for i in range(k)])
    s2 = sig.select(F.col(id_col).alias("id2"), *[F.col(f"h{i}").alias(f"b{i}") for i in range(k)])
    return (
        s1.join(_pair_side(cand, broadcast_pair_limit), "id1")
        .join(s2, "id2")
        .withColumn("est", signature_agreement_expr(k, "a{i}", "b{i}"))
        .filter(F.col("est") >= min_estimate)
        .select("id1", "id2")
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    shingle_n: int = 5,
    est_margin: float = 0.25,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline:
    shingle -> sign -> band -> estimate-filter -> exact verify.

    The estimate filter keeps candidates with sig-estimated Jaccard >=
    threshold - est_margin (at K=16 the estimate's std is ~0.12, so a 0.25
    margin keeps true positives with overwhelming probability).

    Shuffle budget of the whole pipeline: signatures are a shuffle-free
    projection (array form), so the only shuffles left are the band-bucket
    self-join and the final distinct — both on uniform md5-derived keys.
    The input is repartitioned because document corpora often arrive as few
    large files and shingling is CPU-bound; the per-shingle hash arrays
    (ONE md5 digest each, split into the 32-bit signature base and the
    60-bit verify key — shingle_hashes) feed both the signature and the
    verify branches, so they are persisted instead of the raw shingles.
    """
    spread = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    hashed = shingle_hashes(
        shingle_arrays(spread, id_col, text_col, shingle_n), id_col
    ).persist()
    sig = minhash_signatures(hashed, id_col).persist()
    cand = lsh_candidate_pairs(sig, id_col)
    # pruned is broadcast by verify_jaccard; without a persist the broadcast
    # would re-execute the whole candidate self-join a second time (its plan
    # contains it). Pair lists are two longs per row — caching is free.
    pruned = estimate_filter(
        cand, sig, id_col, max(0.0, threshold - est_margin)
    ).persist()
    return verify_jaccard(pruned, hashed, id_col, threshold)


def incremental_neardup(
    existing: DataFrame,
    incoming: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental ingestion dedup: flag each INCOMING document against the
    EXISTING corpus — the production shape where a small batch arrives
    against a petabyte store and re-running the all-corpus self-join would
    be absurd.

    Pipeline: both sides shingle+sign (in deployment the existing side's
    band table is precomputed once and stored — sinks S12-S14 cover that;
    the signatures here are derived because the test corpus is small), then
    incoming bands BROADCAST against the existing band table (batch-sized
    side ships; the corpus side is never shuffled), candidates verify with
    exact Jaccard on 60-bit shingle hashes, and every incoming doc comes
    back with (is_dup, best_jaccard, matched_id) — the argmax existing
    match with min-id tie-break, NULL when nothing clears the threshold.

    Scale shape: cost is O(batch) + one broadcast probe of the corpus band
    table + quadratic work confined to actual band collisions, exactly the
    LSH contract; nothing corpus-sized shuffles and nothing is O(corpus x
    batch)."""
    # each hash table feeds two plan branches (banding + verify arrays):
    # persist, or the full shingle+md5 pipeline recomputes per consumer —
    # the exact cost the streaming face measured as minutes-vs-seconds at
    # 10x (streaming/joins.py) and minhash_dedup_pairs persists against
    ex_hash = shingle_hashes(shingle_arrays(existing, id_col, text_col), id_col).persist()
    in_hash = shingle_hashes(shingle_arrays(incoming, id_col, text_col), id_col).persist()
    ex_bands = lsh_banded(minhash_signatures(ex_hash, id_col), id_col)
    in_bands = lsh_banded(minhash_signatures(in_hash, id_col), id_col)
    cand = (
        ex_bands.withColumnRenamed(id_col, "old_id")
        .join(
            F.broadcast(in_bands.withColumnRenamed(id_col, "new_id")),
            ["band_id", "band_sig"],
        )
        .select("new_id", "old_id")
        .distinct()
    )
    s_new = in_hash.select(F.col(id_col).alias("new_id"), F.col("h60").alias("h_new"))
    s_old = ex_hash.select(F.col(id_col).alias("old_id"), F.col("h60").alias("h_old"))
    scored = (
        # the collision pair list is batch-x-collision sized — usually tiny,
        # but boilerplate-heavy batches can explode it, so it gets the same
        # size guard as the batch pipeline's verify (broadcast <= limit,
        # shuffle equi-join past it; _pair_side)
        s_old.join(_pair_side(cand, PAIR_LIMIT_DEFAULT), "old_id")
        .join(F.broadcast(s_new), "new_id")
        .withColumn("jaccard", jaccard_expr(F.col("h_new"), F.col("h_old")))
        .filter(F.col("jaccard") >= threshold)
    )
    best = scored.groupBy("new_id").agg(
        F.max("jaccard").alias("best_jaccard"),
        F.max_by("old_id", F.struct(F.col("jaccard"), -F.col("old_id"))).alias(
            "matched_id"
        ),
    )
    return (
        incoming.select(F.col(id_col).alias("new_id"))
        .join(F.broadcast(best), "new_id", "left")
        .select(
            F.col("new_id").alias(id_col),
            F.col("best_jaccard").isNotNull().alias("is_dup"),
            "best_jaccard",
            "matched_id",
        )
    )


LSH_BUCKET_CAP = 256


def minhash_dedup_components(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    shingle_n: int = 5,
    est_margin: float = 0.25,
    bucket_cap: int = LSH_BUCKET_CAP,
) -> DataFrame:
    """Mega-bucket-capped near-dup dedup -> (node, label) components.

    The uncapped pipeline's one super-linear stage is pairwise verification
    inside band buckets: a boilerplate cluster of m near-identical documents
    lands in one bucket and costs O(m²) candidate pairs — quadratic in the
    DATA, not the plan (SCALING.md). This variant routes any band bucket
    larger than ``bucket_cap`` straight to the component graph as m-1 star
    edges (member -> bucket-min member), skipping pairwise work entirely;
    only buckets of m <= cap go through estimate-filter + exact verify.
    Total pair work is bounded by cap²·n_buckets + Σ small m², i.e. LINEAR
    in corpus size for any fixed cap.

    The trade, stated honestly: star-edge members join a component WITHOUT
    exact verification. A bucket that large means >= r (=K/bands) minhashes
    agree across all m documents — for true Jaccard j the per-band collision
    probability is j^r, so a 256-document all-pairs-colliding bucket is
    boilerplate with near-1 Jaccard in practice, and the canonical-doc output
    (keep node == label) is unchanged on every corpus we can test (see
    tests/test_dedup.py pathological-cluster case).
    """
    spread = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    hashed = shingle_hashes(
        shingle_arrays(spread, id_col, text_col, shingle_n), id_col
    ).persist()
    sig = minhash_signatures(hashed, id_col).persist()
    banded = lsh_banded(sig, id_col)
    # bucket stats as WINDOW aggregates over the same (band_id, band_sig)
    # key the self-join uses: the old groupBy + join-back evaluated the
    # banded subtree TWICE (Spark does not dedupe common subexpressions
    # across join inputs) and paid an extra Exchange + join; one window
    # pays one Exchange and one pass (guide §2.4 — operations keyed the
    # same way share one exchange). count/min per key are identical.
    from pyspark.sql.window import Window

    wb = Window.partitionBy("band_id", "band_sig")
    tagged = (
        banded.withColumn("m", F.count(F.lit(1)).over(wb))
        .withColumn("hub", F.min(id_col).over(wb))
        .persist()
    )
    small = tagged.filter(F.col("m") <= bucket_cap)
    star = (
        tagged.filter((F.col("m") > bucket_cap) & (F.col(id_col) != F.col("hub")))
        .select(F.col("hub").alias("id1"), F.col(id_col).alias("id2"))
        .distinct()
    )
    a = small.select(F.col(id_col).alias("id1"), "band_id", "band_sig")
    c = small.select(F.col(id_col).alias("id2"), "band_id", "band_sig")
    cand = (
        a.join(c, ["band_id", "band_sig"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    pruned = estimate_filter(
        cand, sig, id_col, max(0.0, threshold - est_margin)
    ).persist()
    verified = verify_jaccard(pruned, hashed, id_col, threshold).select("id1", "id2")
    edges = verified.unionByName(star)
    out = connected_components(edges)
    # connected_components localCheckpoints its edges eagerly, so the
    # result's lineage is flat and no longer reads through these caches —
    # release them instead of leaking partitions into a long-lived session
    # (VERDICT r10 item 9).
    for cached in (hashed, sig, tagged, pruned):
        cached.unpersist()
    return out


def connected_components(
    pairs: DataFrame, id1: str = "id1", id2: str = "id2", max_iter: int = 50
) -> DataFrame:
    """Connected components of the near-dup pair graph -> (node, label) with
    label = smallest node id in the component. Turning pairs into components
    is the step that makes dedup actionable: keep ``node == label``, drop the
    rest.

    Iterative min-label propagation with pointer jumping: each round every
    node takes the min of (its label, its neighbors' labels, its label's
    label). The neighbor step alone needs O(diameter) rounds — fatal on
    chain-shaped dup clusters (doc i ~ doc i+1) — while the pointer jump
    halves remaining chain length every round, giving O(log diameter)
    convergence (the hash-to-min idea, Kiveris et al. 2014).

    Scale shape: per round two equi-joins shuffled on the node key + one
    map-side-combinable groupBy(min); the label table has one row per node
    that appears in a pair — a tiny fraction of the corpus for near-dup
    graphs. Each round's labels are localCheckpoint'ed — persist alone caches
    data but the *logical plan* still grows per round, and Catalyst's
    re-analysis of the accumulated plan goes super-linear after a few
    iterations; checkpointing truncates lineage so every round plans against
    a flat scan (on a cluster, use a reliable checkpoint dir for the same
    effect with fault tolerance). Convergence is detected from SUM(label) —
    labels only ever decrease, so the sum is strictly decreasing until
    fixpoint — one aggregate action per round instead of an old-vs-new
    join."""
    fwd = pairs.select(F.col(id1).alias("src"), F.col(id2).alias("dst"))
    rev = pairs.select(F.col(id2).alias("src"), F.col(id1).alias("dst"))
    edges = fwd.unionByName(rev).distinct().localCheckpoint()
    # seed labels with min(node, min neighbor) instead of node: the first
    # neighbor-propagation round comes free with the init aggregate (same
    # one shuffle the old distinct paid), and on the star/clique-shaped
    # components LSH bucketing produces — where the hub usually IS the
    # minimum — the whole graph converges at init and the loop exits after
    # one confirming round instead of two or three. Fewer rounds is the
    # only lever that matters here: each round costs fixed driver/job
    # overhead that dwarfs the KB-sized shuffles (guide §1.2: fix the
    # distributed algorithm, not the per-task work).
    # The convergence sum rides each materialization as an Observation —
    # metrics populate on the localCheckpoint job itself, so every round
    # (and the init) pays ONE action instead of checkpoint + a separate
    # sum-collect job (guide §1.4: measure on the action you already pay).
    from pyspark.sql import Observation

    obs0 = Observation()
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("__nbr"))
        .select(
            F.col("src").alias("node"),
            F.least(F.col("src"), F.col("__nbr")).alias("label"),
        )
        .observe(obs0, F.sum("label").alias("s"))
        .localCheckpoint()
    )
    cur_sum = obs0.get["s"]

    def _step(lbl: DataFrame) -> DataFrame:
        # min over {own label} ∪ {neighbors' labels} as ONE union + groupBy
        # instead of a groupBy plus a separate own-label left join — same
        # value per node (least(own, min-neighbors) ≡ min over the union),
        # one fewer join/exchange per round (guide §2.4)
        nbr_rows = edges.join(lbl, edges.src == lbl.node).select(
            F.col("dst").alias("node"), "label"
        )
        stepped = (
            nbr_rows.unionByName(lbl)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # pointer jump: label <- label(label); halves chain depth per round.
        # The jump map reads the PREVIOUS round's checkpointed labels (a
        # flat scan), not `stepped` itself: a stepped-on-stepped self-join
        # references the un-materialized union+groupBy subtree twice, so
        # every round executed its aggregate TWICE (guide §2.4 / §3.3 —
        # Spark does not dedupe common subexpressions across join inputs).
        # A one-round-stale jump preserves the invariant (labels are node
        # ids inside the same component, only ever decreasing) and the
        # fixpoint: the loop stops only after a full no-change round, where
        # the stale and fresh maps coincide, so the converged labels are
        # the component minimum either way.
        lmap = lbl.select(F.col("node").alias("label"), F.col("label").alias("jump"))
        return stepped.join(lmap, "label", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("jump", F.col("label"))).alias("label"),
        )

    for _ in range(max_iter):
        # ONE propagation step per materialized round. Measured alternative
        # (r11): composing two steps before the checkpoint QUADRUPLES the
        # inner subtree — _step references its input twice (the pointer-jump
        # self-join), so without a materialization between steps the nested
        # plan re-executes and re-analyzes the duplicated subtree (4.4s vs
        # 1.6s warm on the sf0.1 simhash graph). The checkpoint per step is
        # the cheap side of that trade.
        obs = Observation()
        new_labels = (
            _step(labels)
            .observe(obs, F.sum("label").alias("s"))
            .localCheckpoint()
        )
        new_sum = obs.get["s"]
        labels = new_labels
        if new_sum == cur_sum:
            break
        cur_sum = new_sum
    return labels


# --- SimHash ---------------------------------------------------------------

def _hex_slice_to_long(md5col, start: int, width: int = 8):
    return F.conv(F.substring(md5col, start, width), 16, 10).cast("long")


def simhash_fingerprints(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per doc as two 32-bit halves (fp_hi, fp_lo).

    Each distinct token hashes via md5; per bit position the docs' tokens vote
    +1/-1; the sign of the vote sets the bit. The 64 bit-votes are 64
    aggregate expressions over the (doc, token) rows — ONE map-side-combined
    shuffle on the doc id and no 32x bit-row explosion (an earlier
    explode(bits) formulation shuffled 32x the rows through two groupBys);
    the fingerprint assembly from the votes is a pure projection."""
    # NOT spread (measured r11): the md5+vote map side runs in the scan's
    # single partition at bench scale, but a noop A/B showed repartitioning
    # first is neutral here (0.85s vs 0.86s warm) — the cost is plan and
    # schedule, not the hashing — and the extra exchange would shuffle the
    # corpus text for nothing at scale
    toks = docs.select(F.col(id_col), F.explode(F.array_distinct(tokens(normalize(text_col)))).alias("tok"))
    hashed = toks.selectExpr(
        id_col,
        "CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT) AS h_hi",
        "CAST(conv(substring(md5(tok), 9, 8), 16, 10) AS BIGINT) AS h_lo",
    )

    # vote_j = sum(+1/-1 per token bit) > 0  ⟺  2 * sum(bit_j) > n_tokens:
    # summing the raw bit (one shift+and per bit) and comparing against the
    # token count once per doc does the same vote with no per-row branch —
    # 64 CASE WHENs per token row dropped from the hot aggregate
    # (guide §1.2 step 2: cheaper per-task work, identical result).
    # The 65 aggregates and the two 32-term bit assemblies are built as SQL
    # strings, ONE F.expr each: the Column-API formulation paid ~460 py4j
    # round-trips of driver time per call (profiled at 1.6s inside
    # ``assemble`` alone at any scale — guide §5, driver discipline).
    aggs = [
        F.expr(f"sum(shiftright(h_hi, {j}) & 1) AS vh{j}") for j in range(32)
    ] + [
        F.expr(f"sum(shiftright(h_lo, {j}) & 1) AS vl{j}") for j in range(32)
    ] + [F.expr("count(1) AS __nt")]
    votes = hashed.groupBy(id_col).agg(*aggs)

    def assemble(prefix: str) -> str:
        return " + ".join(
            f"IF({prefix}{j} * 2 > __nt, {1 << j}L, 0L)" for j in range(32)
        )

    return votes.selectExpr(
        id_col,
        f"({assemble('vh')}) AS fp_hi",
        f"({assemble('vl')}) AS fp_lo",
    )


def simhash_neardup_pairs(fp: DataFrame, id_col: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share one of four 16-bit blocks
    (pigeonhole: hamming <= 3 guarantees a shared block; wider radii trade
    recall), verified by exact Hamming distance."""
    blocks = fp.select(
        F.col(id_col),
        "fp_hi",
        "fp_lo",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("blk"), F.expr("fp_hi >> 16").alias("bv")),
                F.struct(F.lit(1).alias("blk"), F.expr("fp_hi & 65535").alias("bv")),
                F.struct(F.lit(2).alias("blk"), F.expr("fp_lo >> 16").alias("bv")),
                F.struct(F.lit(3).alias("blk"), F.expr("fp_lo & 65535").alias("bv")),
            )
        ).alias("b"),
    ).select(id_col, "fp_hi", "fp_lo", "b.blk", "b.bv")
    a = blocks.select(F.col(id_col).alias("id1"), F.col("fp_hi").alias("hi1"), F.col("fp_lo").alias("lo1"), "blk", "bv")
    c = blocks.select(F.col(id_col).alias("id2"), F.col("fp_hi").alias("hi2"), F.col("fp_lo").alias("lo2"), "blk", "bv")
    hamming = F.bit_count(F.col("hi1").bitwiseXOR(F.col("hi2"))) + F.bit_count(
        F.col("lo1").bitwiseXOR(F.col("lo2"))
    )
    return (
        a.join(c, ["blk", "bv"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_components_capped(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bucket_cap: int = 64,
) -> DataFrame:
    """Near-dup CONNECTED COMPONENTS by SimHash with capped-bucket routing
    — the scale face of the leakage-safe split (VERDICT r10 item 3: the
    earlier capped split rode the MinHash shingle pipeline, paying its
    K-signature constant everywhere; this one reuses the SAME cheap
    token-level SimHash fingerprints the exact face uses, so on a
    dup-sparse corpus the only extra over simhash_neardup_pairs +
    components is one bucket-size aggregate, and on a dup-dense corpus the
    pair work stays LINEAR in corpus size for fixed cap where the exact
    face's block self-join is quadratic in clone-cluster size).

    Routing (same trade as minhash_dedup_components, stated there): 16-bit
    pigeonhole blocks whose bucket holds ≤ cap members verify exact
    Hamming pairs; an over-cap bucket contributes m−1 UNVERIFIED star
    edges hub→member — components may over-merge docs that merely share a
    16-bit block in a mega-bucket, never under-merge (a bucket that big IS
    boilerplate in practice). Output (node, label); singletons absent
    (callers root them at their own id, as the split does)."""
    fp = simhash_fingerprints(docs, id_col, text_col)
    blocks = fp.select(
        F.col(id_col),
        "fp_hi",
        "fp_lo",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("blk"), F.expr("fp_hi >> 16").alias("bv")),
                F.struct(F.lit(1).alias("blk"), F.expr("fp_hi & 65535").alias("bv")),
                F.struct(F.lit(2).alias("blk"), F.expr("fp_lo >> 16").alias("bv")),
                F.struct(F.lit(3).alias("blk"), F.expr("fp_lo & 65535").alias("bv")),
            )
        ).alias("b"),
    ).select(id_col, "fp_hi", "fp_lo", "b.blk", "b.bv")
    # bucket stats as WINDOW aggregates: the old groupBy + join-back
    # re-evaluated the blocks subtree — and the simhash_fingerprints
    # aggregate under it — TWICE, plus an extra Exchange + join; one
    # window over the same (blk, bv) key pays one Exchange and one
    # upstream pass (guide §2.4). count/min per key are identical.
    from pyspark.sql.window import Window

    wb = Window.partitionBy("blk", "bv")
    tagged = (
        blocks.withColumn("m", F.count(F.lit(1)).over(wb))
        .withColumn("hub", F.min(id_col).over(wb))
        .persist()
    )
    star = (
        tagged.filter((F.col("m") > bucket_cap) & (F.col(id_col) != F.col("hub")))
        .select(F.col("hub").alias("id1"), F.col(id_col).alias("id2"))
        .distinct()
    )
    small = tagged.filter(F.col("m") <= bucket_cap)
    a = small.select(
        F.col(id_col).alias("id1"), F.col("fp_hi").alias("hi1"),
        F.col("fp_lo").alias("lo1"), "blk", "bv",
    )
    c = small.select(
        F.col(id_col).alias("id2"), F.col("fp_hi").alias("hi2"),
        F.col("fp_lo").alias("lo2"), "blk", "bv",
    )
    hamming = F.bit_count(F.col("hi1").bitwiseXOR(F.col("hi2"))) + F.bit_count(
        F.col("lo1").bitwiseXOR(F.col("lo2"))
    )
    verified = (
        a.join(c, ["blk", "bv"])
        .filter(F.col("id1") < F.col("id2"))
        .filter(hamming <= max_hamming)
        .select("id1", "id2")
        .distinct()
    )
    out = connected_components(verified.unionByName(star))
    tagged.unpersist()  # components are checkpointed; nothing reads the cache
    return out


# Content-defined chunking parameters (classic LBFS/rsync-style gear CDC;
# FastCDC, Xia et al., USENIX ATC'16, surveys the family): a gear rolling
# hash over the normalized character stream marks a boundary CANDIDATE
# wherever its low bits are zero; chunks are cut greedily at the first
# candidate at least MIN chars in, forced at MAX. The hash is NEVER reset,
# so a candidate is a pure function of the trailing 53 characters — that
# locality is what makes the chunking shift-resistant AND what lets both
# engines compute it without a stateful scan: Spark vectorizes it as 53
# shifted adds per batch (mod 2^53 kills terms past shift 52), DuckDB
# replays the same recurrence in a recursive CTE. The gear table is Knuth's
# multiplicative hash of the codepoint — pure arithmetic on both sides.
CDC_MIN, CDC_MAX, CDC_MOD = 16, 128, 1 << 53
CDC_GEAR_MULT, CDC_GEAR_MOD, CDC_MASK_MOD = 2654435761, 1 << 32, 32


def cdc_chunk_kernel(batches):
    """mapInPandas kernel: (doc_id, nt) -> (doc_id, chunk) rows.

    Vectorized bit-plane evaluation of h_i = (2*h_{i-1} + gear(c_i)) mod 2^53
    == sum_{s=0}^{52} gear(c_{i-s}) << s (mod 2^53): 53 shifted uint64 adds
    over the whole text (wraparound mod 2^64 is harmless because 2^53 divides
    2^64), then a greedy walk that touches only emitted cuts — next cut =
    min(first candidate >= start+MIN-1, start+MAX-1, n) via searchsorted.
    Python-level work is O(chunks), not O(chars)."""
    import numpy as np
    import pandas as pd

    pad = "\x00" * 53  # gear(0)=0, so 53 NULs fully flush the 53-char window
    for pdf in batches:
        docs = [(i, t) for i, t in zip(pdf["doc_id"], pdf["nt"]) if len(t) > 0]
        if not docs:
            yield pd.DataFrame({"doc_id": [], "chunk": []})
            continue
        # one hash pass over the whole batch: texts joined with NUL padding,
        # which zeroes the rolling window so each doc's h matches the
        # stand-alone recurrence exactly
        joined = pad + pad.join(t for _, t in docs)
        codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        gear = (codes.astype(np.uint64) * np.uint64(CDC_GEAR_MULT)) & np.uint64(
            CDC_GEAR_MOD - 1
        )
        h = np.zeros(len(codes), dtype=np.uint64)
        for s in range(min(53, len(codes))):
            h[s:] += gear[: len(codes) - s] << np.uint64(s)
        h &= np.uint64(CDC_MOD - 1)
        all_cands = np.flatnonzero(h % np.uint64(CDC_MASK_MOD) == 0)
        doc_ids, chunks = [], []
        off = 53  # 0-based offset of the current doc's first char in `joined`
        for doc_id, nt in docs:
            n = len(nt)
            lo, hi = np.searchsorted(all_cands, (off, off + n))
            cands = all_cands[lo:hi] - (off - 1)  # 1-indexed within the doc
            start = 1
            while start <= n:
                ci = np.searchsorted(cands, start + CDC_MIN - 1)
                cut = int(cands[ci]) if ci < len(cands) else n + CDC_MAX
                cut = min(cut, start + CDC_MAX - 1, n)
                doc_ids.append(doc_id)
                chunks.append(nt[start - 1 : cut])
                start = cut + 1
            off += n + 53
        yield pd.DataFrame({"doc_id": doc_ids, "chunk": chunks})


def _window_fingerprints(
    docs: DataFrame, id_col: str, text_col: str, window: int
) -> DataFrame:
    """(id, pos, fp) sliding-window fingerprint rows: fp is the first 60
    bits of md5(window text) as a long — the shingle_hashes trick: a 60-bit
    key is collision-free at any realistic window population (P ~ n²/2⁶¹)
    and longs group/join several times cheaper than 32-char hex strings,
    which the sf1 dup-dense measurement showed dominating the spans
    pipeline (every window of every clone repeats, so nearly all 10M
    window rows survive into the doc-frequency agg and the flag join).

    The token array materializes in its own projection BEFORE the window
    transform: an expression referenced inside a ``transform`` lambda
    re-evaluates PER ELEMENT, so leaving ``tokens(normalize(text))``
    inline re-ran the regex split once per window position — measured 57s
    for the bare windowing pass at sf1; a column reference inside the
    lambda is free (5.3s after this split, 11x)."""
    toked = docs.select(
        F.col(id_col), tokens(normalize(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
    n_win = F.size(toks) - F.lit(window - 1)
    wins = F.transform(
        F.sequence(F.lit(0), n_win - F.lit(1)),
        lambda i: F.struct(
            i.alias("pos"),
            F.conv(
                F.substring(F.md5(F.concat_ws(" ", F.slice(toks, i + F.lit(1), window))), 1, 15),
                16, 10,
            ).cast("long").alias("fp"),
        ),
    )
    return toked.select(
        F.col(id_col), F.explode(F.when(n_win > 0, wins)).alias("w")
    ).select(id_col, F.col("w.pos").alias("pos"), F.col("w.fp").alias("fp"))


def repeated_substring_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """Exact repeated-substring detection (the ExactSubstr signal of Lee et
    al. 2022, arXiv:2107.06499 "Deduplicating Training Data Makes Language
    Models Better", adapted from suffix arrays to a distributable
    fingerprint formulation): per document, the MAXIMAL token spans covered
    by ``window``-token sliding windows whose exact text occurs in at least
    ``min_df`` distinct documents. Returns (id, span_start, span_end,
    n_windows) with 0-based token positions, end exclusive.

    The paper's suffix-array construction is inherently sequential over a
    concatenated corpus; the sliding-window fingerprint form finds the same
    spans for repeats >= window tokens (a repeat of length R >= W is covered
    by exactly R-W+1 flagged windows, which merge back into the maximal
    span) and is three shuffle-free fan-outs plus two hash-key shuffles:

    - windows: per-row transform + explode -> (id, pos, md5(window-text)) —
      token work stays row-local, only 32-byte fingerprints leave the row
    - doc frequency: groupBy(fp) with count_distinct(id), map-side combined
      on uniform md5 keys (boilerplate-heavy fps partial-aggregate)
    - span merge: per-doc window over flagged positions — new span when the
      position gap exceeds ``window`` (coverage no longer overlaps/abuts),
      the lag-sessionize pattern; partitioned by doc, never global.

    Sub-window repeats (< window tokens) are invisible by construction —
    the paper's own floor (they use 50 BPE tokens); window tunes it.
    """
    from pyspark.sql.window import Window

    exploded = _window_fingerprints(docs, id_col, text_col, window)
    rep = (
        exploded.groupBy("fp")
        .agg(F.count_distinct(F.col(id_col)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("fp")
    )
    flagged = exploded.join(rep, "fp").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    grouped = (
        flagged.withColumn(
            "__new",
            F.when(
                F.col("pos") - F.lag("pos").over(w) > F.lit(window), 1
            ).otherwise(F.when(F.lag("pos").over(w).isNull(), 1).otherwise(0)),
        )
        .withColumn(
            "__span",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return grouped.groupBy(id_col, "__span").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(window)).alias("span_end"),
        F.count(F.lit(1)).alias("n_windows"),
    ).select(id_col, "span_start", "span_end", "n_windows")


def remove_substring_spans(
    docs: DataFrame, spans: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """The removal face of repeated_substring_spans (Lee et al. 2022 cut
    every repeated substring occurrence): rebuild each document's normalized
    text with all tokens inside any flagged span dropped. Returns
    (id, clean_text, n_tokens, n_removed).

    Scale shape: spans aggregate to ONE array row per flagged doc (shuffle
    of span triples only — never tokens), left-join onto the docs, and the
    cut itself is a per-row indexed ``filter`` HOF in codegen; document
    token arrays never leave their row, there is no token-level shuffle."""
    span_arr = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__sp")
    )
    # tokenize ONCE per row in its own projection (same hoist as
    # _window_fingerprints: re-evaluating the regex split in every output
    # expression quadruples the scan cost)
    toked = docs.select(F.col(id_col), tokens(normalize(text_col)).alias("__toks"))
    toks = F.col("__toks")
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("__sp"),
            lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
        ),
    )
    out = toked.join(span_arr, id_col, "left").select(
        F.col(id_col),
        F.when(F.col("__sp").isNull(), F.concat_ws(" ", toks))
        .otherwise(F.concat_ws(" ", kept))
        .alias("clean_text"),
        F.size(toks).alias("n_tokens"),
        F.when(F.col("__sp").isNull(), F.lit(0))
        .otherwise(F.size(toks) - F.size(kept))
        .alias("n_removed"),
    )
    return out


def set_similarity_join(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    broadcast_pair_limit=PAIR_LIMIT_DEFAULT,
) -> DataFrame:
    """Exact word-n-gram Jaccard self-join with PREFIX FILTERING (the
    AllPairs/PPJoin family, Bayardo et al. 2007 "Scaling Up All Pairs
    Similarity Search"): lossless for pairs with Jaccard >= threshold,
    without the naive inverted index's hot-gram pair explosion.

    Why: a plain index self-join emits sum_g df(g)^2/2 candidate rows — on
    the sf1 dup-dense corpus that is 138M joined rows collapsing to 250k
    true pairs (measured; the naive shape ran 220s+). Prefix filtering
    indexes only each document's FIRST p = |d| - ceil(t*|d|) + 1 grams in a
    global rarest-first order (df asc, gram asc): if two sets share NO
    prefix gram, every shared gram lies in a suffix smaller than
    ceil(t*|d|) <= |intersection|, a contradiction — so every qualifying
    pair collides in the prefix index, and rare-first ordering makes those
    collisions scarce.

    Plan: one explode for the df table (map-side-combined groupBy on 60-bit
    hashed grams), one per-doc window for the prefix ranks (partitioned by
    doc, never global), a prefix-only self-join, then exact verify via
    per-pair array_intersect on the full hashed-gram arrays — candidate
    pairs ride the same _pair_side broadcast guard as the MinHash verify.

    Returns (id1, id2, jaccard) with jaccard rounded at the engine-parity
    scale — bit-identical to the naive formulation (the SQL oracle replays
    the naive index join; results must hash-match)."""
    from pyspark.sql.window import Window

    g60 = lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
    gram_arr = F.transform(word_ngrams(text_col, n), g60)
    base = docs.select(F.col(id_col).alias("__id"), gram_arr.alias("__gs")).persist()

    grams = base.select("__id", F.explode("__gs").alias("g"))
    dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("__df"))
    # prefix size per doc: |d| - ceil(t*|d|) + 1
    ranked = (
        grams.join(dfreq, "g")
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__id").orderBy(F.col("__df"), F.col("g"))
            ),
        )
        .join(base.select("__id", F.size("__gs").alias("__n")), "__id")
        .filter(F.col("__rn") <= F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")) + 1)
        .select("__id", "g")
    )
    cand = (
        ranked.withColumnRenamed("__id", "id1")
        .join(ranked.withColumnRenamed("__id", "id2"), "g")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    s1 = base.select(F.col("__id").alias("id1"), F.col("__gs").alias("gs1"))
    s2 = base.select(F.col("__id").alias("id2"), F.col("__gs").alias("gs2"))
    jac = jaccard_expr(F.col("gs1"), F.col("gs2"))
    return (
        s1.join(_pair_side(cand, broadcast_pair_limit), "id1")
        .join(s2, "id2")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def fuzzy_edit_distance_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_edit: int = 40,
    shingle_n: int = 5,
    broadcast_pair_limit=PAIR_LIMIT_DEFAULT,
) -> DataFrame:
    """Edit-distance (Levenshtein) similarity join — the fuzzy-dedup face
    for corpora where near-dups differ by character-level edits rather than
    set overlap (OCR noise, template fills, typo farms). All-pairs
    Levenshtein is O(n² · len²): unthinkable at corpus scale. This runs the
    Ed-Join economics with the repo's existing LSH machinery as the
    blocking stage:

    1. BLOCK: MinHash-LSH candidate pairs (banded equi-join — the same
       lossless-for-high-overlap blocking the Jaccard pipeline uses; a pair
       within ``max_edit`` edits of ~500-char documents shares almost all
       shingles, so its band-collision probability is ~1);
    2. LENGTH PRUNE: |len(a) − len(b)| ≤ max_edit is necessary for
       edit_distance ≤ max_edit — a codegen filter before any distance
       work;
    3. VERIFY: Spark's built-in ``levenshtein(l, r, threshold)`` — the
       threshold form ABANDONS a pair the moment its running distance
       exceeds ``max_edit`` (banded DP, O(len·max_edit) per pair instead of
       O(len²)), returning -1 for over-threshold pairs.

    Shuffle budget: the band self-join + one distinct (the blocking), then
    the pair list joins the normalized-text table under the same
    byte-bounded broadcast guard as verify_jaccard — the corpus text is
    never shuffled. Returns (id1, id2, edit_distance)."""
    spread = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    hashed = shingle_hashes(
        shingle_arrays(spread, id_col, text_col, shingle_n), id_col
    )
    sig = minhash_signatures(hashed, id_col)
    cand = lsh_candidate_pairs(sig, id_col)
    # THREE plan branches read the normalized text (the length table and the
    # two pair-attach sides) — without a persist each re-pays the corpus
    # scan, the repartition exchange and the regex normalization (guide §5:
    # cache what is reused and more expensive to recompute; the cache is
    # (id, ~300-char text), MBs at corpus scale). Same lazy-return pattern
    # as minhash_dedup_pairs' persists.
    norm = spread.select(F.col(id_col), normalize(text_col).alias("__nt")).persist()
    pruned = _length_pruned_pairs(
        cand, norm, id_col, max_edit, broadcast_pair_limit
    )
    t1 = norm.select(F.col(id_col).alias("id1"), F.col("__nt").alias("__nt1"))
    t2 = norm.select(F.col(id_col).alias("id2"), F.col("__nt").alias("__nt2"))
    return (
        t1.join(pruned, "id1")
        .join(t2, "id2")
        .withColumn(
            "edit_distance",
            # identical strings short-circuit at O(len) equality — in a
            # dup-dense corpus (exact replicas) that is MOST candidate
            # pairs, and it skips the O(len·max_edit) banded DP for them
            F.when(F.col("__nt1") == F.col("__nt2"), F.lit(0)).otherwise(
                F.levenshtein(F.col("__nt1"), F.col("__nt2"), max_edit)
            ),
        )
        .filter(F.col("edit_distance") >= 0)  # -1 = abandoned over-threshold
        .select("id1", "id2", "edit_distance")
    )


def fuzzy_edit_distance_components(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_edit: int = 40,
    shingle_n: int = 5,
    bucket_cap: int = LSH_BUCKET_CAP,
    broadcast_pair_limit=PAIR_LIMIT_DEFAULT,
) -> DataFrame:
    """Edit-distance dedup with the CAPPED-COMPONENTS routing (VERDICT r09
    item 4): ``fuzzy_edit_distance_pairs`` emits every true pair, so a
    clone-dense corpus pays O(cluster²) pair volume even though each pair
    is cheap. This face composes the blocker with
    ``minhash_dedup_components``' mega-bucket cap and returns (node, label)
    COMPONENTS instead of pairs — the actionable dedup output whose size is
    O(corpus), never O(pairs):

    - band buckets of m <= ``bucket_cap`` go through the exact path:
      pairwise candidates -> length prune -> threshold-banded
      ``levenshtein(l, r, max_edit)`` (identical-pair O(len)
      short-circuit) -> verified edges;
    - buckets of m > ``bucket_cap`` route straight to the component graph
      as m-1 STAR EDGES (member -> bucket-min hub) with no pairwise work —
      a bucket that large means all r row-hashes of one band agree across
      every member, which at character-edit scales is a boilerplate clone
      cluster; the trade is the same one minhash_dedup_components states.

    Total DP work is bounded by cap²·n_buckets + Σ small-bucket m² — LINEAR
    in corpus size for fixed cap regardless of clone-cluster size, where
    the all-pairs face is quadratic in cluster size (SCALING.md measured
    250,598 pairs at sf1). Edges feed the pointer-jumping
    ``connected_components``; keep node == label."""
    spread = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    hashed = shingle_hashes(
        shingle_arrays(spread, id_col, text_col, shingle_n), id_col
    )
    sig = minhash_signatures(hashed, id_col)
    banded = lsh_banded(sig, id_col)
    # bucket stats as WINDOW aggregates: here sig is NOT cached (nothing
    # else reads it), so the old groupBy + join-back re-ran the whole
    # two-UDF shingle→md5→permutation chain on BOTH join inputs — the
    # single most expensive duplication in this face. One window over the
    # same key pays one Exchange and one chain pass (guide §2.4).
    from pyspark.sql.window import Window

    wb = Window.partitionBy("band_id", "band_sig")
    tagged = (
        banded.withColumn("m", F.count(F.lit(1)).over(wb))
        .withColumn("hub", F.min(id_col).over(wb))
        .persist()
    )
    small = tagged.filter(F.col("m") <= bucket_cap)
    star = (
        tagged.filter((F.col("m") > bucket_cap) & (F.col(id_col) != F.col("hub")))
        .select(F.col("hub").alias("id1"), F.col(id_col).alias("id2"))
        .distinct()
    )
    a = small.select(F.col(id_col).alias("id1"), "band_id", "band_sig")
    c = small.select(F.col(id_col).alias("id2"), "band_id", "band_sig")
    cand = (
        a.join(c, ["band_id", "band_sig"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    # three branches read the normalized text — persist like the pairs face
    # (released below: connected_components checkpoints eagerly, so nothing
    # reads through the cache after it returns)
    norm = spread.select(F.col(id_col), normalize(text_col).alias("__nt")).persist()
    pruned = _length_pruned_pairs(
        cand, norm, id_col, max_edit, broadcast_pair_limit
    )
    t1 = norm.select(F.col(id_col).alias("id1"), F.col("__nt").alias("__nt1"))
    t2 = norm.select(F.col(id_col).alias("id2"), F.col("__nt").alias("__nt2"))
    verified = (
        t1.join(pruned, "id1")
        .join(t2, "id2")
        .filter(
            F.when(F.col("__nt1") == F.col("__nt2"), F.lit(0)).otherwise(
                F.levenshtein(F.col("__nt1"), F.col("__nt2"), max_edit)
            )
            >= 0
        )
        .select("id1", "id2")
    )
    edges = verified.unionByName(star)
    out = connected_components(edges)
    # safe to release here: connected_components checkpointed the edges
    # eagerly, so nothing downstream reads through the cache (VERDICT r10
    # item 9 — this persist leaked into long-lived sessions)
    tagged.unpersist()
    norm.unpersist()
    return out
