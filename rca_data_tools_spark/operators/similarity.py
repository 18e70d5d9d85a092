"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB pipeline needs:
- **Brute-force top-k**: broadcast the (small) query set against the corpus
  scan; per-row JVM fold for the dot product; window top-k per query. Exact,
  one pass over the corpus, no shuffle of the corpus itself — the right
  baseline when queries are few.
- **Hyperplane LSH buckets**: deterministic ±1 random hyperplanes (signs
  derived from md5, so any engine reproduces them); bucket = sign bits of the
  projections. Bucketed join + exact re-rank turns O(N·Q) into
  O(N + collisions) — the scale path when queries are many.

Deterministic decimal-sum dot products are used where results feed the
oracle-compared queries; the plain double fold is the fast path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rca_data_tools_spark.functions.vectors import cosine, to_double_array


def seq_dot(a: Column, b: Column) -> Column:
    """Dot product as a sequential left fold over doubles.

    F.aggregate folds left-to-right, and so does DuckDB's list_reduce over
    the same element order — IEEE addition is deterministic, so the two
    engines produce bit-identical sums without any decimal detour (verified
    empirically over the full corpus cross product). Stays in whole-stage
    codegen, ~20x faster than a BigDecimal fold.
    """
    prods = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda s, x: s + x)


def dec_cosine(a: Column, b: Column) -> Column:
    """Deterministic cosine: sequential-fold dot and norms, IEEE sqrt/divide."""
    return seq_dot(a, b) / (F.sqrt(seq_dot(a, a)) * F.sqrt(seq_dot(b, b)))


# Backwards-compatible alias: the deterministic dot IS the sequential fold.
dec_dot = seq_dot


def seq_cosine_udf():
    """Arrow-vectorized cosine with seq_dot's exact IEEE add order.

    zip_with/aggregate folds are interpreted per element; this UDF stacks
    each Arrow batch into (n, dim) float64 matrices and accumulates dot and
    norms with one vectorized multiply-add per dimension — the d-loop runs
    0..dim-1, so every per-row sum is bit-identical to the sequential fold
    (and to the DuckDB list_reduce oracle). Rounding stays OUTSIDE the UDF
    (callers apply F.round on the returned double), so result columns keep
    Spark's exact HALF_UP decimal semantics."""
    import numpy as np
    import pandas as pd

    def _cos(a, b):
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        mat_a = np.stack(a.to_numpy())
        mat_b = np.stack(b.to_numpy())
        n, dim = mat_a.shape
        dot = np.zeros(n)
        na = np.zeros(n)
        nb = np.zeros(n)
        for d in range(dim):  # sequential over d == the SQL fold's add order
            x, y = mat_a[:, d], mat_b[:, d]
            dot += x * y
            na += x * x
            nb += y * y
        return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))

    return F.pandas_udf(_cos, "double")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    k: int = 5,
    deterministic: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (self excluded when ids
    collide). Queries are broadcast; ranking uses round-6 similarity with id
    tie-break so results are reproducible across engines and retries."""
    joined = corpus.crossJoin(F.broadcast(queries)).filter(F.col(q_id_col) != F.col(id_col))
    a, b = to_double_array(q_vec_col), to_double_array(vec_col)
    sim = seq_cosine_udf()(a, b) if deterministic else cosine(a, b)
    scored = joined.select(q_id_col, id_col, F.round(sim, 6).alias("cos_sim"))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplane_projection(vec: Column, plane_id: int, dim: int) -> Column:
    """Deterministic projection onto a ±1 hyperplane: component d is +1 when
    bit 0 of md5('p<plane>|<d>') is set; the projection is a sequential
    double fold, so the sign is reproducible across runs and engines."""
    signs = [
        1 if int(__import__("hashlib").md5(f"p{plane_id}|{d}".encode()).hexdigest()[-1], 16) & 1 else -1
        for d in range(dim)
    ]
    sign_arr = F.array(*[F.lit(s) for s in signs])
    prods = F.zip_with(vec, sign_arr, lambda x, s: x * s)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def lsh_bucket(vec: Column, table: int, n_planes: int, dim: int) -> Column:
    """LSH bucket id for one hash table = integer of projection sign bits.
    Plane ids are salted by table so tables are independent."""
    bucket = F.lit(0)
    for p in range(n_planes):
        bit = F.when(hyperplane_projection(vec, table * 100 + p, dim) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def lsh_buckets(vec: Column, n_tables: int, n_planes: int, dim: int) -> Column:
    """Array of (table, bucket) structs — one entry per hash table. Multiple
    independent tables are the standard recall lever for hyperplane LSH."""
    return F.array(
        *[
            F.struct(F.lit(t).alias("tbl"), lsh_bucket(vec, t, n_planes, dim).alias("bkt"))
            for t in range(n_tables)
        ]
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    k: int = 5,
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates = union over hash tables of bucket
    collisions, then exact re-rank.

    At scale the corpus is scanned once to compute all table buckets (pure
    column math), exploded to (table, bucket) keys and equi-joined against
    the broadcast query buckets — shuffle-free for the corpus, linear in
    collisions. Recall tunes with n_tables (up) and n_planes (down).
    """
    c = corpus.select(
        id_col, vec_col, F.explode(lsh_buckets(to_double_array(vec_col), n_tables, n_planes, dim)).alias("tb")
    ).select(id_col, vec_col, "tb.tbl", "tb.bkt")
    q = queries.select(
        q_id_col, q_vec_col, F.explode(lsh_buckets(to_double_array(q_vec_col), n_tables, n_planes, dim)).alias("tb")
    ).select(q_id_col, q_vec_col, "tb.tbl", "tb.bkt")
    cand = (
        c.join(F.broadcast(q), ["tbl", "bkt"])
        .filter(F.col(q_id_col) != F.col(id_col))
        .select(q_id_col, id_col, q_vec_col, vec_col)
        .distinct()
    )
    sim = seq_cosine_udf()(to_double_array(q_vec_col), to_double_array(vec_col))
    scored = cand.select(q_id_col, id_col, F.round(sim, 6).alias("cos_sim"))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_neardup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.8,
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup PAIRS over the whole corpus — the dedup-family
    member where both sides are big (vs the broadcast-query top-k flavors):
    every vector computes its LSH buckets in one scan, candidates come from a
    bucketed SELF equi-join on (table, bucket), and only collisions pay the
    exact cosine verify against the threshold.

    Scale shape: the corpus shuffles once on the (tbl, bkt) key — uniform by
    construction (md5-derived hyperplane signs) — and the quadratic blowup is
    confined within buckets, ~N²/2^planes per table instead of N²/2. Recall
    tunes with n_tables up / n_planes down, exactly like minhash banding."""
    bucketed = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(lsh_buckets(to_double_array(vec_col), n_tables, n_planes, dim)).alias("tb"),
    ).select(id_col, vec_col, "tb.tbl", "tb.bkt")
    a = bucketed.select(
        F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"), "tbl", "bkt"
    )
    b = bucketed.select(
        F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"), "tbl", "bkt"
    )
    cand = (
        a.join(b, ["tbl", "bkt"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "v1", "v2")
        .distinct()
    )
    sim = F.round(seq_cosine_udf()(to_double_array("v1"), to_double_array("v2")), 6)
    return (
        cand.select("id1", "id2", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


# --- IVF (inverted-file) index ---------------------------------------------

def _strided_seed_ids(
    corpus: DataFrame, id_col: str, n_seeds: int, stride: int
) -> list:
    """Ids of every ``stride``-th corpus vector in id RANK order — not id
    arithmetic, so the selection works on any id space (offset, sparse,
    hashed), not just dense 0-based ids (where the two coincide). The head
    scan is a TopK sort-limit of stride*n_seeds skinny rows; the returned
    list is index-sized (<= n_seeds)."""
    head = [
        r[0]
        for r in corpus.select(id_col).orderBy(id_col).limit(stride * n_seeds).collect()
    ]
    return head[::stride]


def ivf_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, n_lists: int, stride: int
) -> DataFrame:
    """Deterministic coarse-quantizer seeds: every ``stride``-th corpus vector
    in id-rank order, n_lists of them -> (cid, cvec). Production would refine
    these with a few Lloyd iterations (each iteration = one broadcast-assign
    + groupBy mean, both scale-flat); the seed rule is kept closed-form here
    so any engine — including the DuckDB oracle, which replays it as a
    ROW_NUMBER selection — reproduces the index bit-for-bit."""
    seed_ids = _strided_seed_ids(corpus, id_col, n_lists, stride)
    if not seed_ids:
        return corpus.filter(F.lit(False)).select(
            F.lit(0).cast("long").alias("cid"), F.col(vec_col).alias("cvec")
        )
    cid_map = F.create_map(
        *[F.lit(x) for i, sid in enumerate(seed_ids) for x in (sid, i)]
    )
    return corpus.filter(F.col(id_col).isin(seed_ids)).select(
        cid_map[F.col(id_col)].cast("long").alias("cid"),
        F.col(vec_col).alias("cvec"),
    )


def ivf_assign(
    df: DataFrame, centroids, id_col: str, vec_col: str, nprobe: int = 1
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids by cosine
    (round-6 + cid tie-break for cross-engine determinism).

    The quantizer is config-sized, so it collects into plan-time constants and
    the whole assignment is a single corpus scan through an Arrow-vectorized
    pandas UDF: each batch is stacked into an (n, dim) float64 matrix and the
    n_lists dots accumulate with one vectorized multiply-add per dimension.
    Zero shuffles, zero window state; a crossJoin+row_number formulation
    would shuffle every (vector × centroid) row instead.

    Determinism contract: the accumulation loops run d = 0..dim-1, so every
    per-row sum performs the same IEEE adds in the same order as seq_dot's
    sequential fold — dots, norms, and cosines are bit-identical to the SQL
    expression and to the DuckDB list_reduce oracle. Ties on the rounded
    similarity break by ascending cid via a stable argsort, matching the
    (−sim, cid) struct sort of the expression formulation."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    def py_norm(xs: list[float]) -> float:
        # same sequential left fold as seq_dot -> bit-identical to the SQL
        acc = 0.0
        for x in xs:
            acc += float(x) * float(x)
        return math.sqrt(acc)

    rows = centroids if isinstance(centroids, list) else centroids.collect()
    if not rows:
        # Empty quantizer (empty corpus / no seeds): no list to assign to —
        # an empty-but-well-typed assignment, not an error.
        return df.withColumn("cid", F.lit(None).cast("long")).where(F.lit(False))
    cents = sorted(
        (
            (int(r["cid"]), [float(x) for x in r["cvec"]], py_norm([float(x) for x in r["cvec"]]))
            for r in rows
        )
    )
    cids = np.array([c[0] for c in cents], dtype=np.int64)
    cvecs = np.array([c[1] for c in cents], dtype=np.float64)  # (L, dim)
    cnorms = np.array([c[2] for c in cents], dtype=np.float64)
    n_lists, dim = cvecs.shape
    take = min(nprobe, n_lists)

    def _probe(emb):
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack(emb.to_numpy())  # (n, dim) float64
        n = mat.shape[0]
        dots = np.zeros((n, n_lists))
        norm2 = np.zeros(n)
        for d in range(dim):  # sequential over d == the SQL fold's add order
            col = mat[:, d]
            dots += col[:, None] * cvecs[:, d][None, :]
            norm2 += col * col
        sims = np.round(dots / (np.sqrt(norm2)[:, None] * cnorms[None, :]), 6)
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :take]
        picked = cids[idx]  # (n, take), tie-broken by ascending cid
        return pd.Series([r.tolist() for r in picked])

    probe = F.pandas_udf(_probe, ArrayType(LongType()))
    return df.select("*", F.explode(probe(to_double_array(vec_col))).alias("cid"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    k: int = 5,
    n_lists: int = 16,
    stride: int = 29,
    nprobe: int = 4,
    centroids: DataFrame | list | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are bucketed by nearest centroid
    (the inverted lists); each query probes its ``nprobe`` nearest lists and
    re-ranks exactly within them.

    Scale shape: the expensive O(N*Q) cross product of brute force becomes
    O(N * n_lists) assignment (broadcast, one corpus scan) + an equi-join on
    cid that touches only probed lists — candidates shrink by ~n_lists/nprobe.
    Recall tunes with nprobe; n_lists scales with sqrt(N) in the usual IVF
    sizing. The one shuffle is the per-query top-k window over candidates.

    ``centroids`` overrides the quantizer (e.g. Lloyd-refined via
    ivf_refine); default is the closed-form strided seeds."""
    if centroids is None:
        centroids = ivf_centroids(corpus, id_col, vec_col, n_lists, stride)
    cent_rows = centroids if isinstance(centroids, list) else centroids.collect()
    lists = ivf_assign(corpus, cent_rows, id_col, vec_col, nprobe=1)
    probes = ivf_assign(queries, cent_rows, q_id_col, q_vec_col, nprobe=nprobe)
    cand = lists.join(F.broadcast(probes), "cid").filter(F.col(q_id_col) != F.col(id_col))
    sim = F.round(seq_cosine_udf()(to_double_array(q_vec_col), to_double_array(vec_col)), 6)
    scored = cand.select(q_id_col, id_col, sim.alias("cos_sim"))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_dedup(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_lists: int = 16,
    stride: int = 29,
    threshold: float = 0.5,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus embeddings with the deterministic
    IVF coarse quantizer, then mark within-cluster near-duplicates by exact
    pairwise cosine. Keep priority follows the paper: examples FARTHEST from
    their centroid rank first (ascending centroid-cosine, id tie-break), and
    a document is a duplicate iff some higher-priority cluster-mate sits
    within ``threshold`` cosine of it.

    Scale shape: the O(N²) corpus self-join collapses to one broadcast-literal
    assignment pass (zero shuffles, see ivf_assign) + quadratic work confined
    WITHIN clusters — one shuffle on cid, pair volume O(Σ|cluster|²). With
    n_lists ∝ N/target_cluster_size (the paper uses ~N/10⁴ clusters at
    100M-doc scale) that is linear-ish in N, never all-pairs. The pairwise
    cosine runs in the Arrow-vectorized kernel with seq_dot's exact IEEE add
    order, so the full pipeline (assignment, ranking, pair verdicts) replays
    bit-for-bit in a SQL oracle.

    Returns (id, cid, cent_sim, is_dup 0/1) for every corpus row.
    """
    spark = corpus.sparkSession
    cent_rows = ivf_centroids(corpus, id_col, vec_col, n_lists, stride).collect()
    assigned = ivf_assign(corpus, cent_rows, id_col, vec_col, nprobe=1)
    cents = spark.createDataFrame(
        [(int(r["cid"]), [float(x) for x in r["cvec"]]) for r in cent_rows],
        schema="cid long, cvec array<double>",
    )
    cos = seq_cosine_udf()
    cent_sim = F.round(cos(to_double_array(vec_col), F.col("cvec")), 6)
    ranked = (
        assigned.join(F.broadcast(cents), "cid")
        .select(id_col, "cid", to_double_array(vec_col).alias("_vec"), cent_sim.alias("cent_sim"))
        .withColumn(
            "keep_rank",
            F.row_number().over(
                Window.partitionBy("cid").orderBy(F.col("cent_sim").asc(), F.col(id_col))
            ),
        )
        # The ranked assignment feeds three consumers (pair left side, pair
        # right side, final output join); without a checkpoint Catalyst
        # re-runs the scan + Arrow assignment pass for each. Lazy local
        # checkpoint -> one materialization, reused.
        .localCheckpoint(eager=False)
    )
    prior = ranked.select(
        F.col("cid").alias("_p_cid"),
        F.col("_vec").alias("_p_vec"),
        F.col("keep_rank").alias("_p_rank"),
    )
    pair_sim = F.round(cos(F.col("_vec"), F.col("_p_vec")), 6)
    dropped = (
        ranked.join(
            prior,
            (F.col("cid") == F.col("_p_cid")) & (F.col("_p_rank") < F.col("keep_rank")),
        )
        .select(F.col(id_col), pair_sim.alias("pair_sim"))
        .filter(F.col("pair_sim") >= threshold)
        .select(id_col)
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return ranked.join(dropped, id_col, "left").select(
        id_col,
        "cid",
        "cent_sim",
        F.coalesce(F.col("_dup"), F.lit(0)).alias("is_dup"),
    )


def ivf_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    iters: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Lloyd refinement of the IVF quantizer (spherical k-means update):
    assign every vector to its nearest centroid by cosine, replace each
    centroid with its list's element-wise mean. The mean maximizes average
    cosine to the list (after the implicit normalization inside cosine), so
    the quantization objective is non-decreasing per iteration.

    Scale shape per iteration: one broadcast-literal assignment pass (zero
    shuffles, see ivf_assign) + one partial-aggregated groupBy on cid —
    64 avg columns, map-side combined. Empty lists keep their old centroid.

    The list means use the decimal-exact ``davg`` (round -> DECIMAL sum ->
    double), not float ``avg``: partition-order-insensitive (the same
    centroids on any cluster layout) and bit-replayable by the SQL oracle
    of ann_ivf_refined_topk."""
    from rca_data_tools_spark.functions.numeric import davg

    cents = centroids
    for _ in range(iters):
        assigned = ivf_assign(corpus, cents, id_col, vec_col, nprobe=1)
        means = assigned.groupBy("cid").agg(
            *[davg(F.element_at(to_double_array(vec_col), d + 1)).alias(f"m{d}") for d in range(dim)]
        )
        new = means.select(
            "cid", F.array(*[F.col(f"m{d}") for d in range(dim)]).alias("cvec")
        )
        old = cents if not isinstance(cents, list) else None
        if old is not None:
            kept = old.join(new.select("cid"), "cid", "left_anti")
            cents = new.unionByName(kept)
        else:
            cents = new
    return cents


# ---------------------------------------------------------------------------
# Product quantization (Jegou et al. 2011, "Product Quantization for Nearest
# Neighbor Search"): split the d-dim space into M subspaces, quantize each
# subvector against a K-codeword codebook, represent every corpus vector as
# M small codes. Approximate (asymmetric, ADC) distances then come from M
# table lookups instead of d multiplies — and the encoded corpus is M bytes
# per vector instead of 8d, the memory lever that keeps billion-vector
# indexes in RAM at 100 TB corpus scale.

PQ_M = 4        # subspaces
PQ_K = 16       # codewords per subspace
PQ_STRIDE = 23  # closed-form seed stride (same contract as ivf_centroids)


def pq_codebook(
    corpus: DataFrame, id_col: str, vec_col: str,
    dim: int = 64, m: int = PQ_M, k: int = PQ_K, stride: int = PQ_STRIDE,
) -> list:
    """Deterministic codebook rows (m, j, cvec): codeword j of subspace mi is
    the mi-th subvector of the corpus vector at id-RANK j*stride (rank, not
    id arithmetic — works on any id space; see _strided_seed_ids). Closed-
    form seeds keep the index bit-reproducible in any engine (the
    ivf_centroids stance); production would refine each subspace codebook
    with Lloyd iterations, which are scale-flat (broadcast assign + groupBy
    mean per subspace). Config-sized (m*k rows) -> collected into plan-time
    constants."""
    sub = dim // m
    seed_ids = _strided_seed_ids(corpus, id_col, k, stride)
    if not seed_ids:
        return []
    j_map = F.create_map(
        *[F.lit(x) for j, sid in enumerate(seed_ids) for x in (sid, j)]
    )
    seeds = corpus.filter(F.col(id_col).isin(seed_ids)).select(
        j_map[F.col(id_col)].cast("long").alias("j"),
        to_double_array(vec_col).alias("v"),
    )
    rows = seeds.select(
        "j",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(mi).alias("m"),
                        F.slice("v", mi * sub + 1, sub).alias("cvec"),
                    )
                    for mi in range(m)
                ]
            )
        ).alias("s"),
    ).select("j", "s.m", "s.cvec")
    return rows.collect()


def _pq_arrays(cb_rows: list, m: int, k: int):
    import numpy as np

    sub = len(cb_rows[0]["cvec"])
    # a short corpus yields fewer than k seed codewords: size the codebook
    # to what exists, never zero-pad (a zero codeword could win an argmin
    # the oracle, which only scores existing rows, would never score)
    k_eff = min(k, max(int(r["j"]) for r in cb_rows) + 1)
    C = np.zeros((m, k_eff, sub))
    for r in cb_rows:
        C[int(r["m"]), int(r["j"])] = [float(x) for x in r["cvec"]]
    return C, sub


def pq_encode(
    corpus: DataFrame, cb_rows: list, id_col: str, vec_col: str,
    m: int = PQ_M, k: int = PQ_K, keep: "list[str] | None" = None,
) -> DataFrame:
    """(id, [keep...,] codes: array<long>) — per subspace, the argmin
    squared-L2 codeword (round-6 + lowest-code tie-break, the ivf_assign
    determinism contract). One corpus scan through an Arrow kernel, zero
    shuffles; the d-loop accumulates in subspace-dimension order so every
    distance is the same IEEE fold the SQL oracle computes. ``keep`` rides
    extra columns through (e.g. the IVF list id for the composed index)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    C, sub = _pq_arrays(cb_rows, m, k)
    k_eff = C.shape[1]

    def _enc(emb):
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack(emb.to_numpy())  # (n, dim)
        n = mat.shape[0]
        codes = np.zeros((n, m), dtype=np.int64)
        for mi in range(m):
            acc = np.zeros((n, k_eff))
            for d in range(sub):  # sequential == the SQL fold's add order
                diff = mat[:, mi * sub + d][:, None] - C[mi, :, d][None, :]
                acc += diff * diff
            codes[:, mi] = np.argmin(np.round(acc, 6), axis=1)  # first min = lowest j
        return pd.Series([r.tolist() for r in codes])

    enc = F.pandas_udf(_enc, ArrayType(LongType()))
    return corpus.select(
        F.col(id_col),
        *[F.col(c) for c in (keep or [])],
        enc(to_double_array(vec_col)).alias("codes"),
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    k: int = 5,
    n_candidates: int = 32,
    m: int = PQ_M,
    n_codes: int = PQ_K,
) -> DataFrame:
    """PQ/ADC approximate top-k with exact re-rank: encode the corpus once
    (M codes per vector), build each query's M x K lookup table of
    subspace distances, score every corpus vector with M table lookups,
    keep the ``n_candidates`` best per query by approximate distance, and
    re-rank those exactly by cosine.

    Scale shape: the corpus is scanned twice (encode; ADC score) with ZERO
    shuffles — queries and lookup tables are plan-time constants, approx
    scores fan out only Q skinny rows per corpus vector, and the exact
    re-rank touches n_candidates*Q rows. The encoded corpus (M bytes/vec)
    is what a production index persists; distances come from lookups, not
    d-dim arithmetic — the PQ memory/computation trade."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType

    cb_rows = pq_codebook(corpus, id_col, vec_col, m=m, k=n_codes)
    q_rows = sorted(
        ((int(r[q_id_col]), [float(x) for x in r[q_vec_col]]) for r in queries.collect())
    )
    if not cb_rows or not q_rows:
        # Empty corpus or no queries: no index to build — an empty but
        # well-typed result, not an error (the empty-slice contract).
        return corpus.sparkSession.createDataFrame(
            [],
            f"{q_id_col} long, {id_col} long, approx_dist double, "
            "cos_sim double, rank int",
        )
    C, sub = _pq_arrays(cb_rows, m, n_codes)
    k_eff = C.shape[1]
    q_ids = [q[0] for q in q_rows]
    Q = np.array([q[1] for q in q_rows])  # (nq, dim)
    nq = Q.shape[0]
    lut = np.zeros((nq, m, k_eff))
    for mi in range(m):
        acc = np.zeros((nq, k_eff))
        for d in range(sub):
            diff = Q[:, mi * sub + d][:, None] - C[mi, :, d][None, :]
            acc += diff * diff
        lut[:, mi, :] = np.round(acc, 6)

    def _score(codes):
        if len(codes) == 0:
            return pd.Series([], dtype=object)
        cd = np.stack(codes.to_numpy())  # (n, m) int
        n = cd.shape[0]
        approx = np.zeros((n, nq))
        for mi in range(m):  # m-order accumulation == the SQL d0+d1+d2+d3
            approx += lut[:, mi, :][:, cd[:, mi]].T
        return pd.Series([r.tolist() for r in approx])

    score = F.pandas_udf(_score, ArrayType(DoubleType()))
    enc = pq_encode(corpus, cb_rows, id_col, vec_col, m=m, k=n_codes)
    scored = enc.select(
        F.col(id_col), F.posexplode(score("codes")).alias("qi", "approx_dist")
    ).select(
        F.element_at(
            F.array(*[F.lit(q) for q in q_ids]), F.col("qi") + 1
        ).alias(q_id_col),
        F.col(id_col),
        F.col("approx_dist"),
    ).filter(F.col(q_id_col) != F.col(id_col))
    w_adc = Window.partitionBy(q_id_col).orderBy(F.col("approx_dist"), F.col(id_col))
    cand = scored.withColumn("adc_rank", F.row_number().over(w_adc)).filter(
        F.col("adc_rank") <= n_candidates
    )
    exact = corpus.join(
        F.broadcast(cand.select(q_id_col, id_col, "approx_dist")), id_col
    ).join(F.broadcast(queries), q_id_col)
    sim = F.round(seq_cosine_udf()(to_double_array(q_vec_col), to_double_array(vec_col)), 6)
    rr = exact.select(q_id_col, id_col, "approx_dist", sim.alias("cos_sim"))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return rr.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def pq_refine(
    corpus: DataFrame,
    cb_rows: list,
    id_col: str,
    vec_col: str,
    iters: int = 2,
    m: int = PQ_M,
    k: int = PQ_K,
) -> list:
    """Per-subspace Lloyd refinement of a PQ codebook (the k-means step the
    closed-form seeds defer; same stance as ivf_refine): each iteration
    encodes the corpus once (Arrow scan, zero shuffles) and replaces every
    codeword with the element-wise mean of its assigned subvectors — one
    map-side-combinable groupBy of m*k cells; codewords that attract no
    vectors keep their previous value. Scale-flat per iteration: corpus
    scan + a dim-sized (m*k x sub) aggregate."""
    sub = len(cb_rows[0]["cvec"])
    for _ in range(iters):
        enc = pq_encode(corpus, cb_rows, id_col, vec_col, m=m, k=k)
        joined = corpus.join(enc, id_col).select(
            to_double_array(vec_col).alias("v"), "codes"
        )
        parts = joined.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(mi).alias("m"),
                            F.element_at("codes", mi + 1).alias("j"),
                            F.slice("v", mi * sub + 1, sub).alias("sv"),
                        )
                        for mi in range(m)
                    ]
                )
            ).alias("p")
        ).select("p.m", "p.j", "p.sv")
        new_rows = parts.groupBy("m", "j").agg(
            F.array(
                *[F.avg(F.element_at("sv", d + 1)) for d in range(sub)]
            ).alias("cvec")
        ).collect()
        got = {(int(r["m"]), int(r["j"])) for r in new_rows}
        cb_rows = new_rows + [
            r for r in cb_rows if (int(r["m"]), int(r["j"])) not in got
        ]
    return cb_rows


def ivf_pq_build(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_lists: int = 16,
    stride: int = 29,
    m: int = PQ_M,
    n_codes: int = PQ_K,
):
    """Build the persistable IVFPQ index: (cent_rows, cb_rows, enc) —
    coarse centroids and PQ codebook as config-sized row lists (KBs: what a
    format stores as JSON/manifest metadata), and the encoded corpus
    ``(id, cid, codes)`` DataFrame — (8 + 8 + M) bytes per vector, the
    table a production store persists and serves search from without ever
    rescanning the raw vectors. One shared corpus scan builds it."""
    cent_rows = ivf_centroids(corpus, id_col, vec_col, n_lists, stride).collect()
    cb_rows = pq_codebook(corpus, id_col, vec_col, m=m, k=n_codes)
    if not cb_rows:
        return cent_rows, cb_rows, None
    lists = ivf_assign(corpus, cent_rows, id_col, vec_col, nprobe=1)
    enc = pq_encode(lists, cb_rows, id_col, vec_col, m=m, k=n_codes, keep=["cid"])
    return cent_rows, cb_rows, enc


def ivf_pq_search(
    corpus: DataFrame,
    queries: DataFrame,
    cent_rows: list,
    cb_rows: list,
    enc: DataFrame,
    id_col: str,
    vec_col: str,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    k: int = 5,
    nprobe: int = 4,
    n_candidates: int = 32,
    m: int = PQ_M,
    n_codes: int = PQ_K,
) -> DataFrame:
    """Search a (possibly persisted-and-reloaded) IVFPQ index: probe
    ``nprobe`` lists per query, ADC-score ONLY those lists' codes via a
    plan-time literal lookup table (M element_at's + M-1 adds per row,
    pure codegen), exact cosine re-rank of the top ``n_candidates``.
    ``corpus`` is touched only for the re-rank join (n_candidates * Q
    rows by id)."""
    import numpy as np

    q_rows = sorted(
        ((int(r[q_id_col]), [float(x) for x in r[q_vec_col]]) for r in queries.collect())
    )
    if not cb_rows or not q_rows or enc is None:
        return corpus.sparkSession.createDataFrame(
            [],
            f"{q_id_col} long, {id_col} long, approx_dist double, "
            "cos_sim double, rank int",
        )
    probes = ivf_assign(queries, cent_rows, q_id_col, q_vec_col, nprobe=nprobe)
    C, sub = _pq_arrays(cb_rows, m, n_codes)
    k_eff = C.shape[1]
    q_ids = [qr[0] for qr in q_rows]
    Q = np.array([qr[1] for qr in q_rows])
    nq = Q.shape[0]
    lut = np.zeros((nq, m, k_eff))
    for mi in range(m):
        acc = np.zeros((nq, k_eff))
        for d in range(sub):
            diff = Q[:, mi * sub + d][:, None] - C[mi, :, d][None, :]
            acc += diff * diff
        lut[:, mi, :] = np.round(acc, 6)

    # the LUT as a plan-time literal: lut_lit[qidx][mi][code] — ADC becomes
    # M array lookups + M-1 adds in whole-stage codegen, no Python. Built as
    # ONE SQL string (repr round-trips doubles exactly; the D suffix keeps
    # Spark from parsing the literal as DECIMAL): the nested-F.array
    # formulation paid nq*m*k_eff py4j round-trips of pure driver time
    # (~0.8s for a 10x8x16 LUT — guide §5, driver discipline)
    def _dlit(v: float) -> str:
        return repr(float(v)) + "D"

    lut_lit = F.expr(
        "array(" + ",".join(
            "array(" + ",".join(
                "array(" + ",".join(
                    _dlit(lut[qi, mi, j]) for j in range(k_eff)
                ) + ")"
                for mi in range(m)
            ) + ")"
            for qi in range(nq)
        ) + ")"
    )
    qidx = F.create_map(
        *[F.lit(x) for i, qid in enumerate(q_ids) for x in (qid, i)]
    )[F.col(q_id_col)].cast("int")
    per_q = lut_lit[qidx]
    approx = None
    for mi in range(m):
        term = per_q[F.lit(mi)][F.element_at("codes", mi + 1).cast("int")]
        approx = term if approx is None else approx + term
    scored = (
        enc.join(F.broadcast(probes.select(q_id_col, "cid")), "cid")
        .filter(F.col(q_id_col) != F.col(id_col))
        .select(q_id_col, id_col, approx.alias("approx_dist"))
    )
    w_adc = Window.partitionBy(q_id_col).orderBy(F.col("approx_dist"), F.col(id_col))
    cand = scored.withColumn("adc_rank", F.row_number().over(w_adc)).filter(
        F.col("adc_rank") <= n_candidates
    )
    exact = corpus.join(
        F.broadcast(cand.select(q_id_col, id_col, "approx_dist")), id_col
    ).join(F.broadcast(queries), q_id_col)
    sim = F.round(seq_cosine_udf()(to_double_array(q_vec_col), to_double_array(vec_col)), 6)
    rr = exact.select(q_id_col, id_col, "approx_dist", sim.alias("cos_sim"))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return rr.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    k: int = 5,
    n_lists: int = 16,
    stride: int = 29,
    nprobe: int = 4,
    n_candidates: int = 32,
    m: int = PQ_M,
    n_codes: int = PQ_K,
) -> DataFrame:
    """IVFPQ — the production vector-index composition (Jegou et al. 2011,
    the FAISS workhorse): IVF lists prune WHERE to look, product
    quantization compresses WHAT is scanned there. Corpus vectors carry
    (list id, M-byte PQ code); each query probes its nprobe lists and
    ADC-scores ONLY those lists' codes via its M x K lookup table — probe
    volume is corpus x nprobe/n_lists AND each probe touches M bytes
    instead of the d-dim vector. Top ``n_candidates`` by approximate
    distance re-rank exactly by cosine. Build + search in one call;
    ivf_pq_build / ivf_pq_search are the separable halves a production
    store runs at different times (build once, persist, search many —
    queries/vecq.py ann_index_persisted drives that lifecycle).

    Scale shape: assignment + encoding are one shared corpus scan (Arrow
    kernel, broadcast quantizer/codebook); ADC scoring is pure codegen —
    the lookup table is a plan-time literal array, each row costs M
    element_at's and M-1 adds; the only shuffles are the two per-query
    top-k windows. At 100 TB the persisted index is (cid, 4 bytes)/vector.

    Determinism: lookup-table entries round to 6 (like every distance in
    the family) and sum in fixed subspace order, so approx_dist is the
    same IEEE fold as the oracle's l0+l1+l2+l3."""
    cent_rows, cb_rows, enc = ivf_pq_build(
        corpus, id_col, vec_col, n_lists=n_lists, stride=stride, m=m, n_codes=n_codes
    )
    return ivf_pq_search(
        corpus, queries, cent_rows, cb_rows, enc, id_col, vec_col,
        q_id_col=q_id_col, q_vec_col=q_vec_col, k=k, nprobe=nprobe,
        n_candidates=n_candidates, m=m, n_codes=n_codes,
    )


def ivf_pq_batch_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    k: int = 5,
    n_lists: int = 16,
    stride: int = 29,
    nprobe: int = 4,
    n_candidates: int = 32,
    m: int = PQ_M,
    n_codes: int = PQ_K,
) -> DataFrame:
    """IVFPQ for QUERY BATCHES (VERDICT r08 item 8): same index, same
    semantics, same results as ivf_pq_topk, but the per-query ADC lookup
    tables are a broadcast-joined DATAFRAME instead of plan-time literals,
    so the physical plan is QUERY-COUNT-INDEPENDENT — a million-query batch
    join (corpus×corpus semantic dedup, offline re-ranking) compiles the
    same plan as ten queries. ivf_pq_search's literal LUT stays the right
    call for serving-sized batches (zero joins, pure codegen); this is the
    offline face.

    Pipeline — nothing query-sized ever touches the driver or the plan:
    1. build the index (ivf_pq_build: one corpus scan; quantizer+codebook
       are config-sized constants, the ONLY driver-held state);
    2. probes: each query's nprobe nearest lists via the same Arrow kernel
       corpus assignment uses (ivf_assign over the queries DataFrame);
    3. LUTs: one Arrow kernel over the queries DataFrame emits each
       query's M×K subspace-distance table as a nested array column
       (entries rounded to 6 like every distance in the family);
    4. ADC: encoded corpus ⋈ probes on the list id (the IVF confinement —
       probe volume ∝ nprobe/n_lists), ⋈ LUTs on the query id, then the
       score is a pure-JVM fold: zip_with(codes, lut, element_at) summed
       left-to-right — the same IEEE add order as the literal path and
       the SQL oracle's l0+l1+l2+l3;
    5. top-n_candidates per query by approximate distance, exact cosine
       re-rank to top-k.

    Scale shape: both joins are unhinted — AQE broadcasts batch-sized
    probe/LUT sides and falls back to shuffled joins for a corpus-sized
    query batch instead of OOMing a forced build side. The two per-query
    top-k windows are the only other shuffles."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType

    cent_rows, cb_rows, enc = ivf_pq_build(
        corpus, id_col, vec_col, n_lists=n_lists, stride=stride, m=m, n_codes=n_codes
    )
    if not cb_rows or enc is None:
        return corpus.sparkSession.createDataFrame(
            [],
            f"{q_id_col} long, {id_col} long, approx_dist double, "
            "cos_sim double, rank int",
        )
    probes = ivf_assign(
        queries, cent_rows, q_id_col, q_vec_col, nprobe=nprobe
    ).select(q_id_col, "cid")
    C, sub = _pq_arrays(cb_rows, m, n_codes)
    k_eff = C.shape[1]

    def _lut(emb):
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        Q = np.stack(emb.to_numpy())  # (n, dim)
        nq = Q.shape[0]
        out = np.zeros((nq, m, k_eff))
        for mi in range(m):
            acc = np.zeros((nq, k_eff))
            for d in range(sub):  # sequential == the SQL fold's add order
                diff = Q[:, mi * sub + d][:, None] - C[mi, :, d][None, :]
                acc += diff * diff
            out[:, mi, :] = np.round(acc, 6)
        return pd.Series([[row.tolist() for row in q] for q in out])

    lut_udf = F.pandas_udf(_lut, ArrayType(ArrayType(DoubleType())))
    luts = queries.select(
        F.col(q_id_col), lut_udf(to_double_array(q_vec_col)).alias("__lut")
    )
    # ADC in whole-stage codegen: M element_at's via zip_with, left fold —
    # (0.0 + t0) + t1 + ... is bit-identical to the literal path's
    # t0 + t1 + ... for the non-negative rounded distances involved
    terms = F.zip_with(
        "codes", "__lut",
        lambda c, row: F.element_at(row, c.cast("int") + F.lit(1)),
    )
    approx = F.aggregate(terms, F.lit(0.0), lambda s, x: s + x)
    scored = (
        enc.join(probes, "cid")
        .join(luts, q_id_col)
        .filter(F.col(q_id_col) != F.col(id_col))
        .select(q_id_col, id_col, approx.alias("approx_dist"))
    )
    w_adc = Window.partitionBy(q_id_col).orderBy(F.col("approx_dist"), F.col(id_col))
    cand = scored.withColumn("adc_rank", F.row_number().over(w_adc)).filter(
        F.col("adc_rank") <= n_candidates
    ).select(q_id_col, id_col, "approx_dist")
    exact = corpus.join(cand, id_col).join(queries, q_id_col)
    sim = F.round(seq_cosine_udf()(to_double_array(q_vec_col), to_double_array(vec_col)), 6)
    rr = exact.select(q_id_col, id_col, "approx_dist", sim.alias("cos_sim"))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return rr.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
