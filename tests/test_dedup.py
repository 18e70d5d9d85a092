"""Checks for the oracle-less dedup/similarity paths: SimHash pair generation
against a pure-Python reimplementation, MinHash recall against exact Jaccard,
and LSH top-k recall against brute force."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from rca_data_tools_spark.operators.dedup import simhash_fingerprints, simhash_neardup_pairs
from rca_data_tools_spark.sources.readers import load_table
from tests.conftest import SF_CORRECTNESS


def _py_simhash(text: str) -> tuple[int, int]:
    norm = re.sub(r"\s+", " ", text.strip().lower())
    toks = sorted({t for t in norm.split(" ") if t})
    votes_hi, votes_lo = [0] * 32, [0] * 32
    for t in toks:
        h = hashlib.md5(t.encode()).hexdigest()
        hi, lo = int(h[:8], 16), int(h[8:16], 16)
        for j in range(32):
            votes_hi[j] += 1 if (hi >> j) & 1 else -1
            votes_lo[j] += 1 if (lo >> j) & 1 else -1
    fp_hi = sum(1 << j for j in range(32) if votes_hi[j] > 0)
    fp_lo = sum(1 << j for j in range(32) if votes_lo[j] > 0)
    return fp_hi, fp_lo


def test_simhash_matches_python(spark):
    d = load_table(spark, SF_CORRECTNESS, "documents").limit(50)
    got = {r.doc_id: (r.fp_hi, r.fp_lo) for r in simhash_fingerprints(d, "doc_id", "text").collect()}
    src = {r.doc_id: r.text for r in d.collect()}
    for doc_id, text in src.items():
        assert got[doc_id] == _py_simhash(text), f"doc {doc_id}"


def test_simhash_pairs_complete_within_radius(spark):
    """Pigeonhole: every pair with hamming <= 3 MUST be found by 4-block
    candidate generation — verify against the exhaustive pair set."""
    d = load_table(spark, SF_CORRECTNESS, "documents").limit(120)
    fp = simhash_fingerprints(d, "doc_id", "text")
    got = {(r.id1, r.id2) for r in simhash_neardup_pairs(fp, "doc_id", max_hamming=3).collect()}
    fps = {r.doc_id: (r.fp_hi, r.fp_lo) for r in fp.collect()}
    ids = sorted(fps)
    expect = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(fps[a][0] ^ fps[b][0]).count("1") + bin(fps[a][1] ^ fps[b][1]).count("1")
            if ham <= 3:
                expect.add((a, b))
    assert got == expect


def test_minhash_recall_of_planted_dups(spark):
    """Every pair with true Jaccard >= 0.9 should surface (16 hashes/4 bands:
    band-collision prob at j=0.9 is 1-(1-0.9^4)^4 ≈ 0.987 per band set — with
    the planted 25 pairs we verify exact recall empirically)."""
    from rca_data_tools_spark.operators.dedup import minhash_dedup_pairs, shingle_table

    d = load_table(spark, SF_CORRECTNESS, "documents")
    got = {(r.id1, r.id2): r.jaccard for r in minhash_dedup_pairs(d, "doc_id", "text", 0.7).collect()}
    # exhaustive truth from the shingle table
    sh = shingle_table(d, "doc_id", "text")
    a = sh.select(F.col("doc_id").alias("id1"), "sh")
    b = sh.select(F.col("doc_id").alias("id2"), "sh")
    inter = a.join(b, "sh").filter("id1 < id2").groupBy("id1", "id2").count()
    sizes = {r.doc_id: r.n for r in sh.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    truth = {
        (r.id1, r.id2)
        for r in inter.collect()
        if r["count"] / (sizes[r.id1] + sizes[r.id2] - r["count"]) >= 0.9
    }
    assert truth, "corpus should contain planted near-dups"
    missed = truth - set(got)
    assert not missed, f"missed planted pairs: {missed}"


def test_lsh_topk_recall(spark):
    """Bucketed ANN should recover a reasonable share of brute-force top-5
    (single 6-plane table on a diffuse corpus — just assert sane structure
    and >0 overlap)."""
    from rca_data_tools_spark.operators.similarity import brute_force_topk, lsh_topk

    e = load_table(spark, SF_CORRECTNESS, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    exact = {(r.q_id, r.vec_id) for r in brute_force_topk(e, q, "vec_id", "embedding", k=5).collect()}
    approx = {(r.q_id, r.vec_id) for r in lsh_topk(e, q, "vec_id", "embedding", k=5).collect()}
    assert len(exact) == 50
    assert approx, "lsh produced no candidates"
    for qid, nid in approx:
        assert qid != nid
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"recall too low: {recall}"


def test_ivf_topk_recall_and_shape(spark):
    """IVF candidates come only from probed lists; recall against brute force
    is data-dependent (random vectors cluster poorly) but must stay well
    above the random-candidate floor, and every query gets exactly k rows."""
    from rca_data_tools_spark.queries import QUERIES
    from tests.conftest import SF_CORRECTNESS

    ivf = QUERIES["ann_ivf_topk"](spark, SF_CORRECTNESS).toPandas()
    bf = QUERIES["ann_topk_cosine"](spark, SF_CORRECTNESS).toPandas()
    assert ivf.groupby("q_id").size().eq(5).all()
    recall = len(set(zip(ivf.q_id, ivf.vec_id)) & set(zip(bf.q_id, bf.vec_id))) / len(bf)
    assert recall >= 0.3, recall


def test_ivf_refine_improves_quantization(spark):
    """Spherical-k-means property: average cosine similarity of vectors to
    their assigned centroid must not decrease after Lloyd refinement."""
    from pyspark.sql import functions as F

    from rca_data_tools_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        ivf_refine,
    )
    from rca_data_tools_spark.sources.readers import load_table
    from tests.conftest import SF_CORRECTNESS

    e = load_table(spark, SF_CORRECTNESS, "embeddings")
    cents0 = ivf_centroids(e, "vec_id", "embedding", n_lists=16, stride=29)

    def objective(cents):
        rows = cents.collect()
        cmap = {r["cid"]: [float(x) for x in r["cvec"]] for r in rows}
        a = ivf_assign(e, rows, "vec_id", "embedding", nprobe=1)
        pdf = a.select("vec_id", "cid", "embedding").toPandas()
        import numpy as np

        total = 0.0
        for _, r in pdf.iterrows():
            v = np.asarray(r.embedding, dtype=float)
            c = np.asarray(cmap[r.cid], dtype=float)
            total += float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c)))
        return total / len(pdf)

    before = objective(cents0)
    cents1 = ivf_refine(e, cents0, "vec_id", "embedding", iters=2)
    after = objective(cents1)
    assert after >= before - 1e-9, (before, after)
    assert after > before + 1e-4  # random seeds genuinely improve


def test_connected_components_shapes(spark):
    """Chain (worst-case diameter), clique, singleton pair, and determinism."""
    from rca_data_tools_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 60)]  # 60-node chain
        + [(100, 101), (100, 102), (101, 102)]  # triangle
        + [(200, 201)],  # isolated pair
        "id1 long, id2 long",
    )
    lab = {r["node"]: r["label"] for r in connected_components(pairs).collect()}
    assert all(lab[i] == 1 for i in range(1, 61))
    assert lab[100] == lab[101] == lab[102] == 100
    assert lab[200] == lab[201] == 200
    # every node labeled, label is a member of the component
    assert set(lab) == set(range(1, 61)) | {100, 101, 102, 200, 201}


def test_connected_components_matches_networkx_style_union_find(spark):
    """Randomized graph vs a Python union-find ground truth."""
    import random

    from rca_data_tools_spark.operators.dedup import connected_components

    rng = random.Random(7)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    parent = list(range(300))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {}
    for a, b in edges:
        for n in (a, b):
            truth[n] = find(n)

    pairs = spark.createDataFrame(edges, "id1 long, id2 long")
    lab = {r["node"]: r["label"] for r in connected_components(pairs).collect()}
    assert lab == truth


def test_embedding_neardup_pairs_recall(spark):
    """Self-join LSH near-dup pairs: every reported pair must be a true
    threshold pair (verify is exact), and recall of the brute-force pair set
    should be substantial with 8 tables x 4 planes."""
    from rca_data_tools_spark.operators.similarity import dec_cosine, lsh_neardup_pairs
    from rca_data_tools_spark.functions.vectors import to_double_array

    e = load_table(spark, SF_CORRECTNESS, "embeddings")
    a = e.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("v1"))
    b = e.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("v2"))
    sim = F.round(dec_cosine(to_double_array("v1"), to_double_array("v2")), 6)
    exact = {
        (r.id1, r.id2)
        for r in a.crossJoin(b)
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.4)
        .collect()
    }
    approx = {
        (r.id1, r.id2)
        for r in lsh_neardup_pairs(e, "vec_id", "embedding", threshold=0.4).collect()
    }
    assert approx <= exact, "LSH reported a non-threshold pair"
    assert len(exact) > 0
    recall = len(approx) / len(exact)
    assert recall >= 0.5, f"recall too low: {recall}"


def test_semantic_dedup_keep_rule(spark):
    """SemDeDup invariants: every cluster keeps its rank-1 (farthest-from-
    centroid) member; a doc is dropped iff some higher-priority cluster-mate
    is within the cosine threshold; and the kept set re-checked pairwise
    within each cluster contains no pair above the threshold among mutually
    comparable priorities (greedy-prefix property)."""
    from rca_data_tools_spark.functions.vectors import to_double_array
    from rca_data_tools_spark.operators.similarity import dec_cosine, semantic_dedup

    e = load_table(spark, SF_CORRECTNESS, "embeddings")
    out = semantic_dedup(e, "vec_id", "embedding", n_lists=16, stride=29, threshold=0.3)
    rows = out.collect()
    assert len(rows) == e.count()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cid, []).append(r)
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in e.collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return round(dot / (na * nb), 6)

    n_dups = 0
    for cid, members in by_cluster.items():
        members.sort(key=lambda r: (r.cent_sim, r.vec_id))
        assert members[0].is_dup == 0, f"cluster {cid} dropped its rank-1 member"
        for i, r in enumerate(members):
            expect_dup = any(
                cos(vecs[m.vec_id], vecs[r.vec_id]) >= 0.3 for m in members[:i]
            )
            assert bool(r.is_dup) == expect_dup, (cid, r.vec_id)
            n_dups += r.is_dup
    assert n_dups > 0, "threshold produced no duplicates at sf0.01 — weak test"


def test_megabucket_cap_bounds_pairs_and_preserves_components(spark):
    """A pathological boilerplate cluster (40 near-identical docs) must NOT
    cost O(m²) pairwise verification under the bucket cap, and the final
    component labels — hence the canonical keep/drop decisions — must be
    identical to the uncapped pipeline's."""
    from rca_data_tools_spark.operators.dedup import (
        lsh_banded,
        minhash_dedup_components,
        minhash_signatures,
        shingle_arrays,
        shingle_hashes,
    )

    base = " ".join(f"boilerplate sentence {i} repeated across every clone" for i in range(12))
    rows = [(i, base + f" tail{i % 3}") for i in range(40)]  # clone cluster
    rows += [(100 + i, f"unique document number {i} " * 15 + f"suffix {i}") for i in range(10)]
    rows += [(300, "a genuine near duplicate pair first version " * 10),
             (301, "a genuine near duplicate pair first versionX " * 10)]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    cap = 8
    capped = {r.node: r.label for r in minhash_dedup_components(d, "doc_id", "text", bucket_cap=cap).collect()}
    uncapped = {r.node: r.label for r in minhash_dedup_components(d, "doc_id", "text", bucket_cap=10**9).collect()}
    assert capped == uncapped
    assert capped, "corpus should produce components"
    # the clone cluster collapsed to one component rooted at its min id
    assert all(capped.get(i) == 0 for i in range(40))

    # pair-work bound: under the cap, no candidate pair may come from a
    # bucket above the cap, so the clone cluster's 780 pairs never form
    hashed = shingle_hashes(shingle_arrays(d, "doc_id", "text", 5), "doc_id")
    sig = minhash_signatures(hashed, "doc_id")
    banded = lsh_banded(sig, "doc_id")
    sizes = banded.groupBy("band_id", "band_sig").count()
    tagged = banded.join(sizes, ["band_id", "band_sig"])
    small = tagged.filter(F.col("count") <= cap)
    a = small.select(F.col("doc_id").alias("id1"), "band_id", "band_sig")
    b = small.select(F.col("doc_id").alias("id2"), "band_id", "band_sig")
    n_capped_pairs = (
        a.join(b, ["band_id", "band_sig"]).filter("id1 < id2").select("id1", "id2").distinct().count()
    )
    assert n_capped_pairs < 100, n_capped_pairs  # vs >= 780 uncapped


def test_incremental_neardup_flags_planted_dups(spark):
    """Planted case: one arriving doc is a near-copy of a corpus doc, one is
    an exact copy, one is novel. Flags, best-Jaccard ordering, and the
    min-id tie-break on an exact tie must all hold."""
    from rca_data_tools_spark.operators.dedup import incremental_neardup

    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    existing = spark.createDataFrame(
        [(1, base), (2, base), (3, "completely different corpus text about spark shuffles " * 5)],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [(100, base),                      # exact copy of docs 1 AND 2 (tie)
         (101, base + " with a tiny extra tail"),  # near dup
         (102, "utterly novel content never seen in the corpus " * 6)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            incremental_neardup(existing, incoming, "doc_id", "text", 0.5).collect()}
    assert len(rows) == 3
    assert rows[100]["is_dup"] and rows[100]["best_jaccard"] == 1.0
    assert rows[100]["matched_id"] == 1  # min-id tie-break between 1 and 2
    assert rows[101]["is_dup"] and 0.5 <= rows[101]["best_jaccard"] < 1.0
    assert not rows[102]["is_dup"]
    assert rows[102]["best_jaccard"] is None and rows[102]["matched_id"] is None


def test_pq_topk_recall_and_structure(spark):
    """PQ/ADC with exact re-rank: 4-byte codes + 32-candidate re-rank must
    recover a solid share of brute-force top-5; approx distances must be
    non-negative and ranks dense 1..5 per query."""
    from rca_data_tools_spark.operators.similarity import brute_force_topk, pq_adc_topk

    e = load_table(spark, SF_CORRECTNESS, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {(r.q_id, r.vec_id) for r in brute_force_topk(e, q, "vec_id", "embedding", k=5).collect()}
    rows = pq_adc_topk(e, q, "vec_id", "embedding", k=5, n_candidates=64).collect()
    approx = {(r.q_id, r.vec_id) for r in rows}
    assert len(rows) == 50
    by_q = {}
    for r in rows:
        assert r.q_id != r.vec_id and r.approx_dist >= 0.0
        by_q.setdefault(r.q_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())
    # recall grows monotonically with the candidate budget — the ADC scores
    # genuinely order the corpus (random diffuse vectors are PQ's hardest
    # case; 16-bit codes can't do better without Lloyd refinement)
    recalls = {}
    for nc in (32, 64, 128):
        a = {(r.q_id, r.vec_id)
             for r in pq_adc_topk(e, q, "vec_id", "embedding", k=5, n_candidates=nc).collect()}
        recalls[nc] = len(exact & a) / len(exact)
    assert recalls[32] >= 0.2 and recalls[64] >= 0.35 and recalls[128] >= 0.6, recalls
    assert recalls[32] <= recalls[64] <= recalls[128], recalls


def test_index_seeds_survive_offset_id_space(spark):
    """Seed selection for IVF centroids and PQ codebooks is id-RANK based,
    so an id space that starts at 1,000,000 (or is sparse) builds the SAME
    index as the dense 0-based one — the id-arithmetic form silently built
    an empty codebook and returned zero neighbors for a non-empty corpus."""
    from rca_data_tools_spark.operators.similarity import (
        ivf_centroids,
        ivf_topk,
        pq_adc_topk,
        pq_codebook,
    )

    e = load_table(spark, SF_CORRECTNESS, "embeddings")
    off = e.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")

    cb0 = pq_codebook(e, "vec_id", "embedding")
    cb1 = pq_codebook(off, "vec_id", "embedding")
    assert len(cb0) == len(cb1) > 0
    assert {(r["m"], r["j"]) for r in cb0} == {(r["m"], r["j"]) for r in cb1}
    assert [r["cvec"] for r in sorted(cb0, key=lambda r: (r["m"], r["j"]))] == [
        r["cvec"] for r in sorted(cb1, key=lambda r: (r["m"], r["j"]))
    ]

    c0 = {(r["cid"], tuple(r["cvec"])) for r in ivf_centroids(e, "vec_id", "embedding", 16, 29).collect()}
    c1 = {(r["cid"], tuple(r["cvec"])) for r in ivf_centroids(off, "vec_id", "embedding", 16, 29).collect()}
    assert c0 == c1 and len(c0) == 16

    q_off = off.filter(F.col("vec_id") < 1_000_010).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    pq_rows = pq_adc_topk(off, q_off, "vec_id", "embedding", k=5, n_candidates=64).collect()
    assert len(pq_rows) == 50  # not the silent empty result
    ivf_rows = ivf_topk(off, q_off, "vec_id", "embedding", k=5).collect()
    assert {(r.q_id - 1_000_000, r.vec_id - 1_000_000) for r in ivf_rows} == {
        (r.q_id, r.vec_id)
        for r in ivf_topk(
            e,
            e.filter(F.col("vec_id") < 10).select(
                F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
            ),
            "vec_id",
            "embedding",
            k=5,
        ).collect()
    }


def test_pq_refine_reduces_quantization_error_and_helps_recall(spark):
    """Two Lloyd rounds per subspace must strictly reduce total squared
    quantization error (the k-means objective), and the refined codebook's
    64-candidate recall must not fall below the seed codebook's."""
    import numpy as np

    from rca_data_tools_spark.operators.similarity import (
        _pq_arrays,
        brute_force_topk,
        pq_adc_topk,
        pq_codebook,
        pq_encode,
        pq_refine,
    )

    e = load_table(spark, SF_CORRECTNESS, "embeddings")
    X = np.stack([
        np.asarray(r["embedding"], dtype=np.float64)
        for r in e.orderBy("vec_id").collect()
    ])

    def qerr(cb_rows):
        C, sub = _pq_arrays(cb_rows, 4, 16)
        total = 0.0
        for mi in range(4):
            d = ((X[:, mi * sub:(mi + 1) * sub][:, None, :] - C[mi][None, :, :]) ** 2).sum(-1)
            total += d.min(axis=1).sum()
        return total

    cb0 = pq_codebook(e, "vec_id", "embedding")
    cb1 = pq_refine(e, cb0, "vec_id", "embedding", iters=1)
    cb2 = pq_refine(e, cb1, "vec_id", "embedding", iters=1)
    e0, e1, e2 = qerr(cb0), qerr(cb1), qerr(cb2)
    assert e1 < e0 and e2 <= e1, (e0, e1, e2)

    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {(r.q_id, r.vec_id) for r in brute_force_topk(e, q, "vec_id", "embedding", k=5).collect()}

    def recall(cb_rows):
        # re-encode + ADC with the given codebook via the operator pieces
        from rca_data_tools_spark.operators import similarity as S
        import numpy as _np
        C, sub = _pq_arrays(cb_rows, 4, 16)
        codes = {r["vec_id"]: r["codes"] for r in
                 pq_encode(e, cb_rows, "vec_id", "embedding").collect()}
        hits = 0
        for qid in range(10):
            qv = X[qid]
            lut = _np.zeros((4, 16))
            for mi in range(4):
                lut[mi] = ((qv[mi * sub:(mi + 1) * sub][None, :] - C[mi]) ** 2).sum(-1)
            scored = sorted(
                (sum(lut[mi][codes[v][mi]] for mi in range(4)), v)
                for v in codes if v != qid
            )[:64]
            cand = {v for _, v in scored}
            top5 = sorted(
                ((float(_np.dot(qv, X[v]) / (_np.linalg.norm(qv) * _np.linalg.norm(X[v]))), v)
                 for v in cand), key=lambda t: (-t[0], t[1])
            )[:5]
            hits += len({v for _, v in top5} & {v for (qq, v) in exact if qq == qid})
        return hits / len(exact)

    r0, r2 = recall(cb0), recall(cb2)
    assert r2 >= r0 - 0.05, (r0, r2)  # refinement must not hurt
    print("qerr:", e0, "->", e2, "recall:", r0, "->", r2)


def test_cdc_chunks_shift_resistant(spark, tmp_path):
    """The property fixed-grid span dedup lacks: prepending words to a
    document re-synchronizes the chunking, so most chunks survive verbatim.
    Also pins boundary invariants: chunk lengths in [MIN, MAX] (except a
    short final tail), chunks concatenate back to the normalized text."""
    import pandas as pd
    from pyspark.sql import functions as F
    from rca_data_tools_spark.operators.dedup import CDC_MIN, CDC_MAX
    from rca_data_tools_spark.queries import QUERIES

    base = (
        "the quick brown fox jumps over the lazy dog while the cold tide "
        "rolls across the shelf and the sensor logs a steady stream of "
        "temperature salinity and pressure readings every fifteen seconds "
        "until the battery finally gives out near the end of the deployment"
    )
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [base, "completely new preamble inserted up front " + base],
            "source": ["a", "a"],
            "lang": ["en", "en"],
            "url": ["u", "u"],
            "published_ts": pd.to_datetime(["2020-01-01", "2020-01-01"]),
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(docs).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = {r["doc_id"]: r for r in QUERIES["dedup_cdc_chunks"](spark, sf).collect()}
    # the shared suffix re-synchronizes: both docs flag duplicated chunks
    assert out[0]["n_dup"] >= 1 and out[1]["n_dup"] >= 1
    # and a strict majority of the ORIGINAL doc's chunks survive the edit
    assert out[0]["n_dup"] / out[0]["n_chunks"] > 0.5
    # invariants: chunks tile the normalized text exactly
    assert out[0]["chunk_chars"] == len(base)
    # length bounds: rebuild the chunk list and check [MIN, MAX]
    from rca_data_tools_spark.sources.readers import load_table

    d = load_table(spark, sf, "documents")
    n_chunks, chunk_chars = out[0]["n_chunks"], out[0]["chunk_chars"]
    # every non-final chunk >= MIN; all chunks <= MAX
    assert chunk_chars <= n_chunks * CDC_MAX
    assert chunk_chars >= (n_chunks - 1) * CDC_MIN


def test_verify_shuffle_fallback_matches_broadcast(spark):
    """The pair-list size guard (operators/dedup.py _pair_side): with
    broadcast_pair_limit=0 every pair list exceeds the limit, so verify and
    estimate run the shuffle-equi-join fallback — and must produce exactly
    the pairs the forced-broadcast path (limit=None) produces. Also asserts
    the fallback really activates: no broadcast HINT survives in the
    analyzed plan of the guarded verify join (AQE may still runtime-convert,
    which is allowed — the guard's contract is only 'never FORCE an
    unbounded broadcast')."""
    from rca_data_tools_spark.operators.dedup import (
        estimate_filter,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_arrays,
        shingle_hashes,
        verify_jaccard,
    )

    d = load_table(spark, SF_CORRECTNESS, "documents")
    hashed = shingle_hashes(shingle_arrays(d, "doc_id", "text", 5), "doc_id").persist()
    sig = minhash_signatures(hashed, "doc_id").persist()
    cand = lsh_candidate_pairs(sig, "doc_id")

    pruned_bc = estimate_filter(cand, sig, "doc_id", 0.45, broadcast_pair_limit=None).persist()
    pruned_sh = estimate_filter(cand, sig, "doc_id", 0.45, broadcast_pair_limit=0).persist()
    assert sorted(map(tuple, pruned_bc.collect())) == sorted(map(tuple, pruned_sh.collect()))

    got_bc = verify_jaccard(pruned_bc, hashed, "doc_id", 0.7, broadcast_pair_limit=None)
    got_sh = verify_jaccard(pruned_sh, hashed, "doc_id", 0.7, broadcast_pair_limit=0)
    rows_bc = sorted((r.id1, r.id2, r.jaccard) for r in got_bc.collect())
    rows_sh = sorted((r.id1, r.id2, r.jaccard) for r in got_sh.collect())
    assert rows_bc == rows_sh and rows_bc, "fallback must reproduce the broadcast result"

    # the guarded plan carries no broadcast hint; the forced one does
    analyzed_sh = got_sh._jdf.queryExecution().analyzed().toString()
    analyzed_bc = got_bc._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in analyzed_sh and "ResolvedHint" not in analyzed_sh
    assert "ResolvedHint" in analyzed_bc or "UnresolvedHint" in analyzed_bc


def test_repeated_substring_spans_planted(spark):
    """Planted ExactSubstr scenario: a 12-token passage shared verbatim by
    two docs must come back as ONE maximal merged span per doc covering
    exactly the repeat (12 tokens ≥ window 8 -> 12-8+1 = 5 flagged windows
    merging to [start, start+12)); a doc without the passage yields no
    spans; removal cuts exactly the passage tokens."""
    from rca_data_tools_spark.operators.dedup import (
        remove_substring_spans,
        repeated_substring_spans,
    )

    passage = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    rows = [
        (1, "unique one two three " + passage + " tail1 tail2"),       # repeat at tok 4
        (2, passage + " other words here entirely"),                    # repeat at tok 0
        (3, "completely different text with no shared passage at all nine ten"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    spans = repeated_substring_spans(d, "doc_id", "text", window=8, min_df=2)
    got = {r.doc_id: (r.span_start, r.span_end, r.n_windows) for r in spans.collect()}
    assert got == {1: (4, 16, 5), 2: (0, 12, 5)}, got

    out = {r.doc_id: r for r in remove_substring_spans(d, spans, "doc_id", "text").collect()}
    assert out[1].clean_text == "unique one two three tail1 tail2"
    assert out[1].n_removed == 12 and out[1].n_tokens == 18
    assert out[2].clean_text == "other words here entirely"
    assert out[3].n_removed == 0
    assert out[3].clean_text == rows[2][1]


def test_repeated_substring_two_separate_repeats_stay_separate(spark):
    """Two repeats in one doc separated by more than the window length must
    NOT merge into one span (the gap > window rule)."""
    from rca_data_tools_spark.operators.dedup import repeated_substring_spans

    r1 = "r1a r1b r1c r1d r1e r1f r1g r1h"              # 8 tokens
    r2 = "r2a r2b r2c r2d r2e r2f r2g r2h"              # 8 tokens
    gap = " ".join(f"g{i}" for i in range(12))           # 12 unique tokens
    d = spark.createDataFrame(
        [(1, f"{r1} {gap} {r2}"), (2, r1 + " x y z unrelated"), (3, r2 + " p q r unrelated2")],
        "doc_id long, text string",
    )
    spans = repeated_substring_spans(d, "doc_id", "text", window=8, min_df=2)
    got = sorted(
        (r.span_start, r.span_end)
        for r in spans.filter(F.col("doc_id") == 1).collect()
    )
    assert got == [(0, 8), (20, 28)], got


def test_split_leakage_safe_no_pair_crosses(spark):
    """The structural guarantee of split_leakage_safe: no near-dup pair may
    straddle a split boundary, and the split is a function of the component
    root alone."""
    from rca_data_tools_spark.queries.dedupq import split_leakage_safe
    from rca_data_tools_spark.queries.dedupq import simhash_fingerprints
    from rca_data_tools_spark.operators.dedup import simhash_neardup_pairs
    from rca_data_tools_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    assigned = split_leakage_safe(spark, sf)
    rows = assigned.collect()
    split_of = {r["doc_id"]: r["split"] for r in rows}
    comp_of = {r["doc_id"]: r["component"] for r in rows}
    # every document got exactly one assignment
    d = load_table(spark, sf, "documents")
    assert len(rows) == d.count()
    assert set(split_of.values()) <= {"train", "val", "test"}
    # recompute the near-dup pairs independently and assert zero crossings
    fp = simhash_fingerprints(d, "doc_id", "text")
    pairs = simhash_neardup_pairs(fp, "doc_id", max_hamming=3).collect()
    assert pairs, "fixture must contain near-dup pairs for the test to bite"
    crossing = [
        (p["id1"], p["id2"])
        for p in pairs
        if split_of[p["id1"]] != split_of[p["id2"]]
    ]
    assert crossing == []
    # same component -> same split (the mechanism, not just the outcome)
    by_comp: dict = {}
    for doc, comp in comp_of.items():
        by_comp.setdefault(comp, set()).add(split_of[doc])
    assert all(len(s) == 1 for s in by_comp.values())


def test_split_hash_wrap_safe_at_huge_component_ids(spark):
    """ADVICE r10: raw component ids past ~3.47e9 overflowed BIGINT in the
    Knuth multiply (Spark wrapped negative -> everything routed to 'train';
    DuckDB raised). The mod-prime reduction keeps both engines identical
    and in [0, 10) at any id scale."""
    import duckdb
    import pyspark.sql.functions as F

    ids = [1, 2654435761, 3_470_000_000, 2**40, 2**62, 9_223_372_036_854_775]
    df = spark.createDataFrame([(i,) for i in ids], "component long").withColumn(
        "h", ((F.col("component") % 1000000007) * F.lit(2654435761)) % 10
    )
    got = {r["component"]: r["h"] for r in df.collect()}
    assert all(0 <= h <= 9 for h in got.values())
    con = duckdb.connect()
    for i in ids:
        (oh,) = con.execute(
            f"SELECT (({i} % 1000000007) * 2654435761) % 10"
        ).fetchone()
        assert got[i] == oh
    assert len(set(got.values())) > 1  # still spreads


def test_simhash_components_capped_matches_exact_under_cap(spark):
    """With a cap no bucket exceeds, the capped routing IS the exact
    pipeline: components equal connected_components(simhash pairs)."""
    from rca_data_tools_spark.operators.dedup import (
        connected_components,
        simhash_components_capped,
        simhash_fingerprints,
        simhash_neardup_pairs,
    )

    sf = "/root/testdata/sf0.001"
    d = load_table(spark, sf, "documents")
    capped = simhash_components_capped(
        d, "doc_id", "text", max_hamming=3, bucket_cap=10**9
    )
    fp = simhash_fingerprints(d, "doc_id", "text")
    exact = connected_components(
        simhash_neardup_pairs(fp, "doc_id", max_hamming=3)
    )
    assert sorted(map(tuple, capped.collect())) == sorted(
        map(tuple, exact.collect())
    )


def test_simhash_components_capped_star_routing_over_merges_never_splits(spark):
    """Over-cap buckets route to UNVERIFIED star edges: every exact
    component stays within ONE capped component (splits would leak across
    an eval boundary; over-merges are conservative)."""
    from rca_data_tools_spark.operators.dedup import (
        connected_components,
        simhash_components_capped,
        simhash_fingerprints,
        simhash_neardup_pairs,
    )

    sf = "/root/testdata/sf0.001"
    d = load_table(spark, sf, "documents")
    capped = simhash_components_capped(
        d, "doc_id", "text", max_hamming=3, bucket_cap=3
    ).withColumnRenamed("label", "capped_label")
    fp = simhash_fingerprints(d, "doc_id", "text")
    exact = connected_components(
        simhash_neardup_pairs(fp, "doc_id", max_hamming=3)
    ).withColumnRenamed("label", "exact_label")
    j = exact.join(capped, "node")  # every exact node got SOME capped label
    assert j.count() == exact.count()
    # one exact component -> exactly one capped component (never split)
    import pyspark.sql.functions as F

    split_groups = (
        j.groupBy("exact_label")
        .agg(F.count_distinct("capped_label").alias("n"))
        .filter("n > 1")
        .count()
    )
    assert split_groups == 0
