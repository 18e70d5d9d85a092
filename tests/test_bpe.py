"""BPE trainer semantics: merge order, overlap handling, symbol boundaries,
deterministic tie-breaks, and the Spark apply path vs the Python trainer."""

from __future__ import annotations

from rca_data_tools_spark.operators.bpe import (
    apply_merge,
    seq_symbols,
    to_seq,
    train_merges,
)


def _naive_bpe(word_freqs, n_merges):
    """Independent list-domain reference: merge the best pair greedily
    left-to-right within each word, no string tricks."""
    seqs = [(list(w), f) for w, f in word_freqs]
    merges = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for syms, f in seqs:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, l, r, cnt))
        new = []
        for syms, f in seqs:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new.append((out, f))
        seqs = new
    return merges


def test_matches_list_domain_reference():
    wf = [("banana", 10), ("bandana", 7), ("analysis", 5), ("nan", 3)]
    assert train_merges(wf, 12) == _naive_bpe(wf, 12)


def test_overlap_left_to_right():
    # 'aaaa' -> pairs ('a','a') x3; merging left-to-right gives 'aa','aa',
    # never the overlapping middle pair.
    wf = [("aaaa", 1)]
    merges = train_merges(wf, 2)
    assert merges[0][1:3] == ("a", "a")
    seq = apply_merge(to_seq("aaaa"), "a", "a")
    assert seq_symbols(seq) == ["aa", "aa"]
    # second merge now sees ('aa','aa')
    assert merges[1][1:3] == ("aa", "aa")


def test_odd_run_leaves_tail():
    seq = apply_merge(to_seq("aaa"), "a", "a")
    assert seq_symbols(seq) == ["aa", "a"]


def test_symbol_boundary_no_partial_match():
    # after merging x+a -> 'xa', the pattern ('a','b') must not fire inside
    # the 'xa' symbol even though 'a' is its suffix.
    seq = to_seq("xab")
    seq = apply_merge(seq, "x", "a")
    assert seq_symbols(seq) == ["xa", "b"]
    unchanged_then_b = apply_merge(seq, "a", "b")
    assert seq_symbols(unchanged_then_b) == ["xa", "b"]


def test_tie_break_lexicographic():
    # 'ab' and 'cd' both appear once -> ('a','b') wins by lex order.
    merges = train_merges([("ab", 1), ("cd", 1)], 1)
    assert merges[0][1:3] == ("a", "b")


def test_early_stop_when_fully_merged():
    merges = train_merges([("ab", 5)], 10)
    assert len(merges) == 1  # one pair, then nothing left to merge


def test_frequency_weighting():
    # pair from the frequent word must win over the rare word's pair
    merges = train_merges([("xy", 100), ("zz", 1)], 1)
    assert merges[0][1:3] == ("x", "y")


def test_spark_apply_matches_trainer(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from rca_data_tools_spark.operators.bpe import (
        merged_seq_col,
        token_count_from_seq,
        word_frequencies,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "banana bandana banana",
                    "analysis of banana",
                    "nan nan bandana",
                ],
            }
        )
    )
    wf = word_frequencies(docs, top_v=100)
    merges = train_merges(wf, 8)
    dim = spark.createDataFrame(pd.DataFrame({"word": [w for w, _ in wf]}))
    got = {
        r["word"]: (r["seq"], r["n"])
        for r in dim.select(
            "word",
            merged_seq_col(F.col("word"), merges).alias("seq"),
            token_count_from_seq(merged_seq_col(F.col("word"), merges)).alias("n"),
        ).collect()
    }
    for word, _ in wf:
        seq = to_seq(word)
        for _, l, r, _ in merges:
            seq = apply_merge(seq, l, r)
        assert got[word][0] == seq, word
        assert got[word][1] == len(seq_symbols(seq)), word


def test_property_matches_reference_on_random_corpora():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.text(alphabet="abcxyz", min_size=1, max_size=8)
    corpora = st.lists(
        st.tuples(words, st.integers(min_value=1, max_value=50)),
        min_size=1,
        max_size=12,
        unique_by=lambda wf: wf[0],
    )

    @given(corpora, st.integers(min_value=1, max_value=10))
    @settings(max_examples=200, deadline=None)
    def check(wf, k):
        assert train_merges(wf, k) == _naive_bpe(wf, k)

    check()


def test_oracle_survives_early_merge_exhaustion(spark, tmp_path):
    """A corpus whose vocabulary fully merges before N_MERGES must not
    annihilate the oracle's later apply stages (sentinel no-op merges), and
    the merge table must still match the early-stopping Python trainer."""
    import duckdb
    import pandas as pd

    from rca_data_tools_spark.queries import ORACLES, QUERIES

    sf = str(tmp_path)
    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["ab ab ab", "ab a", "b ab"],
         "lang": ["en"] * 3, "source": ["t"] * 3, "n_chars": [8, 4, 4]}
    )
    spark.createDataFrame(docs).coalesce(1).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    for name in ("bpe_train_merges", "bpe_apply_tokens"):
        sdf = (
            QUERIES[name](spark, sf).toPandas().sort_values("doc_id" if "apply" in name else "merge_rank").reset_index(drop=True)
        )
        odf = con.execute(ORACLES[name]).df().sort_values("doc_id" if "apply" in name else "merge_rank").reset_index(drop=True)
        assert len(sdf) == len(odf) and len(sdf) > 0, (name, len(sdf), len(odf))
        for c in sdf.columns:
            assert list(sdf[c].astype(str)) == list(odf[c].astype(str)), (name, c)
