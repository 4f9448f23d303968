"""Prefix-filter exact similarity join — brute-force completeness (the
recall-1.0 theorem, checked), stat exactness, order-mode parity."""

import numpy as np
import pandas as pd


def _corpus(rng, n_docs=60, vocab=12, min_len=5, max_len=25, dup_frac=0.4):
    """Dense near-dup corpus: small vocab + mutated copies so many pairs
    sit near the threshold on both sides."""
    words = [f"w{i}" for i in range(vocab)]
    texts = []
    for _ in range(n_docs):
        L = int(rng.integers(min_len, max_len))
        texts.append(" ".join(rng.choice(words, L)))
    n_dup = int(n_docs * dup_frac)
    for i in range(n_dup):
        base = texts[int(rng.integers(0, n_docs))].split()
        j = int(rng.integers(0, len(base)))
        base[j] = words[int(rng.integers(0, vocab))]
        texts.append(" ".join(base))
    return pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )


def _brute(df, k, tn, td):
    def shingles(t):
        toks = t.split()
        if len(toks) >= k:
            return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
        return {" ".join(toks)} if toks else set()

    sets = {r.doc_id: shingles(r.text) for r in df.itertuples()}
    rows = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            A, B = sets[a], sets[b]
            if not A or not B:
                continue
            sh = len(A & B)
            un = len(A) + len(B) - sh
            if td * sh >= tn * un:
                rows.append((a, b, sh, len(A), len(B), sh / un))
    return pd.DataFrame(
        rows, columns=["src", "dst", "shared", "size_a", "size_b", "jaccard"]
    ).sort_values(["src", "dst"]).reset_index(drop=True)


def _run(df, ray_df, **kw):
    from abwcf_ray.stages.simjoin import similarity_join

    out = similarity_join(ray_df, **kw).to_pandas()
    if "shared" not in out.columns:
        return _brute(df.iloc[:0], 3, 1, 2)
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def test_similarity_join_completeness_vs_bruteforce(ray_session):
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(61)
    df = _corpus(rng)
    ref = _brute(df, 3, 2, 5)  # t = 0.4, lots of borderline pairs
    for blocks in (1, 5):
        out = _run(
            df,
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
            .repartition(blocks),
            threshold_num=2,
            threshold_den=5,
            shingle_k=3,
            merge_partitions=8,
        )
        # completeness AND exact stats: frame equality
        pd.testing.assert_frame_equal(
            out.astype({"jaccard": np.float64}), ref, check_dtype=False
        )
        assert len(out) > 0  # the corpus must actually exercise the join


def test_similarity_join_hash_order_parity(ray_session):
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(67)
    df = _corpus(rng, n_docs=40)
    base = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    a = _run(df, base, threshold_num=1, threshold_den=2, shingle_k=2,
             order="df", merge_partitions=4)
    b = _run(df, base, threshold_num=1, threshold_den=2, shingle_k=2,
             order="hash", merge_partitions=4)
    pd.testing.assert_frame_equal(a, b)


def test_similarity_join_threshold_one_is_exact_set_equality(ray_session):
    import pyarrow as pa
    import ray.data as rd

    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "a b c d e",
                "a b c d e",      # identical -> J = 1
                "a b c d e f",    # superset -> J < 1
                "x y z x y z",
            ],
        }
    )
    out = _run(
        df,
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
        threshold_num=1,
        threshold_den=1,
        shingle_k=2,
        merge_partitions=4,
    )
    assert out[["src", "dst"]].values.tolist() == [[0, 1]]
    assert out["jaccard"].tolist() == [1.0]


def test_sorted_neighborhood_join_subset_of_complete(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.simjoin import sorted_neighborhood_join

    rng = np.random.default_rng(137)
    # near-dups built by PREFIX-preserving mutation (mutate a late token)
    # sort adjacently, so a window catches them
    words = [f"w{i}" for i in range(10)]
    texts = []
    for _ in range(40):
        texts.append(" ".join(rng.choice(words, 12)))
    for i in range(20):
        base = texts[i].split()
        base[-1] = words[int(rng.integers(0, 10))]
        texts.append(" ".join(base))
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    complete = _brute(df, 3, 2, 5)
    out = sorted_neighborhood_join(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
        .repartition(4),
        window=8,
        threshold_num=2,
        threshold_den=5,
        shingle_k=3,
        merge_partitions=8,
    ).to_pandas()
    if "shared" not in out.columns:
        out = complete.iloc[:0]
    out = out.sort_values(["src", "dst"]).reset_index(drop=True)
    # every SNM pair is a TRUE pair with exact stats (soundness)...
    comp_idx = complete.set_index(["src", "dst"])
    for row in out.itertuples():
        ref = comp_idx.loc[(row.src, row.dst)]
        assert (row.shared, row.size_a, row.size_b) == (
            ref["shared"], ref["size_a"], ref["size_b"]
        )
        assert row.jaccard == ref["jaccard"]
    # ...and the prefix-preserving mutations give high (not guaranteed
    # total) recall
    assert len(out) >= 0.5 * len(complete) > 0
