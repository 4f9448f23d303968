"""BPE pair statistics (stages/bpe.py): brute-force parity, boundary
semantics (pairs never span documents), overlap counting, unicode."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import ray.data as rd

from abwcf_ray.stages.bpe import char_pair_counts


def _brute(texts, k):
    c = Counter()
    for s in texts:
        for a, b in zip(s, s[1:]):
            c[(a, b)] += 1
    rows = sorted(c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:k]
    return [(a, b, n) for (a, b), n in rows]


def _run(texts, k, blocks=3):
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(blocks)
    out = (
        char_pair_counts(ds, k=k)
        .to_pandas()
        .sort_values(["n", "c1", "c2"], ascending=[False, True, True])
        .reset_index(drop=True)
    )
    return list(out.itertuples(index=False, name=None))


def test_char_pairs_matches_bruteforce(ray_session):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
        "aaa bbb aaa",
        "",
        "x",
    ] * 7
    assert _run(texts, 20) == _brute(texts, 20)


def test_char_pairs_overlapping_and_no_cross_doc(ray_session):
    # "aaa" contributes (a,a) twice; docs "ab"+"ba" must NOT produce
    # a (b,b) or sentinel pair across the boundary
    got = dict(
        ((c1, c2), n) for c1, c2, n in _run(["aaa", "ab", "ba"], 10, blocks=1)
    )
    assert got == {("a", "a"): 2, ("a", "b"): 1, ("b", "a"): 1}


def _ref_bpe(texts, n_merges):
    """Pure-Python reference BPE: same id allocation, same (count DESC,
    pair ASC) argmax, true sequential greedy left-to-right application."""
    seqs = [[ord(ch) for ch in t] for t in texts]
    tok = {}

    def tok_of(s):
        return tok[s] if s in tok else chr(s)

    rows = []
    for step in range(n_merges):
        c = Counter()
        for seq in seqs:
            for x, y in zip(seq, seq[1:]):
                c[(x, y)] += 1
        if not c:
            break
        (a, b), n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        nid = 0x110000 + step
        tok[nid] = tok_of(a) + tok_of(b)
        rows.append(
            {
                "step": step,
                "left_tok": tok_of(a),
                "right_tok": tok_of(b),
                "token": tok[nid],
                "count": n,
                "left_id": a,
                "right_id": b,
                "new_id": nid,
            }
        )
        for si, seq in enumerate(seqs):
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(nid)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[si] = out
    return rows


def _run_bpe(texts, n_merges, blocks):
    from abwcf_ray.stages.bpe import bpe_train

    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(blocks)
    return bpe_train(ds, n_merges=n_merges).to_dict("records")


def test_bpe_train_matches_reference(ray_session):
    texts = [
        "the cat sat on the mat",
        "the hat of the cat",
        "that that mat",
        "aaaa aabaa aaa",  # runs: parity selection must equal greedy
        "",
    ] * 4
    assert _run_bpe(texts, 8, blocks=3) == _ref_bpe(texts, 8)


def test_bpe_train_layout_invariance_and_early_stop(ray_session):
    texts = ["ababab", "xy"]  # after a few merges no pair repeats
    a = _run_bpe(texts, 10, blocks=1)
    b = _run_bpe(texts, 10, blocks=5)
    assert a == b == _ref_bpe(texts, 10)
    assert len(a) < 10  # stopped before exhausting the budget


def test_char_pairs_unicode_codepoints(ray_session):
    got = _run(["héé", "日本日本"], 10)
    d = {(c1, c2): n for c1, c2, n in got}
    assert d[("é", "é")] == 1
    assert d[("h", "é")] == 1
    assert d[("日", "本")] == 2
    assert d[("本", "日")] == 1


# ---------------------------------------------------------------- encode


def _ref_encode_counts(texts, merge_rows):
    """Sequential greedy left-to-right application of each merge in step
    order (the classic BPE encode); returns per-doc token counts."""
    counts = []
    for t in texts:
        seq = [ord(c) for c in t]
        for r in merge_rows:
            a, b, nid = r["left_id"], r["right_id"], r["new_id"]
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(nid)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        counts.append(len(seq))
    return counts


def test_bpe_encode_matches_sequential_reference(ray_session):
    from abwcf_ray.stages.bpe import bpe_encode, bpe_train

    texts = [
        "the cat sat on the mat",
        "the hat of the cat",
        "that that mat",
        "aaaa aabaa aaa",
        "",
        "ththe",
    ] * 3
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = rd.from_pandas(df).repartition(4)
    merges = bpe_train(ds, n_merges=8)
    out = (
        bpe_encode(ds, merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _ref_encode_counts(texts, merges.to_dict("records"))
    assert out["n_tokens"].tolist() == exp
    # every doc shrank or held (merges only ever remove symbols); note the
    # merge table's `count` is the OVERLAPPING pair count at selection
    # time, not the applied-merge count, so no exact conservation law here
    assert (out["n_tokens"].to_numpy() <= df["text"].str.len().to_numpy()).all()


def test_bpe_encode_zero_merges_is_char_count(ray_session):
    from abwcf_ray.stages.bpe import bpe_encode

    texts = ["abc", "", "héé"]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [5, 6, 7], "text": texts}))
    empty = pd.DataFrame(columns=["left_id", "right_id", "new_id"])
    out = bpe_encode(ds, empty).to_pandas().sort_values("doc_id")
    assert out["n_tokens"].tolist() == [3, 0, 3]


def test_bpe_encode_layout_invariance(ray_session):
    from abwcf_ray.stages.bpe import bpe_encode, bpe_train

    texts = ["banana bandana", "ananas", "nan"] * 5
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    m = bpe_train(rd.from_pandas(df).repartition(2), n_merges=5)
    a = (
        bpe_encode(rd.from_pandas(df).repartition(1), m)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        bpe_encode(
            rd.from_pandas(df.iloc[::-1].reset_index(drop=True)).repartition(7),
            m,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_bpe_encode_hypothesis_differential(ray_session):
    """Randomized differential vs the sequential greedy reference:
    small alphabets force dense merges, runs, and merge-of-merge chains."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from abwcf_ray.stages.bpe import bpe_encode, bpe_train

    @settings(max_examples=10, deadline=None)
    @given(seed=st.integers(0, 10_000), n_merges=st.integers(1, 6))
    def inner(seed, n_merges):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 30))
        texts = [
            "".join(rng.choice(list("aabbc "), int(rng.integers(0, 25))))
            for _ in range(n)
        ]
        df = pd.DataFrame({"doc_id": range(n), "text": texts})
        ds = rd.from_pandas(df).repartition(3)
        merges = bpe_train(ds, n_merges=n_merges)
        out = (
            bpe_encode(ds, merges)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        exp = _ref_encode_counts(texts, merges.to_dict("records"))
        assert out["n_tokens"].tolist() == exp

    inner()


def test_bpe_nul_codepoints_dropped_consistently(ray_session):
    """In-text NUL (the join sentinel) is stripped before symbolization
    in BOTH train and encode — offsets stay aligned and merges never
    span document boundaries (regression: a stray NUL used to shift
    every later doc's boundary)."""
    from abwcf_ray.stages.bpe import bpe_encode, bpe_train

    dirty = ["a\x00b ab ab", "cd\x00", "\x00\x00", "abab"]
    clean = [t.replace("\x00", "") for t in dirty]
    dfd = pd.DataFrame({"doc_id": range(4), "text": dirty})
    dfc = pd.DataFrame({"doc_id": range(4), "text": clean})
    md = bpe_train(rd.from_pandas(dfd).repartition(2), n_merges=4)
    mc = bpe_train(rd.from_pandas(dfc).repartition(2), n_merges=4)
    assert md.to_dict("records") == mc.to_dict("records")
    outd = (
        bpe_encode(rd.from_pandas(dfd), md)
        .to_pandas()
        .sort_values("doc_id")["n_tokens"]
        .tolist()
    )
    assert outd == _ref_encode_counts(clean, md.to_dict("records"))
