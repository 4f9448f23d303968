"""Exact duplicated-substring removal (stages/substr.py, the ExactSubstr
operator of Lee et al. 2022): parity with a pure-Python oracle on both the
broadcast and co-partitioned drop paths, edge cases (short/empty/null
docs, within-doc runs, overlapping spans), and the winnowing contracts
(window coverage; winnowed drops are a subset of exact drops; duplicated
runs >= k + w - 1 are still detected in the later copy)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from abwcf_ray.stages.substr import (
    _batch_gram_positions,
    _winnow_select,
    exact_substring_dedup,
)

_MAX_POS = 1 << 20


def _py_substr(docs, k):
    """Brute-force oracle: token k-grams, first occurrence by
    (doc_id, pos) wins, every other occurrence drops its [pos, pos+k)
    span; overlapping spans union."""
    toks = {d: (t or "").split() for d, t in docs}
    occ: dict[tuple, list] = {}
    for d, _ in docs:
        ws = toks[d]
        for pos in range(len(ws) - k + 1):
            occ.setdefault(tuple(ws[pos : pos + k]), []).append((d * _MAX_POS + pos, d, pos))
    drops: dict[int, set] = {}
    for lst in occ.values():
        if len(lst) < 2:
            continue
        lst.sort()
        for _, d, pos in lst[1:]:
            drops.setdefault(d, set()).update(range(pos, pos + k))
    rows = []
    for d, _ in docs:
        ws = toks[d]
        dr = drops.get(d, set())
        kept = [w for i, w in enumerate(ws) if i not in dr]
        rows.append((d, len(ws), len(kept), " ".join(kept)))
    return pd.DataFrame(rows, columns=["doc_id", "n_tokens", "n_kept", "text_clean"])


def _mk_docs(n=60, seed=7, k=4):
    """Deterministic corpus with planted duplicated runs: doc i borrows a
    k+2-token run from doc (i*5+1)%n when i%3==0, and doc 0's opening run
    recurs verbatim in several docs (cross- and within-doc dups)."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{j}" for j in range(400)]
    base = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 30))))
        for _ in range(n)
    ]
    motif = " ".join(rng.choice(vocab, size=k + 3))
    docs = []
    for i in range(n):
        t = base[i]
        if i % 3 == 0:
            donor = base[(i * 5 + 1) % n].split()[: k + 2]
            t = t + " " + " ".join(donor) if donor else t
        if i % 7 == 0:
            t = motif + " " + t
        if i == 11:
            t = t + " " + motif + " " + motif  # within-doc repeat too
        docs.append((i, t.strip()))
    docs[5] = (5, "")
    docs[9] = (9, None)
    docs[13] = (13, "one two three")  # shorter than k -> untouched
    return docs


def _ds(docs):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
    ).repartition(5)


def _run(docs, **kw) -> pd.DataFrame:
    out = exact_substring_dedup(_ds(docs), **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_broadcast_path_matches_brute_force(ray_session):
    docs = _mk_docs(k=4)
    got = _run(docs, k=4)
    want = _py_substr(docs, 4)
    pd.testing.assert_frame_equal(got, want)
    # planted signal actually exercised the operator
    assert (got["n_kept"] < got["n_tokens"]).any()


def test_dup_id_broadcast_path_matches_brute_force(ray_session):
    # drops too big to broadcast, dup-id set fits: clean docs rebuild
    # map-side, only dup docs co-partition (with partitions auto-raised
    # by dup_docs_per_partition)
    docs = _mk_docs(k=4)
    got = _run(docs, k=4, broadcast_max_drops=0, partitions=7,
               dup_docs_per_partition=8)
    want = _py_substr(docs, 4)
    pd.testing.assert_frame_equal(got, want)


def test_full_copartition_path_matches_brute_force(ray_session):
    # neither drops nor dup ids fit: every doc co-partitions with drops
    docs = _mk_docs(k=4)
    got = _run(docs, k=4, broadcast_max_drops=0, broadcast_max_dup_ids=0,
               partitions=7)
    want = _py_substr(docs, 4)
    pd.testing.assert_frame_equal(got, want)


def test_edge_docs_pass_through(ray_session):
    docs = [(0, ""), (1, None), (2, "a b"), (3, "x " * 50 + "y")]
    got = _run(docs, k=8)
    assert got["n_tokens"].tolist() == [0, 0, 2, 51]
    # doc 3's 'x x x ...' run duplicates ITSELF within the doc
    want = _py_substr(docs, 8)
    pd.testing.assert_frame_equal(got, want)


def test_winnow_window_coverage():
    rng = np.random.default_rng(3)
    C = rng.integers(0, 2**63, size=200).astype(np.uint64)
    doc_idx = np.repeat(np.arange(4, dtype=np.int64), 50)
    for w in (2, 5, 9):
        keep = _winnow_select(C, doc_idx, w)
        for s in range(0, 200, 50):
            sel = np.flatnonzero(keep[s : s + 50])
            # every w-window inside the doc contains a selected position
            for a in range(0, 50 - w + 1):
                assert ((sel >= a) & (sel < a + w)).any()


def test_winnowed_drops_subset_of_exact(ray_session):
    docs = _mk_docs(n=40, k=4)
    exact = _run(docs, k=4, window=1)
    winn = _run(docs, k=4, window=3)
    # same tokenization; winnowed keeps a superset of tokens per doc
    assert (winn["n_kept"] >= exact["n_kept"]).all()
    for te, tw in zip(exact["text_clean"], winn["text_clean"]):
        assert set(te.split()) <= set(tw.split()) | set(te.split())
        # every token position exact kept is also winnow-kept: compare as
        # multisets of (token, count) — winnow drops subset of exact drops
        from collections import Counter

        assert not Counter(te.split()) - Counter(tw.split())


def test_winnow_detects_long_runs(ray_session):
    k, w = 4, 4
    run = " ".join(f"m{j}" for j in range(k + w - 1))  # exactly k + w - 1
    docs = [
        (0, "alpha beta " + run + " gamma delta"),
        (1, "zeta " + run + " eta theta iota kappa"),
        (2, "plain filler words only here"),
    ]
    got = _run(docs, k=k, window=w)
    # the later copy (doc 1) lost at least k tokens of the run
    assert got.loc[1, "n_kept"] <= got.loc[1, "n_tokens"] - k
    assert got.loc[0, "n_kept"] == got.loc[0, "n_tokens"]  # first copy intact
    assert got.loc[2, "n_kept"] == got.loc[2, "n_tokens"]


def test_gram_positions_vectorized_matches_naive():
    from abwcf_ray.functions.hashing import hash64

    texts = ["a b c d e", "", "x y", "a b c d e f g"]
    k = 3
    C, doc_idx, pos, lens = _batch_gram_positions(texts, k)
    assert lens.tolist() == [5, 0, 2, 7]
    exp = []
    for i, t in enumerate(texts):
        ws = t.split()
        for p in range(len(ws) - k + 1):
            exp.append((i, p, tuple(ws[p : p + k])))
    assert [(d, p) for d, p in zip(doc_idx, pos)] == [(d, p) for d, p, _ in exp]
    # identical grams hash identically, distinct ones differ here
    seen = {}
    for (d, p, g), c in zip(exp, C):
        if g in seen:
            assert seen[g] == c
        seen[g] = c
    assert len(set(seen.values())) == len(seen)
