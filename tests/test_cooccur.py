"""Co-occurrence (stages/cooccur.py): brute-force parity, layout
invariance, max_doc_terms truncation, and the shared pair-explode
gather (segment_pair_indices) against itertools."""

from __future__ import annotations

import itertools
import re

import numpy as np
import pandas as pd

from abwcf_ray.stages.cooccur import cooccurrence, cooccurrence_lift
from abwcf_ray.stages.fuzzy import segment_pair_indices


def test_segment_pair_indices_matches_itertools():
    rng = np.random.default_rng(3)
    lens = rng.integers(0, 9, 40)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    ai, bi = segment_pair_indices(starts, lens.astype(np.int64))
    want = {
        (s + i, s + j)
        for s, ln in zip(starts, lens)
        for i, j in itertools.combinations(range(ln), 2)
    }
    got = set(zip(ai.tolist(), bi.tolist()))
    assert got == want and len(ai) == len(want)


def test_segment_pair_indices_empty():
    e = np.empty(0, np.int64)
    ai, bi = segment_pair_indices(e, e)
    assert len(ai) == 0 and len(bi) == 0


def _brute_pairs(texts, min_count, max_doc_terms=None):
    counts: dict = {}
    for t in texts:
        toks = sorted(set(re.findall(r"[a-z]{4,}", t.lower())))
        if max_doc_terms is not None:
            toks = toks[:max_doc_terms]
        for a, b in itertools.combinations(toks, 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    rows = [
        {"w1": a, "w2": b, "n": n}
        for (a, b), n in counts.items()
        if n >= min_count
    ]
    return (
        pd.DataFrame(rows, columns=["w1", "w2", "n"])
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )


_TEXTS = [
    "Apple banana cherry apple",
    "banana cherry dates",
    "apple cherry elder figs",
    "short wo rd s only",
    "",
    "Banana apple cherry cherry banana",
    "dates figs grape apple banana",
]


def _ds(texts, parallelism=3):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({"text": texts})).repartition(
        parallelism
    )


def test_cooccurrence_matches_brute(ray_session):
    got = (
        cooccurrence(_ds(_TEXTS), min_count=2, partitions=4)
        .to_pandas()
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )
    want = _brute_pairs(_TEXTS, 2)
    pd.testing.assert_frame_equal(got, want)


def test_cooccurrence_layout_invariant(ray_session):
    a = (
        cooccurrence(_ds(_TEXTS, 1), min_count=1, partitions=2)
        .to_pandas()
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )
    b = (
        cooccurrence(_ds(_TEXTS, 7), min_count=1, partitions=5)
        .to_pandas()
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_cooccurrence_max_doc_terms(ray_session):
    got = (
        cooccurrence(_ds(_TEXTS), min_count=1, max_doc_terms=2, partitions=4)
        .to_pandas()
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )
    want = _brute_pairs(_TEXTS, 1, max_doc_terms=2)
    pd.testing.assert_frame_equal(got, want)


def test_cooccurrence_lift_values(ray_session):
    got = (
        cooccurrence_lift(_ds(_TEXTS), min_count=2, partitions=4)
        .to_pandas()
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )
    df: dict = {}
    for t in _TEXTS:
        for w in set(re.findall(r"[a-z]{4,}", t.lower())):
            df[w] = df.get(w, 0) + 1
    want = _brute_pairs(_TEXTS, 2)
    want["lift"] = [
        float(np.float64(int(n) * len(_TEXTS)) / np.float64(df[a] * df[b]))
        for a, b, n in want.itertuples(index=False)
    ]
    pd.testing.assert_frame_equal(got, want)
