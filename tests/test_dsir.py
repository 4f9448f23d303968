"""DSIR importance weighting (stages/dsir.py): gram kernel, fit, scoring,
Gumbel resampling — all against dict/bincount brute-force references."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from abwcf_ray.functions.hashing import hash64
from abwcf_ray.stages.dsir import (
    _batch_gram_hashes,
    add_dsir_logw,
    dsir_exact_hits,
    dsir_log_weights,
    dsir_resample,
    fit_bucket_counts,
)

EN = "the cat and the dog have fun with the ball"
DE = "der hund und die katze spielen mit dem ball gern"


def _brute_grams(text: str) -> list:
    ws = text.split()
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def test_gram_hashes_multiplicity():
    texts = ["a b a b", "x", "", "a a"]
    g, doc = _batch_gram_hashes(texts)
    for i, t in enumerate(texts):
        assert int((doc == i).sum()) == len(_brute_grams(t))
    # identical bigrams hash identically, with multiplicity kept
    g0 = np.sort(g[doc == 0])
    vals, counts = np.unique(g0, return_counts=True)
    # "a b a b": unigrams a×2 b×2, bigrams "a b"×2 "b a"×1
    assert sorted(counts.tolist()) == [1, 2, 2, 2]


def test_fit_bucket_counts_matches_bincount(ray_session):
    texts = [EN, DE, EN + " extra tokens here", "solo"]
    m = 128
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(3)
    got = fit_bucket_counts(ds, m=m)
    g, _ = _batch_gram_hashes(texts)
    ref = np.bincount((g % np.uint64(m)).astype(np.int64), minlength=m)
    np.testing.assert_array_equal(got, ref)


def test_logw_and_resample_brute_force(ray_session):
    rng = np.random.default_rng(3)
    texts = [EN if i % 2 == 0 else DE for i in range(40)]
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64), "text": texts})
    raw = rd.from_pandas(df).repartition(4)
    target = rd.from_pandas(df[df["doc_id"] % 2 == 0])

    m = 256
    tc = fit_bucket_counts(target, m=m)
    rc = fit_bucket_counts(raw, m=m)
    w = dsir_log_weights(tc, rc)

    scored = add_dsir_logw(raw, w, m=m).to_pandas().sort_values("doc_id")

    # brute force per doc
    for _, row in scored.iterrows():
        g, _ = _batch_gram_hashes([texts[int(row["doc_id"])]])
        b = (g % np.uint64(m)).astype(np.int64)
        assert row["dsir_logw"] == pytest.approx(float(w[b].sum()), rel=1e-12)
        assert row["n_grams"] == len(b)

    # EN docs (the target) must outscore DE docs
    en_mean = scored[scored["doc_id"] % 2 == 0]["dsir_logw"].mean()
    de_mean = scored[scored["doc_id"] % 2 == 1]["dsir_logw"].mean()
    assert en_mean > de_mean

    # resample: deterministic, layout-invariant, exact n
    sel_a = dsir_resample(add_dsir_logw(raw, w, m=m), 10, seed=7)
    sel_b = dsir_resample(
        add_dsir_logw(rd.from_pandas(df).repartition(9), w, m=m), 10, seed=7
    )
    assert len(sel_a) == 10
    assert sel_a["doc_id"].tolist() == sel_b["doc_id"].tolist()
    # selection is target-enriched (gumbel noise is bounded vs the logw gap)
    assert (sel_a["doc_id"] % 2 == 0).mean() >= 0.7


def test_dsir_exact_hits_brute_force(ray_session):
    texts = [EN, DE, "the ball", "und die", ""]
    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64), "text": texts})
    raw = rd.from_pandas(df).repartition(2)
    target = rd.from_pandas(df[df["doc_id"].isin([0, 2])])

    out = (
        dsir_exact_hits(raw, target)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    from collections import Counter

    t_cnt = Counter(g for i in (0, 2) for g in _brute_grams(texts[i]))
    r_cnt = Counter(g for t in texts for g in _brute_grams(t))
    for i, t in enumerate(texts):
        gs = _brute_grams(t)
        assert out.loc[i, "n_grams"] == len(gs)
        assert out.loc[i, "target_hits"] == sum(t_cnt.get(g, 0) for g in gs)
        assert out.loc[i, "raw_hits"] == sum(r_cnt.get(g, 0) for g in gs)
