"""Unigram-LM rarity scoring (stages/lm.py) vs brute-force oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def _brute_force(df: pd.DataFrame, vocab_size: int) -> pd.DataFrame:
    toks = df["text"].fillna("").str.split()
    counts = pd.Series([w for ts in toks for w in ts]).value_counts()
    vocab = (
        counts.rename("cnt")
        .reset_index()
        .rename(columns={"index": "w"})
        .sort_values(["cnt", "w"], ascending=[False, True], kind="stable")
        .head(vocab_size)
    )
    rank = {w: i + 1 for i, w in enumerate(vocab["w"])}
    oov = vocab_size + 1
    n = toks.map(len).to_numpy(np.int64)
    rs = np.array(
        [sum(rank.get(w, oov) for w in ts) for ts in toks], dtype=np.int64
    )
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy(),
            "n_lm_tokens": n,
            "rank_sum": rs,
            "mean_rank": rs / np.maximum(n, 1),
        }
    )


def test_lm_rarity_matches_brute_force(docs):
    from abwcf_ray.stages.lm import lm_rarity_score

    out = (
        lm_rarity_score(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        _brute_force(docs.to_pandas(), 65536)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for col in ("n_lm_tokens", "rank_sum"):
        assert (out[col].to_numpy() == exp[col].to_numpy()).all(), col
    # single IEEE division on both sides -> bit-identical
    assert (out["mean_rank"].to_numpy() == exp["mean_rank"].to_numpy()).all()
    assert set(out["lm_bucket"]) <= {"head", "middle", "tail"}


def test_lm_rarity_oov_path(docs):
    """A tiny vocabulary forces the OOV rank (vocab_size + 1) on most
    tokens — exercises the truncation tie-break (count DESC, word ASC)."""
    from abwcf_ray.stages.lm import lm_rarity_score

    v = 7
    out = (
        lm_rarity_score(docs, vocab_size=v)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        _brute_force(docs.to_pandas(), v)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (out["rank_sum"].to_numpy() == exp["rank_sum"].to_numpy()).all()
    # OOV actually hit: some doc's rank_sum exceeds n * v
    assert (out["rank_sum"] > out["n_lm_tokens"] * v).any()


def test_lm_rarity_block_layout_invariant(docs):
    """Scores are a pure function of the corpus, not of block boundaries."""
    from abwcf_ray.stages.lm import lm_rarity_score

    a = (
        lm_rarity_score(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        lm_rarity_score(docs.repartition(13))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_top_keywords_brute_force(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.lm import top_keywords

    texts = [
        "apple apple banana cherry",      # tf: apple 2 -> keyword apple
        "banana cherry cherry banana",    # tie tf 2/2 -> lower df wins
        "unique",                         # singleton
        "apple banana",                   # tf tie 1/1 -> df: cherry absent; apple df vs banana df
    ]
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64), "text": texts})
    out = (
        top_keywords(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # brute force
    import collections

    toks = [t.split() for t in texts]
    dfc = collections.Counter()
    for ts in toks:
        dfc.update(set(ts))
    exp = []
    for i, ts in enumerate(toks):
        tf = collections.Counter(ts)
        best = sorted(tf.items(), key=lambda kv: (-kv[1], dfc[kv[0]], kv[0]))[0]
        exp.append((i, best[0], best[1], dfc[best[0]]))
    got = list(
        zip(out["doc_id"], out["keyword"], out["tf"], out["df"])
    )
    assert [tuple(map(lambda x: x if isinstance(x, str) else int(x), g)) for g in got] == exp


def test_top_keywords_layout_invariant(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.lm import top_keywords

    rng = np.random.default_rng(4)
    texts = [
        " ".join(f"w{j}" for j in rng.integers(0, 40, 25)) for _ in range(120)
    ]
    df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64), "text": texts})
    a = top_keywords(rd.from_pandas(df).repartition(2)).to_pandas().sort_values("doc_id")
    b = top_keywords(rd.from_pandas(df).repartition(9)).to_pandas().sort_values("doc_id")
    assert a["keyword"].tolist() == b["keyword"].tolist()
    assert a["df"].tolist() == b["df"].tolist()
