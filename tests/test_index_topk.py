"""Inverted postings (stages/index.py) and per-group top-k
(stages/sample.topk_per_group) — brute-force parity, tie determinism,
layout invariance, empty inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _docs_df(n: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 30)))
        for _ in range(n)
    ]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


def _brute_postings(df: pd.DataFrame, min_df: int) -> pd.DataFrame:
    rows = {}
    for doc_id, text in zip(df["doc_id"], df["text"]):
        for w in set(text.split()):
            rows.setdefault(w, []).append(int(doc_id))
    out = pd.DataFrame(
        [
            (w, len(ids), ",".join(map(str, sorted(ids))))
            for w, ids in rows.items()
            if len(ids) >= min_df
        ],
        columns=["word", "df", "postings"],
    )
    return out.sort_values("word").reset_index(drop=True)


@pytest.mark.parametrize("blocks", [1, 7])
def test_term_postings_matches_brute_force(ray_session, blocks):
    import ray.data as rd

    from abwcf_ray.stages.index import term_postings

    df = _docs_df(300, seed=5)
    ds = rd.from_pandas(df).repartition(blocks)
    got = (
        term_postings(ds, min_df=3)
        .to_pandas()
        .sort_values("word")
        .reset_index(drop=True)
    )
    exp = _brute_postings(df, min_df=3)
    got["df"] = got["df"].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


def test_term_postings_empty_and_min_df_floor(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.index import term_postings

    df = pd.DataFrame({"doc_id": np.array([1, 2], np.int64),
                       "text": ["unique1 shared", "unique2 shared"]})
    got = term_postings(rd.from_pandas(df), min_df=2).to_pandas()
    assert got["word"].tolist() == ["shared"]
    assert got["postings"].tolist() == ["1,2"]
    # min_df above every df -> empty result, no crash
    got2 = term_postings(rd.from_pandas(df), min_df=5).to_pandas()
    assert len(got2) == 0


def _brute_topk(df: pd.DataFrame, k: int) -> pd.DataFrame:
    out = (
        df.sort_values(["g", "score", "doc_id"], ascending=[True, False, True])
        .groupby("g", sort=True)
        .head(k)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out


@pytest.mark.parametrize("blocks", [1, 5])
def test_topk_per_group_matches_brute_force(ray_session, blocks):
    import ray.data as rd

    from abwcf_ray.stages.sample import topk_per_group

    rng = np.random.default_rng(9)
    n = 1_000
    # many ties: scores drawn from a tiny domain
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "g": [f"g{i}" for i in rng.integers(0, 23, size=n)],
            "score": rng.integers(0, 7, size=n).astype(np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(blocks)
    got = (
        topk_per_group(ds, 4, group_col="g", score_col="score", id_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "g", "score"]]
    )
    exp = _brute_topk(df, 4)[["doc_id", "g", "score"]]
    pd.testing.assert_frame_equal(got, exp)


def test_topk_per_group_int_groups_and_ascending(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.sample import topk_per_group

    df = pd.DataFrame(
        {
            "doc_id": np.arange(10, dtype=np.int64),
            "g": np.array([0, 0, 0, 1, 1, 1, 2, 2, 2, 2], np.int64),
            "score": np.array([5, 3, 9, 1, 1, 2, 7, 7, 7, 0], np.int64),
        }
    )
    got = (
        topk_per_group(
            rd.from_pandas(df), 2, group_col="g", score_col="score",
            id_col="doc_id", descending=False,
        )
        .to_pandas()
        .sort_values("doc_id")["doc_id"]
        .tolist()
    )
    # ascending: smallest scores win; ties break on doc_id asc
    # g0: scores 3(id1),5(id0) | g1: 1(id3),1(id4) | g2: 0(id9),7(id6)
    assert got == [0, 1, 3, 4, 6, 9]


@pytest.mark.parametrize("blocks", [1, 7])
def test_topk_per_group_multikey_matches_sql_order(ray_session, blocks):
    import ray.data as rd

    from abwcf_ray.stages.sample import topk_per_group

    rng = np.random.default_rng(13)
    n = 800
    # heavy primary-key ties so the secondary key + id tiebreak matter
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "g": rng.integers(0, 5, n).astype(np.int64),
            "a": np.round(rng.uniform(0, 3, n), 1),  # float, ~30 values
            "b": rng.integers(0, 4, n).astype(np.int64),
        }
    )
    got = (
        topk_per_group(
            rd.from_pandas(df).repartition(blocks),
            3,
            group_col="g",
            score_col=["a", "b"],
            descending=[True, False],
            id_col="doc_id",
        )
        .to_pandas()
        .sort_values("doc_id")["doc_id"]
        .tolist()
    )
    exp = (
        df.sort_values(
            ["g", "a", "b", "doc_id"], ascending=[True, False, True, True]
        )
        .groupby("g")
        .head(3)
        .sort_values("doc_id")["doc_id"]
        .tolist()
    )
    assert got == exp


def test_longest_prefix_route(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.index import longest_prefix_route

    urls = [
        "/u/1/t/click",   # matches /u/1 AND /u/1/t/click -> longest wins
        "/u/12/t/view",   # matches /u/1 AND /u/12 -> /u/12
        "/u/10/t/error",  # matches /u/1 AND /u/10 -> /u/10
        "/u/3/t/view",    # matches /u/3
        "/u/99/t/click",  # no rule -> dropped
    ]
    ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())})).repartition(2)
    out = (
        longest_prefix_route(
            ds,
            rules=["/u/1", "/u/1/t/click", "/u/12", "/u/3", "/u/10"],
            key_col="url",
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    got = dict(zip(out["url"], out["rule"]))
    assert got == {
        "/u/1/t/click": "/u/1/t/click",
        "/u/12/t/view": "/u/12",
        "/u/10/t/error": "/u/10",
        "/u/3/t/view": "/u/3",
    }


def test_conjunctive_search_token_boundaries(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.index import conjunctive_search

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "spark join window",        # all three -> kept
                    "sparkle join window",      # 'spark' only as substring -> dropped
                    "join window",              # missing spark -> dropped
                    "window spark mid join x",  # all three any order -> kept
                ],
                pa.string(),
            ),
        }
    )
    out = conjunctive_search(
        rd.from_arrow(docs),
        terms=["spark", "join", "window"],
    ).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 3]
