"""Markov transition matrix (stages/transitions.py) vs a pandas shift()
reference, under block-layout variation and single-event users."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from abwcf_ray.stages.transitions import transition_matrix


def _ref(df: pd.DataFrame) -> pd.DataFrame:
    d = df.sort_values(["user_id", "ts", "event_id"])
    nxt = d.groupby("user_id")["event_type"].shift(-1)
    pairs = pd.DataFrame({"src": d["event_type"], "dst": nxt}).dropna()
    m = (
        pairs.groupby(["src", "dst"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    m["n"] = m["n"].astype(np.int64)
    m["p"] = m["n"] / m.groupby("src")["n"].transform("sum")
    return m


def _events(seed: int, n: int, n_users: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01", "us").astype(np.int64)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": (base + rng.integers(0, 10**9, n)).astype("datetime64[us]"),
            "user_id": rng.integers(0, n_users, n).astype(np.int64),
            "event_type": rng.choice(["view", "cart", "buy", "search"], n),
        }
    )


def _run(df: pd.DataFrame, blocks: int) -> pd.DataFrame:
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)
    return transition_matrix(
        ds,
        user_col="user_id",
        order_cols=["ts", "event_id"],
        type_col="event_type",
        partitions=8,
    )


def test_transition_matrix_matches_pandas(ray_session):
    df = _events(7, 3000, 40)
    pd.testing.assert_frame_equal(_run(df, 6), _ref(df))


def test_transition_matrix_layout_invariance(ray_session):
    df = _events(11, 900, 5)
    pd.testing.assert_frame_equal(_run(df, 1), _run(df, 17))


def test_transition_matrix_single_event_users_drop_out(ray_session):
    # users with one event contribute no transition; a lone pair counts once
    df = pd.DataFrame(
        {
            "event_id": np.array([0, 1, 2], np.int64),
            "ts": np.array(
                ["2024-01-01T00:00:00"] * 3, dtype="datetime64[us]"
            ),
            "user_id": np.array([1, 2, 2], np.int64),
            "event_type": ["view", "view", "buy"],
        }
    )
    out = _run(df, 2)
    assert out.to_dict("list") == {
        "src": ["view"],
        "dst": ["buy"],
        "n": [1],
        "p": [1.0],
    }


def test_longest_streak_bruteforce(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from abwcf_ray.stages.transitions import longest_streak

    rng = np.random.default_rng(13)
    n = 300
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts_us": rng.integers(0, 1000, n).astype(np.int64),
            "user_id": rng.integers(0, 9, n).astype(np.int64),
            "event_type": rng.choice(["a", "b"], n),
        }
    )
    out = (
        longest_streak(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
            .repartition(4),
            user_col="user_id",
            order_cols=["ts_us", "event_id"],
            type_col="event_type",
            partitions=4,
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ref = {}
    for uid, sub in df.sort_values(["ts_us", "event_id"]).groupby("user_id"):
        best = cur = 0
        prev = None
        for t in sub["event_type"]:
            cur = cur + 1 if t == prev else 1
            best = max(best, cur)
            prev = t
        ref[uid] = best
    assert dict(zip(out["user_id"], out["max_streak"])) == ref


def test_distinct_value_islands_bruteforce(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.transitions import distinct_value_islands

    rng = np.random.default_rng(47)
    n = 500
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 25, n).astype(np.int64),
            "v": rng.integers(0, 40, n).astype(np.int64),  # many dup values
        }
    )
    ref_rows = []
    for uid, sub in df.groupby("u"):
        vals = sorted(set(sub["v"]))
        runs, cur = [], 1
        for a, b in zip(vals, vals[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        ref_rows.append((uid, len(vals), len(runs), max(runs)))
    ref = pd.DataFrame(
        ref_rows, columns=["u", "n_values", "n_islands", "longest"]
    ).sort_values("u").reset_index(drop=True)

    for blocks in (1, 6):
        out = (
            distinct_value_islands(
                rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
                .repartition(blocks),
                key_col="u",
                value_col="v",
                partitions=4,
            )
            .to_pandas()
            .sort_values("u")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, ref)


def test_ngram_path_counts_bruteforce(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.transitions import ngram_path_counts

    rng = np.random.default_rng(89)
    n = 400
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 12, n).astype(np.int64),
            "ts": rng.integers(0, 80, n).astype(np.int64),
            "rid": np.arange(n, dtype=np.int64),
            "t": rng.choice(["a", "b", "c"], n),
        }
    )
    ref = {}
    for _, sub in df.groupby("u"):
        ts = sub.sort_values(["ts", "rid"])["t"].tolist()
        for i in range(len(ts) - 2):
            k = (ts[i], ts[i + 1], ts[i + 2])
            ref[k] = ref.get(k, 0) + 1

    for blocks in (1, 6):
        out = ngram_path_counts(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
            .repartition(blocks),
            user_col="u",
            order_cols=["ts", "rid"],
            type_col="t",
            n=3,
            partitions=4,
        )
        got = {
            (r.t1, r.t2, r.t3): r.cnt for r in out.itertuples()
        }
        assert got == ref
