"""Keyed window functions (stages/winfun.py): brute-force pandas parity,
layout invariance, string keys, sentinel semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from abwcf_ray.stages.winfun import keyed_window_functions


def _brute(df: pd.DataFrame, key, order, sum_col, lag_col, sentinel=-1):
    df = df.sort_values([key, *order], kind="mergesort").reset_index(drop=True)
    g = df.groupby(key, sort=False)
    out = df.copy()
    out["rn"] = g.cumcount() + 1
    if sum_col:
        out["run_sum"] = g[sum_col].cumsum()
    if lag_col:
        out["lag_prev"] = g[lag_col].shift(1).fillna(sentinel).astype(np.int64)
    return out


def _frame(n=500, keys=37, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, keys, n).astype(np.int64),
            "ts": rng.integers(0, 50, n).astype(np.int64),  # heavy ties
            "v": rng.integers(-100, 100, n).astype(np.int64),
        }
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("id").reset_index(drop=True)


def test_matches_brute_force(ray_session):
    import ray.data as rd

    df = _frame()
    got = keyed_window_functions(
        rd.from_pandas(df).repartition(7),
        key_col="k",
        order_cols=["ts", "id"],
        sum_col="v",
        lag_col="ts",
        partitions=8,
    ).to_pandas()
    exp = _brute(df, "k", ["ts", "id"], "v", "ts")
    cols = ["id", "k", "ts", "v", "rn", "run_sum", "lag_prev"]
    pd.testing.assert_frame_equal(_canon(got)[cols], _canon(exp)[cols])


def test_layout_invariance(ray_session):
    import ray.data as rd

    df = _frame(seed=11)
    outs = []
    for parts in (1, 3, 13):
        got = keyed_window_functions(
            rd.from_pandas(df).repartition(parts),
            key_col="k",
            order_cols=["ts", "id"],
            sum_col="v",
            lag_col="v",
            partitions=4,
        ).to_pandas()
        outs.append(_canon(got)[["id", "rn", "run_sum", "lag_prev"]])
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_string_keys_and_single_row_groups(ray_session):
    import ray.data as rd

    df = _frame(n=40, keys=40, seed=3)
    df["k"] = "host-" + df["k"].astype(str)
    got = keyed_window_functions(
        rd.from_pandas(df),
        key_col="k",
        order_cols=["ts", "id"],
        sum_col="v",
        lag_col="ts",
        partitions=8,
    ).to_pandas()
    exp = _brute(df, "k", ["ts", "id"], "v", "ts")
    cols = ["id", "k", "rn", "run_sum", "lag_prev"]
    pd.testing.assert_frame_equal(_canon(got)[cols], _canon(exp)[cols])
    # every single-row key: rn == 1, lag == sentinel
    firsts = got[got["rn"] == 1]
    assert (firsts["lag_prev"] == -1).all()


def test_rn_only_no_optional_columns(ray_session):
    import ray.data as rd

    df = _frame(n=60, keys=5, seed=5)
    got = keyed_window_functions(
        rd.from_pandas(df), key_col="k", order_cols=["ts", "id"]
    ).to_pandas()
    assert "run_sum" not in got.columns and "lag_prev" not in got.columns
    exp = _brute(df, "k", ["ts", "id"], None, None)
    pd.testing.assert_frame_equal(
        _canon(got)[["id", "rn"]], _canon(exp)[["id", "rn"]]
    )


def test_negative_values_exact(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "id": np.arange(6, dtype=np.int64),
            "k": np.array([1, 1, 1, 2, 2, 2], np.int64),
            "ts": np.array([3, 1, 2, 9, 9, 9], np.int64),
            "v": np.array([-5, 10, -20, 7, -7, 0], np.int64),
        }
    )
    got = keyed_window_functions(
        rd.from_pandas(df),
        key_col="k",
        order_cols=["ts", "id"],
        sum_col="v",
        lag_col="v",
    ).to_pandas()
    exp = _brute(df, "k", ["ts", "id"], "v", "v")
    cols = ["id", "rn", "run_sum", "lag_prev"]
    pd.testing.assert_frame_equal(_canon(got)[cols], _canon(exp)[cols])


def _brute_dense_ntile(df, key, rank_col, tiebreak, t):
    df = df.sort_values([key, rank_col, tiebreak], kind="mergesort").reset_index(
        drop=True
    )
    out = df.copy()
    dense, tiles = [], []
    for _, g in df.groupby(key, sort=False):
        v = g[rank_col].to_numpy()
        d = np.ones(len(g), np.int64)
        d[1:] += np.cumsum(v[1:] != v[:-1])
        dense.append(d)
        cnt = len(g)
        q, r = divmod(cnt, t)
        buckets = []
        for b in range(1, t + 1):
            buckets.extend([b] * (q + (1 if b <= r else 0)))
        tiles.append(np.array(buckets[:cnt], np.int64))
    out["dense_rank"] = np.concatenate(dense)
    out["ntile"] = np.concatenate(tiles)
    return out


@pytest.mark.parametrize("t", [1, 3, 4, 50])
def test_dense_rank_and_ntile_match_brute_force(ray_session, t):
    import ray.data as rd

    df = _frame(seed=21)
    got = keyed_window_functions(
        rd.from_pandas(df).repartition(5),
        key_col="k",
        order_cols=["ts", "id"],
        dense_rank_cols=["ts"],
        ntile=t,
        partitions=8,
    ).to_pandas()
    exp = _brute_dense_ntile(df, "k", "ts", "id", t)
    cols = ["id", "k", "ts", "dense_rank", "ntile"]
    pd.testing.assert_frame_equal(_canon(got)[cols], _canon(exp)[cols])


def test_dense_rank_cols_must_prefix_order_cols(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError):
        keyed_window_functions(
            rd.from_pandas(_frame(n=10)),
            key_col="k",
            order_cols=["ts", "id"],
            dense_rank_cols=["id"],
        )


def test_roll_sum_matches_pandas(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.winfun import keyed_window_functions

    rng = np.random.default_rng(8)
    n = 500
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 9, n).astype(np.int64),
            "o": rng.permutation(n).astype(np.int64),
            "v": rng.integers(-20, 90, n).astype(np.int64),
        }
    )
    got = (
        keyed_window_functions(
            rd.from_pandas(df).repartition(6),
            key_col="k",
            order_cols=["o"],
            sum_col="v",
            roll_rows=4,
            partitions=8,
        )
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    want = df.sort_values(["k", "o"]).reset_index(drop=True)
    want["roll"] = (
        want.groupby("k")["v"].rolling(4, min_periods=1).sum().to_numpy()
    )
    np.testing.assert_array_equal(
        got["roll_sum"].to_numpy(), want["roll"].to_numpy(np.int64)
    )


def test_roll_rows_requires_sum_col(ray_session):
    import pytest as _pytest
    import ray.data as rd

    from abwcf_ray.stages.winfun import keyed_window_functions

    ds = rd.from_pandas(pd.DataFrame({"k": [1], "o": [1]}))
    with _pytest.raises(ValueError):
        keyed_window_functions(
            ds, key_col="k", order_cols=["o"], roll_rows=3
        )


def test_rank_pct_cume_match_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from abwcf_ray.stages.winfun import keyed_window_functions

    rng = np.random.default_rng(21)
    n = 400
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, n).astype(np.int64),
            "v": rng.integers(0, 9, n).astype(np.int64),  # heavy ties
            "i": np.arange(n, dtype=np.int64),
        }
    )
    got = (
        keyed_window_functions(
            rd.from_pandas(df).repartition(5),
            key_col="k",
            order_cols=["v", "i"],
            rank_cols=["v"],
            partitions=8,
        )
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        """
        SELECT i, CAST(RANK() OVER w AS BIGINT) AS rank,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume_dist
        FROM df WINDOW w AS (PARTITION BY k ORDER BY v) ORDER BY i
        """
    ).df()
    np.testing.assert_array_equal(got["rank"].to_numpy(), want["rank"].to_numpy())
    np.testing.assert_array_equal(
        got["pct_rank"].to_numpy(), want["pct_rank"].to_numpy()
    )
    np.testing.assert_array_equal(
        got["cume_dist"].to_numpy(), want["cume_dist"].to_numpy()
    )


def test_pct_rank_single_row_key_is_zero(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.winfun import keyed_window_functions

    df = pd.DataFrame(
        {"k": np.array([1, 2, 2], np.int64), "v": np.array([5, 3, 3], np.int64),
         "i": np.arange(3, dtype=np.int64)}
    )
    out = (
        keyed_window_functions(
            rd.from_pandas(df),
            key_col="k",
            order_cols=["v", "i"],
            rank_cols=["v"],
        )
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    assert out.loc[0, "pct_rank"] == 0.0
    assert out.loc[0, "cume_dist"] == 1.0
    # the tied pair in key 2 shares rank 1 and cume_dist 1.0
    assert out.loc[1, "rank"] == 1 and out.loc[2, "rank"] == 1
    assert out.loc[1, "cume_dist"] == 1.0 and out.loc[2, "cume_dist"] == 1.0


def test_cumulative_distinct_bruteforce_and_layout_invariance(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.winfun import cumulative_distinct

    rng = np.random.default_rng(37)
    n = 500
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 20, n).astype(np.int64),
            "ts": rng.integers(0, 50, n).astype(np.int64),  # heavy ties
            "rid": np.arange(n, dtype=np.int64),
            "v": rng.choice(["a", "b", "c", "d"], n),
        }
    )
    # brute force: per user in (ts, rid) order, count distinct v so far
    ref = {}
    for _, sub in df.groupby("u"):
        seen = set()
        for _, row in sub.sort_values(["ts", "rid"]).iterrows():
            seen.add(row["v"])
            ref[row["rid"]] = len(seen)

    for blocks in (1, 7):
        out = (
            cumulative_distinct(
                rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
                .repartition(blocks),
                key_col="u",
                order_cols=["ts", "rid"],
                value_col="v",
                out_col="nd",
                id_col="rid",
                partitions=4,
            )
            .to_pandas()
            .sort_values("rid")
            .reset_index(drop=True)
        )
        assert out["nd"].tolist() == [ref[r] for r in out["rid"]]
        assert len(out) == n


def test_range_frame_agg_bruteforce_with_ties(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.winfun import range_frame_agg

    rng = np.random.default_rng(43)
    n = 400
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 15, n).astype(np.int64),
            "ts": rng.integers(0, 200, n).astype(np.int64),  # heavy ties
            "rid": np.arange(n, dtype=np.int64),
            "w": rng.integers(0, 50, n).astype(np.int64),
        }
    )
    X = 30
    # brute force: frame of row i = all rows j of the key with
    # ts_j in [ts_i - X, ts_i] (RANGE semantics: peers included)
    ref_n, ref_w = {}, {}
    for _, sub in df.groupby("u"):
        ts = sub["ts"].to_numpy()
        w = sub["w"].to_numpy()
        for rid, t in zip(sub["rid"], ts):
            m = (ts >= t - X) & (ts <= t)
            ref_n[rid] = int(m.sum())
            ref_w[rid] = int(w[m].sum())

    for blocks in (1, 8):
        out = (
            range_frame_agg(
                rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
                .repartition(blocks),
                key_col="u",
                ts_col="ts",
                weight_col="w",
                range_preceding=X,
                id_col="rid",
                partitions=4,
            )
            .to_pandas()
            .sort_values("rid")
            .reset_index(drop=True)
        )
        assert out["n_frame"].tolist() == [ref_n[r] for r in out["rid"]]
        assert out["w_frame"].tolist() == [ref_w[r] for r in out["rid"]]


def test_last_match_before_bruteforce(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.winfun import last_match_before

    rng = np.random.default_rng(83)
    n = 500
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 20, n).astype(np.int64),
            "ts": rng.integers(0, 100, n).astype(np.int64),
            "rid": np.arange(n, dtype=np.int64),
            "is_src": (rng.random(n) < 0.4).astype(np.int64),
            "is_tgt": (rng.random(n) < 0.3).astype(np.int64),
        }
    )
    ref = {}
    for _, sub in df.groupby("u"):
        sub = sub.sort_values(["ts", "rid"])
        last_src = -1
        for row in sub.itertuples():
            if row.is_tgt:
                ref[row.rid] = last_src
            if row.is_src:
                last_src = row.rid
    for blocks in (1, 7):
        out = (
            last_match_before(
                rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
                .repartition(blocks),
                key_col="u",
                order_cols=["ts", "rid"],
                source_col="is_src",
                target_col="is_tgt",
                id_col="rid",
                partitions=4,
            )
            .to_pandas()
            .sort_values("rid")
            .reset_index(drop=True)
        )
        assert len(out) == len(ref)
        assert out["attr_id"].tolist() == [ref[r] for r in out["rid"]]


def test_run_max_drawdown_bruteforce(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.winfun import keyed_window_functions

    rng = np.random.default_rng(131)
    n = 300
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 10, n).astype(np.int64),
            "o": rng.permutation(n).astype(np.int64),
            "v": rng.integers(-50, 50, n).astype(np.int64),
        }
    )
    ref = {}
    for _, sub in df.groupby("u"):
        cm = -10**9
        for row in sub.sort_values("o").itertuples():
            cm = max(cm, row.v)
            ref[row.o] = (cm, cm - row.v)
    out = keyed_window_functions(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
        .repartition(6),
        key_col="u",
        order_cols=["o"],
        max_col="v",
        partitions=4,
    ).to_pandas()
    for row in out.itertuples():
        assert (row.run_max, row.drawdown) == ref[row.o]
