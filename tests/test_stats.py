"""Grouped moment statistics (stages/stats.py): brute-force parity,
layout invariance, exact float discipline on degenerate groups."""

from __future__ import annotations

import numpy as np
import pandas as pd

from abwcf_ray.stages.stats import group_stats


def _frame(n=400, seed=9):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "a": rng.choice(["en", "de", "fr"], n),
            "b": rng.choice(["w", "x", "y", "z"], n),
            "v": rng.integers(-50, 200, n).astype(np.int64),
        }
    )


def _brute(df):
    g = df.groupby(["a", "b"], as_index=False).agg(
        count=("v", "size"),
        sum=("v", "sum"),
        sumsq=("v", lambda s: int((s.to_numpy() ** 2).sum())),
        min=("v", "min"),
        max=("v", "max"),
    )
    for c in ("count", "sum", "sumsq", "min", "max"):
        g[c] = g[c].astype(np.int64)
    n = g["count"].to_numpy()
    s = g["sum"].to_numpy()
    sq = g["sumsq"].to_numpy()
    g["mean"] = s.astype(np.float64) / n
    g["var_pop"] = (n * sq - s * s).astype(np.float64) / (n * n).astype(np.float64)
    return g.sort_values(["a", "b"]).reset_index(drop=True)


def _run(df, parts=6, merge=8):
    import ray.data as rd

    out = group_stats(
        rd.from_pandas(df).repartition(parts),
        group_cols=["a", "b"],
        value_col="v",
        merge_partitions=merge,
    ).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def test_matches_brute_force(ray_session):
    df = _frame()
    got = _run(df)
    cols = ["a", "b", "count", "sum", "sumsq", "min", "max", "mean", "var_pop"]
    pd.testing.assert_frame_equal(got[cols], _brute(df)[cols])


def test_layout_invariance_bit_exact(ray_session):
    df = _frame(seed=17)
    a = _run(df, parts=1, merge=4)
    b = _run(df, parts=11, merge=64)
    pd.testing.assert_frame_equal(a, b)  # exact, incl. float bits


def test_single_row_groups_zero_variance(ray_session):
    df = pd.DataFrame({"a": ["p", "q"], "b": ["r", "s"], "v": [7, -3]})
    got = _run(df, parts=2, merge=2)
    assert (got["var_pop"] == 0.0).all()
    assert (got["mean"] == got["v" if "v" in got else "sum"].astype(float)).all()


def _frame_xy(n=500, seed=17):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "a": rng.choice(["en", "de", "fr"], n),
            "x": rng.integers(-40, 120, n).astype(np.int64),
            "y": rng.integers(0, 30, n).astype(np.int64),
        }
    )


def _brute_cov(df):
    g = df.groupby("a", as_index=False).agg(
        n=("x", "size"),
        sx=("x", "sum"),
        sy=("y", "sum"),
        sxy=("x", lambda s: int((s.to_numpy() * df.loc[s.index, "y"].to_numpy()).sum())),
    )
    num = (g["n"] * g["sxy"] - g["sx"] * g["sy"]).astype(np.float64)
    g["cov_samp"] = np.where(
        g["n"] > 1, num / (g["n"] * (g["n"] - 1)).astype(np.float64), np.nan
    )
    g["cov_pop"] = num / (g["n"] * g["n"]).astype(np.float64)
    return g.sort_values("a").reset_index(drop=True)


def _run_cov(df, blocks):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.stats import group_cov

    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)
    out = group_cov(ds, group_cols=["a"], x_col="x", y_col="y", merge_partitions=8)
    return out.to_pandas().sort_values("a").reset_index(drop=True)


def test_group_cov_matches_bruteforce(ray_session):
    df = _frame_xy()
    got = _run_cov(df, 6)
    want = _brute_cov(df)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_group_cov_bits_layout_invariant(ray_session):
    df = _frame_xy(300, 23)
    a, b = _run_cov(df, 1), _run_cov(df, 13)
    # bit-identical floats, not just approx: partials are exact ints
    assert a["cov_samp"].to_numpy().tobytes() == b["cov_samp"].to_numpy().tobytes()
    pd.testing.assert_frame_equal(a, b)


def test_group_cov_singleton_group_nan(ray_session):
    df = pd.DataFrame({"a": ["solo", "p", "p"], "x": [3, 1, 2], "y": [7, 5, 9]})
    df[["x", "y"]] = df[["x", "y"]].astype(np.int64)
    out = _run_cov(df, 2)
    row = out[out["a"] == "solo"].iloc[0]
    assert np.isnan(row["cov_samp"]) and row["cov_pop"] == 0.0


def _run_mode(df, blocks):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.stats import group_mode

    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)
    out = group_mode(ds, group_cols=["a"], value_col="v", merge_partitions=8)
    return out.to_pandas().sort_values("a").reset_index(drop=True)


def test_group_mode_matches_bruteforce(ray_session):
    rng = np.random.default_rng(31)
    df = pd.DataFrame(
        {
            "a": rng.choice(["p", "q", "r", "s"], 600),
            "v": rng.choice(list("abcde"), 600),
        }
    )
    got = _run_mode(df, 7)
    want = (
        df.groupby(["a", "v"], as_index=False)
        .size()
        .rename(columns={"v": "mode_value", "size": "n"})
        .sort_values(["a", "n", "mode_value"], ascending=[True, False, True])
        .drop_duplicates("a")
        .reset_index(drop=True)
    )
    want["n"] = want["n"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)


def test_group_mode_tie_breaks_smallest_and_layout_invariant(ray_session):
    df = pd.DataFrame({"a": ["g"] * 4, "v": ["z", "b", "z", "b"]})
    for blocks in (1, 3):
        out = _run_mode(df, blocks)
        assert out.to_dict("list") == {"a": ["g"], "mode_value": ["b"], "n": [2]}


def test_group_string_agg_matches_brute(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.stats import group_string_agg

    rng = np.random.default_rng(5)
    n = 300
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 12, n).astype(np.int64),
            "o": np.arange(n, dtype=np.int64),
            "e": rng.choice(["view", "click", "buy"], n),
        }
    )
    df = df.sample(frac=1, random_state=5).reset_index(drop=True)
    ds = rd.from_pandas(df).repartition(5)
    got = (
        group_string_agg(
            ds, group_cols=["u"], value_col="e", order_col="o", sep=">"
        )
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["u", "o"])
        .groupby("u", as_index=False)["e"]
        .agg(">".join)
        .rename(columns={"e": "path"})
        .sort_values("u")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_group_corr_matches_reference(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.stats import group_corr

    rng = np.random.default_rng(31)
    n = 1500
    df = pd.DataFrame(
        {
            "g": rng.choice(["p", "q"], n),
            "x": rng.integers(0, 50, n).astype(np.int64),
        }
    )
    df["y"] = df["x"] * 2 + rng.integers(-5, 6, n).astype(np.int64)
    got = (
        group_corr(
            rd.from_pandas(df).repartition(5),
            group_cols=["g"], x_col="x", y_col="y",
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    for _, r in got.iterrows():
        sub = df[df["g"] == r["g"]]
        nn, sx, sy = len(sub), int(sub.x.sum()), int(sub.y.sum())
        sxx = int((sub.x**2).sum())
        syy = int((sub.y**2).sum())
        sxy = int((sub.x * sub.y).sum())
        want = np.float64(nn * sxy - sx * sy) / np.sqrt(
            np.float64(nn * sxx - sx * sx) * np.float64(nn * syy - sy * sy)
        )
        assert r["corr"] == want  # bit-exact
        # strong linear relation -> corr near 1
        assert r["corr"] > 0.95


def test_group_corr_zero_variance_is_nan(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.stats import group_corr

    df = pd.DataFrame(
        {"g": ["a"] * 4, "x": np.array([3, 3, 3, 3], np.int64),
         "y": np.array([1, 2, 3, 4], np.int64)}
    )
    out = group_corr(
        rd.from_pandas(df), group_cols=["g"], x_col="x", y_col="y"
    ).to_pandas()
    assert np.isnan(out.loc[0, "corr"])


def test_group_regression_matches_reference(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.stats import group_regression

    rng = np.random.default_rng(47)
    n = 1500
    df = pd.DataFrame(
        {
            "g": rng.choice(["p", "q", "r"], n),
            "x": rng.integers(0, 50, n).astype(np.int64),
        }
    )
    df["y"] = df["x"] * 3 + 7 + rng.integers(-4, 5, n).astype(np.int64)
    got = (
        group_regression(
            rd.from_pandas(df).repartition(5),
            group_cols=["g"], x_col="x", y_col="y",
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    for _, r in got.iterrows():
        sub = df[df["g"] == r["g"]]
        nn, sx, sy = len(sub), int(sub.x.sum()), int(sub.y.sum())
        sxx = int((sub.x**2).sum())
        syy = int((sub.y**2).sum())
        sxy = int((sub.x * sub.y).sum())
        num = np.float64(nn * sxy - sx * sy)
        d1 = np.float64(nn * sxx - sx * sx)
        d2 = np.float64(nn * syy - sy * sy)
        slope = num / d1
        intercept = (np.float64(sy) - slope * np.float64(sx)) / np.float64(nn)
        r2 = (num * num) / (d1 * d2)
        assert r["slope"] == slope  # bit-exact
        assert r["intercept"] == intercept
        assert r["r2"] == r2
        # planted line y = 3x + 7 with small noise
        assert abs(r["slope"] - 3.0) < 0.05
        assert abs(r["intercept"] - 7.0) < 1.5
        assert r["r2"] > 0.99


def test_group_regression_zero_x_variance(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.stats import group_regression

    df = pd.DataFrame(
        {"g": ["a"] * 4, "x": np.array([3, 3, 3, 3], np.int64),
         "y": np.array([1, 2, 3, 4], np.int64)}
    )
    out = group_regression(
        rd.from_pandas(df), group_cols=["g"], x_col="x", y_col="y"
    ).to_pandas()
    assert np.isnan(out.loc[0, "slope"])  # 0/0
    assert np.isnan(out.loc[0, "r2"])


def test_group_ohlc_bruteforce_and_layout_invariance(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.stats import group_ohlc

    rng = np.random.default_rng(29)
    n = 400
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "ts": rng.integers(0, 100, n).astype(np.int64),  # heavy ts ties
            "rid": np.arange(n, dtype=np.int64),
            "v": rng.normal(size=n),
        }
    )
    ref_rows = []
    for g, sub in df.groupby("g"):
        s = sub.sort_values(["ts", "rid"], kind="mergesort")
        ref_rows.append(
            (g, s["v"].iloc[0], s["v"].max(), s["v"].min(), s["v"].iloc[-1], len(s))
        )
    ref = pd.DataFrame(
        ref_rows, columns=["g", "open_v", "hi", "lo", "close_v", "n"]
    ).sort_values("g").reset_index(drop=True)

    for blocks in (1, 7):
        out = (
            group_ohlc(
                rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
                .repartition(blocks),
                group_cols=["g"],
                ts_col="ts",
                id_col="rid",
                value_col="v",
                merge_partitions=4,
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        for c in ["open_v", "hi", "lo", "close_v"]:
            np.testing.assert_array_equal(out[c].to_numpy(), ref[c].to_numpy())
        assert out["n"].tolist() == ref["n"].tolist()


def test_group_time_weighted_bruteforce(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.stats import group_time_weighted

    rng = np.random.default_rng(103)
    n = 400
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 20, n).astype(np.int64),
            "ts": rng.integers(0, 10**9, n).astype(np.int64),  # ~1000 s span
            "rid": np.arange(n, dtype=np.int64),
            "v": rng.uniform(0, 100, n),
        }
    )
    ref = {}
    for uid, sub in df.groupby("u"):
        s = sub.sort_values(["ts", "rid"])
        q = np.floor(s["v"].to_numpy() * 1024.0).astype(np.int64)
        ts = s["ts"].to_numpy(np.int64)
        dt = (ts[1:] - ts[:-1]) // 1_000_000
        num = int((q[:-1] * dt).sum())
        den = int(dt.sum())
        if den > 0:
            ref[uid] = (num, den, num / den)

    for blocks in (1, 6):
        out = (
            group_time_weighted(
                rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
                .repartition(blocks),
                key_col="u",
                ts_col="ts",
                value_col="v",
                id_col="rid",
                merge_partitions=4,
            )
            .to_pandas()
            .sort_values("u")
            .reset_index(drop=True)
        )
        assert len(out) == len(ref)
        for row in out.itertuples():
            num, den, twa = ref[int(row.u)]
            assert (row.num, row.den) == (num, den)
            assert row.twa_q == twa


# ---------------------------------------------------------------- zscore


def test_group_zscore_matches_brute_force(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.stats import group_zscore

    df = _frame(300, seed=3).rename(columns={"a": "g"}).drop(columns=["b"])
    df["id"] = np.arange(len(df))
    out = (
        group_zscore(
            rd.from_pandas(df).repartition(5),
            group_cols=["g"],
            value_col="v",
            merge_partitions=4,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    n = df.groupby("g")["v"].transform("size").to_numpy().astype(np.int64)
    sx = df.groupby("g")["v"].transform("sum").to_numpy().astype(np.int64)
    sxx = (
        df.assign(v2=df["v"].to_numpy() ** 2)
        .groupby("g")["v2"]
        .transform("sum")
        .to_numpy()
        .astype(np.int64)
    )
    x = df["v"].to_numpy().astype(np.float64)
    exp = (x - sx.astype(np.float64) / n) / np.sqrt(
        (n * sxx - sx * sx).astype(np.float64) / (n * n).astype(np.float64)
    )
    np.testing.assert_array_equal(out["z"].to_numpy(), exp)  # bit-exact


def test_group_zscore_zero_variance_group(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.stats import group_zscore

    df = pd.DataFrame({"g": ["a", "a", "b"], "v": [7, 7, 3]})
    out = group_zscore(
        rd.from_pandas(df), group_cols=["g"], value_col="v"
    ).to_pandas()
    za = out.loc[out["g"] == "a", "z"].to_numpy()
    zb = out.loc[out["g"] == "b", "z"].to_numpy()
    assert np.isnan(za).all()  # 0/0 within constant group
    assert np.isnan(zb).all()  # singleton: var 0, x == mean -> 0/0


# ---------------------------------------------------------------- welch


def _welch_brute(df):
    rows = []
    for g, sub in df.groupby("g"):
        stats = {}
        for c in (0, 1):
            v = sub.loc[sub["cohort"] == c, "v"].to_numpy().astype(np.int64)
            stats[c] = (
                np.int64(len(v)),
                np.int64(v.sum()) if len(v) else np.int64(0),
                np.int64((v * v).sum()) if len(v) else np.int64(0),
            )
        n0, sx0, sxx0 = stats[0]
        n1, sx1, sxx1 = stats[1]
        with np.errstate(divide="ignore", invalid="ignore"):
            m0 = np.float64(sx0) / np.float64(n0)
            m1 = np.float64(sx1) / np.float64(n1)
            v0 = np.float64(n0 * sxx0 - sx0 * sx0) / np.float64(n0 * (n0 - 1))
            v1 = np.float64(n1 * sxx1 - sx1 * sx1) / np.float64(n1 * (n1 - 1))
            t = (m1 - m0) / np.sqrt(
                v1 / np.float64(n1) + v0 / np.float64(n0)
            )
        rows.append(
            dict(g=g, n0=n0, n1=n1, sx0=sx0, sx1=sx1, sxx0=sxx0, sxx1=sxx1, t=t)
        )
    return pd.DataFrame(rows).sort_values("g").reset_index(drop=True)


def test_group_welch_matches_brute_force(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.stats import group_welch_t

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "g": rng.choice(["en", "de", "fr", "it"], 500),
            "cohort": rng.integers(0, 2, 500).astype(np.int64),
            "v": rng.integers(0, 1000, 500).astype(np.int64),
        }
    )
    out = (
        group_welch_t(
            rd.from_pandas(df).repartition(7),
            group_cols=["g"],
            cohort_col="cohort",
            value_col="v",
            merge_partitions=4,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    exp = _welch_brute(df)
    cols = ["g", "n0", "n1", "sx0", "sx1", "sxx0", "sxx1", "t"]
    pd.testing.assert_frame_equal(out[cols], exp[cols])


def test_group_welch_degenerate_cohorts(ray_session):
    """Missing cohort and singleton cohort both yield NaN t."""
    import ray.data as rd

    from abwcf_ray.stages.stats import group_welch_t

    df = pd.DataFrame(
        {
            "g": ["a", "a", "a", "b", "b", "c", "c", "c", "c"],
            "cohort": [0, 0, 0, 0, 1, 0, 0, 1, 1],
            "v": [1, 2, 3, 4, 5, 6, 7, 8, 9],
        }
    )
    out = (
        group_welch_t(
            rd.from_pandas(df),
            group_cols=["g"],
            cohort_col="cohort",
            value_col="v",
        )
        .to_pandas()
        .set_index("g")
    )
    assert np.isnan(out.loc["a", "t"])  # cohort 1 missing
    assert np.isnan(out.loc["b", "t"])  # both cohorts singletons
    assert np.isfinite(out.loc["c", "t"])  # 2 vs 2: defined
    assert out.loc["a", "n1"] == 0 and out.loc["a", "sx1"] == 0


def test_group_welch_t_rejects_bad_cohort(ray_session):
    """ADVICE r4 low: a cohort value outside {0, 1} must raise, not be
    silently dropped by the 0/1 pivot."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from abwcf_ray.stages.stats import group_welch_t

    df = pd.DataFrame(
        {"g": ["x", "x", "x"], "cohort": [0, 1, 2], "v": [1, 2, 3]}
    )
    with pytest.raises(Exception) as ei:
        group_welch_t(
            rd.from_pandas(df),
            group_cols=["g"],
            cohort_col="cohort",
            value_col="v",
        ).to_pandas()
    assert "cohort" in str(ei.value)
