"""Resample + forward fill (stages/resample.py) vs a pandas reference
(groupby + reindex + ffill), under layout variation and bucket-boundary
tie cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from abwcf_ray.stages.resample import resample_ffill

SPAN = 3_600_000_000  # 1 hour in us


def _ref(df: pd.DataFrame) -> pd.DataFrame:
    d = df.copy()
    d["bucket"] = d["ts"].astype("datetime64[us]").astype(np.int64) // SPAN
    d = d.sort_values(["user_id", "bucket", "ts", "event_id"])
    obs = d.groupby(["user_id", "bucket"], as_index=False).last()
    rows = []
    for uid, g in obs.groupby("user_id"):
        full = pd.DataFrame(
            {"bucket": np.arange(g["bucket"].min(), g["bucket"].max() + 1)}
        )
        m = full.merge(g[["bucket", "value"]], on="bucket", how="left")
        m["observed"] = m["value"].notna().astype(np.int64)
        m["value"] = m["value"].ffill()
        m.insert(0, "user_id", uid)
        rows.append(m)
    return (
        pd.concat(rows, ignore_index=True)
        .sort_values(["user_id", "bucket"])
        .reset_index(drop=True)
    )


def _events(seed: int, n: int, n_users: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = base + rng.integers(0, 40 * SPAN, n)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts.astype("datetime64[us]"),
            "user_id": rng.integers(0, n_users, n).astype(np.int64),
            "value": np.round(rng.uniform(0, 100, n), 2),
        }
    )


def _run(df: pd.DataFrame, blocks: int) -> pd.DataFrame:
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)
    out = resample_ffill(
        ds,
        key_col="user_id",
        ts_col="ts",
        val_col="value",
        tie_col="event_id",
        span_us=SPAN,
        partitions=8,
    ).to_pandas()
    return out.sort_values(["user_id", "bucket"]).reset_index(drop=True)


def test_resample_ffill_matches_pandas(ray_session):
    df = _events(3, 2000, 25)
    ref = _ref(df)
    out = _run(df, 5)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_resample_ffill_layout_invariance(ray_session):
    df = _events(9, 800, 7)
    a = _run(df, 1)
    b = _run(df, 13)
    pd.testing.assert_frame_equal(a, b)


def _ref_interp(df: pd.DataFrame) -> pd.DataFrame:
    d = df.copy()
    d["bucket"] = d["ts"].astype("datetime64[us]").astype(np.int64) // SPAN
    d = d.sort_values(["user_id", "bucket", "ts", "event_id"])
    obs = d.groupby(["user_id", "bucket"], as_index=False).last()
    rows = []
    for uid, g in obs.groupby("user_id"):
        bk = g["bucket"].to_numpy()
        vv = g["value"].to_numpy()
        full = np.arange(bk.min(), bk.max() + 1)
        fi = np.searchsorted(bk, full, side="right") - 1
        observed = bk[fi] == full
        ni = np.minimum(fi + 1, len(bk) - 1)
        gd = (full - bk[fi]).astype(np.float64)
        bd = (bk[ni] - bk[fi]).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            interp = vv[fi] + ((vv[ni] - vv[fi]) * gd) / bd
        rows.append(
            pd.DataFrame(
                {
                    "user_id": uid,
                    "bucket": full,
                    "value": np.where(observed, vv[fi], interp),
                    "observed": observed.astype(np.int64),
                }
            )
        )
    return (
        pd.concat(rows, ignore_index=True)
        .sort_values(["user_id", "bucket"])
        .reset_index(drop=True)
    )


def _run_interp(df: pd.DataFrame, blocks: int) -> pd.DataFrame:
    from abwcf_ray.stages.resample import resample_interp

    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)
    out = resample_interp(
        ds,
        key_col="user_id",
        ts_col="ts",
        val_col="value",
        tie_col="event_id",
        span_us=SPAN,
        partitions=8,
    ).to_pandas()
    return out.sort_values(["user_id", "bucket"]).reset_index(drop=True)


def test_resample_interp_matches_reference_bits(ray_session):
    df = _events(17, 2000, 25)
    ref = _ref_interp(df)
    out = _run_interp(df, 5)
    assert out["user_id"].tolist() == ref["user_id"].tolist()
    assert out["bucket"].tolist() == ref["bucket"].tolist()
    assert out["observed"].tolist() == ref["observed"].tolist()
    # bit-exact: observed values untouched, gaps the fixed 4-op expression
    assert out["value"].to_numpy().tobytes() == ref["value"].to_numpy().tobytes()


def test_resample_interp_layout_invariance(ray_session):
    df = _events(23, 800, 7)
    a = _run_interp(df, 1)
    b = _run_interp(df, 13)
    pd.testing.assert_frame_equal(a, b)


def test_resample_interp_endpoints_and_midpoint(ray_session):
    # observations at buckets 5 (1.0) and 9 (9.0): gaps 6,7,8 -> 3, 5, 7
    ts = np.array(["2024-01-01T05:30:00", "2024-01-01T09:10:00"], "datetime64[us]")
    df = pd.DataFrame(
        {
            "event_id": np.array([1, 2], np.int64),
            "ts": ts,
            "user_id": np.array([1, 1], np.int64),
            "value": np.array([1.0, 9.0]),
        }
    )
    out = _run_interp(df, 1)
    assert out["value"].tolist() == [1.0, 3.0, 5.0, 7.0, 9.0]
    assert out["observed"].tolist() == [1, 0, 0, 0, 1]


def test_resample_ffill_same_bucket_tie_takes_last_event(ray_session):
    # two events in the SAME bucket with identical ts: event_id breaks the tie
    ts = np.array(["2024-01-01T05:30:00"] * 2 + ["2024-01-01T09:10:00"], "datetime64[us]")
    df = pd.DataFrame(
        {
            "event_id": np.array([10, 11, 12], np.int64),
            "ts": ts,
            "user_id": np.array([1, 1, 1], np.int64),
            "value": np.array([1.5, 2.5, 7.0]),
        }
    )
    out = _run(df, 2)
    # bucket 5: value 2.5 (event 11 wins the tie); buckets 6..8 ffilled 2.5
    assert out["value"].tolist() == [2.5, 2.5, 2.5, 2.5, 7.0]
    assert out["observed"].tolist() == [1, 0, 0, 0, 1]
