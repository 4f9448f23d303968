"""As-of temporal join (stages/asof.py): brute-force parity on random
streams, single-stage vs skew-safe two-stage bit-parity (incl. a hot key),
unmatched-row handling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from abwcf_ray.stages.asof import asof_join


def _mk(seed: int, n_left: int, n_right: int, n_keys: int, hot_frac: float = 0.0):
    rng = np.random.default_rng(seed)
    def keys(n):
        k = rng.integers(0, n_keys, n)
        if hot_frac:
            hot = rng.random(n) < hot_frac
            k[hot] = 0
        return k.astype(np.int64)
    lt = pd.DataFrame(
        {
            "event_id": np.arange(n_left, dtype=np.int64),
            "user_id": keys(n_left),
            "ts": rng.integers(0, 10_000, n_left).astype(np.int64),
        }
    )
    rt = pd.DataFrame(
        {
            "rid": np.arange(n_right, dtype=np.int64) + 100_000,
            "user_id": keys(n_right),
            "ts": rng.integers(0, 10_000, n_right).astype(np.int64),
            "value": rng.random(n_right),
        }
    )
    # unique (key, ts) on the right so "latest" is unambiguous
    rt = rt.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)
    return lt, rt


def _brute(lt: pd.DataFrame, rt: pd.DataFrame) -> pd.DataFrame:
    l = lt.sort_values("ts", kind="mergesort")
    r = rt.sort_values("ts", kind="mergesort")
    j = pd.merge_asof(
        l, r[["user_id", "ts", "rid", "value"]], on="ts", by="user_id",
        direction="backward",
    )
    j["matched"] = (~j["rid"].isna()).astype(np.int64)
    j["rid"] = j["rid"].fillna(-1).astype(np.int64)
    j["value"] = j["value"].fillna(-1.0)
    return j.sort_values("event_id").reset_index(drop=True)


def _run(lt, rt, **kw) -> pd.DataFrame:
    out = asof_join(
        rd.from_pandas(lt).repartition(5),
        rd.from_pandas(rt).repartition(3),
        key_col="user_id",
        ts_col="ts",
        left_cols=["event_id", "user_id", "ts"],
        payload_cols=["rid", "value"],
        **kw,
    ).to_pandas()
    out["rid"] = out["rid_r"].fillna(-1).astype(np.int64)
    out["value"] = out["value_r"].fillna(-1.0)
    return out.sort_values("event_id").reset_index(drop=True)


def test_asof_single_stage_matches_brute_force(ray_session):
    lt, rt = _mk(1, 300, 200, 12)
    got = _run(lt, rt, partitions=7)
    ref = _brute(lt, rt)
    assert got["event_id"].tolist() == ref["event_id"].tolist()
    assert got["rid"].tolist() == ref["rid"].tolist()
    assert got["matched"].tolist() == ref["matched"].tolist()
    np.testing.assert_allclose(got["value"], ref["value"], rtol=0, atol=0)


def test_asof_two_stage_parity_under_hot_key(ray_session):
    # 60% of rows on one key: the single-partition assumption stressor
    lt, rt = _mk(2, 400, 300, 10, hot_frac=0.6)
    ref = _brute(lt, rt)
    one = _run(lt, rt, partitions=6)
    two = _run(lt, rt, partitions=6, bucket_span_us=500)
    for got in (one, two):
        assert got["rid"].tolist() == ref["rid"].tolist()
        assert got["matched"].tolist() == ref["matched"].tolist()


def test_asof_bucket_boundaries_exact(ray_session):
    # right rows only in early buckets; left rows far later — carry-ins
    # must cross many empty buckets
    lt = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "user_id": np.array([1, 1, 2, 3], np.int64),
            "ts": np.array([9000, 9500, 9900, 50], np.int64),
        }
    )
    rt = pd.DataFrame(
        {
            "rid": np.array([7, 8, 9], np.int64),
            "user_id": np.array([1, 1, 2], np.int64),
            "ts": np.array([10, 20, 100], np.int64),
            "value": np.array([0.5, 0.7, 0.9]),
        }
    )
    got = _run(lt, rt, partitions=4, bucket_span_us=100)
    # user 1: latest right at ts<=9000 is rid 8; user 2: rid 9; user 3: none
    assert got.set_index("event_id")["rid"].tolist() == [8, 8, 9, -1]
    assert got["matched"].tolist() == [1, 1, 1, 0]


def test_asof_no_right_rows(ray_session):
    lt, _ = _mk(3, 50, 10, 5)
    rt = pd.DataFrame(
        {
            "rid": pd.Series(dtype=np.int64),
            "user_id": pd.Series(dtype=np.int64),
            "ts": pd.Series(dtype=np.int64),
            "value": pd.Series(dtype=np.float64),
        }
    )
    got = _run(lt, rt)
    assert (got["matched"] == 0).all()
    assert (got["rid"] == -1).all()
    assert len(got) == len(lt)


def _brute_range(lt, rt, width):
    n, s = [], []
    for _, row in lt.iterrows():
        m = rt[(rt["user_id"] == row["user_id"])
               & (rt["ts"] >= row["ts"] - width) & (rt["ts"] <= row["ts"])]
        n.append(len(m))
        s.append(int(m["rid"].sum()))
    out = lt.copy()
    out["n_in_window"] = np.array(n, np.int64)
    out["sum_in_window"] = np.array(s, np.int64)
    return out.sort_values("event_id").reset_index(drop=True)


def _run_range(lt, rt, width, **kw):
    from abwcf_ray.stages.asof import range_join_agg

    out = range_join_agg(
        rd.from_pandas(lt).repartition(4),
        rd.from_pandas(rt).repartition(3),
        key_col="user_id",
        ts_col="ts",
        left_cols=["event_id", "user_id", "ts"],
        agg_col="rid",
        width_us=width,
        **kw,
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def test_range_join_matches_brute_force(ray_session):
    lt, rt = _mk(11, 200, 150, 8)
    ref = _brute_range(lt, rt, 800)
    got = _run_range(lt, rt, 800, partitions=5)
    assert got["n_in_window"].tolist() == ref["n_in_window"].tolist()
    assert got["sum_in_window"].tolist() == ref["sum_in_window"].tolist()


def test_range_join_bucketed_parity_hot_key(ray_session):
    lt, rt = _mk(12, 300, 250, 9, hot_frac=0.5)
    ref = _brute_range(lt, rt, 700)
    got = _run_range(lt, rt, 700, partitions=5, bucket_span_us=1000)
    assert got["n_in_window"].tolist() == ref["n_in_window"].tolist()
    assert got["sum_in_window"].tolist() == ref["sum_in_window"].tolist()


def test_range_join_boundaries_inclusive(ray_session):
    lt = pd.DataFrame(
        {"event_id": np.array([0], np.int64), "user_id": np.array([1], np.int64),
         "ts": np.array([1000], np.int64)}
    )
    rt = pd.DataFrame(
        {
            "rid": np.array([1, 2, 3, 4], np.int64),
            "user_id": np.array([1, 1, 1, 1], np.int64),
            # exactly at ts-w, inside, exactly at ts, just below ts-w
            "ts": np.array([900, 950, 1000, 899], np.int64),
            "value": np.zeros(4),
        }
    )
    got = _run_range(lt, rt, 100, bucket_span_us=200)
    assert got.loc[0, "n_in_window"] == 3
    assert got.loc[0, "sum_in_window"] == 1 + 2 + 3
    got1 = _run_range(lt, rt, 100)
    assert got1.loc[0, "n_in_window"] == 3


def test_range_join_span_guard():
    from abwcf_ray.stages.asof import range_join_agg

    with pytest.raises(ValueError):
        range_join_agg(
            None, None, key_col="k", ts_col="t", left_cols=[], agg_col="a",
            width_us=100, bucket_span_us=50,
        )


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n_keys=st.integers(1, 6),
    span=st.sampled_from([50, 173, 1000]),
)
def test_asof_hypothesis_differential(ray_session, seed, n_keys, span):
    """Randomized differential: both regimes vs the global pandas
    merge_asof on tiny adversarial streams (few keys -> heavy collisions,
    duplicate left timestamps, buckets of awkward span)."""
    rng = np.random.default_rng(seed)
    nl, nr = rng.integers(1, 40), rng.integers(0, 40)
    lt = pd.DataFrame(
        {
            "event_id": np.arange(nl, dtype=np.int64),
            "user_id": rng.integers(0, n_keys, nl).astype(np.int64),
            "ts": rng.integers(0, 3000, nl).astype(np.int64),
        }
    )
    rt = pd.DataFrame(
        {
            "rid": np.arange(nr, dtype=np.int64),
            "user_id": rng.integers(0, n_keys, nr).astype(np.int64),
            "ts": rng.integers(0, 3000, nr).astype(np.int64),
            "value": rng.random(nr),
        }
    ).drop_duplicates(["user_id", "ts"]).reset_index(drop=True)
    ref = _brute(lt, rt)
    one = _run(lt, rt, partitions=3)
    two = _run(lt, rt, partitions=3, bucket_span_us=span)
    for got in (one, two):
        assert got["rid"].tolist() == ref["rid"].tolist()
        assert got["matched"].tolist() == ref["matched"].tolist()


def _brute_pairs(lt, rt, width):
    rows = []
    for _, l in lt.iterrows():
        m = rt[(rt["user_id"] == l["user_id"])
               & (rt["ts"] >= l["ts"] - width) & (rt["ts"] <= l["ts"])]
        for _, r in m.iterrows():
            rows.append((int(l["event_id"]), int(r["rid"])))
    return sorted(rows)


def _run_pairs(lt, rt, width, **kw):
    from abwcf_ray.stages.asof import range_join_pairs

    out = range_join_pairs(
        rd.from_pandas(lt).repartition(4),
        rd.from_pandas(rt).repartition(3),
        key_col="user_id",
        ts_col="ts",
        left_id_col="event_id",
        right_id_col="rid",
        width_us=width,
        **kw,
    ).to_pandas()
    return sorted(zip(out["left_id"].astype(int), out["right_id"].astype(int)))


def test_range_pairs_match_brute_force(ray_session):
    lt, rt = _mk(21, 120, 100, 6)
    ref = _brute_pairs(lt, rt, 600)
    assert _run_pairs(lt, rt, 600, partitions=3) == ref
    assert _run_pairs(lt, rt, 600, partitions=3, bucket_span_us=700) == ref


def test_range_pairs_group_isolation(ray_session):
    # regression: a left row whose window precedes ALL of its group's
    # rights must emit nothing — and never leak another group's rows
    lt = pd.DataFrame(
        {"event_id": np.array([0, 1], np.int64),
         "user_id": np.array([2, 3], np.int64),
         "ts": np.array([100, 5000], np.int64)}
    )
    rt = pd.DataFrame(
        {"rid": np.array([10, 11, 12], np.int64),
         "user_id": np.array([1, 2, 3], np.int64),
         "ts": np.array([90, 4000, 4990], np.int64),
         "value": np.zeros(3)}
    )
    # user 2's right is at 4000 (after left ts 100) -> no pair for left 0
    got = _run_pairs(lt, rt, 200, partitions=1)
    assert got == [(1, 12)]


def test_asof_int64_payload_exact_beyond_2_53(ray_session):
    """64-bit payload ids survive the null-union exactly (regression: the
    pandas conversion of null-bearing int64 columns decayed them to
    float64, rounding values above 2^53 for matched rows too)."""
    import ray.data as rd

    big = (1 << 60) + 12345  # not representable in float64
    lt = pd.DataFrame(
        {
            "event_id": np.array([1, 2], np.int64),
            "user_id": np.array([7, 7], np.int64),
            "ts": np.array([100, 5], np.int64),
            "tag": np.array([big + 1, big + 2], np.int64),  # extra_left
        }
    )
    rt = pd.DataFrame(
        {
            "user_id": np.array([7], np.int64),
            "ts": np.array([50], np.int64),
            "ref": np.array([big], np.int64),  # payload
        }
    )
    import pyarrow as pa
    import ray

    def arrow_rows(ds):
        # read through ARROW (the engine's contract): a final .to_pandas()
        # would itself decay the nullable int64 output to float64
        t = pa.concat_tables(
            [x for x in ray.get(ds.to_arrow_refs()) if x.num_rows]
        )
        rows = sorted(t.to_pylist(), key=lambda r: r["_ts"])
        return rows

    out = arrow_rows(
        asof_join(
            rd.from_pandas(lt),
            rd.from_pandas(rt),
            key_col="user_id",
            ts_col="ts",
            left_cols=["event_id", "ts", "tag"],
            payload_cols=["ref"],
        )
    )
    unmatched, matched = out[0], out[1]
    assert matched["ref_r"] == big  # bit-exact, not float-rounded
    assert unmatched["ref_r"] is None
    assert matched["tag"] == big + 1
    assert unmatched["tag"] == big + 2

    # two-stage (bucketed) path: same exactness through carries/markers
    out2 = arrow_rows(
        asof_join(
            rd.from_pandas(lt),
            rd.from_pandas(rt),
            key_col="user_id",
            ts_col="ts",
            left_cols=["event_id", "ts", "tag"],
            payload_cols=["ref"],
            bucket_span_us=30,
        )
    )
    assert out2[1]["ref_r"] == big
    assert out2[1]["tag"] == big + 1
