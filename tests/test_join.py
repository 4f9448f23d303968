"""Generic hash equi-join (stages/join.py): pandas-merge parity across
both regimes, duplicate-key multiplicity, left join, string keys, empty
sides."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _frames(seed: int):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 40, size=500).astype(np.int64),
            "lv": np.arange(500, dtype=np.int64),
        }
    )
    # duplicate keys on the right too -> row multiplication
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 60, size=120).astype(np.int64),
            "rv": np.arange(120, dtype=np.int64) * 10,
        }
    )
    return left, right


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("broadcast_max_rows", [1_000_000, 0])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_equi_join_matches_pandas(ray_session, broadcast_max_rows, how):
    import ray.data as rd

    from abwcf_ray.stages.join import equi_join

    left, right = _frames(3)
    got = equi_join(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(3),
        on="k",
        how=how,
        broadcast_max_rows=broadcast_max_rows,
    ).to_pandas()
    exp = left.merge(right, on="k", how=how, sort=False)
    if how == "left":
        # unmatched rows carry nulls; compare with nullable dtype
        got["rv"] = got["rv"].astype("float64")
        exp["rv"] = exp["rv"].astype("float64")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))


@pytest.mark.parametrize("broadcast_max_rows", [1_000_000, 0])
def test_equi_join_string_keys_and_collision_suffix(ray_session, broadcast_max_rows):
    import ray.data as rd

    from abwcf_ray.stages.join import equi_join

    left = pd.DataFrame({"k": ["a", "b", "b", "c"], "v": [1, 2, 3, 4]})
    right = pd.DataFrame({"k": ["b", "c", "c", "x"], "v": [10, 20, 30, 40]})
    got = equi_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        on="k",
        broadcast_max_rows=broadcast_max_rows,
    ).to_pandas()
    exp = left.merge(right, on="k", how="inner", suffixes=("", "_r"), sort=False)
    got["v"] = got["v"].astype(np.int64)
    got["v_r"] = got["v_r"].astype(np.int64)
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))


def test_equi_join_empty_right(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.join import equi_join

    left = pd.DataFrame({"k": np.array([1, 2], np.int64), "v": [1, 2]})
    right = pd.DataFrame({"k": np.array([], np.int64), "rv": np.array([], np.int64)})
    got = equi_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k"
    ).to_pandas()
    assert len(got) == 0


# -- semi / anti membership joins -------------------------------------------


def _pandas_semi(left, right, on, anti):
    present = left[on].isin(right[on].dropna().unique()) & left[on].notna()
    return left[~present if anti else present]


@pytest.mark.parametrize("broadcast_max_rows", [1_000_000, 0])
@pytest.mark.parametrize("anti", [False, True])
def test_semi_anti_join_matches_pandas(ray_session, broadcast_max_rows, anti):
    import ray.data as rd

    from abwcf_ray.stages.join import semi_join

    left, right = _frames(11)
    got = semi_join(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(3),
        on="k",
        anti=anti,
        broadcast_max_rows=broadcast_max_rows,
    ).to_pandas()
    exp = _pandas_semi(left, right, "k", anti)
    got["k"] = got["k"].astype(np.int64)
    got["lv"] = got["lv"].astype(np.int64)
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))


@pytest.mark.parametrize("broadcast_max_rows", [1_000_000, 0])
@pytest.mark.parametrize("anti", [False, True])
def test_semi_anti_join_null_keys_exists_semantics(
    ray_session, broadcast_max_rows, anti
):
    """NULL keys match nothing: dropped by semi, KEPT by anti (NOT EXISTS)."""
    import ray.data as rd

    from abwcf_ray.stages.join import semi_join

    left = pd.DataFrame(
        {"k": pd.array([1, None, 2, None, 3], dtype="Int64"),
         "lv": np.arange(5, dtype=np.int64)}
    )
    right = pd.DataFrame({"k": pd.array([2, 3, 9], dtype="Int64")})
    got = semi_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        on="k",
        anti=anti,
        broadcast_max_rows=broadcast_max_rows,
    ).to_pandas()
    want_lv = {0, 1, 3} if anti else {2, 4}
    assert set(got["lv"].astype(int)) == want_lv


@pytest.mark.parametrize("anti", [False, True])
def test_semi_anti_join_string_keys_bucketed(ray_session, anti):
    import ray.data as rd

    from abwcf_ray.stages.join import semi_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {"k": [f"h{i}.example" for i in rng.integers(0, 30, 400)],
         "lv": np.arange(400, dtype=np.int64)}
    )
    right = pd.DataFrame({"k": [f"h{i}.example" for i in range(0, 30, 3)]})
    got = semi_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right),
        on="k",
        anti=anti,
        broadcast_max_rows=0,  # force bloom + bucketed exact
    ).to_pandas()
    exp = _pandas_semi(left, right, "k", anti)
    got["lv"] = got["lv"].astype(np.int64)
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))


def test_bloom_has_no_false_negatives(ray_session):
    """Every present key must probe positive (the exactness precondition of
    the definite-absent fast path)."""
    import ray.data as rd

    from abwcf_ray.stages.join import _bloom_build, _bloom_params, _bloom_probe
    import pyarrow as pa

    keys = pd.DataFrame({"k": np.arange(0, 50_000, dtype=np.int64)})
    m = _bloom_params(len(keys), 12)
    bm = _bloom_build(rd.from_pandas(keys).repartition(6), "k", m)
    col = pa.chunked_array([pa.array(np.arange(0, 50_000, dtype=np.int64))])
    assert _bloom_probe(bm, m, col).all()
    # and absent keys are mostly pruned (fp rate well under 5%)
    absent = pa.chunked_array(
        [pa.array(np.arange(1_000_000, 1_050_000, dtype=np.int64))]
    )
    fp = _bloom_probe(bm, m, absent).mean()
    assert fp < 0.05, fp


def test_full_outer_join_matches_pandas(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.join import equi_join

    left, right = _frames(7)
    got = equi_join(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(3),
        on="k",
        how="outer",
    ).to_pandas()
    exp = left.merge(right, on="k", how="outer", sort=False)
    for c in ("k", "lv", "rv"):
        got[c] = got[c].astype("float64")
        exp[c] = exp[c].astype("float64")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))
    # both unmatched directions must be present in this fixture
    assert got["lv"].isna().any() and got["rv"].isna().any()


@pytest.mark.parametrize("broadcast_max_rows", [1_000_000, 0])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_composite_key_join_matches_pandas(ray_session, broadcast_max_rows, how):
    import ray.data as rd

    from abwcf_ray.stages.join import equi_join

    rng = np.random.default_rng(13)
    left = pd.DataFrame(
        {
            "a": rng.integers(0, 8, 400).astype(np.int64),
            "b": pd.Series(rng.integers(0, 6, 400)).map("s{}".format),
            "lv": np.arange(400, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "a": rng.integers(0, 10, 90).astype(np.int64),
            "b": pd.Series(rng.integers(0, 8, 90)).map("s{}".format),
            "rv": np.arange(90, dtype=np.int64) * 7,
        }
    )
    got = equi_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(3),
        on=["a", "b"],
        how=how,
        broadcast_max_rows=broadcast_max_rows,
    ).to_pandas()
    exp = left.merge(right, on=["a", "b"], how=how, sort=False)
    if how == "left":
        got["rv"] = got["rv"].astype("float64")
        exp["rv"] = exp["rv"].astype("float64")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))


# ----------------------------------------------------- exactness / nulls


def _arrow_rows(ds, order_key):
    import pyarrow as pa
    import ray

    t = pa.concat_tables(
        [x for x in ray.get(ds.to_arrow_refs()) if x.num_rows],
        promote_options="default",
    )
    return sorted(t.to_pylist(), key=order_key)


def test_equi_join_int64_exact_beyond_2_53(ray_session):
    """64-bit payloads survive BOTH regimes exactly (regression: the
    null-padded union decayed int64 columns to float64 in pandas)."""
    import ray.data as rd

    from abwcf_ray.stages.join import equi_join

    big = (1 << 60) + 7
    lt = pd.DataFrame(
        {"k": np.array([1, 2], np.int64), "lv": np.array([big, big + 1], np.int64)}
    )
    rt = pd.DataFrame(
        {"k": np.array([1, 3], np.int64), "rv": np.array([big + 2, big + 3], np.int64)}
    )
    for bc_max in (10, 0):  # broadcast regime, then forced bucketed
        out = _arrow_rows(
            equi_join(
                rd.from_pandas(lt),
                rd.from_pandas(rt),
                on="k",
                how="left",
                broadcast_max_rows=bc_max,
            ),
            lambda r: r["k"],
        )
        assert out[0] == {"k": 1, "lv": big, "rv": big + 2}
        assert out[1]["lv"] == big + 1 and out[1]["rv"] is None
    # full outer: unmatched right carries its exact payload
    out = _arrow_rows(
        equi_join(rd.from_pandas(lt), rd.from_pandas(rt), on="k", how="outer"),
        lambda r: (r["k"], r["lv"] is None),
    )
    r3 = [r for r in out if r["k"] == 3][0]
    assert r3["rv"] == big + 3 and r3["lv"] is None


def test_equi_join_null_keys_never_match(ray_session):
    """SQL semantics: NULL join keys match nothing (regression: pandas
    merge pairs NaN keys with each other)."""
    import ray.data as rd

    from abwcf_ray.stages.join import equi_join

    lt = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"), "lv": [10, 20]})
    rt = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"), "rv": [30, 40]})
    for bc_max in (10, 0):
        inner = _arrow_rows(
            equi_join(
                rd.from_pandas(lt),
                rd.from_pandas(rt),
                on="k",
                broadcast_max_rows=bc_max,
            ),
            lambda r: r["lv"],
        )
        assert inner == [{"k": 1, "lv": 10, "rv": 30}]
        left = _arrow_rows(
            equi_join(
                rd.from_pandas(lt),
                rd.from_pandas(rt),
                on="k",
                how="left",
                broadcast_max_rows=bc_max,
            ),
            lambda r: r["lv"],
        )
        assert left[1] == {"k": None, "lv": 20, "rv": None}
    outer = _arrow_rows(
        equi_join(rd.from_pandas(lt), rd.from_pandas(rt), on="k", how="outer"),
        lambda r: (r["lv"] is None, r["lv"] or 0),
    )
    # 1<->1 matched; the two null-key rows emit separately, unmatched
    assert len(outer) == 3
    assert {(r["lv"], r["rv"]) for r in outer} == {(10, 30), (20, None), (None, 40)}


def test_semi_join_int64_exact_beyond_2_53(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.join import semi_join

    big = (1 << 59) + 11
    lt = pd.DataFrame(
        {"k": np.array([1, 2], np.int64), "lv": np.array([big, big + 1], np.int64)}
    )
    rt = pd.DataFrame({"k": np.array([1], np.int64)})
    # force the bucketed-exact verify path (no broadcast)
    out = _arrow_rows(
        semi_join(
            rd.from_pandas(lt), rd.from_pandas(rt), on="k", broadcast_max_rows=0
        ),
        lambda r: r["k"],
    )
    assert out == [{"k": 1, "lv": big}]
