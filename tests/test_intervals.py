"""interval_coverage — brute-force islands parity + layout invariance."""

import numpy as np
import pandas as pd


def _brute(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for uid, sub in df.groupby("u"):
        ivs = sorted(zip(sub["s"], sub["e"]))
        blocks = []
        for s, e in ivs:
            if blocks and s <= blocks[-1][1]:
                blocks[-1][1] = max(blocks[-1][1], e)
            else:
                blocks.append([s, e])
        rows.append((uid, len(blocks), sum(b[1] - b[0] for b in blocks)))
    return (
        pd.DataFrame(rows, columns=["u", "n_blocks", "covered"])
        .sort_values("u")
        .reset_index(drop=True)
    )


def test_interval_coverage_bruteforce_and_layout_invariance(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.intervals import interval_coverage

    rng = np.random.default_rng(31)
    n = 600
    s = rng.integers(0, 10_000, n).astype(np.int64)
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 40, n).astype(np.int64),
            "s": s,
            "e": s + rng.integers(0, 400, n).astype(np.int64),
        }
    )
    ref = _brute(df)
    for blocks in (1, 9):
        out = (
            interval_coverage(
                rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
                .repartition(blocks),
                key_col="u",
                start_col="s",
                end_col="e",
                partitions=8,
            )
            .to_pandas()
            .sort_values("u")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, ref)


def test_interval_coverage_touching_merges_and_zero_length(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.intervals import interval_coverage

    # [0,10] touches [10,20] -> one block of 20; [30,30] is its own
    # zero-length block; a contained interval [2,5] changes nothing.
    df = pd.DataFrame(
        {
            "u": np.array([1, 1, 1, 1], np.int64),
            "s": np.array([0, 10, 2, 30], np.int64),
            "e": np.array([10, 20, 5, 30], np.int64),
        }
    )
    out = interval_coverage(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
        key_col="u",
        start_col="s",
        end_col="e",
        partitions=2,
    ).to_pandas()
    assert out["n_blocks"].tolist() == [2]
    assert out["covered"].tolist() == [20]


def test_interval_join_bruteforce_and_layout_invariance(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.intervals import interval_join

    rng = np.random.default_rng(71)

    def mk(n, seed_off):
        s = rng.integers(0, 5_000, n).astype(np.int64)
        return pd.DataFrame(
            {
                "u": rng.integers(0, 20, n).astype(np.int64),
                "s": s,
                "e": s + rng.integers(0, 300, n).astype(np.int64),
                "rid": np.arange(n, dtype=np.int64) + seed_off,
            }
        )

    L, R = mk(250, 0), mk(200, 10_000)
    ref_rows = []
    for lrow in L.itertuples():
        for rrow in R.itertuples():
            if lrow.u != rrow.u:
                continue
            ov = min(lrow.e, rrow.e) - max(lrow.s, rrow.s)
            if ov > 0:
                ref_rows.append((lrow.u, lrow.rid, rrow.rid, ov))
    ref = pd.DataFrame(
        ref_rows, columns=["u", "lid", "rid2", "overlap"]
    ).sort_values(["u", "lid", "rid2"]).reset_index(drop=True)
    assert len(ref) > 50

    for blocks in (1, 6):
        lt = rd.from_arrow(
            pa.Table.from_pandas(
                L.rename(columns={"rid": "lid"}), preserve_index=False
            )
        ).repartition(blocks)
        rt = rd.from_arrow(
            pa.Table.from_pandas(
                R.rename(columns={"rid": "rid2"}), preserve_index=False
            )
        ).repartition(blocks)
        out = (
            interval_join(
                lt, rt,
                key_col="u", start_col="s", end_col="e",
                left_id="lid", right_id="rid2", partitions=8,
            )
            .to_pandas()
            .sort_values(["u", "lid", "rid2"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, ref)


def test_peak_concurrency_bruteforce_halfopen(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.intervals import peak_concurrency

    rng = np.random.default_rng(73)
    n = 400
    s = rng.integers(0, 2_000, n).astype(np.int64)
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 15, n).astype(np.int64),
            "s": s,
            "e": s + rng.integers(1, 200, n).astype(np.int64),
        }
    )
    ref = {}
    for uid, sub in df.groupby("u"):
        pts = sorted(
            [(t, 1) for t in sub["s"]] + [(t, -1) for t in sub["e"]],
            key=lambda x: (x[0], x[1]),  # -1 before +1 at equal ts
        )
        live = peak = 0
        for _, d in pts:
            live += d
            peak = max(peak, live)
        ref[uid] = (peak, len(sub))

    for blocks in (1, 5):
        out = (
            peak_concurrency(
                rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
                .repartition(blocks),
                key_col="u", start_col="s", end_col="e", partitions=4,
            )
            .to_pandas()
            .sort_values("u")
            .reset_index(drop=True)
        )
        assert [(p, n_) for p, n_ in zip(out["peak"], out["n_intervals"])] == [
            ref[u] for u in out["u"]
        ]

    # half-open: [0,10) and [10,20) never overlap -> peak 1
    df2 = pd.DataFrame(
        {"u": np.array([1, 1], np.int64),
         "s": np.array([0, 10], np.int64),
         "e": np.array([10, 20], np.int64)}
    )
    out2 = peak_concurrency(
        rd.from_arrow(pa.Table.from_pandas(df2, preserve_index=False)),
        key_col="u", start_col="s", end_col="e", partitions=2,
    ).to_pandas()
    assert out2["peak"].tolist() == [1]


# --- restored original interval_union tests (commit b35e63e) ---
from abwcf_ray.stages.intervals import interval_union


def _brute_union(df):
    rows = []
    for k, sub in df.groupby("k"):
        iv = sorted(zip(sub["s"], sub["e"]))
        blocks = []
        for s, e in iv:
            if blocks and s <= blocks[-1][1]:
                blocks[-1][1] = max(blocks[-1][1], e)
            else:
                blocks.append([s, e])
        rows.append((k, len(blocks), sum(e - s for s, e in blocks)))
    out = pd.DataFrame(rows, columns=["k", "n_blocks", "covered"])
    out["n_blocks"] = out["n_blocks"].astype(np.int64)
    out["covered"] = out["covered"].astype(np.int64)
    return out.sort_values("k").reset_index(drop=True)


def _run_union(df, blocks=5, partitions=8):
    import ray.data as rd

    return (
        interval_union(
            rd.from_pandas(df).repartition(blocks),
            key_col="k",
            start_col="s",
            end_col="e",
            partitions=partitions,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )


def test_interval_union_matches_brute_union(ray_session):
    rng = np.random.default_rng(19)
    n = 800
    s = rng.integers(0, 10_000, n).astype(np.int64)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 15, n).astype(np.int64),
            "s": s,
            "e": s + rng.integers(0, 600, n).astype(np.int64),
        }
    )
    pd.testing.assert_frame_equal(_run_union(df), _brute_union(df))


def test_interval_union_touching_nested_duplicate(ray_session):
    # touching intervals merge (s == prior end), nested collapse,
    # exact duplicates count once
    df = pd.DataFrame(
        {
            "k": np.array([1, 1, 1, 1, 1, 2, 2], np.int64),
            "s": np.array([0, 10, 3, 3, 40, 5, 5], np.int64),
            "e": np.array([10, 20, 7, 7, 50, 9, 9], np.int64),
        }
    )
    out = _run_union(df, blocks=3)
    want = _brute_union(df)
    pd.testing.assert_frame_equal(out, want)
    assert want.loc[want["k"] == 1, "n_blocks"].iloc[0] == 2  # [0,20)+[40,50)
    assert want.loc[want["k"] == 1, "covered"].iloc[0] == 30


def test_interval_union_layout_invariant(ray_session):
    rng = np.random.default_rng(29)
    n = 300
    s = rng.integers(0, 2_000, n).astype(np.int64)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 6, n).astype(np.int64),
            "s": s,
            "e": s + rng.integers(0, 80, n).astype(np.int64),
        }
    )
    pd.testing.assert_frame_equal(
        _run_union(df, blocks=1, partitions=2), _run_union(df, blocks=9, partitions=16)
    )
