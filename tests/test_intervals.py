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
