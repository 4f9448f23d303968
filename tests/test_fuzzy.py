"""Fuzzy ed<=1 self-join (stages/fuzzy.py) vs a brute-force Levenshtein
DP over all pairs, plus kernel units for the vectorized verifier and the
deletion-neighborhood band hashes."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from abwcf_ray.stages.fuzzy import (
    _band_hashes,
    _flat_codepoints,
    ed_le1_mask,
    fuzzy_join_ed1,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(strings: list[str]) -> set[tuple[int, int]]:
    return {
        (i, j)
        for i in range(len(strings))
        for j in range(i + 1, len(strings))
        if _lev(strings[i], strings[j]) <= 1
    }


def _words(seed: int, n: int) -> list[str]:
    rng = np.random.default_rng(seed)
    alpha = "ab"  # tiny alphabet => dense near-dup structure
    out = []
    for _ in range(n):
        L = rng.integers(0, 6)
        out.append("".join(rng.choice(list(alpha)) for _ in range(L)))
    return out


def test_ed_le1_mask_against_dp():
    rng = np.random.default_rng(5)
    ws = _words(5, 60)
    A, B = [], []
    for _ in range(400):
        A.append(ws[rng.integers(len(ws))])
        B.append(ws[rng.integers(len(ws))])
    got = ed_le1_mask(
        [list(a.encode()) for a in A], [list(b.encode()) for b in B]
    )
    want = np.array([_lev(a, b) <= 1 for a, b in zip(A, B)])
    assert (got == want).all()


def test_band_hashes_textual_equality():
    # equal strings/variants get equal hashes regardless of batch position
    s = ["hello", "hell", "xhello", "hello"]
    arr = pa.array(s, pa.string())
    data, off = _flat_codepoints(arr)
    bands, sidx = _band_hashes(data, off)
    by = {}
    for b, i in zip(bands.tolist(), sidx.tolist()):
        by.setdefault(i, set()).add(b)
    # "hello" twice: identical band sets
    assert by[0] == by[3]
    # "hell" is a deletion of "hello": its full hash appears in hello's bands
    assert by[1] & by[0]
    # "xhello": deleting 'x' gives "hello" => shares hello's full hash
    assert by[2] & by[0]


def test_fuzzy_join_matches_bruteforce(ray_session):
    ws = _words(13, 400)
    df = pd.DataFrame(
        {"id": np.arange(len(ws), dtype=np.int64), "s": ws}
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(7)
    out = fuzzy_join_ed1(ds, id_col="id", str_col="s", partitions=8)
    got = set(
        map(tuple, out.to_pandas()[["src", "dst"]].to_numpy().tolist())
    )
    assert got == _brute(ws)


def test_fuzzy_join_layout_invariance(ray_session):
    ws = [f"Customer#{k:05d}" for k in range(300)]
    df = pd.DataFrame(
        {"id": np.arange(len(ws), dtype=np.int64), "s": ws}
    )

    def run(blocks):
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)
        return (
            fuzzy_join_ed1(ds, id_col="id", str_col="s", partitions=8)
            .to_pandas()
            .sort_values(["src", "dst"])
            .reset_index(drop=True)
        )

    a, b = run(1), run(11)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == len(_brute(ws))


def _cc_ref(n: int, edges: set[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n)}


def test_fuzzy_clusters_matches_unionfind_both_cc_paths(ray_session):
    from abwcf_ray.stages.fuzzy import fuzzy_clusters_ed1

    ws = _words(21, 250)
    want = _cc_ref(len(ws), _brute(ws))
    df = pd.DataFrame({"id": np.arange(len(ws), dtype=np.int64), "s": ws})
    for thr in (10**9, 0):  # driver union-find path, distributed path
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
        out = fuzzy_clusters_ed1(
            ds, id_col="id", str_col="s", partitions=8, cc_edge_threshold=thr
        )
        got = dict(zip(out["id"], out["cluster"]))
        assert got == want, f"thr={thr}"
        assert (
            (out["cluster"].to_numpy() != out["id"].to_numpy())
            == out["is_dup"].to_numpy()
        ).all()


def test_fuzzy_join_codepoint_level_and_nulls(ray_session):
    """Levenshtein runs over CODEPOINTS (accented pair found at ed 1,
    matching DuckDB levenshtein) and NULL strings match nothing."""
    df = pd.DataFrame(
        {
            "id": np.arange(5, dtype=np.int64),
            "s": ["caf\u00e9", "cafe", None, None, "x"],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(2)
    out = fuzzy_join_ed1(ds, id_col="id", str_col="s", partitions=4)
    got = set(map(tuple, out.to_pandas()[["src", "dst"]].to_numpy().tolist()))
    assert (0, 1) in got  # café ~ cafe: 1 substitution in codepoints
    for a, b in got:  # no null-derived pairs
        assert a not in (2, 3) and b not in (2, 3)
