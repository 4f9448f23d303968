"""Distributed set operations (stages/setops.py): brute-force parity on
all three ops, duplicate collapse, layout invariance, composite keys."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from abwcf_ray.stages.setops import set_op


def _frames(seed=3, n=300):
    rng = np.random.default_rng(seed)
    mk = lambda m: pd.DataFrame(
        {
            "a": rng.choice(["u", "v", "w", "x", "y"], m),
            "b": rng.integers(0, 12, m).astype(np.int64),
        }
    )
    return mk(n), mk(n // 2)


def _brute(l, r, op):
    ls = set(map(tuple, l[["a", "b"]].itertuples(index=False)))
    rs = set(map(tuple, r[["a", "b"]].itertuples(index=False)))
    got = {
        "intersect": ls & rs,
        "except": ls - rs,
        "union": ls | rs,
    }[op]
    return (
        pd.DataFrame(sorted(got), columns=["a", "b"])
        .astype({"b": np.int64})
        .reset_index(drop=True)
    )


def _run(l, r, op, pl=5, pr=3, m=8):
    import ray.data as rd

    out = set_op(
        rd.from_pandas(l).repartition(pl),
        rd.from_pandas(r).repartition(pr),
        op=op,
        key_cols=["a", "b"],
        partitions=m,
    ).to_pandas()
    if out.empty:  # empty Datasets surface with no columns
        return out
    return out.sort_values(["a", "b"]).reset_index(drop=True)


@pytest.mark.parametrize("op", ["intersect", "except", "union"])
def test_matches_brute_force(ray_session, op):
    l, r = _frames()
    pd.testing.assert_frame_equal(_run(l, r, op), _brute(l, r, op))


@pytest.mark.parametrize("op", ["intersect", "except"])
def test_layout_invariance(ray_session, op):
    l, r = _frames(seed=11)
    a = _run(l, r, op, pl=1, pr=1, m=4)
    b = _run(l, r, op, pl=9, pr=7, m=64)
    pd.testing.assert_frame_equal(a, b)


def test_disjoint_and_identical(ray_session):
    l = pd.DataFrame({"a": ["p", "q"], "b": np.array([1, 2], np.int64)})
    r = pd.DataFrame({"a": ["z"], "b": np.array([9], np.int64)})
    assert len(_run(l, r, "intersect", pl=1, pr=1, m=2)) == 0
    pd.testing.assert_frame_equal(
        _run(l, l, "intersect", pl=1, pr=1, m=2),
        l.sort_values(["a", "b"]).reset_index(drop=True),
    )
    assert len(_run(l, l, "except", pl=1, pr=1, m=2)) == 0


def test_bad_op_rejected(ray_session):
    import ray.data as rd

    l = rd.from_items([{"a": "x", "b": 1}])
    with pytest.raises(ValueError):
        set_op(l, l, op="minus", key_cols=["a", "b"])


# ------------------------------------------------------- jaccard matrix


def _jac_brute(df):
    import itertools

    import numpy as np
    import pandas as pd

    vocab = {
        g: set(" ".join(sub["text"]).split())
        for g, sub in df.groupby("src")
    }
    rows = []
    for a, b in itertools.combinations(sorted(vocab), 2):
        sh = len(vocab[a] & vocab[b])
        if sh:
            rows.append(
                (
                    a,
                    b,
                    np.int64(sh),
                    np.int64(len(vocab[a])),
                    np.int64(len(vocab[b])),
                    np.float64(sh)
                    / np.float64(len(vocab[a]) + len(vocab[b]) - sh),
                )
            )
    return pd.DataFrame(
        rows, columns=["s1", "s2", "shared", "n1", "n2", "jaccard"]
    )


def test_group_jaccard_matches_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from abwcf_ray.stages.setops import group_jaccard_matrix

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(120)]
    df = pd.DataFrame(
        {
            "src": rng.choice(["a", "b", "c", "d"], 200),
            "text": [
                " ".join(rng.choice(vocab, rng.integers(1, 15)))
                for _ in range(200)
            ],
        }
    )
    out = group_jaccard_matrix(
        rd.from_pandas(df).repartition(6),
        group_col="src",
        partitions=4,
    )
    pd.testing.assert_frame_equal(out, _jac_brute(df))


def test_group_jaccard_disjoint_and_identical(ray_session):
    import pandas as pd
    import ray.data as rd

    from abwcf_ray.stages.setops import group_jaccard_matrix

    df = pd.DataFrame(
        {
            "src": ["a", "a", "b", "c"],
            "text": ["x y z", "x", "x y z", "p q"],
        }
    )
    out = group_jaccard_matrix(rd.from_pandas(df), group_col="src")
    # a and b identical vocab -> jaccard 1; c disjoint -> absent
    assert out.to_records(index=False).tolist() == [("a", "b", 3, 3, 3, 1.0)]


def test_group_jaccard_nontokenized(ray_session):
    import pandas as pd
    import ray.data as rd

    from abwcf_ray.stages.setops import group_jaccard_matrix

    df = pd.DataFrame(
        {
            "src": ["a", "a", "b", "b", "b"],
            "text": ["k1", "k2", "k2", "k3", "k1"],
        }
    )
    out = group_jaccard_matrix(
        rd.from_pandas(df).repartition(2),
        group_col="src",
        tokenize=False,
    )
    assert out.to_records(index=False).tolist() == [
        ("a", "b", 2, 2, 3, 2 / 3)
    ]


def test_group_jaccard_null_group_excluded(ray_session):
    """ADVICE r4 low: a NULL group must be dropped (SQL GROUP BY NULL
    semantics), not misrouted into the pairs bucket — before the fix a
    null-group row corrupted every group's vocab in its frame."""
    import pandas as pd
    import ray.data as rd

    from abwcf_ray.stages.setops import group_jaccard_matrix

    df = pd.DataFrame(
        {
            "src": ["a", "a", None, "b", "b", None],
            "text": ["k1", "k2", "k2", "k2", "k1", "k9"],
        }
    )
    out = group_jaccard_matrix(
        rd.from_pandas(df).repartition(2), group_col="src", tokenize=False
    )
    # identical to the no-null-rows input: a={k1,k2}, b={k1,k2}
    assert out.to_records(index=False).tolist() == [
        ("a", "b", 2, 2, 2, 1.0)
    ]
