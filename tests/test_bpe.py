"""BPE pair statistics (stages/bpe.py): brute-force parity, boundary
semantics (pairs never span documents), overlap counting, unicode."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import ray.data as rd

from abwcf_ray.stages.bpe import char_pair_counts


def _brute(texts, k):
    c = Counter()
    for s in texts:
        for a, b in zip(s, s[1:]):
            c[(a, b)] += 1
    rows = sorted(c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:k]
    return [(a, b, n) for (a, b), n in rows]


def _run(texts, k, blocks=3):
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(blocks)
    out = (
        char_pair_counts(ds, k=k)
        .to_pandas()
        .sort_values(["n", "c1", "c2"], ascending=[False, True, True])
        .reset_index(drop=True)
    )
    return list(out.itertuples(index=False, name=None))


def test_char_pairs_matches_bruteforce(ray_session):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
        "aaa bbb aaa",
        "",
        "x",
    ] * 7
    assert _run(texts, 20) == _brute(texts, 20)


def test_char_pairs_overlapping_and_no_cross_doc(ray_session):
    # "aaa" contributes (a,a) twice; docs "ab"+"ba" must NOT produce
    # a (b,b) or sentinel pair across the boundary
    got = dict(
        ((c1, c2), n) for c1, c2, n in _run(["aaa", "ab", "ba"], 10, blocks=1)
    )
    assert got == {("a", "a"): 2, ("a", "b"): 1, ("b", "a"): 1}


def test_char_pairs_unicode_codepoints(ray_session):
    got = _run(["héé", "日本日本"], 10)
    d = {(c1, c2): n for c1, c2, n in got}
    assert d[("é", "é")] == 1
    assert d[("h", "é")] == 1
    assert d[("日", "本")] == 2
    assert d[("本", "日")] == 1
