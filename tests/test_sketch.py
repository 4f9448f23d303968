"""Heavy hitters (stages/sketch.py): exact output vs brute force on a
zipfian stream, layout invariance, the completeness-guarantee guard, and
per-row (non-tokenized) mode."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from abwcf_ray.stages.sketch import _mg_truncate, heavy_hitters


def _zipf_docs(seed: int, n_docs: int, vocab: int):
    rng = np.random.default_rng(seed)
    # zipfian-ish: item i has weight 1/(i+1)
    w = 1.0 / np.arange(1, vocab + 1)
    w /= w.sum()
    texts = [
        " ".join(f"w{j}" for j in rng.choice(vocab, size=30, p=w))
        for _ in range(n_docs)
    ]
    return pd.DataFrame({"doc_id": np.arange(n_docs), "text": texts})


def _brute(df: pd.DataFrame, threshold: int) -> pd.DataFrame:
    toks = df["text"].str.findall(r"\S+").explode()
    vc = toks.value_counts()
    out = vc[vc >= threshold].reset_index()
    out.columns = ["item", "cnt"]
    return out.sort_values(
        ["cnt", "item"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)


def test_mg_truncate_guarantee():
    items = np.array([f"i{j}" for j in range(10)], dtype=object)
    counts = np.array([100, 90, 80, 5, 4, 3, 3, 2, 2, 1], np.int64)
    it, ct = _mg_truncate(items, counts, 3)
    assert len(it) <= 3
    # the k+1-th largest (5) was deducted
    assert ct.tolist() == [95, 85, 75]


def test_heavy_hitters_matches_brute_force(ray_session):
    df = _zipf_docs(5, 200, 500)
    n_tokens = int(df["text"].str.count(r"\S+").sum())
    threshold = max(1, n_tokens // 100)
    ref = _brute(df, threshold)
    got = heavy_hitters(
        rd.from_pandas(df).repartition(6), threshold=threshold, k=256
    )
    assert got["item"].tolist() == ref["item"].tolist()
    assert got["cnt"].tolist() == ref["cnt"].tolist()
    assert 0 < len(got) < 500  # non-degenerate both ways


def test_heavy_hitters_layout_invariant(ray_session):
    df = _zipf_docs(6, 150, 300)
    n_tokens = int(df["text"].str.count(r"\S+").sum())
    threshold = max(1, n_tokens // 80)
    a = heavy_hitters(rd.from_pandas(df).repartition(2), threshold=threshold, k=256)
    b = heavy_hitters(rd.from_pandas(df).repartition(11), threshold=threshold, k=256)
    assert a["item"].tolist() == b["item"].tolist()
    assert a["cnt"].tolist() == b["cnt"].tolist()


def test_heavy_hitters_guarantee_guard(ray_session):
    df = _zipf_docs(7, 50, 100)
    with pytest.raises(ValueError, match="cannot guarantee"):
        heavy_hitters(rd.from_pandas(df), threshold=1, k=4)


def test_heavy_hitters_row_mode(ray_session):
    hosts = ["h1"] * 50 + ["h2"] * 30 + ["h3"] * 2 + ["h4"]
    df = pd.DataFrame({"host": hosts})
    got = heavy_hitters(
        rd.from_pandas(df).repartition(3),
        threshold=10,
        k=16,
        text_col="host",
        tokenize=False,
    )
    assert got["item"].tolist() == ["h1", "h2"]
    assert got["cnt"].tolist() == [50, 30]


def test_int_quantiles_matches_duckdb_rule(ray_session):
    import duckdb

    from abwcf_ray.stages.sketch import int_quantiles

    rng = np.random.default_rng(9)
    vals = rng.integers(0, 500, 3000).astype(np.int64)
    df = pd.DataFrame({"x": vals})
    # exact-percent qs: q_pct = round(q*100) must invert losslessly, else
    # the duckdb comparison below would run at a different quantile
    qs = [0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    got = int_quantiles(rd.from_pandas(df).repartition(7), col="x", qs=qs)
    for q, v in zip(got["q_pct"], got["value"]):
        ref = duckdb.sql(
            f"SELECT quantile_disc(x, {q / 100}) FROM df"
        ).fetchone()[0]
        assert v == ref, (q, v, ref)


def test_int_quantiles_layout_invariant(ray_session):
    from abwcf_ray.stages.sketch import int_quantiles

    df = pd.DataFrame({"x": np.arange(1000, dtype=np.int64) % 37})
    a = int_quantiles(rd.from_pandas(df).repartition(2), col="x", qs=[0.5, 0.9])
    b = int_quantiles(rd.from_pandas(df).repartition(13), col="x", qs=[0.5, 0.9])
    assert a.equals(b)


def test_exact_distinct_count(ray_session):
    df = _zipf_docs(13, 100, 400)
    exact = len(set(w for t in df["text"] for w in t.split()))
    from abwcf_ray.stages.sketch import exact_distinct_count

    got = exact_distinct_count(rd.from_pandas(df).repartition(5))
    assert got == exact


def test_hll_within_error_bound(ray_session):
    from abwcf_ray.stages.sketch import hll_distinct_count

    # per-row mode with a known distinct count
    n_distinct = 20_000
    items = [f"item-{i % n_distinct}" for i in range(60_000)]
    df = pd.DataFrame({"text": items})
    est = hll_distinct_count(
        rd.from_pandas(df).repartition(6), tokenize=False, p=14
    )
    rel = abs(est - n_distinct) / n_distinct
    assert rel < 0.05, (est, rel)  # ~6 sigma at p=14


def test_hll_merge_is_layout_invariant(ray_session):
    from abwcf_ray.stages.sketch import hll_distinct_count

    df = _zipf_docs(17, 200, 800)
    a = hll_distinct_count(rd.from_pandas(df).repartition(2), p=12)
    b = hll_distinct_count(rd.from_pandas(df).repartition(9), p=12)
    assert a == b  # register max-merge is order/layout independent


def test_sparse_int_histogram_regime_parity(ray_session):
    """Driver-merge and keyed-exchange regimes of sparse_int_histogram
    produce identical (v, n) tables."""
    import ray.data as rd

    from abwcf_ray.stages.sketch import sparse_int_histogram

    rng = np.random.default_rng(17)
    df = pd.DataFrame({"x": rng.integers(-40, 40, 3000).astype(np.int64)})
    ds = rd.from_pandas(df).repartition(7)
    a = sparse_int_histogram(ds, col="x")  # driver merge (under threshold)
    b = sparse_int_histogram(ds, col="x", driver_merge_max_rows=0)  # keyed
    pd.testing.assert_frame_equal(a, b)
    exp = df["x"].value_counts().sort_index()
    assert (a["v"].to_numpy() == exp.index.to_numpy()).all()
    assert (a["n"].to_numpy() == exp.to_numpy()).all()


def test_group_int_quantiles_matches_brute_force(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.sketch import group_int_quantiles

    rng = np.random.default_rng(29)
    df = pd.DataFrame(
        {
            "g": "h" + pd.Series(rng.integers(0, 9, 4000)).astype(str),
            "x": rng.integers(-100, 100, 4000).astype(np.int64),
        }
    )
    qs = [0.25, 0.5, 0.9]
    got = (
        group_int_quantiles(
            rd.from_pandas(df).repartition(6), group_col="g", col="x", qs=qs
        )
        .to_pandas()
        .sort_values(["g", "q_pct"])
        .reset_index(drop=True)
    )
    rows = []
    for gval, sub in df.groupby("g"):
        s = np.sort(sub["x"].to_numpy())
        for q in qs:
            rows.append(
                (gval, int(round(q * 100)),
                 int(s[max(1, int(np.ceil(q * len(s)))) - 1]))
            )
    exp = pd.DataFrame(rows, columns=["g", "q_pct", "value"])
    exp["q_pct"] = exp["q_pct"].astype(np.int64)
    exp["value"] = exp["value"].astype(np.int64)
    exp = exp.sort_values(["g", "q_pct"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_group_int_quantiles_layout_invariance(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.sketch import group_int_quantiles

    rng = np.random.default_rng(31)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 4, 1500).astype(np.int64),
            "x": rng.integers(0, 30, 1500).astype(np.int64),
        }
    )
    outs = [
        group_int_quantiles(
            rd.from_pandas(df).repartition(p), group_col="g", col="x",
            qs=[0.5, 0.99], merge_partitions=m,
        )
        .to_pandas()
        .sort_values(["g", "q_pct"])
        .reset_index(drop=True)
        for p, m in ((1, 8), (11, 64))
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_group_weighted_median_bruteforce(ray_session):
    import pyarrow as pa

    from abwcf_ray.stages.sketch import group_weighted_median

    rng = np.random.default_rng(17)
    n = 400
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "v": rng.integers(0, 50, n).astype(np.int64),
            "w": rng.integers(1, 9, n).astype(np.int64),
        }
    )
    out = (
        group_weighted_median(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
            .repartition(5),
            group_col="g",
            val_col="v",
            weight_col="w",
            merge_partitions=4,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    for _, row in out.iterrows():
        sub = df[df["g"] == row["g"]].sort_values("v")
        cum = sub["w"].cumsum().to_numpy()
        tot = int(cum[-1])
        expect = int(sub["v"].to_numpy()[np.searchsorted(cum, (tot + 1) // 2)])
        assert row["wmed"] == expect and row["total_w"] == tot


def test_group_median_cont_matches_quantile_cont(ray_session):
    import pyarrow as pa

    from abwcf_ray.stages.sketch import group_median_cont

    rng = np.random.default_rng(19)
    n = 301
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], n),  # mixed odd/even group sizes
            "v": rng.integers(0, 30, n).astype(np.int64),
        }
    )
    out = (
        group_median_cont(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
            .repartition(4),
            group_col="g",
            col="v",
            merge_partitions=4,
        )
        .to_pandas()
        .set_index("g")
    )
    for g, sub in df.groupby("g"):
        ref = float(np.quantile(sub["v"].to_numpy(np.float64), 0.5, method="linear"))
        assert out.loc[g, "med_cont"] == ref
        assert out.loc[g, "n"] == len(sub)


def test_label_centroids_bruteforce(ray_session):
    import pyarrow as pa

    from abwcf_ray.stages.similarity import label_centroids

    rng = np.random.default_rng(23)
    n, d = 120, 8
    X = rng.normal(size=(n, d)).astype(np.float32)
    lab = rng.integers(0, 4, n).astype(np.int64)
    t = pa.table(
        {
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(X.ravel(), pa.float32()), d
            ),
            "label": pa.array(lab, pa.int64()),
        }
    )
    out = (
        label_centroids(
            rd.from_arrow(t).repartition(3),
            vec_col="embedding",
            label_col="label",
        )
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    q = np.floor(X.astype(np.float64) * float(1 << 20)).astype(np.int64)
    for lb in range(4):
        rows = out[out["label"] == lb]
        sel = q[lab == lb]
        np.testing.assert_array_equal(rows["sum_q"].to_numpy(), sel.sum(axis=0))
        assert (rows["n"] == len(sel)).all()


def test_group_iqr_outliers_bruteforce(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.sketch import group_iqr_outliers

    rng = np.random.default_rng(41)
    n = 800
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], n),
            "v": rng.integers(0, 1000, n).astype(np.int64),
        }
    )
    # inject obvious outliers
    df.loc[df.index[:5], "v"] = 1_000_000
    ref_rows = []
    for g, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy(np.float64))
        q1 = float(np.quantile(v, 0.25, method="linear"))
        q3 = float(np.quantile(v, 0.75, method="linear"))
        iqr = q3 - q1
        n_out = int(((v < q1 - 1.5 * iqr) | (v > q3 + 1.5 * iqr)).sum())
        ref_rows.append((g, len(v), q1, q3, iqr, n_out))
    ref = pd.DataFrame(
        ref_rows, columns=["g", "n", "q1", "q3", "iqr", "n_outliers"]
    ).sort_values("g").reset_index(drop=True)

    for blocks in (1, 6):
        out = (
            group_iqr_outliers(
                rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
                .repartition(blocks),
                group_col="g",
                col="v",
                merge_partitions=4,
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        assert out["n"].tolist() == ref["n"].tolist()
        assert out["n_outliers"].tolist() == ref["n_outliers"].tolist()
        # dyadic-exact floats: bitwise equality against numpy's linear rule
        for c in ("q1", "q3", "iqr"):
            np.testing.assert_array_equal(
                out[c].to_numpy(), ref[c].to_numpy()
            )


def test_label_scatter_matches_quantized_numpy(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.similarity import label_scatter

    rng = np.random.default_rng(79)
    n, d = 200, 8
    X = rng.normal(scale=0.3, size=(n, d))
    lab = rng.integers(0, 4, n).astype(np.int64)
    tbl = pa.table(
        {
            "label": pa.array(lab),
            "embedding": pa.array(list(X), pa.list_(pa.float64())),
        }
    )
    q = np.floor(X * 65536.0).astype(np.int64)
    ref = {}
    for g in np.unique(lab):
        sub = q[lab == g]
        m = len(sub)
        s1 = sub.sum(axis=0)
        s2 = (sub * sub).sum(axis=0)
        tr = int((m * s2 - s1 * s1).sum())
        ref[int(g)] = (m, tr, tr / float(m * m))

    for blocks in (1, 5):
        out = (
            label_scatter(
                rd.from_arrow(tbl).repartition(blocks),
                vec_col="embedding",
                label_col="label",
                merge_partitions=4,
            )
            .to_pandas()
            .sort_values("label")
            .reset_index(drop=True)
        )
        for row in out.itertuples():
            m, tr, sc = ref[int(row.label)]
            assert (row.n, row.trace_num) == (m, tr)
            assert row.scatter == sc


def test_group_float_quantiles_selects_exact_elements(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.sketch import group_float_quantiles

    rng = np.random.default_rng(101)
    n = 600
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y"], n),
            "v": rng.normal(size=n),
        }
    )
    # inject exact duplicates so the histogram combiner is exercised
    df.loc[df.index[:50], "v"] = df["v"].iloc[100]

    def ref_q(vals, q):
        s = np.sort(vals)
        rank = max(1, int(np.ceil(q * len(s))))
        return float(s[rank - 1])

    for blocks in (1, 5):
        out = (
            group_float_quantiles(
                rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
                .repartition(blocks),
                group_col="g",
                col="v",
                qs=[0.25, 0.5, 0.75],
                merge_partitions=4,
            )
            .to_pandas()
            .sort_values(["g", "q_pct"])
            .reset_index(drop=True)
        )
        for row in out.itertuples():
            vals = df.loc[df["g"] == row.g, "v"].to_numpy()
            assert row.value == ref_q(vals, row.q_pct / 100.0)
            # quantile_disc SELECTS: the output must be an actual element
            assert (vals == row.value).any()


def test_kmeans_assign_step_bruteforce(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.similarity import kmeans_assign_step

    rng = np.random.default_rng(113)
    n, d, k = 300, 6, 4
    X = rng.normal(scale=0.4, size=(n, d))
    C = np.floor(rng.normal(scale=0.4, size=(k, d)) * 16384.0).astype(np.int64)
    q = np.floor(X * 16384.0).astype(np.int64)
    diff = q[:, None, :] - C[None, :, :]
    assign = np.argmin((diff * diff).sum(axis=2), axis=1)
    ref_n = np.bincount(assign, minlength=k)
    ref_s = np.zeros((k, d), np.int64)
    np.add.at(ref_s, assign, q)

    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(X), pa.list_(pa.float64())),
        }
    )
    for blocks in (1, 5):
        out = (
            kmeans_assign_step(
                rd.from_arrow(tbl).repartition(blocks),
                vec_col="embedding",
                centroids_q=C,
                scale_bits=14,
                merge_partitions=4,
            )
            .to_pandas()
            .sort_values(["cluster", "dim"])
            .reset_index(drop=True)
        )
        got_n = out.groupby("cluster")["n"].max().to_numpy()
        np.testing.assert_array_equal(got_n, ref_n)
        np.testing.assert_array_equal(
            out["sum_q"].to_numpy().reshape(k, d), ref_s
        )


def test_knn_loo_accuracy_bruteforce(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from abwcf_ray.stages.similarity import knn_loo_accuracy

    rng = np.random.default_rng(127)
    n, d, k = 120, 5, 3
    centers = rng.normal(scale=1.0, size=(k, d))
    lab = rng.integers(0, k, n).astype(np.int64)
    X = centers[lab] + rng.normal(scale=0.3, size=(n, d))
    q = np.floor(X * 16384.0).astype(np.int64)
    ref = {}
    for i in range(n):
        d2 = ((q - q[i]) ** 2).sum(axis=1)
        d2[i] = np.iinfo(np.int64).max
        # tie-break by lowest id = argmin first hit on (d2, id) order
        nn = min(range(n), key=lambda j: (d2[j], j))
        ref.setdefault(int(lab[i]), [0, 0])
        ref[int(lab[i])][0] += 1
        ref[int(lab[i])][1] += int(lab[nn] == lab[i])

    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "label": pa.array(lab),
            "embedding": pa.array(list(X), pa.list_(pa.float64())),
        }
    )
    for blocks in (1, 4):
        out = (
            knn_loo_accuracy(
                rd.from_arrow(tbl).repartition(blocks),
                vec_col="embedding",
                id_col="vec_id",
                label_col="label",
                merge_partitions=4,
            )
            .to_pandas()
            .sort_values("label")
            .reset_index(drop=True)
        )
        for row in out.itertuples():
            tot, cor = ref[int(row.label)]
            assert (row.n, row.n_correct) == (tot, cor)
            assert row.acc == cor / tot
    # well-separated clusters: the eval should be nearly perfect
    assert out["n_correct"].sum() / out["n"].sum() > 0.8


# ---------------------------------------------------------------- count-min


def test_cms_matches_brute_force(ray_session):
    from abwcf_ray.stages.sketch import cms_heavy_hitters

    df = _zipf_docs(5, 80, 400)
    out = cms_heavy_hitters(
        rd.from_pandas(df).repartition(6), threshold=20, depth=4, width=4096
    )
    pd.testing.assert_frame_equal(out, _brute(df, 20))


def test_cms_tiny_width_still_exact(ray_session):
    """Collision-heavy sketch (width 64 << vocab) inflates the candidate
    set but the verify pass keeps the output exact — the one-sided-error
    guarantee that replaces MG's threshold > N/(k+1) precondition."""
    from abwcf_ray.stages.sketch import cms_heavy_hitters

    df = _zipf_docs(7, 60, 500)
    out = cms_heavy_hitters(
        rd.from_pandas(df).repartition(4), threshold=15, depth=2, width=64
    )
    pd.testing.assert_frame_equal(out, _brute(df, 15))


def test_cms_layout_invariance(ray_session):
    from abwcf_ray.stages.sketch import cms_heavy_hitters

    df = _zipf_docs(9, 50, 300)
    a = cms_heavy_hitters(rd.from_pandas(df).repartition(2), threshold=12)
    b = cms_heavy_hitters(
        rd.from_pandas(df.iloc[::-1].reset_index(drop=True)).repartition(9),
        threshold=12,
    )
    pd.testing.assert_frame_equal(a, b)


def test_cms_overestimate_invariant(ray_session):
    """Threshold=1 makes every token a candidate, so the verify output
    equals the exact vocabulary table — only possible because CMS point
    estimates never undercount (the completeness lemma)."""
    from abwcf_ray.stages.sketch import cms_heavy_hitters

    df = _zipf_docs(3, 40, 200)
    # run with threshold 1: every token is a candidate, so the verify
    # output IS the exact vocabulary count table
    out = cms_heavy_hitters(
        rd.from_pandas(df).repartition(3), threshold=1, depth=3, width=256
    )
    exact = _brute(df, 1)
    pd.testing.assert_frame_equal(out, exact)


def test_cms_nontokenized_mode(ray_session):
    from abwcf_ray.stages.sketch import cms_heavy_hitters

    df = pd.DataFrame({"host": ["a"] * 30 + ["b"] * 5 + ["c"] * 12})
    out = cms_heavy_hitters(
        rd.from_pandas(df).repartition(3),
        threshold=10,
        text_col="host",
        tokenize=False,
        width=1024,
    )
    assert out.to_records(index=False).tolist() == [("a", 30), ("c", 12)]
