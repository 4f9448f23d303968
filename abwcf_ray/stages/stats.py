"""Grouped moment statistics: COUNT / SUM / SUM(x²) / MIN / MAX per group
in one pass, with mean and population variance derived EXACTLY.

The distributed shape is the repo's standard high-cardinality aggregate:
map-side combiner per batch (vectorized pandas groupby over count, sum,
sumsq, min, max — all five partials merge associatively), ONE
keyed-partition exchange of the partials (O(distinct groups), never
O(rows); the dedup.keyed_hash_agg idiom), then mean/variance computed
from the merged integer moments.

Float discipline (the repetition_signals contract): every accumulated
quantity is exact int64; mean and var_pop are SINGLE IEEE divisions of
exact integers —

    mean    = sum / n
    var_pop = (n·sumsq − sum²) / n²

so a DuckDB oracle hash-matches by computing the same two expressions
(NOT var_pop(), whose streaming Welford recurrence rounds differently).
int64 bound contract: callers must keep n·sumsq and sum² under 2^63
(values up to ~10^4 over ~10^9 rows/group fit; pre-scale or shard wider
otherwise) — the same caller bound as every exact-int stage here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.functions.hashing import hash64
from abwcf_ray.stages.dedup import keyed_hash_agg

_AGGS = {
    "count": ("count", "sum"),
    "sum": ("sum", "sum"),
    "sumsq": ("sumsq", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}


def group_stats(
    ds,
    *,
    group_cols: list[str],
    value_col: str,
    merge_partitions: int = 64,
):
    """Per-group moments of integer ``value_col``: returns a Dataset with
    ``group_cols + [count, sum, sumsq, min, max, mean, var_pop]``.
    ``mean``/``var_pop`` are float64 via one IEEE division each of exact
    int64 moments (bit-reproducible across layouts and in SQL)."""

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {c: t.column(c).to_pandas() for c in group_cols}
        cols.update(
            count=np.ones(t.num_rows, np.int64), sum=v, sumsq=v * v, min=v, max=v
        )
        g = (
            pd.DataFrame(cols)
            .groupby(group_cols, as_index=False, sort=False)
            .agg(**_AGGS)
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def key_of(b: pa.Table) -> np.ndarray:
        k = hash64(b.column(group_cols[0]))
        for c in group_cols[1:]:
            k = k * np.uint64(0x9E3779B97F4A7C15) ^ hash64(b.column(c))
        return k

    merged = keyed_hash_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        key_of,
        lambda g: g.groupby(group_cols, as_index=False, sort=False).agg(**_AGGS),
        partitions=merge_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("count").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("sum").to_numpy(zero_copy_only=False).astype(np.int64)
        sq = t.column("sumsq").to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.append_column("mean", pa.array(s.astype(np.float64) / n, pa.float64()))
        num = n * sq - s * s
        return t.append_column(
            "var_pop",
            pa.array(num.astype(np.float64) / (n * n).astype(np.float64)),
        )

    return merged.map_batches(finish, batch_format="pyarrow")


_COV_AGGS = {
    "n": ("n", "sum"),
    "sx": ("sx", "sum"),
    "sy": ("sy", "sum"),
    "sxy": ("sxy", "sum"),
}


def group_zscore(
    ds,
    *,
    group_cols: list[str],
    value_col: str,
    out_col: str = "z",
    merge_partitions: int = 64,
):
    """Per-row z-score of integer ``value_col`` within its group — the
    standard ML feature-normalization transform. Returns the input rows
    with ``out_col`` appended.

    Two-phase aggregate-then-broadcast-back: :func:`group_stats` settles
    the exact int64 moments per group (one keyed exchange, O(distinct
    groups)), the small moments table is broadcast once via ``ray.put``
    and every batch joins it map-side — the full table never shuffles.

    Float discipline: z = (x − Σx/n) / sqrt((n·Σx² − Σx²ᵀ)/n²) as FIXED
    IEEE ops over exact integers (divide, subtract, divide, sqrt,
    divide), so a SQL oracle mirrors the bits with the identical
    expression. Zero-variance groups yield ±inf/NaN identically on both
    sides. Caller bound: n·Σx² and n² under 2^63.
    """
    import ray

    moments = group_stats(
        ds,
        group_cols=group_cols,
        value_col=value_col,
        merge_partitions=merge_partitions,
    ).to_pandas()
    mdf = moments[group_cols + ["count", "sum", "sumsq"]]
    mref = ray.put(mdf)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(mref)  # zero-copy per node after first fetch
        j = df.merge(m, on=group_cols, how="left", sort=False)
        n = j["count"].to_numpy().astype(np.int64)
        sx = j["sum"].to_numpy().astype(np.int64)
        sxx = j["sumsq"].to_numpy().astype(np.int64)
        x = j[value_col].to_numpy().astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = sx.astype(np.float64) / n.astype(np.float64)
            var = (n * sxx - sx * sx).astype(np.float64) / (
                n * n
            ).astype(np.float64)
            z = (x - mean) / np.sqrt(var)
        out = df.copy()
        out[out_col] = z
        return out

    return ds.map_batches(apply, batch_format="pandas")


def group_welch_t(
    ds,
    *,
    group_cols: list[str],
    cohort_col: str,
    value_col: str,
    merge_partitions: int = 64,
):
    """Per-group Welch t-statistic between two cohorts (``cohort_col``
    ∈ {0, 1}) of integer ``value_col`` — the A/B-test primitive.
    Returns ``group_cols + [n0, sx0, sxx0, n1, sx1, sxx1, t]``.

    One keyed exchange on hash(group) — BOTH cohorts of a group
    co-locate, so the pairing needs no second exchange. Every
    accumulated term is exact int64; t is the fixed IEEE expression

        t = (m1 − m0) / sqrt(v1/n1 + v0/n0),
        m_i = Σx_i / n_i,
        v_i = (n_i·Σx²_i − Σx_i²) / (n_i·(n_i−1))   (sample variance)

    mirrored op-for-op by the SQL oracle (NOT a streaming var_samp()).
    Groups missing a cohort or with a singleton cohort yield NaN/±inf
    identically on both sides. Caller bound: n·Σx² under 2^63.
    """

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {c: t.column(c).to_pandas() for c in group_cols}
        coh = (
            t.column(cohort_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        bad = (coh != 0) & (coh != 1)
        if bad.any():
            raise ValueError(
                f"group_welch_t: cohort_col {cohort_col!r} must be 0/1; "
                f"found {np.unique(coh[bad])[:5].tolist()}"
            )
        cols["cohort"] = coh
        cols.update(n=np.ones(t.num_rows, np.int64), sx=x, sxx=x * x)
        g = (
            pd.DataFrame(cols)
            .groupby(group_cols + ["cohort"], as_index=False, sort=False)
            .agg(n=("n", "sum"), sx=("sx", "sum"), sxx=("sxx", "sum"))
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def key_of(b: pa.Table) -> np.ndarray:
        k = hash64(b.column(group_cols[0]))
        for c in group_cols[1:]:
            k = k * np.uint64(0x9E3779B97F4A7C15) ^ hash64(b.column(c))
        return k

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(group_cols + ["cohort"], as_index=False, sort=False).agg(
            n=("n", "sum"), sx=("sx", "sum"), sxx=("sxx", "sum")
        )
        wide = m.pivot_table(
            index=group_cols,
            columns="cohort",
            values=["n", "sx", "sxx"],
            aggfunc="first",
        )
        out = pd.DataFrame(index=wide.index).reset_index()
        arr = {}
        for stat in ("n", "sx", "sxx"):
            for c in (0, 1):
                col = (
                    wide[(stat, c)]
                    if (stat, c) in wide.columns
                    else pd.Series(np.nan, index=wide.index)
                )
                # missing cohort -> 0 counts; the int64 moment algebra
                # below then yields 0/0 = NaN for that group, same as a
                # singleton cohort (den = n*(n-1) = 0).
                arr[f"{stat}{c}"] = (
                    col.fillna(0).to_numpy(dtype=np.int64)
                )
                out[f"{stat}{c}"] = arr[f"{stat}{c}"]
        n0, n1 = arr["n0"], arr["n1"]
        sx0, sx1 = arr["sx0"], arr["sx1"]
        sxx0, sxx1 = arr["sxx0"], arr["sxx1"]
        # exact int64 numerators/denominators, then fixed IEEE ops
        num0 = (n0 * sxx0 - sx0 * sx0).astype(np.float64)
        den0 = (n0 * (n0 - 1)).astype(np.float64)
        num1 = (n1 * sxx1 - sx1 * sx1).astype(np.float64)
        den1 = (n1 * (n1 - 1)).astype(np.float64)
        nf0, nf1 = n0.astype(np.float64), n1.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            m0 = sx0.astype(np.float64) / nf0
            m1 = sx1.astype(np.float64) / nf1
            v0 = num0 / den0
            v1 = num1 / den1
            out["t"] = (m1 - m0) / np.sqrt(v1 / nf1 + v0 / nf0)
        return out

    return keyed_hash_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        key_of,
        finish,
        partitions=merge_partitions,
    )


def group_cov(
    ds,
    *,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    merge_partitions: int = 64,
):
    """Per-group bivariate covariance of integer columns: returns a
    Dataset with ``group_cols + [n, sx, sy, sxy, cov_samp, cov_pop]``.
    Same shape as :func:`group_stats` — associative int64 partials
    (count, Σx, Σy, Σxy) combine map-side, ONE keyed-partition exchange
    merges, and each covariance is a SINGLE IEEE division —

        cov_samp = (n·Σxy − Σx·Σy) / (n·(n−1))    (NaN when n < 2)
        cov_pop  = (n·Σxy − Σx·Σy) / n²

    — of exact integers, so the oracle hash-matches by computing the
    identical expressions (NOT covar_samp(), whose streaming update
    rounds differently). Caller bound: n·Σxy and Σx·Σy under 2^63."""

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {c: t.column(c).to_pandas() for c in group_cols}
        cols.update(n=np.ones(t.num_rows, np.int64), sx=x, sy=y, sxy=x * y)
        g = (
            pd.DataFrame(cols)
            .groupby(group_cols, as_index=False, sort=False)
            .agg(**_COV_AGGS)
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def key_of(b: pa.Table) -> np.ndarray:
        k = hash64(b.column(group_cols[0]))
        for c in group_cols[1:]:
            k = k * np.uint64(0x9E3779B97F4A7C15) ^ hash64(b.column(c))
        return k

    merged = keyed_hash_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        key_of,
        lambda g: g.groupby(group_cols, as_index=False, sort=False).agg(
            **_COV_AGGS
        ),
        partitions=merge_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        sx = t.column("sx").to_numpy(zero_copy_only=False).astype(np.int64)
        sy = t.column("sy").to_numpy(zero_copy_only=False).astype(np.int64)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False).astype(np.int64)
        num = (n * sxy - sx * sy).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            samp = np.where(
                n > 1, num / (n * (n - 1)).astype(np.float64), np.nan
            )
            popv = num / (n * n).astype(np.float64)
        t = t.append_column("cov_samp", pa.array(samp, pa.float64()))
        return t.append_column("cov_pop", pa.array(popv, pa.float64()))

    return merged.map_batches(finish, batch_format="pyarrow")


def group_mode(
    ds,
    *,
    group_cols: list[str],
    value_col: str,
    merge_partitions: int = 64,
):
    """Per-group MODE: the most frequent ``value_col`` per group, ties
    broken by smallest value (deterministic under any layout). Returns a
    Dataset with ``group_cols + [mode_value, n]`` (n = the winning
    count).

    Shape: map-side (group, value) partial counts (vectorized groupby
    size — dense streams collapse before the wire), ONE hash(GROUP)
    exchange (exchange volume O(distinct pairs); keying on the group
    rather than the pair lands each group's histogram whole in one
    partition, so the argmax needs no second pass), per-partition merged
    counts + one (group, -n, value) mergesort picks winners."""

    def partial(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c).to_pandas() for c in group_cols}
        cols["mode_value"] = t.column(value_col).to_pandas()
        g = (
            pd.DataFrame(cols)
            .groupby(group_cols + ["mode_value"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "n"})
        )
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def key_of(b: pa.Table) -> np.ndarray:
        k = hash64(b.column(group_cols[0]))
        for c in group_cols[1:]:
            k = k * np.uint64(0x9E3779B97F4A7C15) ^ hash64(b.column(c))
        return k

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(group_cols + ["mode_value"], as_index=False, sort=False)[
            "n"
        ].sum()
        m = m.sort_values(
            group_cols + ["n", "mode_value"],
            ascending=[True] * len(group_cols) + [False, True],
            kind="mergesort",
        )
        return m.drop_duplicates(group_cols, keep="first").reset_index(
            drop=True
        )

    return keyed_hash_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        key_of,
        pick,
        partitions=merge_partitions,
    )


def group_string_agg(
    ds,
    *,
    group_cols: list[str],
    value_col: str,
    order_col: str,
    sep: str = ">",
    out_col: str = "path",
    merge_partitions: int = 64,
):
    """Per-group ORDERED string concatenation (SQL
    ``string_agg(value, sep ORDER BY order_col)``) — the event-path /
    clickstream-sequence build. Returns ``group_cols + [out_col]``.

    Concatenation is associative but not commutative, so each group's
    rows must land whole: ONE hash(GROUP) exchange (the group_mode
    shape), then per partition one (group, order) mergesort + one
    segmented join. ``(group, order_col)`` must be unique per row for a
    deterministic result — true for (user_id, ts) event streams; ties
    would make both engine and SQL nondeterministic.

    Exchange volume is O(rows) by nature (every value appears in the
    output); the win over a native sort-shuffle groupby is the small
    64-valued sort key (see keyed_hash_agg)."""

    def slim(t: pa.Table) -> pa.Table:
        return t.select(group_cols + [order_col, value_col])

    def key_of(b: pa.Table) -> np.ndarray:
        k = hash64(b.column(group_cols[0]))
        for c in group_cols[1:]:
            k = k * np.uint64(0x9E3779B97F4A7C15) ^ hash64(b.column(c))
        return k

    def join(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(group_cols + [order_col], kind="mergesort")
        out = g.groupby(group_cols, as_index=False, sort=False)[
            value_col
        ].agg(sep.join)
        return out.rename(columns={value_col: out_col})

    return keyed_hash_agg(
        ds.map_batches(slim, batch_format="pyarrow"),
        key_of,
        join,
        partitions=merge_partitions,
    )


_CORR_AGGS = {
    "n": ("n", "sum"),
    "sx": ("sx", "sum"),
    "sy": ("sy", "sum"),
    "sxx": ("sxx", "sum"),
    "syy": ("syy", "sum"),
    "sxy": ("sxy", "sum"),
}


def _second_moment_merge(
    ds,
    *,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    merge_partitions: int = 64,
):
    """Shared moment pipeline for :func:`group_corr` /
    :func:`group_regression`: map-side combiner of the six exact int64
    second-moment terms (n, Σx, Σy, Σx², Σy², Σxy) per group, then ONE
    keyed-partition exchange of the partials — O(distinct groups) on
    the wire, never O(rows)."""

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {c: t.column(c).to_pandas() for c in group_cols}
        cols.update(
            n=np.ones(t.num_rows, np.int64),
            sx=x, sy=y, sxx=x * x, syy=y * y, sxy=x * y,
        )
        g = (
            pd.DataFrame(cols)
            .groupby(group_cols, as_index=False, sort=False)
            .agg(**_CORR_AGGS)
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def key_of(b: pa.Table) -> np.ndarray:
        k = hash64(b.column(group_cols[0]))
        for c in group_cols[1:]:
            k = k * np.uint64(0x9E3779B97F4A7C15) ^ hash64(b.column(c))
        return k

    return keyed_hash_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        key_of,
        lambda g: g.groupby(group_cols, as_index=False, sort=False).agg(
            **_CORR_AGGS
        ),
        partitions=merge_partitions,
    )


def group_corr(
    ds,
    *,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    merge_partitions: int = 64,
):
    """Per-group Pearson correlation of integer columns: returns
    ``group_cols + [n, sx, sy, sxx, syy, sxy, corr]``. Same one-exchange
    moment shape as :func:`group_cov`, with the extra second moments.

    corr = (n·Σxy − Σx·Σy) / sqrt((n·Σxx − Σx²) · (n·Σyy − Σy²))

    computed as EXACT int64 numerator/moment terms followed by exactly
    three IEEE operations — one multiply, one sqrt (correctly rounded by
    IEEE 754), one divide — in that order, so the SQL oracle reproduces
    the float bit-for-bit by writing the identical expression (NOT
    corr(), whose streaming update rounds differently). NaN when either
    variance term is zero (then the numerator is too — Cauchy–Schwarz —
    so 0/0 on both sides). Caller bound: every moment term under 2^63.
    """
    merged = _second_moment_merge(
        ds,
        group_cols=group_cols,
        x_col=x_col,
        y_col=y_col,
        merge_partitions=merge_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        sx = t.column("sx").to_numpy(zero_copy_only=False).astype(np.int64)
        sy = t.column("sy").to_numpy(zero_copy_only=False).astype(np.int64)
        sxx = t.column("sxx").to_numpy(zero_copy_only=False).astype(np.int64)
        syy = t.column("syy").to_numpy(zero_copy_only=False).astype(np.int64)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False).astype(np.int64)
        num = (n * sxy - sx * sy).astype(np.float64)
        d1 = (n * sxx - sx * sx).astype(np.float64)
        d2 = (n * syy - sy * sy).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = num / np.sqrt(d1 * d2)
        return t.append_column("corr", pa.array(corr, pa.float64()))

    return merged.map_batches(finish, batch_format="pyarrow")


def group_regression(
    ds,
    *,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    merge_partitions: int = 64,
):
    """Per-group ordinary-least-squares fit of integer ``y_col`` on
    integer ``x_col``: returns ``group_cols + [n, sx, sy, sxx, syy, sxy,
    slope, intercept, r2]``. Reuses the :func:`group_corr` moment
    exchange (one keyed exchange of six exact int64 terms per group).

    Float discipline — every output float is a FIXED short IEEE
    expression over exact int64 moments, so a DuckDB oracle reproduces
    the bits by writing the identical expressions (NOT regr_slope()/
    regr_intercept()/regr_r2(), whose streaming updates round
    differently):

        slope     = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)        (1 divide)
        intercept = (Σy − slope·Σx) / n                     (−, ×, ÷)
        r2        = num² / ((n·Σxx − Σx²)·(n·Σyy − Σy²))    (×, ×, ÷)

    Zero x-variance groups yield NaN/±inf identically on both sides
    (0/0 or k/0 in the same IEEE op). Caller bound: every moment term —
    including the n·Σy² cross product — under 2^63; pre-scale wide
    values (the same contract as :func:`group_corr`).
    """
    merged = _second_moment_merge(
        ds,
        group_cols=group_cols,
        x_col=x_col,
        y_col=y_col,
        merge_partitions=merge_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        sx = t.column("sx").to_numpy(zero_copy_only=False).astype(np.int64)
        sy = t.column("sy").to_numpy(zero_copy_only=False).astype(np.int64)
        sxx = t.column("sxx").to_numpy(zero_copy_only=False).astype(np.int64)
        syy = t.column("syy").to_numpy(zero_copy_only=False).astype(np.int64)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False).astype(np.int64)
        num = (n * sxy - sx * sy).astype(np.float64)
        d1 = (n * sxx - sx * sx).astype(np.float64)
        d2 = (n * syy - sy * sy).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = num / d1
            intercept = (
                sy.astype(np.float64) - slope * sx.astype(np.float64)
            ) / n.astype(np.float64)
            r2 = (num * num) / (d1 * d2)
        t = t.append_column("slope", pa.array(slope, pa.float64()))
        t = t.append_column("intercept", pa.array(intercept, pa.float64()))
        return t.append_column("r2", pa.array(r2, pa.float64()))

    return merged.map_batches(finish, batch_format="pyarrow")


def group_decayed_count(
    ds,
    *,
    group_col: str,
    ts_col: str,
    t_ref: int,
    halflife: int,
    clamp: int = 30,
    merge_partitions: int = 64,
):
    """Per-group exponentially-decayed event count — the freshness /
    recrawl-priority signal: each row contributes 2^-(age // halflife)
    where age = t_ref − ts, so recent activity dominates and stale
    activity fades by half per halflife (the crawl analog: hosts whose
    pages change often score high and get re-fetched first; the
    reference's robots/page TTLs, HostManager re-fetch clocks, are the
    binary special case of the same freshness weighting).

    Exact arithmetic end-to-end (the repetition_signals float
    discipline): the decay exponent e = min(clamp, age // halflife) is
    integer, each row's weight is the exact int64 ``1 << (clamp - e)``
    (rows older than clamp·halflife contribute 0), per-batch partials
    sum the weights with a vectorized pandas groupby, ONE keyed
    exchange merges them, and the final score is a SINGLE IEEE division
    ``sum_scaled / 2^clamp`` of an exact integer — so a DuckDB oracle
    computing the identical expression hash-matches bit-for-bit.

    int64 bound contract: rows-per-group · 2^clamp < 2^63 and (for the
    exact float division) total scaled sums should stay under 2^53 —
    clamp=30 leaves room for ~8M rows/group at full weight.

    Returns (group_col, n:int64, sum_scaled:int64, decayed:float64).
    """

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
        age = (np.int64(t_ref) - ts) // np.int64(halflife)
        e = np.clip(age, 0, clamp)  # keep the shift amount in [0, clamp]
        w = np.where(
            (age >= 0) & (age <= clamp),
            np.int64(1) << (np.int64(clamp) - e.astype(np.int64)),
            np.int64(0),
        )
        pdf = pd.DataFrame(
            {group_col: t.column(group_col).to_pandas(), "w": w}
        )
        g = pdf.groupby(group_col, as_index=False, sort=False).agg(
            n=("w", "size"), s=("w", "sum")
        )
        g["n"] = g["n"].astype(np.int64)
        g["s"] = g["s"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def gkey(b: pa.Table) -> np.ndarray:
        c = b.column(group_col)
        if pa.types.is_string(c.type) or pa.types.is_large_string(c.type):
            return hash64(c)
        return c.to_numpy(zero_copy_only=False).astype(np.int64)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(group_col, as_index=False, sort=False).agg(
            n=("n", "sum"), s=("s", "sum")
        )
        out = pd.DataFrame(
            {
                group_col: m[group_col],
                "n": m["n"].astype(np.int64),
                "sum_scaled": m["s"].astype(np.int64),
            }
        )
        out["decayed"] = out["sum_scaled"].to_numpy(np.int64).astype(
            np.float64
        ) / np.float64(np.int64(1) << np.int64(clamp))
        return out

    return keyed_hash_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        gkey,
        finish,
        partitions=merge_partitions,
    )


def group_ohlc(
    ds,
    *,
    group_cols: list[str],
    ts_col: str,
    id_col: str,
    value_col: str,
    merge_partitions: int = 64,
):
    """Per-group OPEN / HIGH / LOW / CLOSE — the time-bucketed candle
    aggregate (market data, per-host latency traces, crawl-rate
    telemetry). OPEN is the value at the MIN (ts, id) of the group,
    CLOSE at the MAX; HIGH/LOW are plain extremes; ``n`` counts rows.

    The interesting property is the MERGE: the partial state
    (open_ts, open_id, open_v, close_ts, close_id, close_v, hi, lo, n)
    is associative — combining two partials re-selects open/close by
    the same (ts, id) order — so map-side partials shrink each batch to
    one row per group before ONE keyed exchange, exactly like the
    moment aggregates. No arithmetic touches ``value`` (it is only
    SELECTED), so float values pass through bit-exact and the SQL
    window oracle hash-matches with no float discipline needed.
    """

    state_cols = [
        "open_ts", "open_id", "open_v",
        "close_ts", "close_id", "close_v",
        "hi", "lo", "n",
    ]

    def _reduce(pdf: pd.DataFrame) -> pd.DataFrame:
        """Collapse (group_cols, state) rows to one state row per group:
        open = state of the min (open_ts, open_id) row, close = max
        (close_ts, close_id) row, hi/lo/n elementwise."""
        by_open = pdf.sort_values(
            group_cols + ["open_ts", "open_id"], kind="mergesort"
        ).groupby(group_cols, as_index=False, sort=False)
        opens = by_open[["open_ts", "open_id", "open_v"]].first()
        by_close = pdf.sort_values(
            group_cols + ["close_ts", "close_id"], kind="mergesort"
        ).groupby(group_cols, as_index=False, sort=False)
        closes = by_close[["close_ts", "close_id", "close_v"]].last()
        rest = pdf.groupby(group_cols, as_index=False, sort=False).agg(
            hi=("hi", "max"), lo=("lo", "min"), n=("n", "sum")
        )
        out = opens.merge(closes, on=group_cols).merge(rest, on=group_cols)
        out["n"] = out["n"].astype(np.int64)
        return out[group_cols + state_cols]

    def partial(t: pa.Table) -> pa.Table:
        pdf = pd.DataFrame({c: t.column(c).to_pandas() for c in group_cols})
        ts = t.column(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
        rid = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        pdf["open_ts"] = ts
        pdf["open_id"] = rid
        pdf["open_v"] = v
        pdf["close_ts"] = ts
        pdf["close_id"] = rid
        pdf["close_v"] = v
        pdf["hi"] = v
        pdf["lo"] = v
        pdf["n"] = np.ones(len(pdf), np.int64)
        return pa.Table.from_pandas(_reduce(pdf), preserve_index=False)

    def key_of(b: pa.Table) -> np.ndarray:
        k = hash64(b.column(group_cols[0]))
        for c in group_cols[1:]:
            k = k * np.uint64(0x9E3779B97F4A7C15) ^ hash64(b.column(c))
        return k

    return keyed_hash_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        key_of,
        _reduce,
        partitions=merge_partitions,
    )


def group_time_weighted(
    ds,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    scale_bits: int = 10,
    merge_partitions: int = 64,
):
    """Per-key TIME-WEIGHTED AVERAGE — the sensor/billing/price
    aggregate: each value is held from its event until the key's next
    event, the mean is weighted by the holding duration. Made hash-safe
    by the fixed-point discipline: q = floor(v * 2^scale_bits) (exact
    power-of-two multiply + floor), dt_s = (next_ts_us - ts_us) //
    1_000_000 (exact floor division), num = sum(q * dt_s) and den =
    sum(dt_s) exact int64, twa_q = ONE IEEE division (q-scaled; divide
    by 2^scale_bits downstream if the natural unit is wanted — that
    division is exact too). Keys whose events all share one second
    (den = 0) are dropped — the SQL mirror does the same.

    ONE hash(key) exchange, per-shard lexsort + vectorized diff — the
    last event of each key holds nothing (no successor). Overflow
    bound: max_q * max_span_s * events_per_key < 2^63.

    Returns (key_col, num:int64, den:int64, twa_q:float64).
    """
    from abwcf_ray.stages.dedup import keyed_hash_agg

    mul = np.float64(np.int64(1) << np.int64(scale_bits))

    def key_of(b: pa.Table) -> np.ndarray:
        return (
            b.column(key_col).to_numpy(zero_copy_only=False).view(np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key_col: pd.Series([], dtype=np.int64),
                "num": pd.Series([], dtype=np.int64),
                "den": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) < 2:
            return empty
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        keys = g[key_col].to_numpy(np.int64)
        ts = g[ts_col].to_numpy(np.int64)
        q = np.floor(
            g[value_col].to_numpy(np.float64) * mul
        ).astype(np.int64)
        same = keys[1:] == keys[:-1]
        dt_s = (ts[1:] - ts[:-1]) // 1_000_000
        w = np.where(same, dt_s, 0)
        pdf = pd.DataFrame(
            {key_col: keys[:-1], "num": q[:-1] * w, "den": w}
        )
        out = pdf.groupby(key_col, as_index=False, sort=False).agg(
            num=("num", "sum"), den=("den", "sum")
        )
        out = out[out["den"] > 0].reset_index(drop=True)
        out["num"] = out["num"].astype(np.int64)
        out["den"] = out["den"].astype(np.int64)
        return out

    out = keyed_hash_agg(ds, key_of, scan, partitions=merge_partitions)

    def finish(t: pa.Table) -> pa.Table:
        num = t.column("num").to_numpy(zero_copy_only=False).astype(np.int64)
        den = t.column("den").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                key_col: t.column(key_col),
                "num": t.column("num"),
                "den": t.column("den"),
                "twa_q": num.astype(np.float64) / den.astype(np.float64),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")
