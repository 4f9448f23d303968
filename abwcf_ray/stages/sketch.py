"""Heavy hitters: Misra-Gries sketch + exact verification pass.

Finding the frequent items of a 10^13-token stream (top words, hot
hosts, dominant boilerplate) with exact counting exchanges O(distinct
items) rows — at web scale, billions. The classic two-phase shape
bounds it:

1. **Sketch pass** (one map over the data): every block reduces to a
   Misra-Gries summary of ``k`` counters — exact per-block counts,
   then the MG reduction (subtract the (k+1)-th largest count, keep
   positive). MG summaries are MERGEABLE (Agarwal et al. 2012): sum
   matching counters, re-truncate. The exchange carries at most
   ``k`` rows per block instead of the block's distinct-item count;
   summed summaries settle in a keyed merge, the driver holds only
   the final ≤ poly(k) candidate set. Guarantee: every item with
   true count > N/(k+1) survives the sketch.

2. **Exact pass**: the candidate set broadcasts (sorted hash array +
   searchsorted probe, the decontaminate shape), one vectorized
   counting pass produces EXACT counts; items with count ≥
   ``threshold`` are emitted. Provided ``threshold ≥ N/(k+1)``
   (asserted), phase 1's guarantee makes the final output EXACTLY the
   set an exact counter would produce — which is why the ``heavy_hitters``
   query carries a full DuckDB value oracle (GROUP BY ... HAVING) even
   though the machinery is a sketch.

Item identity is the 64-bit ``hash64`` of the item string (the
decontaminate / ngram_dedup collision-soundness contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.functions.hashing import hash64
from abwcf_ray.stages.dedup import keyed_hash_agg


def _mg_truncate(items: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries reduction: keep at most k counters, each reduced by
    the (k+1)-th largest count."""
    if len(items) <= k:
        return items, counts
    order = np.argsort(-counts, kind="stable")
    cut = counts[order[k]]
    keep = order[:k]
    new = counts[keep] - cut
    ok = new > 0
    return items[keep][ok], new[ok]


def heavy_hitters(
    ds,
    *,
    threshold: int,
    k: int = 4096,
    text_col: str = "text",
    tokenize: bool = True,
):
    """Exact frequent items via MG sketch + verify. Returns a pandas
    DataFrame (item, cnt) with EXACT counts of every item occurring
    ``>= threshold`` times, sorted by (cnt desc, item asc).

    ``tokenize=True`` streams whitespace tokens of ``text_col``;
    ``tokenize=False`` treats each row's value as one item (e.g. a host
    column). ``threshold`` must be > N/(k+1) where N is the total item
    count — checked after the sketch pass (raise ``k`` if it trips)."""
    import ray

    def items_of(batch: pa.Table) -> pd.Series:
        col = batch.column(text_col).to_pandas().astype("string").fillna("")
        if tokenize:
            return col.str.findall(r"\S+").explode().dropna()
        return col

    def sketch(batch: pa.Table) -> pa.Table:
        it = items_of(batch)
        vc = it.value_counts()
        items = vc.index.to_numpy(dtype=object)
        counts = vc.to_numpy(np.int64)
        items, counts = _mg_truncate(items, counts, k)
        return pa.table(
            {
                "item": pa.array(items.tolist(), pa.string()),
                "mg": pa.array(counts, pa.int64()),
                "n_total": pa.array(
                    np.r_[np.int64(len(it)), np.zeros(len(items) - 1, np.int64)]
                    if len(items)
                    else np.array([len(it)], np.int64),
                    pa.int64(),
                ),
            }
            if len(items)
            else {
                "item": pa.array(["\x00"], pa.string()),
                "mg": pa.array([0], pa.int64()),
                "n_total": pa.array([len(it)], pa.int64()),
            }
        )

    merged = keyed_hash_agg(
        ds.map_batches(sketch, batch_format="pyarrow"),
        lambda b: hash64(b.column("item")),
        lambda g: g.groupby("item", as_index=False).agg(
            mg=("mg", "sum"), n_total=("n_total", "sum")
        ),
    ).to_pandas()
    n_total = int(merged["n_total"].sum())
    if threshold * (k + 1) <= n_total:
        raise ValueError(
            f"threshold {threshold} <= N/(k+1) = {n_total}/{k + 1}: the "
            "sketch cannot guarantee completeness — raise k or threshold"
        )
    cand = merged[merged["mg"] > 0]["item"]
    # candidate payload broadcasts once as a sorted hash array
    ch = hash64(cand.tolist()) if len(cand) else np.zeros(0, np.uint64)
    order = np.argsort(ch, kind="stable")
    cand_arr = cand.to_numpy(dtype=object)[order] if len(cand) else cand.to_numpy()
    ch_sorted = ch[order]
    ref = ray.put(ch_sorted)

    def exact_counts(batch: pa.Table) -> pa.Table:
        sh = ray.get(ref)
        it = items_of(batch)
        if not len(it) or not len(sh):
            return pa.table(
                {"pos": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        h = hash64(it.tolist())
        pos = np.minimum(np.searchsorted(sh, h), len(sh) - 1)
        hit = sh[pos] == h
        vp, vc = np.unique(pos[hit], return_counts=True)
        return pa.table(
            {
                "pos": pa.array(vp.astype(np.int64), pa.int64()),
                "n": pa.array(vc.astype(np.int64), pa.int64()),
            }
        )

    agg = keyed_hash_agg(
        ds.map_batches(exact_counts, batch_format="pyarrow"),
        lambda b: b.column("pos").to_numpy(zero_copy_only=False),
        lambda g: g.groupby("pos", as_index=False).agg(n=("n", "sum")),
    ).to_pandas()
    agg = agg[agg["n"] >= threshold]
    out = pd.DataFrame(
        {
            "item": cand_arr[agg["pos"].to_numpy(np.int64)],
            "cnt": agg["n"].to_numpy(np.int64),
        }
    )
    return out.sort_values(
        ["cnt", "item"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)


def sparse_int_histogram(
    ds,
    *,
    col: str,
    merge_partitions: int = 64,
    driver_merge_max_rows: int = 4_000_000,
) -> pd.DataFrame:
    """Exact global ``(v, n)`` histogram of an integer column, sorted by
    ``v`` — shared by int_quantiles and rank.global_rank.

    Per-block sparse histograms (the combiner) are MATERIALIZED once —
    they are distinct-per-block-sized, bounded by exactly the volume the
    distributed merge would ship — then merged in whichever regime fits:

    - **driver merge** (total partial rows <= ``driver_merge_max_rows``):
      one vectorized pandas groupby on the driver — measurement-like keys
      (lengths, counts, scores) have tiny domains at any corpus size, and
      the keyed exchange's fixed shuffle cost dominates them (measured
      4.4 s -> 0.3 s on a 1-block table).
    - **keyed merge** (above the threshold — e.g. timestamp-grained keys
      whose domain approaches the row count): the standard
      keyed-partition exchange, nothing driver-sized."""
    import ray

    def hist(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        k, c = np.unique(v, return_counts=True)
        return pa.table(
            {
                "v": pa.array(k, pa.int64()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    parts = ds.map_batches(hist, batch_format="pyarrow").materialize()
    if parts.count() <= driver_merge_max_rows:
        tables = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
        if not tables:
            return pd.DataFrame({"v": np.zeros(0, np.int64),
                                 "n": np.zeros(0, np.int64)})
        allp = pa.concat_tables(tables).to_pandas()
        merged = allp.groupby("v", as_index=False, sort=True).agg(n=("n", "sum"))
        return merged.reset_index(drop=True)
    merged = keyed_hash_agg(
        parts,
        lambda b: b.column("v").to_numpy(zero_copy_only=False),
        lambda g: g.groupby("v", as_index=False).agg(n=("n", "sum")),
        partitions=merge_partitions,
    ).to_pandas()
    return merged.sort_values("v", kind="mergesort").reset_index(drop=True)


def int_quantiles(ds, *, col: str, qs: list, merge_partitions: int = 64):
    """Exact discrete quantiles of a bounded-domain INTEGER column in one
    pass: per-batch sparse value histograms (the combiner — exchange is
    O(distinct values per batch), and an integer measurement column like
    a token count has a tiny domain no matter the corpus size) merged via
    :func:`sparse_int_histogram` (driver below threshold, keyed above),
    driver cumulative ranks. Quantile rule = DuckDB's ``quantile_disc``:
    the element at sorted rank ``ceil(q·N)``.

    Returns a pandas DataFrame (q_pct, value): q as integer percent
    (``int(round(q*100))``) so the output hashes stably."""

    merged = sparse_int_histogram(ds, col=col, merge_partitions=merge_partitions)
    counts = merged["n"].to_numpy(np.int64)
    values = merged["v"].to_numpy(np.int64)
    cum = np.cumsum(counts)
    total = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        rank = max(1, int(np.ceil(q * total)))
        pos = int(np.searchsorted(cum, rank, side="left"))
        out_q.append(int(round(q * 100)))
        out_v.append(int(values[pos]) if total else 0)
    return pd.DataFrame(
        {"q_pct": np.array(out_q, np.int64), "value": np.array(out_v, np.int64)}
    )


def exact_distinct_count(ds, *, text_col: str = "text", tokenize: bool = True):
    """Exact distinct-item count: per-batch unique + keyed-merge distinct
    (exchange O(distinct items) — the baseline HLL exists to beat)."""

    def uniq(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col).to_pandas().astype("string").fillna("")
        it = col.str.findall(r"\S+").explode().dropna() if tokenize else col
        h = hash64(it.tolist()) if len(it) else np.zeros(0, np.uint64)
        return pa.table({"h": pa.array(np.unique(h).astype(np.int64), pa.int64())})

    merged = keyed_hash_agg(
        ds.map_batches(uniq, batch_format="pyarrow"),
        lambda b: b.column("h").to_numpy(zero_copy_only=False),
        lambda g: g.drop_duplicates("h"),
    )
    return int(merged.count())


def hll_distinct_count(
    ds, *, text_col: str = "text", tokenize: bool = True, p: int = 14
):
    """HyperLogLog distinct-count estimate (Flajolet et al. 2007): 2^p
    byte registers per block (16 KB at p=14), merged by elementwise max —
    the exchange carries ONE register vector per block no matter how many
    distinct items exist (vs O(distinct) for the exact count). Standard
    error ≈ 1.04/√(2^p) ≈ 0.8% at p=14. Uses the same ``hash64`` item
    identity as the exact counter; the raw-estimate + linear-counting
    small-range correction, no long-range correction (64-bit hashes)."""
    m = 1 << p

    def registers(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col).to_pandas().astype("string").fillna("")
        it = col.str.findall(r"\S+").explode().dropna() if tokenize else col
        reg = np.zeros(m, np.uint8)
        if len(it):
            h = hash64(it.tolist())
            idx = (h >> np.uint64(64 - p)).astype(np.int64)
            rest = (h << np.uint64(p)) | np.uint64(1 << (p - 1))  # sentinel bit
            # rank = leading zeros of the remaining 64-p bits + 1
            lz = np.zeros(len(h), np.uint8)
            cur = rest.copy()
            bit = np.uint64(1) << np.uint64(63)
            # vectorized leading-zero count via float log2 (exact: the
            # leading-one position of a uint64 is recoverable from its
            # float64 exponent for values >= 2^12, and `rest` always has
            # the sentinel bit ensuring a bounded rank)
            nz = cur > 0
            f = np.zeros(len(h))
            f[nz] = np.floor(np.log2(cur[nz].astype(np.float64)))
            lz = (63 - f).astype(np.uint8) + 1
            np.maximum.at(reg, idx, lz)
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    parts = ds.map_batches(registers, batch_format="pyarrow").take_all()
    reg = np.zeros(m, np.uint8)
    for row in parts:
        reg = np.maximum(reg, np.frombuffer(row["reg"], dtype=np.uint8))

    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.float64(2.0) ** (-reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting small-range correction
    return float(est)


def _group_gkey(group_col: str):
    """Partition-key extractor for the group_* family: hash64 for string
    groups, raw int64 otherwise (keyed_hash_agg mixes it)."""

    def gkey(b: pa.Table) -> np.ndarray:
        c = b.column(group_col)
        if pa.types.is_string(c.type) or pa.types.is_large_string(c.type):
            return hash64(c)
        return c.to_numpy(zero_copy_only=False).astype(np.int64)

    return gkey


def _group_int_hist(group_col: str, col: str):
    """Per-batch sparse (group, value, count) int64 histogram — the shared
    combiner of the group_* quantile family (exchange O(distinct pairs),
    never O(rows))."""

    def hist(batch: pa.Table) -> pa.Table:
        pdf = pd.DataFrame(
            {
                group_col: batch.column(group_col).to_pandas(),
                "v": batch.column(col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )
        g = pdf.groupby([group_col, "v"], as_index=False, sort=False).size()
        g = g.rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return hist


def group_int_quantiles(
    ds,
    *,
    group_col: str,
    col: str,
    qs: list,
    merge_partitions: int = 64,
):
    """Exact per-group discrete quantiles (``quantile_disc(col, q) GROUP
    BY group``): per-batch sparse (group, value, count) histograms (the
    combiner — exchange O(distinct pairs), never O(rows)), ONE
    hash(group)-keyed merge that lands every group's histogram whole in
    one shard, then the quantiles come straight off each group's
    cumulative counts in that shard. Returns a Dataset
    (group_col, q_pct:int64, value:int64) — exact int arithmetic, same
    ceil(q·N) rank rule as int_quantiles."""
    from abwcf_ray.functions.hashing import hash64

    hist = _group_int_hist(group_col, col)

    gkey = _group_gkey(group_col)

    def quant(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        merged = g.groupby([group_col, "v"], as_index=False, sort=False).agg(
            n=("n", "sum")
        )
        for gval, sub in merged.groupby(group_col, sort=False):
            sub = sub.sort_values("v", kind="mergesort")
            cum = np.cumsum(sub["n"].to_numpy(np.int64))
            vals = sub["v"].to_numpy(np.int64)
            total = int(cum[-1])
            for q in qs:
                rank = max(1, int(np.ceil(q * total)))
                pos = int(np.searchsorted(cum, rank, side="left"))
                rows.append((gval, int(round(q * 100)), int(vals[pos])))
        out = pd.DataFrame(rows, columns=[group_col, "q_pct", "value"])
        out["q_pct"] = out["q_pct"].astype(np.int64)
        out["value"] = out["value"].astype(np.int64)
        return out

    return keyed_hash_agg(
        ds.map_batches(hist, batch_format="pyarrow"),
        gkey,
        quant,
        partitions=merge_partitions,
    )


def group_trimmed_mean(
    ds,
    *,
    group_col: str,
    col: str,
    q_lo: float = 0.1,
    q_hi: float = 0.9,
    merge_partitions: int = 64,
):
    """Per-group TRIMMED MEAN: mean of ``col`` restricted to the closed
    quantile band [quantile_disc(q_lo), quantile_disc(q_hi)] — the
    outlier-robust aggregate (winsorized-style trim by rank, inclusive
    bounds, same ceil(q·N) rank rule as group_int_quantiles).

    Same scale shape as group_int_quantiles: sparse (group, value, count)
    histograms map-side, ONE hash(group) exchange lands each group's
    histogram whole, and BOTH the band bounds and the trimmed aggregate
    come off that histogram in-shard — the raw rows never cross the wire
    a second time. Returns (group_col, n_kept:int64, sum_kept:int64,
    trimmed_mean:float64) with the mean as ONE IEEE division of exact
    int64s (hash-matches SQL bit-for-bit)."""
    from abwcf_ray.functions.hashing import hash64

    hist = _group_int_hist(group_col, col)

    gkey = _group_gkey(group_col)

    def trim(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        merged = g.groupby([group_col, "v"], as_index=False, sort=False).agg(
            n=("n", "sum")
        )
        for gval, sub in merged.groupby(group_col, sort=False):
            sub = sub.sort_values("v", kind="mergesort")
            cnt = sub["n"].to_numpy(np.int64)
            vals = sub["v"].to_numpy(np.int64)
            cum = np.cumsum(cnt)
            total = int(cum[-1])
            bound = []
            for q in (q_lo, q_hi):
                rank = max(1, int(np.ceil(q * total)))
                bound.append(vals[int(np.searchsorted(cum, rank, side="left"))])
            keep = (vals >= bound[0]) & (vals <= bound[1])
            n_kept = int(cnt[keep].sum())
            sum_kept = int((vals[keep] * cnt[keep]).sum())
            rows.append((gval, n_kept, sum_kept))
        out = pd.DataFrame(rows, columns=[group_col, "n_kept", "sum_kept"])
        out["n_kept"] = out["n_kept"].astype(np.int64)
        out["sum_kept"] = out["sum_kept"].astype(np.int64)
        out["trimmed_mean"] = out["sum_kept"].to_numpy(
            np.int64
        ).astype(np.float64) / out["n_kept"].to_numpy(np.int64).astype(
            np.float64
        )
        return out

    return keyed_hash_agg(
        ds.map_batches(hist, batch_format="pyarrow"),
        gkey,
        trim,
        partitions=merge_partitions,
    )


def group_mad(
    ds,
    *,
    group_col: str,
    col: str,
    merge_partitions: int = 64,
):
    """Per-group MEDIAN + MAD (median absolute deviation, the robust
    spread statistic), both discrete (quantile_disc rank rule,
    ceil(N/2)) and exact int64 end-to-end.

    ONE sparse-histogram exchange (the group_int_quantiles shape): the
    median comes off each group's cumulative counts, and the MAD comes
    off the SAME in-shard histogram re-keyed by |value − median| (counts
    at mirrored offsets merge) — the raw rows never cross the wire a
    second time, unlike the naive two-pass subtract-then-requantile.
    Returns (group_col, med:int64, mad:int64)."""
    from abwcf_ray.functions.hashing import hash64

    hist = _group_int_hist(group_col, col)

    gkey = _group_gkey(group_col)

    def _disc_median(vals: np.ndarray, cnt: np.ndarray) -> int:
        cum = np.cumsum(cnt)
        rank = max(1, int(np.ceil(0.5 * int(cum[-1]))))
        return int(vals[int(np.searchsorted(cum, rank, side="left"))])

    def mad(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        merged = g.groupby([group_col, "v"], as_index=False, sort=False).agg(
            n=("n", "sum")
        )
        for gval, sub in merged.groupby(group_col, sort=False):
            sub = sub.sort_values("v", kind="mergesort")
            vals = sub["v"].to_numpy(np.int64)
            cnt = sub["n"].to_numpy(np.int64)
            med = _disc_median(vals, cnt)
            dev = np.abs(vals - med)
            order = np.argsort(dev, kind="mergesort")
            # mirrored offsets collide; the rank rule only needs sorted
            # cumulative counts, so collisions need no explicit merge
            rows.append((gval, med, _disc_median(dev[order], cnt[order])))
        out = pd.DataFrame(rows, columns=[group_col, "med", "mad"])
        out["med"] = out["med"].astype(np.int64)
        out["mad"] = out["mad"].astype(np.int64)
        return out

    return keyed_hash_agg(
        ds.map_batches(hist, batch_format="pyarrow"),
        gkey,
        mad,
        partitions=merge_partitions,
    )


def group_weighted_median(
    ds,
    *,
    group_col: str,
    val_col: str,
    weight_col: str,
    merge_partitions: int = 64,
):
    """Per-group WEIGHTED median (lower weighted median: the smallest
    value v whose cumulative weight reaches half the group's total —
    the quantity-weighted price centre, robust to row-count skew).

    Same one-exchange shape as :func:`group_mad`: map-side sparse
    histograms keyed by (group, value) carry SUMMED int64 weights (the
    combiner bounds exchange volume by distinct values, not rows), one
    hash(group) exchange, then the median falls out of each group's
    sorted cumulative weights. Exact int64 end-to-end; the SQL oracle is
    the standard ``2*cum >= total`` windowed-cumsum query and
    hash-matches bit-for-bit.

    Returns (group_col, wmed:int64, total_w:int64).
    """
    from abwcf_ray.functions.hashing import hash64
    from abwcf_ray.stages.dedup import keyed_hash_agg

    def hist(batch: pa.Table) -> pa.Table:
        pdf = pd.DataFrame(
            {
                group_col: batch.column(group_col).to_pandas(),
                "v": batch.column(val_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "w": batch.column(weight_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )
        g = pdf.groupby([group_col, "v"], as_index=False, sort=False).agg(
            w=("w", "sum")
        )
        g["w"] = g["w"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    gkey = _group_gkey(group_col)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        merged = g.groupby([group_col, "v"], as_index=False, sort=False).agg(
            w=("w", "sum")
        )
        for gval, sub in merged.groupby(group_col, sort=False):
            sub = sub.sort_values("v", kind="mergesort")
            vals = sub["v"].to_numpy(np.int64)
            w = sub["w"].to_numpy(np.int64)
            cum = np.cumsum(w)
            tot = int(cum[-1])
            # smallest v with 2*cum >= tot  (== cum >= ceil(tot/2))
            i = int(np.searchsorted(cum, (tot + 1) // 2, side="left"))
            rows.append((gval, int(vals[i]), tot))
        out = pd.DataFrame(rows, columns=[group_col, "wmed", "total_w"])
        out["wmed"] = out["wmed"].astype(np.int64)
        out["total_w"] = out["total_w"].astype(np.int64)
        return out

    return keyed_hash_agg(
        ds.map_batches(hist, batch_format="pyarrow"),
        gkey,
        pick,
        partitions=merge_partitions,
    )


def group_median_cont(
    ds,
    *,
    group_col: str,
    col: str,
    merge_partitions: int = 64,
):
    """Per-group CONTINUOUS (interpolated) median — SQL's
    quantile_cont(0.5): with N sorted values the result is the middle
    value (N odd) or the midpoint of the two middle values (N even).

    Same ONE sparse-histogram exchange as :func:`group_mad`. Float
    discipline: integer inputs below 2^52 make the midpoint
    ``(a + b) * 0.5`` EXACTLY representable (a dyadic rational), so any
    correctly-rounded op order lands on the same double and the SQL
    oracle hash-matches bit-for-bit — the one interpolation that is
    exact without the single-division rule.

    Returns (group_col, n:int64, med_cont:float64)."""
    from abwcf_ray.functions.hashing import hash64

    hist = _group_int_hist(group_col, col)

    gkey = _group_gkey(group_col)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        merged = g.groupby([group_col, "v"], as_index=False, sort=False).agg(
            n=("n", "sum")
        )
        for gval, sub in merged.groupby(group_col, sort=False):
            sub = sub.sort_values("v", kind="mergesort")
            vals = sub["v"].to_numpy(np.int64)
            cnt = sub["n"].to_numpy(np.int64)
            cum = np.cumsum(cnt)
            n = int(cum[-1])
            # 0-based positions floor/ceil of 0.5*(n-1)
            lo_pos = (n - 1) // 2
            hi_pos = n // 2
            a = float(vals[int(np.searchsorted(cum, lo_pos + 1, side="left"))])
            b = float(vals[int(np.searchsorted(cum, hi_pos + 1, side="left"))])
            rows.append((gval, n, (a + b) * 0.5))
        out = pd.DataFrame(rows, columns=[group_col, "n", "med_cont"])
        out["n"] = out["n"].astype(np.int64)
        out["med_cont"] = out["med_cont"].astype(np.float64)
        return out

    return keyed_hash_agg(
        ds.map_batches(hist, batch_format="pyarrow"),
        gkey,
        pick,
        partitions=merge_partitions,
    )


def group_iqr_outliers(
    ds,
    *,
    group_col: str,
    col: str,
    merge_partitions: int = 64,
):
    """Per-group Tukey-fence outlier summary off CONTINUOUS quartiles:
    q1 = quantile_cont(0.25), q3 = quantile_cont(0.75), iqr = q3 - q1,
    and n_outliers = COUNT(v < q1 - 1.5*iqr OR v > q3 + 1.5*iqr) — the
    standard box-plot anomaly rule (per-host length anomalies, per-type
    latency spikes).

    Same ONE sparse-histogram exchange as :func:`group_median_cont`; the
    outlier count is read off the merged histogram itself (no second
    pass over the rows). Float discipline: at q in {0.25, 0.75} the
    interpolation fraction f = frac(q*(n-1)) is DYADIC (k/4), so with
    integer inputs below 2^50 every quantity here — a*(1-f)+b*f, iqr,
    1.5*iqr (a multiple of 3/8), and both fences — is exactly
    representable and any correctly-rounded op order (ours or DuckDB's)
    lands on the same double; the comparisons against the fences are
    then exact on both sides. The group_median_cont dyadic argument,
    extended to the quartile family.

    Returns (group_col, n:int64, q1, q3, iqr:float64, n_outliers:int64).
    """
    from abwcf_ray.functions.hashing import hash64

    hist = _group_int_hist(group_col, col)

    gkey = _group_gkey(group_col)

    def _qcont(vals, cum, n, q):
        pos = q * (n - 1)  # exact: q dyadic, n-1 < 2^52
        lo = int(np.floor(pos))
        f = pos - lo
        a = float(vals[int(np.searchsorted(cum, lo + 1, side="left"))])
        if f == 0.0:
            return a
        b = float(vals[int(np.searchsorted(cum, lo + 2, side="left"))])
        return a * (1.0 - f) + b * f

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        merged = g.groupby([group_col, "v"], as_index=False, sort=False).agg(
            n=("n", "sum")
        )
        for gval, sub in merged.groupby(group_col, sort=False):
            sub = sub.sort_values("v", kind="mergesort")
            vals = sub["v"].to_numpy(np.int64)
            cnt = sub["n"].to_numpy(np.int64)
            cum = np.cumsum(cnt)
            n = int(cum[-1])
            q1 = _qcont(vals, cum, n, 0.25)
            q3 = _qcont(vals, cum, n, 0.75)
            iqr = q3 - q1
            lo_fence = q1 - 1.5 * iqr
            hi_fence = q3 + 1.5 * iqr
            vf = vals.astype(np.float64)  # exact for |v| < 2^52
            n_out = int(cnt[(vf < lo_fence) | (vf > hi_fence)].sum())
            rows.append((gval, n, q1, q3, iqr, n_out))
        out = pd.DataFrame(
            rows, columns=[group_col, "n", "q1", "q3", "iqr", "n_outliers"]
        )
        out["n"] = out["n"].astype(np.int64)
        out["n_outliers"] = out["n_outliers"].astype(np.int64)
        for c in ("q1", "q3", "iqr"):
            out[c] = out[c].astype(np.float64)
        return out

    return keyed_hash_agg(
        ds.map_batches(hist, batch_format="pyarrow"),
        gkey,
        pick,
        partitions=merge_partitions,
    )


def group_float_quantiles(
    ds,
    *,
    group_col: str,
    col: str,
    qs: list,
    merge_partitions: int = 64,
):
    """Exact per-group DISCRETE quantiles of a FLOAT column —
    quantile_disc SELECTS an existing element (no arithmetic ever
    touches the value), so float outputs are bit-exact and hash-safe
    with no quantization: the float sibling of
    :func:`group_int_quantiles`. The sparse histogram keys on the raw
    float64 values themselves — identical doubles group exactly, and
    IEEE ordering of non-NaN doubles is a total order, so the per-group
    cumulative-count rank walk is identical to the int path (NaNs are
    the caller's contract to exclude; the fixture has none).

    Returns (group_col, q_pct:int64, value:float64); ceil(q*N) rank
    rule (DuckDB quantile_disc).
    """
    from abwcf_ray.functions.hashing import hash64

    def hist(batch: pa.Table) -> pa.Table:
        pdf = pd.DataFrame(
            {
                group_col: batch.column(group_col).to_pandas(),
                "v": batch.column(col)
                .to_numpy(zero_copy_only=False)
                .astype(np.float64),
            }
        )
        g = pdf.groupby([group_col, "v"], as_index=False, sort=False).size()
        g = g.rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    gkey = _group_gkey(group_col)

    def quant(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        merged = g.groupby([group_col, "v"], as_index=False, sort=False).agg(
            n=("n", "sum")
        )
        for gval, sub in merged.groupby(group_col, sort=False):
            sub = sub.sort_values("v", kind="mergesort")
            cum = np.cumsum(sub["n"].to_numpy(np.int64))
            vals = sub["v"].to_numpy(np.float64)
            total = int(cum[-1])
            for q in qs:
                rank = max(1, int(np.ceil(q * total)))
                pos = int(np.searchsorted(cum, rank, side="left"))
                rows.append((gval, int(round(q * 100)), float(vals[pos])))
        out = pd.DataFrame(rows, columns=[group_col, "q_pct", "value"])
        out["q_pct"] = out["q_pct"].astype(np.int64)
        out["value"] = out["value"].astype(np.float64)
        return out

    return keyed_hash_agg(
        ds.map_batches(hist, batch_format="pyarrow"),
        gkey,
        quant,
        partitions=merge_partitions,
    )


# ---------------------------------------------------------------- count-min


def _cms_salts(depth: int) -> np.ndarray:
    """Deterministic odd 64-bit multipliers, one per CMS row
    (splitmix64 finalizer over the row index, forced odd)."""
    i = np.arange(depth, dtype=np.uint64)
    z = (i + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z | np.uint64(1)


def cms_heavy_hitters(
    ds,
    *,
    threshold: int,
    depth: int = 4,
    width: int = 65536,
    text_col: str = "text",
    tokenize: bool = True,
):
    """Exact frequent items via Count-Min sketch + verify — the CMS
    sibling of :func:`heavy_hitters` (Cormode & Muthukrishnan 2005).
    Returns a pandas DataFrame (item, cnt) with EXACT counts of every
    item occurring ``>= threshold`` times, sorted (cnt desc, item asc).

    Unlike Misra-Gries, the CMS filter needs NO threshold > N/(k+1)
    precondition: a Count-Min cell only ever OVER-counts, so any item
    with true count >= threshold has estimate >= threshold and survives
    into the verify pass unconditionally — width buys a smaller
    false-candidate set (E[est − true] <= 2N/width per row, minimized
    over ``depth`` independent rows), never correctness. The verify
    pass prunes the overestimates, making the output exactly the
    GROUP BY ... HAVING set — which is why the query carries a full
    DuckDB value oracle on sketch machinery.

    Distributed shape: the d×w sketch travels as SPARSE (flat cell,
    count) partials through one keyed exchange (<= d·w rows total after
    the merge regardless of corpus size), assembles dense on the
    driver (d·w·8 bytes, e.g. 2 MB), broadcasts once via ``ray.put``,
    and the verify pass exchanges only per-block candidate counts —
    O(candidates), never O(distinct items).
    """
    import ray

    # width >= 2: width=1 would make the multiply-shift a 64-bit shift,
    # which is C-undefined (platform-dependent result)
    if width & (width - 1) or width < 2:
        raise ValueError("width must be a power of two >= 2")
    lg = int(width).bit_length() - 1
    shift = np.uint64(64 - lg)
    salts = _cms_salts(depth)

    def items_of(batch: pa.Table) -> pd.Series:
        col = batch.column(text_col).to_pandas().astype("string").fillna("")
        if tokenize:
            return col.str.findall(r"\S+").explode().dropna()
        return col

    def cell_rows(h: np.ndarray) -> np.ndarray:
        """(depth, len(h)) flat cell ids: row*width + multiply-shift."""
        idx = ((h[None, :] * salts[:, None]) >> shift).astype(np.int64)
        return idx + (np.arange(depth, dtype=np.int64) * width)[:, None]

    def sketch(batch: pa.Table) -> pa.Table:
        it = items_of(batch)
        if not len(it):
            return pa.table(
                {"cell": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        vc = it.value_counts()
        h = hash64(vc.index.tolist())
        cnt = vc.to_numpy(np.int64)
        flat = cell_rows(h).ravel()
        w = np.broadcast_to(cnt, (depth, len(cnt))).ravel()
        cells, inv = np.unique(flat, return_inverse=True)
        sums = np.bincount(inv, weights=w).astype(np.int64)
        return pa.table(
            {"cell": pa.array(cells, pa.int64()), "c": pa.array(sums, pa.int64())}
        )

    merged = keyed_hash_agg(
        ds.map_batches(sketch, batch_format="pyarrow"),
        lambda b: b.column("cell").to_numpy(zero_copy_only=False),
        lambda g: g.groupby("cell", as_index=False).agg(c=("c", "sum")),
    ).to_pandas()
    dense = np.zeros(depth * width, np.int64)
    dense[merged["cell"].to_numpy(np.int64)] = merged["c"].to_numpy(np.int64)
    ref = ray.put(dense)

    def verify(batch: pa.Table) -> pa.Table:
        cms = ray.get(ref)
        it = items_of(batch)
        if not len(it):
            return pa.table(
                {"item": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        vc = it.value_counts()
        h = hash64(vc.index.tolist())
        est = cms[cell_rows(h)].min(axis=0)
        keep = est >= threshold
        return pa.table(
            {
                "item": pa.array(
                    vc.index.to_numpy(dtype=object)[keep].tolist(), pa.string()
                ),
                "n": pa.array(vc.to_numpy(np.int64)[keep], pa.int64()),
            }
        )

    agg = keyed_hash_agg(
        ds.map_batches(verify, batch_format="pyarrow"),
        lambda b: hash64(b.column("item")),
        lambda g: g.groupby("item", as_index=False).agg(n=("n", "sum")),
    ).to_pandas()
    agg = agg[agg["n"] >= threshold]
    out = pd.DataFrame(
        {"item": agg["item"].to_numpy(dtype=object), "cnt": agg["n"].to_numpy(np.int64)}
    )
    return out.sort_values(
        ["cnt", "item"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
