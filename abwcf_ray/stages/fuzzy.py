"""Fuzzy string self-join at edit distance <= 1 — SymSpell/FastSS-style
deletion-neighborhood banding (Boytsov, "Indexing methods for approximate
dictionary searching", JEA 2011; the public SymSpell algorithm), the
entity-resolution primitive: find every pair of records whose names are
one typo apart, without the all-pairs quadratic scan.

Filter-verify, both halves exact:

- **Band (filter)**: a string emits its full hash plus one hash per
  single-character deletion. Any pair at edit distance <= 1 shares a
  band textually (ed0: full==full; substitution: same-position deletions
  coincide; indel: the longer string's deletion equals the shorter
  string). Hash equality is implied by textual equality, so recall is
  exact; collisions only ADD candidates, which the verifier kills.
- **Verify (exact)**: candidate pairs route through
  ``verify_edges_distributed`` (payloads cross the wire once per
  incident edge, never via the driver) into a fully vectorized
  Levenshtein<=1 decision over padded byte matrices — first-mismatch +
  shifted-suffix compare, no per-pair Python DP.

The deletion hashes are NOT built by materializing O(len^2) variant
bytes: one pass of wrapping-uint64 rolling-hash prefix sums over the
batch's flat UTF-8 buffer (P odd => invertible mod 2^64, so substring
polynomials come from a cumulative sum with inverse powers) yields every
variant hash in O(total bytes) vectorized work.

Scale shape: band rows ship (band, id) only — 16 bytes/variant; strings
cross the exchange once per incident candidate edge in the verify.
Bucket sizes are bounded by the data's own near-dup density (a band
bucket of n strings emits n(n-1)/2 candidates — the classic FastSS
caveat; pathological inputs where thousands of strings share a deletion
variant need a bucket cap, which ``max_bucket`` provides, dropped
buckets logged in the result's lineage by count).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.stages.dedup import (
    keyed_hash_agg,
    verify_edges_distributed,
)

_P = np.uint64(0x00000100000001B3)  # FNV64 prime, odd => invertible mod 2^64


def _inv_u64(p: int) -> np.uint64:
    """Modular inverse of odd p mod 2^64 (Newton iteration)."""
    x = p
    for _ in range(6):
        x = (x * (2 - p * x)) & 0xFFFFFFFFFFFFFFFF
    return np.uint64(x)


_PINV = _inv_u64(int(_P))


def _flat_codepoints(col) -> tuple[np.ndarray, np.ndarray]:
    """(uint32 flat CODEPOINT data, int64 offsets) of an arrow string
    column. Codepoints, not UTF-8 bytes: byte-level edit distance counts
    a one-character accent/CJK substitution as 2+ edits and can't even
    band it (single-byte deletions), silently diverging from the
    character-level contract and the DuckDB levenshtein() oracle.
    Callers must drop NULL strings first (SQL: NULL matches nothing)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.string())
    import pyarrow.compute as pc

    if arr.null_count:
        raise ValueError("_flat_codepoints: drop NULL strings first")
    lens = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    off = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    total = int(off[-1])
    if total == 0:
        return np.zeros(0, np.uint32), off
    # Vectorized UTF-8 -> codepoint decode straight off the Arrow buffers:
    # lead bytes (not 0b10xxxxxx) mark codepoint starts; each codepoint
    # folds its <=3 continuation bytes with shifted masks. No per-string
    # Python round trip (the previous to_pylist + ''.join + utf-32 encode
    # was an O(total chars) object detour on the fuzzy-join hot path).
    boffs = np.frombuffer(arr.buffers()[1], np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    raw = np.frombuffer(arr.buffers()[2], np.uint8)[boffs[0] : boffs[-1]]
    idx = np.flatnonzero((raw & 0xC0) != 0x80)
    b0 = raw[idx].astype(np.uint32)
    pad = np.zeros(len(raw) + 3, np.uint32)
    pad[: len(raw)] = raw
    b1 = pad[idx + 1] & 0x3F
    b2 = pad[idx + 2] & 0x3F
    b3 = pad[idx + 3] & 0x3F
    data = np.where(
        b0 < 0x80,
        b0,
        np.where(
            b0 < 0xE0,
            ((b0 & 0x1F) << 6) | b1,
            np.where(
                b0 < 0xF0,
                ((b0 & 0x0F) << 12) | (b1 << 6) | b2,
                ((b0 & 0x07) << 18) | (b1 << 12) | (b2 << 6) | b3,
            ),
        ),
    ).astype(np.uint32)
    assert len(data) == total, "utf8 decode drift vs pc.utf8_length"
    return data, off


def _band_hashes(
    data: np.ndarray, off: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """All deletion-neighborhood band hashes for the strings delimited by
    ``off`` over ``data``: per string, hash(s) plus hash(s minus char i)
    for every i. Returns (band uint64, string index int64). One vectorized
    pass; textual equality of (sub)strings implies band equality."""
    n = len(off) - 1
    lens = off[1:] - off[:-1]
    total = int(off[-1] - off[0])
    d = data[off[0] : off[-1]].astype(np.uint64)
    o = off - off[0]  # local offsets

    with np.errstate(over="ignore"):
        ppow = np.empty(total + 1, np.uint64)
        ppow[0] = np.uint64(1)
        np.multiply.accumulate(np.full(total, _P, np.uint64), out=ppow[1:])
        pinv = np.empty(total, np.uint64)
        if total:
            pinv[0] = np.uint64(1)
            if total > 1:
                np.multiply.accumulate(
                    np.full(total - 1, _PINV, np.uint64), out=pinv[1:]
                )
        c0 = np.zeros(total + 1, np.uint64)
        np.cumsum(d * pinv, out=c0[1:])

        def poly(a: np.ndarray, b: np.ndarray) -> np.ndarray:
            # hash of data[a:b) with position-independent coefficients
            r = ppow[np.maximum(b, 1) - 1] * (c0[b] - c0[a])
            return np.where(b > a, r, np.uint64(0))

        full = poly(o[:-1], o[1:])
        # deletion variants: one row per (string, position)
        starts = np.repeat(o[:-1], lens)
        ends = np.repeat(o[1:], lens)
        ls = np.repeat(lens, lens)
        seg = np.concatenate([[0], np.cumsum(lens)])
        i = np.arange(total, dtype=np.int64) - np.repeat(seg[:-1], lens)
        pre = poly(starts, starts + i)
        suf = poly(starts + i + 1, ends)
        dele = pre * ppow[ls - 1 - i] + suf

    bands = np.concatenate([full, dele])
    sidx = np.concatenate(
        [
            np.arange(n, dtype=np.int64),
            np.repeat(np.arange(n, dtype=np.int64), lens),
        ]
    )
    return bands, sidx


def segment_pair_indices(
    seg_start: np.ndarray, seg_len: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """All within-segment index pairs (i < j), vectorized across every
    segment at once: returns two flat GLOBAL index arrays (a_idx, b_idx)
    of length sum(len·(len−1)/2). The combination index k → (i, j)
    inversion uses one float sqrt plus two integer corrections (exact for
    k < 2^52). Shared by the fuzzy-join band buckets and the
    co-occurrence per-doc pair explode."""
    m = seg_len * (seg_len - 1) // 2
    total = int(m.sum())
    if total == 0:
        e = np.empty(0, np.int64)
        return e, e
    kk = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
    j = np.floor((np.sqrt(8.0 * kk + 1.0) + 1.0) / 2.0).astype(np.int64)
    j -= j * (j - 1) // 2 > kk
    j += (j + 1) * j // 2 <= kk
    i = kk - j * (j - 1) // 2
    base = np.repeat(seg_start, m)
    return base + i, base + j


def ed_le1_mask(A: list, B: list) -> np.ndarray:
    """Exact vectorized Levenshtein<=1 over pairs of uint32 codepoint
    sequences (plain int lists also work).
    Equal lengths: at most one mismatching position. Lengths off by one:
    removing the first-mismatch position from the longer side must yield
    the shorter. No per-pair Python DP."""
    n = len(A)
    if n == 0:
        return np.zeros(0, bool)
    la = np.fromiter((len(x) for x in A), np.int64, n)
    lb = np.fromiter((len(x) for x in B), np.int64, n)
    # orient: U the longer side
    swap = la < lb
    lu = np.where(swap, lb, la)
    lv = np.where(swap, la, lb)
    diff = lu - lv
    w = max(int(lu.max()), 1)
    U = np.zeros((n, w), np.uint32)
    V = np.zeros((n, w), np.uint32)
    flat_a = np.concatenate([np.asarray(x, np.uint32) for x in A] or [[]])
    flat_b = np.concatenate([np.asarray(x, np.uint32) for x in B] or [[]])
    rows_a = np.repeat(np.arange(n), la)
    cols_a = np.arange(int(la.sum())) - np.repeat(np.cumsum(la) - la, la)
    rows_b = np.repeat(np.arange(n), lb)
    cols_b = np.arange(int(lb.sum())) - np.repeat(np.cumsum(lb) - lb, lb)
    # longer side into U, shorter into V (row-wise swap)
    a_to_u = ~swap[rows_a]
    U[rows_a[a_to_u], cols_a[a_to_u]] = flat_a[a_to_u]
    V[rows_a[~a_to_u], cols_a[~a_to_u]] = flat_a[~a_to_u]
    b_to_v = ~swap[rows_b]
    V[rows_b[b_to_v], cols_b[b_to_v]] = flat_b[b_to_v]
    U[rows_b[~b_to_v], cols_b[~b_to_v]] = flat_b[~b_to_v]

    C = np.arange(w, dtype=np.int64)[None, :]
    inside = C < lv[:, None]
    neq = (U != V) & inside
    mism = neq.sum(1)
    ok_eq = mism <= 1
    # len-diff-1: f = first mismatch (or lv if V is a prefix of U);
    # then U with position f removed must equal V from f on
    f = (neq | ~inside).argmax(1)
    if w > 1:
        Ct = C[:, : w - 1]
        tail_ok = (
            (U[:, 1:] == V[:, : w - 1])
            | (Ct >= lv[:, None])
            | (Ct < f[:, None])
        ).all(1)
    else:
        tail_ok = np.ones(n, bool)
    return np.where(diff == 0, ok_eq, (diff == 1) & tail_ok)


def fuzzy_join_ed1(
    ds,
    *,
    id_col: str,
    str_col: str,
    partitions: int = 64,
    max_bucket: int = 4096,
):
    """Self-join ``ds`` on ``str_col`` at Levenshtein distance <= 1.
    Returns a Dataset of verified (src, dst) id pairs with src < dst.
    ``max_bucket`` caps a band bucket's occupancy (FastSS pathological-
    input guard); buckets above it are dropped WITH a warning in the
    processing task's log (a recall trade, never silent). NULL strings
    match nothing (SQL levenshtein semantics)."""

    def emit(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # SQL semantics: NULL strings match nothing — drop them up front
        # (they would otherwise band as empty strings and cross-match)
        batch = batch.filter(pc.is_valid(batch.column(str_col)))
        if batch.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "id": pa.array([], pa.int64()),
                }
            )
        data, off = _flat_codepoints(batch.column(str_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bands, sidx = _band_hashes(data, off)
        return pa.table(
            {
                "band": pa.array(bands.view(np.int64), pa.int64()),
                "id": pa.array(ids[sidx], pa.int64()),
            }
        )

    def pairgen(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "src": pd.Series([], dtype=np.int64),
                "dst": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) < 2:
            return empty
        b = g["band"].to_numpy()
        ids = g["id"].to_numpy()
        # one (band, id) row per bucket member (a string can reach the
        # same bucket via several deletion positions)
        order = np.lexsort((ids, b))
        b, ids = b[order], ids[order]
        keep = np.r_[True, (b[1:] != b[:-1]) | (ids[1:] != ids[:-1])]
        b, ids = b[keep], ids[keep]
        new = np.r_[True, b[1:] != b[:-1]]
        seg_start = np.flatnonzero(new)
        seg_len = np.diff(np.r_[seg_start, len(b)])
        over = seg_len > max_bucket
        if over.any():
            # pathological band (FastSS guard): dropping is a recall
            # trade — surface it in the task log, never silently
            print(
                f"fuzzy_join_ed1: dropping {int(over.sum())} band "
                f"bucket(s) over max_bucket={max_bucket} "
                f"(largest {int(seg_len.max())})"
            )
        seg_len = np.where(over, 0, seg_len)
        ai, bi = segment_pair_indices(seg_start, seg_len)
        if len(ai) == 0:
            return empty
        a, c = ids[ai], ids[bi]
        src, dst = np.minimum(a, c), np.maximum(a, c)
        return (
            pd.DataFrame({"src": src, "dst": dst})
            .drop_duplicates()
            .reset_index(drop=True)
        )

    cands = keyed_hash_agg(
        ds.map_batches(emit, batch_format="pyarrow"),
        lambda b: b.column("band").to_numpy(zero_copy_only=False).view(np.uint64),
        pairgen,
        partitions=partitions,
    )

    def to_payload(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.is_valid(batch.column(str_col)))
        data, off = _flat_codepoints(batch.column(str_col))
        values = pa.array(data[off[0] : off[-1]], pa.uint32())
        payload = pa.ListArray.from_arrays(
            pa.array(off - off[0], pa.int32()).cast(pa.int32()), values
        )
        return pa.table(
            {
                "doc_id": batch.column(id_col).cast(pa.int64()),
                "payload": payload,
            }
        )

    payload = ds.map_batches(to_payload, batch_format="pyarrow")
    return verify_edges_distributed(
        cands,
        payload,
        ed_le1_mask,
        payload_type=pa.list_(pa.uint32()),
    )


def fuzzy_clusters_ed1(
    ds,
    *,
    id_col: str,
    str_col: str,
    partitions: int = 64,
    max_bucket: int = 4096,
    return_dataset: bool = False,
    cc_edge_threshold: int | None = None,
):
    """Entity resolution: cluster records whose ``str_col`` values chain
    together at edit distance <= 1 (transitive closure of the fuzzy
    join). Returns (id_col, cluster, is_dup) with cluster = the
    component's min id — the fuzzy edges feed the SAME union-find /
    distributed min-label-propagation dispatcher the near-dup families
    use (driver union-find below CC_EDGE_THRESHOLD, O(diameter)
    keyed-exchange rounds above it)."""
    from abwcf_ray.stages.dedup import CC_EDGE_THRESHOLD, _labels_result

    edges = fuzzy_join_ed1(
        ds,
        id_col=id_col,
        str_col=str_col,
        partitions=partitions,
        max_bucket=max_bucket,
    )
    thr = CC_EDGE_THRESHOLD if cc_edge_threshold is None else cc_edge_threshold
    return _labels_result(
        ds, edges, id_col, return_dataset, cc_edge_threshold=thr
    )
