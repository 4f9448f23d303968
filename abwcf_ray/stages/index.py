"""Inverted-index construction over the document corpus.

A web-corpus inverted index (term -> document-frequency + sorted posting
list) is the classic "wide" text aggregate: the exchange must carry
(term, doc_id) pairs — never document text — and the per-term merge must
never funnel through the driver or a full-domain sort. This stage reuses
the repo's two idioms:

- map-side explode + per-doc dedupe: a document's tokens are deduped
  INSIDE its batch; since every doc lives in exactly one row of one block,
  batch-local dedupe already yields globally distinct (term, doc_id)
  pairs — no distinct-shuffle needed before the aggregate.
- ``hash(term) % P`` keyed-partition merge (the ``keyed_hash_agg``
  finding, stages/dedup.py:338): Ray Data's native high-cardinality
  groupby sort-shuffles the full term domain (measured 22x slower); the
  64-valued partition key makes the exchange a cheap range partition and
  each partition aggregates with one vectorized pandas groupby.

Scale note: posting lists for stopword-class terms are unbounded at
100 TB — the ``min_df`` floor is mandatory there in reverse (a max_df
ceiling / stopword drop), and postings would stay per-shard list columns
rather than joined strings; the string form here exists so DuckDB's
``string_agg`` can value-oracle the whole machinery.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abwcf_ray.stages.dedup import keyed_hash_agg


def term_postings(
    ds,
    *,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    partitions: int | None = None,
):
    """Build (word, df, postings) for every whitespace token appearing in
    >= ``min_df`` distinct documents; ``postings`` is the comma-joined
    ascending doc-id list (the oracle-comparable string form of the
    posting array). Exact, layout-invariant, one keyed exchange of
    distinct (word, doc_id) pairs."""

    def pairs(batch: pa.Table) -> pa.Table:
        pdf = batch.select([id_col, text_col]).to_pandas()
        ex = pdf.set_index(id_col)[text_col].str.findall(r"\S+").explode().dropna()
        sub = ex.reset_index()
        sub.columns = [id_col, "word"]
        sub = sub.drop_duplicates()  # per-doc dedupe == global dedupe (one row/doc)
        return pa.table(
            {
                id_col: pa.array(sub[id_col].to_numpy(), pa.int64()),
                "word": pa.array(sub["word"].astype(str).to_numpy(), pa.string()),
            }
        )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["word", id_col])
        g = pdf.groupby("word", sort=True)
        out = pd.DataFrame(
            {
                "df": g[id_col].size().astype(np.int64),
                "postings": g[id_col].agg(
                    lambda s: ",".join(map(str, s.to_numpy()))
                ),
            }
        ).reset_index()
        return out[out["df"] >= min_df][["word", "df", "postings"]]

    from abwcf_ray.functions.hashing import hash64

    return keyed_hash_agg(
        ds.map_batches(pairs, batch_format="pyarrow"),
        lambda b: hash64(b.column("word")),
        merge,
        partitions=partitions,
    )


def conjunctive_search(
    ds,
    *,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
):
    """AND-of-terms document search: keep documents whose whitespace
    tokens include EVERY term in ``terms`` — the conjunctive-query
    primitive over the same token model as :func:`term_postings`
    (a search engine would intersect posting lists; over a streaming
    corpus scan the broadcast-small-side form below is the right
    distributed shape: the query is tiny, the corpus is huge, so no
    exchange at all — one vectorized RE2 pass per term per batch).

    Pure map-side and embarrassingly parallel: each batch computes one
    boolean mask per term with ``pc.match_substring_regex`` (token
    boundaries = start/end or whitespace, exactly the ``\\S+`` token
    rule), ANDs the masks, and filters. The SQL oracle is the identical
    conjunction of ``regexp_matches`` predicates.
    """
    import re as _re

    import pyarrow.compute as pc

    pats = [f"(?:^|\\s){_re.escape(t)}(?:\\s|$)" for t in terms]
    cols = [id_col] + (keep_cols or [])

    def filt(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        mask = None
        for p in pats:
            m = pc.match_substring_regex(text, p)
            mask = m if mask is None else pc.and_(mask, m)
        return batch.filter(pc.fill_null(mask, False)).select(cols)

    return ds.map_batches(filt, batch_format="pyarrow")


def longest_prefix_route(
    ds,
    *,
    rules: list[str],
    key_col: str,
    out_col: str = "rule",
):
    """Longest-matching-prefix routing: label each row with the LONGEST
    rule string that prefixes ``key_col`` (URL route tables, robots
    path rules, IP-prefix-style longest-match — the reference's robots
    path matching, RobotRulesParser, picks rules the same
    longest-prefix-wins way). Rows matching no rule are dropped.

    Broadcast-small-side shape: the rule table rides into every task as
    a plain list (ray.put'd closure constant), and the match is one
    vectorized ``pc.starts_with`` mask per rule applied shortest-first
    so the last overwrite wins — O(|rules|) arrow kernels per batch, no
    exchange, no row loop. For rule tables past ~10^3, swap the mask
    loop for a sorted-prefix binary search per batch (searchsorted on
    the sorted rule array, walk up suffix lengths) — same contract.
    """
    import pyarrow.compute as pc

    ordered = sorted(set(rules), key=len)  # shortest first: longest wins last

    def label(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col)
        lab = np.full(batch.num_rows, "", object)
        hit = np.zeros(batch.num_rows, bool)
        for r in ordered:
            m = pc.starts_with(k, r).to_numpy(zero_copy_only=False)
            m = np.asarray(m, bool)
            lab[m] = r
            hit |= m
        out = batch.append_column(out_col, pa.array(lab.astype(str), pa.string()))
        return out.filter(pa.array(hit))

    return ds.map_batches(label, batch_format="pyarrow")
