"""Paragraph-level dedup + boilerplate removal (stages/paragraphs.py):
parity with a pure-Python oracle, broadcast vs partitioned drop paths,
and edge cases (empty text, trailing newline, within-doc dups, nulls)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

DOCS = [
    (0, "a\nb\na"),          # within-doc dup of 'a'
    (1, "b\n\nc\n"),         # cross-doc dup of 'b'; blank line; trailing \n
    (2, ""),                  # empty doc -> one empty paragraph
    (3, "a"),                 # whole doc is a dup -> text ''
    (4, "c\nd\nb\nb"),        # dups of c, b(x2); fresh d
    (5, None),                # null text behaves like ''
]


def _py_paragraphs(text):
    return (text or "").split("\n")


def _py_dedup(docs):
    seen = set()
    out = []
    for doc_id, text in docs:
        paras = _py_paragraphs(text)
        kept = []
        for p in paras:
            if p == "":
                kept.append(p)
            elif p not in seen:
                seen.add(p)
                kept.append(p)
        out.append((doc_id, len(paras), len(kept), "\n".join(kept)))
    return pd.DataFrame(out, columns=["doc_id", "n_paras", "n_kept", "text"])


def _py_boilerplate(docs, min_df):
    from collections import Counter

    counts = Counter(
        p for _, text in docs for p in _py_paragraphs(text) if p != ""
    )
    out = []
    for doc_id, text in docs:
        paras = _py_paragraphs(text)
        kept = [p for p in paras if p == "" or counts[p] < min_df]
        out.append((doc_id, len(paras), len(kept), "\n".join(kept)))
    return pd.DataFrame(out, columns=["doc_id", "n_paras", "n_kept", "text"])


def _ds(docs):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
    )


def _run(ds_out) -> pd.DataFrame:
    df = ds_out.to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "n_paras", "n_kept", "text"]
    ]


@pytest.mark.parametrize("bmax", [10_000_000, 0])
def test_paragraph_dedup_matches_oracle(ray_session, bmax):
    from abwcf_ray.stages.paragraphs import paragraph_dedup

    got = _run(paragraph_dedup(_ds(DOCS), broadcast_max_drops=bmax))
    want = _py_dedup(DOCS)
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("min_df", [2, 3])
@pytest.mark.parametrize("bmax", [10_000_000, 0])
def test_remove_boilerplate_matches_oracle(ray_session, min_df, bmax):
    from abwcf_ray.stages.paragraphs import remove_boilerplate

    got = _run(
        remove_boilerplate(_ds(DOCS), min_df=min_df, broadcast_max_drops=bmax)
    )
    want = _py_boilerplate(DOCS, min_df)
    pd.testing.assert_frame_equal(got, want)


def test_paragraph_dedup_sf_corpus_first_wins(ray_session):
    """On the real fixture table the total kept must equal the number of
    distinct non-empty paragraphs plus all empty ones, and re-running the
    op over its own output must be a no-op (idempotence)."""
    import ray.data as rd

    from abwcf_ray.stages.paragraphs import paragraph_dedup

    src = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    docs = sorted(src.to_pandas().itertuples(index=False, name=None))
    want = _py_dedup(docs)
    got = _run(paragraph_dedup(_ds(docs)))
    pd.testing.assert_frame_equal(got, want)

    # idempotence: dedup of the cleaned corpus keeps everything
    again = _run(
        paragraph_dedup(_ds(list(want[["doc_id", "text"]].itertuples(index=False, name=None))))
    )
    assert (again["n_kept"] == again["n_paras"]).all()


def test_boilerplate_min_df_one_drops_all_nonempty(ray_session):
    from abwcf_ray.stages.paragraphs import remove_boilerplate

    got = _run(remove_boilerplate(_ds(DOCS), min_df=1))
    nonempty_kept = [
        p
        for t in got["text"]
        for p in (t.split("\n") if t else [""])
        if p != ""
    ]
    assert nonempty_kept == []
