"""Training-data operator tests over the sf0.001 testdata tables."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embs(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet")


def test_token_counts(docs):
    from abwcf_ray.stages.text import add_token_counts

    out = docs.map_batches(add_token_counts, batch_format="pyarrow").to_pandas()
    manual = out["text"].str.count(r"\S+")
    assert (out["n_tokens"] == manual).all()
    assert (out["n_bpe_tokens"] >= out["n_tokens"]).all()


def test_quality_signals(docs):
    from abwcf_ray.stages.text import add_quality_signals

    out = docs.map_batches(add_quality_signals, batch_format="pyarrow").to_pandas()
    assert ((out["alpha_ratio"] >= 0) & (out["alpha_ratio"] <= 1)).all()
    assert (out["n_chars_m"] == out["text"].str.len()).all()
    assert (out["n_words"] > 0).any()


def test_lang_id(docs, ray_session):
    """Accuracy on genuinely language-specific text (the testdata documents'
    ``lang`` label is uncorrelated with their text, so it can't be the
    target); on documents we only require valid labels."""
    import random

    import ray.data as rd

    from abwcf_ray.sources.corpus import _VOCAB
    from abwcf_ray.stages.text import add_lang_id

    rng = random.Random(7)
    rows = []
    for lang, vocab in _VOCAB.items():
        for i in range(30):
            rows.append(
                {"lang": lang, "text": " ".join(rng.choice(vocab) for _ in range(40))}
            )
    ds = rd.from_items(rows)
    out = ds.map_batches(add_lang_id, batch_format="pyarrow").to_pandas()
    known = out[out["lang"].isin(["en", "de", "fr", "es"])]
    acc = (known["lang_id"] == known["lang"]).mean()
    assert acc > 0.8, f"lang-id accuracy {acc}"

    labels = docs.map_batches(add_lang_id, batch_format="pyarrow").to_pandas()["lang_id"]
    assert labels.isin(["en", "de", "fr", "es", "zz"]).all()


def test_fingerprint_stability(docs):
    from abwcf_ray.stages.text import add_fingerprint

    out = docs.map_batches(add_fingerprint, batch_format="pyarrow").to_pandas()
    dup_mask = out.duplicated("text", keep=False)
    fp_by_text = out.groupby("text")["fingerprint"].nunique()
    assert (fp_by_text == 1).all()  # same text -> same fingerprint
    assert out["fingerprint"].astype("uint64").nunique() > 1


def test_fingerprint_matches_scalar_reference():
    """Differential check of the batch fingerprint kernel against a plain
    per-document computation of the same token-hash-mix scheme (FNV-style
    combine over each ``window``-gram of token hashes, min over grams)."""
    import numpy as np
    import pyarrow as pa

    from abwcf_ray.functions.hashing import hash64
    from abwcf_ray.stages.dedup import _FNV_OFFSET64, _FNV_PRIME64
    from abwcf_ray.stages.text import add_fingerprint

    window = 4
    texts = [
        "a b c d e f g",          # longer than the window
        "a b c",                  # shorter -> one gram over all tokens
        "x",                      # single token
        "",                       # empty -> fp 0
        "a b c d e f g",          # duplicate of row 0
        "  spaced   out   tokens   here   now ",
    ]

    def scalar_fp(t: str) -> int:
        toks = t.split()
        if not toks:
            return 0
        H = hash64(toks)
        n = len(toks)
        grams = (
            [H] if n < window
            else [H[j : j + window] for j in range(n - window + 1)]
        )
        best = None
        for g in grams:
            c = _FNV_OFFSET64
            for h in g:
                c = np.uint64((c ^ h) * _FNV_PRIME64)
            best = c if best is None else min(best, c)
        return int(best)

    batch = pa.table({"text": pa.array(texts, pa.string())})
    got = add_fingerprint(batch, window=window).column("fingerprint").to_pylist()
    want = [scalar_fp(t) for t in texts]
    assert got == want
    assert got[0] == got[4] and got[3] == 0


def test_exact_dedup(docs):
    from abwcf_ray.stages.dedup import exact_dedup

    out = exact_dedup(docs).to_pandas()
    pdf = docs.to_pandas()
    expected = pdf.groupby("text")["doc_id"].min().sort_values()
    assert sorted(out["doc_id"]) == sorted(expected)
    assert out["dup_count"].sum() == len(pdf)


def test_minhash_lsh_finds_exact_dups(docs):
    from abwcf_ray.stages.dedup import minhash_lsh_dedup

    labels = minhash_lsh_dedup(docs, threshold=0.9)
    pdf = docs.to_pandas()
    text_min = pdf.groupby("text")["doc_id"].transform("min")
    exact_dup = (pdf["doc_id"] != text_min).to_numpy()
    got = labels.set_index("doc_id").loc[pdf["doc_id"], "is_dup"].to_numpy()
    # every exact duplicate must be caught by minhash at any threshold
    assert (got[exact_dup]).all()


def test_minhash_degenerate_matches_sql_oracle(docs):
    """The minhash_dedup_exact driver query: shingle_k=1 + threshold=1.0 at
    512 perms must reproduce DuckDB's equal-token-set grouping exactly
    (64 perms is NOT enough — the J~0.97 near-dup pairs in this corpus
    full-signature-collide with p = J^64 ~ 0.11 each)."""
    import duckdb

    from abwcf_ray.stages.dedup import minhash_lsh_dedup

    out = (
        minhash_lsh_dedup(docs, num_perm=512, bands=16, shingle_k=1, threshold=1.0)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    exp = (
        con.execute(
            r"""
            WITH keyed AS (
                SELECT doc_id,
                       list_sort(list_distinct(regexp_extract_all(text, '\S+'))) AS k
                FROM documents
            )
            SELECT doc_id,
                   MIN(doc_id) OVER (PARTITION BY k) AS cluster,
                   CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY k) AS BIGINT) AS is_dup
            FROM keyed
            """
        )
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (out["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    assert (out["cluster"].to_numpy() == exp["cluster"].to_numpy()).all()
    assert (out["is_dup"].to_numpy().astype(np.int64) == exp["is_dup"].to_numpy()).all()


def test_simhash_dedup_runs(docs):
    from abwcf_ray.stages.dedup import simhash_dedup

    labels = simhash_dedup(docs, max_hamming=0)
    pdf = docs.to_pandas()
    text_min = pdf.groupby("text")["doc_id"].transform("min")
    exact_dup = (pdf["doc_id"] != text_min).to_numpy()
    got = labels.set_index("doc_id").loc[pdf["doc_id"], "is_dup"].to_numpy()
    assert (got[exact_dup]).all()


def test_ngram_jaccard(docs):
    from abwcf_ray.stages.dedup import ngram_jaccard_dedup

    small = docs.limit(200)
    labels = ngram_jaccard_dedup(small, threshold=0.99)
    pdf = small.to_pandas()
    text_min = pdf.groupby("text")["doc_id"].transform("min")
    exact_dup = (pdf["doc_id"] != text_min).to_numpy()
    got = labels.set_index("doc_id").loc[pdf["doc_id"], "is_dup"].to_numpy()
    assert (got[exact_dup]).all()


def test_no_driver_signature_materialization(docs, embs, monkeypatch):
    """The near-dup entry points must never materialize signatures /
    shingles / vectors driver-side — only verified edges and final labels
    may cross (round-1 VERDICT item 2). Enforced by poisoning to_pandas /
    take_all for any dataset whose schema carries a payload column."""
    import ray.data

    # "shingles" is deliberately NOT banned: ngram_jaccard collects shingle
    # sets for the candidate-involved docs only (bounded by near-dup
    # density); the whole-corpus variants (sig/unit/simhash/text payloads,
    # take_all) are what must never reach the driver.
    banned = {"sig", "unit", "simhash", "bucket_key", "embedding", "text"}
    real_to_pandas = ray.data.Dataset.to_pandas

    def guarded_to_pandas(self, *a, **kw):
        cols = set(self.schema().names)
        assert not (cols & banned), f"driver materialization of payload: {cols & banned}"
        return real_to_pandas(self, *a, **kw)

    def banned_take_all(self, *a, **kw):
        raise AssertionError("take_all() is banned in dedup entry points")

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", guarded_to_pandas)
    monkeypatch.setattr(ray.data.Dataset, "take_all", banned_take_all)

    from abwcf_ray.stages.dedup import (
        embedding_dedup,
        minhash_lsh_dedup,
        ngram_jaccard_dedup,
        simhash_dedup,
    )

    small = docs.limit(150)
    for fn in (minhash_lsh_dedup, simhash_dedup, ngram_jaccard_dedup):
        labels = fn(small)
        assert set(labels.columns) == {"doc_id", "cluster", "is_dup"}
    labels = embedding_dedup(embs.limit(100), threshold=0.99, planes=8)
    assert set(labels.columns) == {"vec_id", "cluster", "is_dup"}


def test_label_assignment_matches_unionfind(ray_session):
    """Distributed broadcast-lookup labeling == in-memory union-find over
    the same edges (property check for labels_from_edges)."""
    import ray.data as rd

    from abwcf_ray.stages.dedup import (
        connected_components_labels,
        labels_from_edges,
    )

    rng = np.random.default_rng(3)
    ids = np.arange(500, dtype=np.int64)
    edges = pd.DataFrame(
        {
            "src": rng.integers(0, 500, 80),
            "dst": rng.integers(0, 500, 80),
        }
    )
    edges = edges[edges["src"] != edges["dst"]]
    edges[["src", "dst"]] = np.sort(edges[["src", "dst"]].to_numpy(), axis=1)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())})).repartition(5)
    got = (
        labels_from_edges(ds, edges, "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = connected_components_labels(edges, ids)
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    assert (got["cluster"].to_numpy() == exp["cluster"].to_numpy()).all()


def test_knn_bruteforce_matches_numpy(embs):
    from abwcf_ray.stages.similarity import knn_bruteforce

    pdf = embs.to_pandas()
    mat = np.array(list(pdf["embedding"]), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    order = np.argsort(ids)
    mat, ids = mat[order], ids[order]
    queries = mat[:3]
    got = knn_bruteforce(embs, queries, k=5, query_ids=ids[:3])

    unit = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
    for qi_idx in range(3):
        cos = unit @ unit[qi_idx]
        cos[qi_idx] = -np.inf
        top = np.argsort(-cos)[:5]
        expected = ids[top].tolist()
        sub = got[got["query_id"] == ids[qi_idx]].sort_values("rank")
        assert sub["neighbor_id"].tolist() == expected


def test_knn_ivf_recall(embs):
    from abwcf_ray.stages.similarity import knn_bruteforce, knn_ivf

    pdf = embs.to_pandas()
    mat = np.array(list(pdf["embedding"]), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    queries = mat[:3]
    exact = knn_bruteforce(embs, queries, k=5, query_ids=ids[:3])
    approx = knn_ivf(embs, queries, k=5, nlist=8, nprobe=4, query_ids=ids[:3])
    recalls = []
    for q in ids[:3]:
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, recalls


def test_embedding_dedup_self_consistent(ray_session):
    import ray.data as rd
    from abwcf_ray.stages.dedup import embedding_dedup

    rng = np.random.default_rng(0)
    base = rng.standard_normal((50, 16))
    dup = base[:10] * 1.001  # near-identical directions
    vecs = np.vstack([base, dup])
    t = pa.table(
        {
            "vec_id": pa.array(range(60), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(t)
    labels = embedding_dedup(ds, threshold=0.999, planes=6)
    lab = labels.set_index("vec_id")
    # each duplicated vector must cluster with its original
    caught = sum(lab.loc[50 + i, "cluster"] == lab.loc[i, "cluster"] for i in range(10))
    assert caught >= 8  # LSH recall: near-identical pairs share buckets


def test_multimodal_fake_decode(ray_session):
    import ray.data as rd
    from abwcf_ray.stages.multimodal import AudioFeaturizer, ImageDecoder, decode_images, make_frame_sampler

    payloads = [bytes([i % 256]) * (1024 * (i + 1)) for i in range(20)]
    t = pa.table(
        {
            "media_id": pa.array(range(20), pa.int64()),
            "kind": pa.array(["image"] * 20),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/fake"] * 20),
        }
    )
    ds = rd.from_arrow(t)
    out = decode_images(ds, fake=True, concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 20 and (out["n_pixels"] == out["width"] * out["height"]).all()
    out2 = decode_images(ds, fake=True, concurrency=2, batch_size=8).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("media_id").reset_index(drop=True),
        out2.sort_values("media_id").reset_index(drop=True),
    )
    # non-fake decoding of a non-image payload must fail loudly, not guess
    with pytest.raises(ValueError):
        ImageDecoder(fake=False)(t.slice(0, 2))
    with pytest.raises(ValueError):
        AudioFeaturizer(fake=False)(t.slice(0, 2))
    frames = ds.map_batches(make_frame_sampler(5), batch_format="pyarrow").to_pandas()
    assert frames["media_id"].nunique() == 20


def test_multimodal_real_decoders(ray_session):
    """The default (non-fake) decoders are REAL: BMP and binary-PPM headers
    and RIFF/WAV durations parse without PIL/ffmpeg; an injected decode_fn
    overrides them."""
    import struct

    import ray.data as rd

    from abwcf_ray.stages.multimodal import (
        AudioFeaturizer,
        ImageDecoder,
        decode_images,
        decode_image_header,
        decode_wav_duration,
    )

    def bmp(w, h):
        return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h) + b"\x00" * 20

    def ppm(w, h):
        return f"P6\n# cmt\n{w} {h}\n255\n".encode() + b"\x00" * 12

    def wav(seconds, rate=8000, channels=1, bits=16):
        block = channels * bits // 8
        data = b"\x00" * int(seconds * rate * block)
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                    rate * block, block, bits)
            + b"data" + struct.pack("<I", len(data))
        )
        return hdr + data

    assert decode_image_header(bmp(31, 17)) == (31, 17)
    assert decode_image_header(bmp(31, -17)) == (31, 17)  # top-down DIB
    assert decode_image_header(ppm(640, 480)) == (640, 480)
    assert abs(decode_wav_duration(wav(2.5)) - 2.5) < 1e-6

    payloads = [bmp(10 * (i + 1), 20) if i % 2 == 0 else ppm(8, 4 * (i + 1)) for i in range(10)]
    t = pa.table(
        {
            "media_id": pa.array(range(10), pa.int64()),
            "kind": pa.array(["image"] * 10),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/bmp", "image/x-portable-pixmap"] * 5),
        }
    )
    out = (
        decode_images(rd.from_arrow(t), fake=False, concurrency=2, batch_size=4)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "width"] == 10 and out.loc[0, "height"] == 20
    assert out.loc[1, "width"] == 8 and out.loc[1, "height"] == 8
    assert (out["n_pixels"] == out["width"] * out["height"]).all()

    # injectable decode_fn takes precedence (the PIL hook point)
    dec = ImageDecoder(decode_fn=lambda b: (1, 2))
    got = dec(t.slice(0, 3)).to_pydict()
    assert got["width"] == [1, 1, 1] and got["height"] == [2, 2, 2]

    wavs = pa.table(
        {
            "media_id": pa.array(range(3), pa.int64()),
            "payload": pa.array([wav(1.0), wav(0.25), wav(3.0)], pa.binary()),
        }
    )
    au = AudioFeaturizer(fake=False, frame_hop_s=0.5)(wavs).to_pydict()
    assert au["duration_s"] == [1.0, 0.25, 3.0]
    assert au["n_frames"] == [2, 1, 6]


def test_embedding_dedup_multi_table_recall(ray_session):
    """Multiple LSH tables recover borderline near-dup pairs a single
    table misses (recall is monotone in table count)."""
    import ray.data as rd
    from abwcf_ray.stages.dedup import embedding_dedup

    rng = np.random.default_rng(5)
    base = rng.standard_normal((60, 16))
    # moderately-near duplicates: enough angle that one table's buckets
    # split some pairs
    dup = base[:25] + 0.06 * rng.standard_normal((25, 16))
    vecs = np.vstack([base, dup])
    t = pa.table(
        {
            "vec_id": pa.array(range(85), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(t)

    def caught(tables):
        lab = embedding_dedup(
            ds, threshold=0.95, planes=10, tables=tables, seed=1
        ).set_index("vec_id")
        return sum(
            lab.loc[60 + i, "cluster"] == lab.loc[i, "cluster"] for i in range(25)
        )

    c1, c4 = caught(1), caught(4)
    assert c4 >= c1
    assert c4 >= 20  # 4 tables: high recall on genuinely-near pairs


def test_cc_distributed_matches_unionfind(ray_session):
    """Min-label propagation (the big-edge-set CC path) must produce the
    exact clusters of driver union-find, including multi-hop chains."""
    import ray.data as rd

    from abwcf_ray.stages.dedup import (
        cc_labels_distributed,
        connected_components_labels,
    )

    rng = np.random.default_rng(11)
    n = 400
    # random graph + a long path (forces multiple propagation rounds)
    e1 = pd.DataFrame(
        {"src": rng.integers(0, n, 120), "dst": rng.integers(0, n, 120)}
    )
    path = np.arange(300, 340)
    e2 = pd.DataFrame({"src": path[:-1], "dst": path[1:]})
    edges = pd.concat([e1, e2], ignore_index=True)
    edges = edges[edges["src"] != edges["dst"]]
    edges[["src", "dst"]] = np.sort(edges[["src", "dst"]].to_numpy(), axis=1)
    edges = edges.drop_duplicates(["src", "dst"]).reset_index(drop=True)

    edges_ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(edges["src"].to_numpy(), pa.int64()),
                "dst": pa.array(edges["dst"].to_numpy(), pa.int64()),
            }
        )
    ).repartition(4)
    got = (
        cc_labels_distributed(edges_ds, merge_partitions=8)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    exp_lookup = connected_components_labels(edges, np.arange(n))
    exp = exp_lookup[exp_lookup["doc_id"].isin(got["node"])].reset_index(drop=True)
    assert (got["node"].to_numpy() == exp["doc_id"].to_numpy()).all()
    assert (got["label"].to_numpy() == exp["cluster"].to_numpy()).all()


def test_dedup_routed_through_distributed_cc(docs):
    """cc_edge_threshold=0 forces every family through distributed CC +
    distributed label join; labels must equal the driver-path result."""
    from abwcf_ray.stages.dedup import minhash_lsh_dedup

    small = docs.limit(150)
    via_driver = minhash_lsh_dedup(small, threshold=0.9)
    via_dist = minhash_lsh_dedup(small, threshold=0.9, cc_edge_threshold=0)
    pd.testing.assert_frame_equal(via_driver, via_dist)


def test_slim_explode_carries_no_payload(docs, embs):
    """The LSH exchanges must ship (id, bucket_key, pkey) ONLY — the
    signature / unit-vector payload crosses the wire once per doc in the
    verify pass, never once per band/table (round-2 VERDICT #2)."""
    from abwcf_ray.stages.dedup import (
        make_band_explode,
        make_embedding_bucketize,
        make_minhash_stage,
    )

    b = docs.limit(20).to_arrow_refs()
    import ray

    t = pa.concat_tables([x for x in map(ray.get, b)])
    sigs = make_minhash_stage(num_perm=16, shingle_k=3)(t)
    exploded = make_band_explode(bands=4, num_perm=16)(sigs)
    assert set(exploded.schema.names) == {"doc_id", "bucket_key", "pkey"}

    eb = embs.limit(20).to_arrow_refs()
    te = pa.concat_tables([x for x in map(ray.get, eb)])
    rng = np.random.default_rng(0)
    dim = len(te.column("embedding")[0].as_py())
    bucketized = make_embedding_bucketize(rng.standard_normal((dim, 8)))(te)
    assert set(bucketized.schema.names) == {"vec_id", "bucket_key", "pkey"}


def test_simhash_vectorized_byte_identical(docs):
    """The batch simhash stage must reproduce the per-document reference
    computation bit for bit."""
    from abwcf_ray.functions.hashing import hash64
    from abwcf_ray.stages.dedup import make_simhash_stage

    t = pa.concat_tables(
        [__import__("ray").get(r) for r in docs.limit(50).to_arrow_refs()]
    )
    got = make_simhash_stage()(t).column("simhash").to_numpy(zero_copy_only=False)

    def ref_simhash(text):
        toks = (text or "").split()
        if not toks:
            return np.uint64(0)
        h = hash64(toks)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        v = (2 * bits - 1).sum(axis=0)
        return np.packbits((v > 0).astype(np.uint8), bitorder="little").view(
            np.uint64
        )[0]

    exp = np.array([ref_simhash(x) for x in t.column("text").to_pylist()], np.uint64)
    assert (got == exp).all()


def test_minhash_vectorized_matches_perdoc(docs):
    """The batch minhash signatures must equal a per-document computation
    with the same shingle scheme (segmented reduction correctness)."""
    from abwcf_ray.stages.dedup import (
        _batch_shingle_hashes,
        _perm_params,
        make_minhash_stage,
        minhash_signature,
    )

    t = pa.concat_tables(
        [__import__("ray").get(r) for r in docs.limit(40).to_arrow_refs()]
    )
    texts = t.column("text").to_pylist()
    k, num_perm, seed = 5, 32, 7
    got = make_minhash_stage(num_perm, k, seed)(t)
    a, b = _perm_params(num_perm, seed)
    for i, text in enumerate(texts):
        sh, sd, _ = _batch_shingle_hashes([text], k)
        exp = minhash_signature(sh, a, b)
        assert (np.asarray(got.column("sig")[i].as_py(), np.uint64) == exp).all()


def test_kmeans_init_unbiased_on_sorted_input(ray_session):
    """Cluster-ordered input (all of cluster A before cluster B...) must
    still yield centroids spanning every region — ds.limit() sampling saw
    only the first blocks and collapsed onto one cluster."""
    import ray.data as rd

    from abwcf_ray.stages.similarity import kmeans_fit

    rng = np.random.default_rng(5)
    centers = np.array([[10.0, 0], [0, 10.0], [-10.0, 0], [0, -10.0]])
    vecs = np.vstack(
        [c + rng.standard_normal((250, 2)) * 0.5 for c in centers]
    )  # SORTED by cluster
    t = pa.table(
        {
            "vec_id": pa.array(range(1000), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(t).repartition(8)
    cents = kmeans_fit(ds, 4, iters=8, seed=1)
    # every true center must have a fitted centroid within 2.0
    d = np.linalg.norm(centers[:, None, :] - cents[None, :, :], axis=2).min(axis=1)
    assert (d < 2.0).all(), d


# --------------------------------------------------------------------------
# SemDeDup (cluster-then-dedup)
# --------------------------------------------------------------------------
def _brute_cc_labels(vecs: np.ndarray, ids: np.ndarray, threshold: float):
    """All-pairs cosine >= threshold -> connected components -> min-id."""
    unit = vecs / np.clip(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12, None)
    adj = unit @ unit.T >= threshold
    n = len(ids)
    label = list(range(n))

    def find(x):
        while label[x] != x:
            label[x] = label[label[x]]
            x = label[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            if adj[i, j]:
                a, b = find(i), find(j)
                if a != b:
                    label[max(a, b)] = min(a, b)
    roots = np.array([ids[find(i)] for i in range(n)])
    # component representative = min id (ids here are sorted ascending)
    return {int(i): int(r) for i, r in zip(ids, roots)}


def test_semdedup_exhaustive_matches_brute_force(embs):
    """n_clusters=1 -> exhaustive candidates: the full machinery (k-means
    fit, nearest-centroid explode, partitioned pairs, distributed verify,
    CC, labels) must equal all-pairs cosine dedup."""
    from abwcf_ray.stages.semdedup import semdedup

    out = semdedup(embs, n_clusters=1, threshold=0.4).set_index("vec_id")
    df = embs.to_pandas().sort_values("vec_id")
    vecs = np.array(list(df["embedding"]), dtype=np.float64)
    exp = _brute_cc_labels(vecs, df["vec_id"].to_numpy(), 0.4)
    assert len(out) == len(exp)
    for i, r in exp.items():
        assert out.loc[i, "cluster"] == r
        assert bool(out.loc[i, "is_dup"]) == (i != r)


def test_semdedup_cluster_scope_is_sound(embs):
    """k > 1 candidate edges are a SUBSET of exhaustive edges, so every
    doc flagged dup under clustering must also be flagged dup
    exhaustively (recall trades, soundness does not)."""
    from abwcf_ray.stages.semdedup import semdedup

    full = semdedup(embs, n_clusters=1, threshold=0.4).set_index("vec_id")
    k4 = semdedup(embs, n_clusters=4, threshold=0.4).set_index("vec_id")
    dup4 = set(k4.index[k4["is_dup"]])
    dupf = set(full.index[full["is_dup"]])
    assert dup4 <= dupf
    assert len(dupf) > 0  # fixture has near-dups at 0.4


def test_semdedup_bucketize_matches_nearest_centroid(ray_session):
    import ray.data as rd

    from abwcf_ray.stages.semdedup import make_cluster_bucketize

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((40, 8))
    c = rng.standard_normal((5, 8))
    t = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(make_cluster_bucketize(c), batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
    )
    exp = np.argmin(((vecs[:, None, :] - c[None, :, :]) ** 2).sum(-1), axis=1)
    assert (out["bucket_key"].to_numpy() == exp).all()
