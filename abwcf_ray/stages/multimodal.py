"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBBED (PIL/ffmpeg are not in this
container): :class:`ImageDecoder`/:class:`AudioFeaturizer` raise
``NotImplementedError`` unless constructed with ``fake=True``, in which
case a deterministic fake decoder produces metadata/features derived from
the payload bytes. The Ray-side plumbing — schema, actor-pool stage shape,
small batch sizes for wide binary rows, output layout — is real and tested:
swapping in a real decoder is a one-function change.

Batch-size guidance (SURVEY-scale): with ~1 MB payloads, ``batch_size=32``
and ``concurrency=N`` keeps ``batch × concurrency`` well under a worker
heap; blocks stay Arrow so payload bytes are zero-copy from the object
store.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from abwcf_ray.functions.hashing import hash64

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
    ]
)


def _fake_header(payload: bytes) -> tuple[int, int]:
    """Deterministic fake dimensions from payload bytes."""
    h = int(hash64([payload[:64].hex()])[0])
    return 64 + (h & 0x3FF), 64 + ((h >> 10) & 0x3FF)


class ImageDecoder:
    """Actor-pool stage: decode image payloads -> (media_id, width, height,
    n_pixels, feature: list<float>[8]).

    Real decode requires PIL/opencv — not present here; construct with
    ``fake=True`` for the deterministic stand-in.
    """

    def __init__(self, fake: bool = False, resize_to: int | None = None):
        self._fake = fake
        self._resize_to = resize_to
        if not fake:
            raise NotImplementedError(
                "image decoding requires PIL/opencv, not available in this "
                "container; construct ImageDecoder(fake=True) for the "
                "deterministic stand-in"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        widths, heights, feats = [], [], []
        for p in payloads:
            w, h = _fake_header(p or b"")
            if self._resize_to:
                scale = self._resize_to / max(w, h)
                w, h = max(1, int(w * scale)), max(1, int(h * scale))
            widths.append(w)
            heights.append(h)
            hs = hash64([(p or b"")[:256].hex() + str(i) for i in range(8)])
            feats.append((hs.astype(np.float64) / 2**64).tolist())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "n_pixels": pa.array(
                    [w * h for w, h in zip(widths, heights)], pa.int64()
                ),
                "feature": pa.array(feats, pa.list_(pa.float64())),
            }
        )


class AudioFeaturizer:
    """Actor-pool stage: audio payload -> (media_id, duration_s, n_frames,
    feature). Fake mode derives duration from payload length (16 kHz mono
    16-bit assumption)."""

    def __init__(self, fake: bool = False, frame_hop_s: float = 0.5):
        self._hop = frame_hop_s
        if not fake:
            raise NotImplementedError(
                "audio decoding requires soundfile/ffmpeg, not available in "
                "this container; construct AudioFeaturizer(fake=True)"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        durs = [len(p or b"") / (16000 * 2) for p in payloads]
        frames = [max(1, int(d / self._hop)) for d in durs]
        feats = [
            (hash64([(p or b"")[:128].hex() + str(i) for i in range(4)]).astype(np.float64) / 2**64).tolist()
            for p in payloads
        ]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "duration_s": pa.array(durs, pa.float64()),
                "n_frames": pa.array(frames, pa.int64()),
                "feature": pa.array(feats, pa.list_(pa.float64())),
            }
        )


def make_frame_sampler(every_n: int = 10):
    """Video frame-sampling plumbing: one (media_id, frame_index) row per
    sampled frame; frame count is derived deterministically in fake mode."""

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_frame = [], []
        for i, p in zip(ids, payloads):
            n_frames = max(1, len(p or b"") // 1024)
            for f in range(0, n_frames, every_n):
                out_id.append(i)
                out_frame.append(f)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_index": pa.array(out_frame, pa.int32()),
            }
        )

    return sample


def decode_images(ds, *, fake: bool = False, concurrency: int = 4, batch_size: int = 32):
    """The canonical multimodal stage shape: callable CLASS -> actor pool,
    small batches for wide binary rows, zero-copy Arrow in/out."""
    return ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
