"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Decoding is three-tier: (1) REAL dependency-free header decoders by
default — BMP and P6-PPM dimensions for images, RIFF/WAV duration for
audio — covering the formats this container can parse without PIL/ffmpeg;
(2) injectable ``decode_fn`` / ``duration_fn`` hooks where a deployment
passes PIL / ffmpeg kernels for the full format range; (3) a
deterministic ``fake=True`` mode for plumbing tests. Payloads outside the
built-in formats raise with a pointer to the hook. The Ray-side shape —
schema, actor-pool stage, small batch sizes for wide binary rows, output
layout — is the same in all three tiers.

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


def decode_image_header(payload: bytes) -> tuple[int, int]:
    """REAL, dependency-free image header decode for BMP and binary PPM
    ('P6') — the formats a pure-Python parser can handle without PIL.
    Returns (width, height); raises ValueError for other formats."""
    if len(payload) >= 26 and payload[:2] == b"BM":
        import struct

        w, h = struct.unpack_from("<ii", payload, 18)
        if w <= 0 or h == 0:
            raise ValueError("corrupt BMP header")
        return w, abs(h)  # negative height = top-down DIB
    if payload[:2] == b"P6":
        # P6 <ws> width <ws> height <ws> maxval; '#' comments allowed
        toks: list[bytes] = []
        i = 2
        while len(toks) < 2 and i < min(len(payload), 512):
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":
                while i < len(payload) and payload[i : i + 1] != b"\n":
                    i += 1
                continue
            start = i
            while i < len(payload) and not payload[i : i + 1].isspace():
                i += 1
            toks.append(payload[start:i])
        if len(toks) == 2:
            return int(toks[0]), int(toks[1])
        raise ValueError("corrupt PPM header")
    raise ValueError("unsupported image format (BMP/P6-PPM supported natively)")


class ImageDecoder:
    """Actor-pool stage: decode image payloads -> (media_id, width, height,
    n_pixels, feature: list<float>[8]).

    Decode resolution order:
    - ``decode_fn``: injectable ``bytes -> (width, height)`` — plug in PIL/
      opencv here when available (``lambda b: Image.open(io.BytesIO(b)).size``);
    - default REAL decoder: :func:`decode_image_header` (BMP / binary PPM,
      pure Python — works in this container);
    - ``fake=True``: deterministic stand-in for arbitrary payloads.
    """

    def __init__(self, fake: bool = False, resize_to: int | None = None,
                 decode_fn=None):
        self._fake = fake
        self._resize_to = resize_to
        self._decode = decode_fn if decode_fn is not None else decode_image_header
        if fake and decode_fn is not None:
            raise ValueError("pass either fake=True or decode_fn, not both")

    def _dims(self, payload: bytes) -> tuple[int, int]:
        if self._fake:
            return _fake_header(payload)
        return self._decode(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        widths, heights, feats = [], [], []
        for p in payloads:
            w, h = self._dims(p or b"")
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


def decode_wav_duration(payload: bytes) -> float:
    """REAL, dependency-free WAV (RIFF/PCM) duration decode: walk the
    chunks, read fmt (rate/channels/bits) and the data size. Raises
    ValueError for non-WAV payloads."""
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, block_align, data_size = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt " and pos + 24 <= len(payload):
            _fmt, channels, rate = struct.unpack_from("<HHI", payload, pos + 8)
            block_align = struct.unpack_from("<H", payload, pos + 20)[0]
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if not rate or not block_align or data_size is None:
        raise ValueError("missing fmt/data chunk")
    return data_size / (rate * block_align)


class AudioFeaturizer:
    """Actor-pool stage: audio payload -> (media_id, duration_s, n_frames,
    feature).

    Decode resolution order mirrors :class:`ImageDecoder`: injectable
    ``duration_fn`` (soundfile/ffmpeg when available), default REAL WAV
    header decode (:func:`decode_wav_duration`, pure Python), or
    ``fake=True`` (duration from payload length, 16 kHz mono 16-bit)."""

    def __init__(self, fake: bool = False, frame_hop_s: float = 0.5,
                 duration_fn=None):
        self._hop = frame_hop_s
        self._fake = fake
        self._duration = duration_fn if duration_fn is not None else decode_wav_duration
        if fake and duration_fn is not None:
            raise ValueError("pass either fake=True or duration_fn, not both")

    def _dur(self, payload: bytes) -> float:
        if self._fake:
            return len(payload) / (16000 * 2)
        return self._duration(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        durs = [self._dur(p or b"") for p in payloads]
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
