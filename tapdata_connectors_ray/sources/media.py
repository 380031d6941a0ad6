"""Multimodal columns: opaque binary payloads + typed metadata.

The 100 TB training-pipeline pattern: image/audio/video travel as ``binary``
columns; decode / feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages sized for large payloads (small ``batch_size``, one
actor init per worker).  The image/audio codecs are NOT in this container,
so the decode core is stubbed (clearly marked) behind a deterministic fake
container format — the Ray-side plumbing (schema, actor signature, batch
sizing, output layout) is real and tested.

Fake container format (deterministic, seeded):
- image: b"IMG1" + u16le width + u16le height + width*height gray bytes
- audio: b"AUD1" + u32le sample_rate + u32le n_samples + n_samples i8 pcm
- video: b"VID1" + u16le width + u16le height + u16le n_frames +
  n_frames*width*height gray bytes (frame-major)
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MEDIA_FIXTURE_VERSION = 4


def _exact_mean(a: "np.ndarray") -> float:
    """Mean as ONE IEEE division of an exact integer sum by an exact count.

    ``np.mean`` (pairwise float accumulation) + pre-rounding is how the
    generator and the decoder drifted 1 ulp apart at sf0.1 (np.round and
    Python round() disagree on half-way cases); integer pixels/PCM sum
    exactly in int64, so sum/size is bit-identical however the bytes were
    reassembled.  No pre-rounding — the driver's value-hash rounds both
    sides with the same implementation."""
    return a.sum(dtype=np.int64) / a.size

_IMG_MAGIC = b"IMG1"
_AUD_MAGIC = b"AUD1"
_VID_MAGIC = b"VID1"

RESIZE_TARGET = 8
FRAME_SAMPLE_STRIDE = 4


def _gen_media_table(n_items: int, seed: int = 7) -> tuple[pa.Table, pa.Table, pa.Table]:
    """(media table, decode-expected, resize-expected).  The expected tables
    are computed from the GENERATION-side variables (w/h/pixels before
    packing), not by running the decode stub — so the decode/resize queries
    get a real value oracle instead of a rows-only check."""
    ids = np.arange(n_items, dtype=np.int64)
    kinds = np.where(
        ids % 3 == 0, "audio", np.where(ids % 7 == 1, "video", "image")
    )
    payloads: list[bytes] = []
    exp_rows: list[tuple] = []
    resize_rows: list[tuple] = []
    sample_rows: list[tuple] = []
    t = RESIZE_TARGET
    for i, kind in zip(ids, kinds):
        r = np.random.default_rng(seed * 1_000_003 + int(i))  # per-item stream
        if kind == "video":
            w, h = int(r.integers(8, 24)), int(r.integers(8, 24))
            nf = int(r.integers(8, 40))
            frames = r.integers(0, 256, nf * w * h, dtype=np.uint8)
            payloads.append(
                _VID_MAGIC + struct.pack("<HHH", w, h, nf) + frames.tobytes()
            )
            exp_rows.append((int(i), "video", w * h, nf, _exact_mean(frames)))
            # expected AFTER frame sampling (every FRAME_SAMPLE_STRIDE-th frame)
            kept = frames.reshape(nf, w * h)[::FRAME_SAMPLE_STRIDE]
            sample_rows.append(
                (int(i), "video", w * h, len(kept), _exact_mean(kept))
            )
        elif kind == "image":
            w = int(r.integers(8, 64))
            h = int(r.integers(8, 64))
            px = r.integers(0, 256, w * h, dtype=np.uint8)
            payloads.append(_IMG_MAGIC + struct.pack("<HH", w, h) + px.tobytes())
            exp_rows.append((int(i), "image", w, h, _exact_mean(px)))
            grid = px.reshape(h, w)[np.ix_((np.arange(t) * h) // t, (np.arange(t) * w) // t)]
            resize_rows.append((int(i), "image", t, t, _exact_mean(grid)))
        else:
            sr = int(r.choice([8000, 16000]))
            ns = int(r.integers(64, 2048))
            pcm = r.integers(-128, 128, ns, dtype=np.int8)
            payloads.append(_AUD_MAGIC + struct.pack("<II", sr, ns) + pcm.tobytes())
            mean_abs = _exact_mean(np.abs(pcm.astype(np.int32)))
            exp_rows.append((int(i), "audio", sr, ns, mean_abs))
    media = pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )

    def expected_table(rows: list[tuple]) -> pa.Table:
        cols = list(zip(*rows)) if rows else [[], [], [], [], []]
        return pa.table(
            {
                "media_id": pa.array(cols[0], type=pa.int64()),
                "kind": pa.array(cols[1], type=pa.string()),
                "dim_a": pa.array(cols[2], type=pa.int64()),
                "dim_b": pa.array(cols[3], type=pa.int64()),
                "mean_signal": pa.array(cols[4], type=pa.float64()),
            }
        )

    return (
        media,
        expected_table(exp_rows),
        expected_table(resize_rows),
        expected_table(sample_rows),
    )


MEDIA_COUNTS = {"sf0.001": 200, "sf0.01": 1_000, "sf0.1": 5_000, "sf1": 20_000}


def ensure_media_fixture(sf: str, root: str = "/tmp/tcr_fixtures") -> str:
    """Media parquet segment dir under the fixture root; cached by version.
    Expected-value side tables (``media_expected.parquet`` /
    ``media_resized_expected.parquet``) land next to it for the oracle."""
    out = os.path.join(root, sf, "media.parquet")
    marker = os.path.join(out, f".v{MEDIA_FIXTURE_VERSION}")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    table, expected, resized, sampled = _gen_media_table(MEDIA_COUNTS.get(sf, 1_000))
    shard = 512  # large binary payloads -> small files/blocks
    for i in range(0, table.num_rows, shard):
        pq.write_table(
            table.slice(i, shard), os.path.join(out, f"part-{i // shard:05d}.parquet")
        )
    parent = os.path.dirname(out)
    pq.write_table(expected, os.path.join(parent, "media_expected.parquet"))
    pq.write_table(resized, os.path.join(parent, "media_resized_expected.parquet"))
    pq.write_table(sampled, os.path.join(parent, "media_framesample_expected.parquet"))
    open(marker, "w").close()
    return out


class DecodeMedia:
    """Actor-pool decode stage.  ``__init__`` is where a real deployment
    loads codecs (PIL / torchaudio / pyav) once per actor; here it binds the
    stub decoders for the fake container format.

    Real-codec path is stubbed: constructing with ``require_real_codecs=True``
    raises ``NotImplementedError`` (the libs are not in this container)."""

    def __init__(self, require_real_codecs: bool = False):
        if require_real_codecs:
            raise NotImplementedError(
                "real image/audio codecs are not available in this environment; "
                "the deterministic fake-container decoder is used instead"
            )

    @staticmethod
    def _decode_one(kind: str, payload: bytes) -> tuple[int, int, float]:
        """-> (dim_a, dim_b, mean_signal): (w, h, mean_pixel) for images,
        (sample_rate, n_samples, mean_abs_pcm) for audio,
        (frame_pixels, n_frames, mean_pixel) for video."""
        if kind == "image":
            assert payload[:4] == _IMG_MAGIC, "bad image magic"
            w, h = struct.unpack_from("<HH", payload, 4)
            px = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=8)
            return w, h, _exact_mean(px)
        if kind == "video":
            assert payload[:4] == _VID_MAGIC, "bad video magic"
            w, h, nf = struct.unpack_from("<HHH", payload, 4)
            px = np.frombuffer(payload, dtype=np.uint8, count=nf * w * h, offset=10)
            return w * h, nf, _exact_mean(px)
        assert payload[:4] == _AUD_MAGIC, "bad audio magic"
        sr, ns = struct.unpack_from("<II", payload, 4)
        pcm = np.frombuffer(payload, dtype=np.int8, count=ns, offset=12)
        return sr, ns, _exact_mean(np.abs(pcm.astype(np.int32)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        decoded = [self._decode_one(k, p) for k, p in zip(kinds, payloads)]
        a, b, m = zip(*decoded) if decoded else ((), (), ())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "dim_a": pa.array(a, type=pa.int64()),
                "dim_b": pa.array(b, type=pa.int64()),
                "mean_signal": pa.array(np.array(m, dtype=np.float64)),
            }
        )


class ResizeImageStub:
    """Actor-pool resize stage (images only): nearest-neighbor downscale of
    the fake gray payload to ``target`` x ``target`` — stands in for a real
    vectorized resize; the batch plumbing (binary in, binary out, metadata
    columns preserved) is the production layout."""

    def __init__(self, target: int = 8):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for kind, payload in zip(batch["kind"].to_pylist(), batch["payload"].to_pylist()):
            if kind != "image":
                out.append(payload)
                continue
            w, h = struct.unpack_from("<HH", payload, 4)
            px = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=8).reshape(h, w)
            t = self.target
            yi = (np.arange(t) * h) // t
            xi = (np.arange(t) * w) // t
            small = px[np.ix_(yi, xi)]
            out.append(_IMG_MAGIC + struct.pack("<HH", t, t) + small.tobytes())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": pa.array(out, type=pa.binary()),
            }
        )


class FrameSampleStub:
    """Actor-pool frame-sampling stage (videos only): keep every
    ``stride``-th frame of the fake container — the video analogue of the
    resize stage; the batch plumbing (binary in/out, metadata preserved,
    small batch_size because payloads are the memory unit) is the
    production layout."""

    def __init__(self, stride: int = FRAME_SAMPLE_STRIDE):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for kind, payload in zip(batch["kind"].to_pylist(), batch["payload"].to_pylist()):
            if kind != "video":
                out.append(payload)
                continue
            w, h, nf = struct.unpack_from("<HHH", payload, 4)
            frames = np.frombuffer(
                payload, dtype=np.uint8, count=nf * w * h, offset=10
            ).reshape(nf, w * h)
            kept = frames[:: self.stride]
            out.append(
                _VID_MAGIC + struct.pack("<HHH", w, h, len(kept)) + kept.tobytes()
            )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": pa.array(out, type=pa.binary()),
            }
        )
