"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are NOT in this container, so the decode step is
a clearly-marked deterministic fake behind the real Ray plumbing: schema
(`payload: binary` + metadata columns), actor-pool `map_batches` signature,
small-batch sizing for wide binary rows, and Arrow-native output layout are
all real and tested. Swap `_fake_decode` for PIL/torchvision/ffmpeg in a
real deployment — nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MULTIMODAL_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),
    ]
)


def encode_payload(batch: pa.Table, text_col: str = "text",
                   id_col: str = "doc_id") -> pa.Table:
    """Build the opaque-binary shape from a text table (fixture adapter)."""
    payloads = pa.array(
        [s.encode() for s in batch[text_col].to_pylist()], type=pa.binary()
    )
    mt = pa.array(
        ["image" if i % 2 == 0 else "audio" for i in batch[id_col].to_pylist()],
        type=pa.string(),
    )
    return pa.table(
        {"item_id": batch[id_col].cast(pa.int64()), "payload": payloads,
         "media_type": mt}
    )


def _fake_decode(payload: bytes) -> dict:
    """STUB — deterministic stand-in for a real image/audio decoder.
    Derives plausible metadata purely from the payload bytes."""
    n = len(payload)
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    seed = int.from_bytes(digest[:4], "big")
    return {
        "n_bytes": n,
        "width": 64 + seed % 1856,  # fake pixel dims
        "height": 64 + (seed >> 8) % 1016,
        "checksum": digest.hex(),
    }


class MediaFeatureExtractor:
    """Actor-pool decode/feature stage. Use SMALL batch_size (payloads are
    wide): `ds.map_batches(MediaFeatureExtractor, batch_format="pyarrow",
    batch_size=256, concurrency=N)`. In production __init__ would load the
    codec/model once per actor (the ST1 pattern)."""

    def __init__(self, real_decoder=None):
        if real_decoder is not None:  # pragma: no cover - no codecs in sandbox
            raise NotImplementedError(
                "real decoders (PIL/ffmpeg) are not available in this "
                "environment; the deterministic fake is used instead"
            )
        self.decode = _fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [self.decode(p) for p in batch["payload"].to_pylist()]
        aspect = np.array(
            [m["width"] / m["height"] for m in metas], dtype=np.float64
        ).round(4)
        return pa.table(
            {
                "item_id": batch["item_id"],
                "media_type": batch["media_type"],
                "n_bytes": pa.array([m["n_bytes"] for m in metas], pa.int64()),
                "width": pa.array([m["width"] for m in metas], pa.int32()),
                "height": pa.array([m["height"] for m in metas], pa.int32()),
                "aspect": pa.array(aspect),
                "checksum": pa.array([m["checksum"] for m in metas], pa.string()),
            }
        )


# ---------------------------------------------------------------------------
# Frame sampling + resize plumbing (video/audio tier)
# ---------------------------------------------------------------------------

VIDEO_FRAMES_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("frame_idx", pa.int32()),
    ("frame_ts_ms", pa.int64()),
    ("frame", pa.binary()),
])


def _fake_video_meta(payload: bytes) -> dict:
    """STUB — stands in for a container demuxer (ffprobe). Deterministic
    duration/fps derived from payload bytes."""
    digest = hashlib.blake2b(payload, digest_size=8).digest()
    seed = int.from_bytes(digest[4:], "big")
    return {
        "duration_ms": 1_000 + seed % 600_000,  # 1s .. 10min
        "fps": 24 + (seed >> 16) % 37,
    }


def _fake_extract_frame(payload: bytes, ts_ms: int) -> bytes:
    """STUB — stands in for a seek+decode of one frame. Deterministic bytes
    keyed by (payload, ts), fixed small size (a real JPEG would be ~50 KB —
    the batch sizing math below budgets for that)."""
    return hashlib.blake2b(
        payload + ts_ms.to_bytes(8, "big"), digest_size=32
    ).digest()


class FrameSampler:
    """flat-map-shaped actor stage: one input video row → `n_frames` rows of
    uniformly-sampled frames. REAL plumbing decisions, stubbed codec:

    - output is a FLAT table (one row per frame), so downstream stages
      (embedding, dedup, resize) stay ordinary map_batches over rows —
      never nested lists of frames that defeat batch sizing;
    - use batch_size so that batch_size × n_frames × frame_bytes fits the
      worker heap (e.g. 50 KB JPEG frames, 8 frames → batch_size ≤ 256
      keeps a batch ≈ 100 MB);
    - the demuxer/codec handle would be opened once per actor here in
      __init__ (the ST1 pattern)."""

    def __init__(self, n_frames: int = 8, real_decoder=None):
        if real_decoder is not None:  # pragma: no cover — no codecs here
            raise NotImplementedError(
                "real demuxers (ffmpeg/pyav) are not available in this "
                "environment; the deterministic fake is used instead")
        self.n_frames = n_frames
        self.meta = _fake_video_meta
        self.extract = _fake_extract_frame

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, fts, frames = [], [], [], []
        for item_id, payload in zip(batch["item_id"].to_pylist(),
                                    batch["payload"].to_pylist()):
            m = self.meta(payload)
            # uniform midpoints: frame i at (i + 0.5)/n of the duration
            for i in range(self.n_frames):
                ts = int((i + 0.5) * m["duration_ms"] / self.n_frames)
                ids.append(item_id)
                fidx.append(i)
                fts.append(ts)
                frames.append(self.extract(payload, ts))
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "frame_ts_ms": pa.array(fts, pa.int64()),
            "frame": pa.array(frames, pa.binary()),
        })


class FrameResizer:
    """Per-frame resize stage (stubbed resampler): real plumbing — binary
    in, binary out, target dims carried as columns so downstream writers
    partition by resolution. A real impl swaps `_resize` for PIL/cv2."""

    def __init__(self, width: int = 224, height: int = 224):
        self.width = width
        self.height = height

    def _resize(self, frame: bytes) -> bytes:
        return hashlib.blake2b(
            frame + self.width.to_bytes(4, "big")
            + self.height.to_bytes(4, "big"),
            digest_size=32,
        ).digest()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = pa.array([self._resize(f) for f in batch["frame"].to_pylist()],
                       pa.binary())
        n = len(batch)
        return (batch.set_column(batch.schema.get_field_index("frame"),
                                 "frame", out)
                .append_column("out_width",
                               pa.array([self.width] * n, pa.int32()))
                .append_column("out_height",
                               pa.array([self.height] * n, pa.int32())))
