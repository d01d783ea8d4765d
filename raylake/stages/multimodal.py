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
