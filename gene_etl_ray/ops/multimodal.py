"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, decoded by an actor-pool ``map_batches`` stage.

The image and audio decode kernels are REAL here, no external libs:
- ``image/jpeg`` — pure-python baseline sequential JPEG
  (``ops/jpeg.py``: Huffman + dequant + IDCT per ITU-T T.81), decode
  AND encode — the dominant web image format;
- ``image/png`` — an actual PNG decoder (chunk parse → IHDR validate →
  zlib-inflate IDAT → scanline unfilter (types 0-2) → numpy array), and
  the matching minimal encoder used by ``synthesize_media``;
- ``audio/wav`` — stdlib ``wave`` PCM decode → int16 numpy samples.

Richer codecs (progressive JPEG, MP3, H.264) genuinely require external
libraries that are absent from this container — those mimes raise
NotImplementedError at the exact call site where PIL/ffmpeg would slot
in; nothing else in the stage would change.

Scale notes: media rows are FAT — ``decode_media`` sizes batches small
(bytes-budgeted, not row-budgeted) and replaces the payload column with
compact feature vectors so the shuffle/store never carries the bytes
forward.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from gene_etl_ray.ops.jpeg import (
    jpeg_decode,
    jpeg_decode_gray,
    jpeg_encode_color,
    jpeg_encode_gray,
)

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("source_url", pa.string()),
    ]
)


# ---------------------------------------------------------------------------
# minimal real PNG codec (8-bit grayscale), stdlib-only
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode_gray(arr: np.ndarray) -> bytes:
    """Encode a 2-D uint8 array as a valid grayscale PNG."""
    if arr.dtype != np.uint8 or arr.ndim != 2:
        raise ValueError("png_encode_gray wants a 2-D uint8 array")
    h, w = arr.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit, grayscale
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))  # filter 0
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_decode_gray(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale PNG (filters 0/1/2) to a 2-D uint8 array."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, width, height, idat = 8, None, None, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit non-interlaced grayscale PNG is supported "
                    "without an image library"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(idat)
    stride = width + 1
    out = np.zeros((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.uint8)
    for r in range(height):
        line = raw[r * stride : (r + 1) * stride]
        ftype, scan = line[0], np.frombuffer(line[1:], dtype=np.uint8).copy()
        if ftype == 0:
            row = scan
        elif ftype == 2:  # Up
            row = (scan.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 1:  # Sub (serial recurrence along the scanline)
            row = scan
            for c in range(1, width):
                row[c] = (int(row[c]) + int(row[c - 1])) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter {ftype} not supported")
        out[r] = row
        prev = row
    return out


# ---------------------------------------------------------------------------
# minimal real WAV codec (16-bit mono PCM), stdlib-only
# ---------------------------------------------------------------------------

def wav_encode_pcm16(samples: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def wav_decode_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise NotImplementedError("only 16-bit mono PCM WAV is supported")
        frames = w.readframes(w.getnframes())
        return np.frombuffer(frames, dtype="<i2"), w.getframerate()


# ---------------------------------------------------------------------------
# minimal real raw-video codec (8-bit grayscale frames), stdlib-only
# ---------------------------------------------------------------------------

_RVID_MAGIC = b"RVID"


def rawvideo_encode(frames: np.ndarray) -> bytes:
    """Encode an (n_frames, h, w) uint8 array as a minimal raw-video
    container: magic + dims header + contiguous frame planes. A REAL
    (if spartan) codec — every byte is decodable by ``rawvideo_decode``
    with no external library; the compressed-codec slot (H.264/VP9)
    raises in ``FrameSampler`` exactly where ffmpeg would plug in."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    if f.ndim != 3:
        raise ValueError("frames must be (n, h, w)")
    n, h, w = f.shape
    return _RVID_MAGIC + struct.pack("<HHI", w, h, n) + f.tobytes()


def rawvideo_decode(data: bytes) -> np.ndarray:
    if data[:4] != _RVID_MAGIC:
        raise ValueError("not a raw-video payload")
    w, h, n = struct.unpack("<HHI", data[4:12])
    arr = np.frombuffer(data[12:], dtype=np.uint8)
    if len(arr) != n * h * w:
        raise ValueError("torn raw-video payload")
    return arr.reshape(n, h, w)


def synthesize_video(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    """Deterministic raw-video payloads from the documents table —
    FIXTURE-PARAMETER construction (everything a pure formula of the
    id, so a SQL twin can re-derive any byte-level statistic): side =
    8 + id%8, n_frames = 8 + id%32, frame ``f`` is the constant pixel
    value (id + f) % 251. One per-row encode loop — inherent for opaque
    binary payloads, same shape as the PNG/WAV synthesizer."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        payloads = []
        for i in ids:
            i = int(i)
            side = 8 + i % 8
            n = 8 + i % 32
            vals = (i + np.arange(n, dtype=np.int64)) % 251
            frames = np.broadcast_to(
                vals[:, None, None], (n, side, side)
            ).astype(np.uint8)
            payloads.append(rawvideo_encode(frames))
        return pd.DataFrame(
            {
                "media_id": ids,
                "media_type": ["video"] * len(ids),
                "payload": payloads,
                "mime": ["video/raw"] * len(ids),
                "source_url": [f"https://media.example.com/v/{i}" for i in ids],
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


class FrameSampler:
    """Video frame-sampling stage (every ``stride``-th frame, from frame
    0) — the multimodal pipeline step that bounds downstream work to
    O(n_frames/stride). ``video/raw`` decodes/re-encodes for real;
    compressed mimes (video/mp4, video/webm) raise at the exact call
    site an ffmpeg/PyAV demuxer would slot into. Output rows carry the
    SAMPLED payload (itself valid raw-video), per-media frame counts,
    and the sampled-byte checksum — the hook e2e tests and the SQL twin
    use to gate the actual pixel bytes through encode→sample→decode."""

    def __init__(self, stride: int = 4):
        if stride < 1:
            raise ValueError("stride must be >= 1")
        self.stride = stride

    def _one(self, payload: bytes, mime: str) -> tuple[bytes, int, int, int, int, int]:
        if mime == "video/raw":
            frames = rawvideo_decode(payload)
            sampled = frames[:: self.stride]
            out = rawvideo_encode(sampled)
            checksum = int(sampled.sum(dtype=np.uint64))
            n, h, w = frames.shape
            return out, n, len(sampled), h, w, checksum
        raise NotImplementedError(
            f"no demuxer for {mime!r} in this container — an ffmpeg/PyAV "
            "frame extractor slots in exactly here"
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        res = [self._one(p, m) for p, m in zip(batch["payload"], batch["mime"])]
        out = batch.copy()
        out["payload"] = [r[0] for r in res]
        out["n_frames_in"] = pd.array([r[1] for r in res], dtype="int64")
        out["n_frames_out"] = pd.array([r[2] for r in res], dtype="int64")
        out["out_h"] = pd.array([r[3] for r in res], dtype="int64")
        out["out_w"] = pd.array([r[4] for r in res], dtype="int64")
        out["checksum"] = pd.array([r[5] for r in res], dtype="int64")
        return out


def sample_frames(
    ds: ray.data.Dataset,
    stride: int = 4,
    concurrency: int = 4,
    batch_size: int = 64,
):
    """Frame-sampling stage wiring: byte-heavy rows → small batches,
    autoscaling actor pool (decoder state per actor, not per batch)."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


def synthesize_media(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    """Deterministic REAL media payloads derived from the documents table:
    valid grayscale PNGs and 16-bit PCM WAVs (stands in for WARC
    image/audio payloads; every byte decodable by the stage below)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        payloads, mtypes, mimes = [], [], []
        for i in ids:
            rng = np.random.RandomState(int(i) % (2**31))
            if i % 3:
                side = 8 + int(i) % 24
                if i % 3 == 1:
                    # the dominant web image format, real baseline bytes;
                    # half the JPEGs are 3-component 4:2:0 COLOR (the
                    # actual web shape), half grayscale — same side
                    # formula, so the fixture-parameter twins hold
                    if i % 6 == 1:
                        img3 = rng.randint(
                            0, 256, size=(side, side, 3)).astype(np.uint8)
                        payloads.append(jpeg_encode_color(img3, quality=90))
                    else:
                        img = rng.randint(
                            0, 256, size=(side, side)).astype(np.uint8)
                        payloads.append(jpeg_encode_gray(img, quality=90))
                    mimes.append("image/jpeg")
                else:
                    img = rng.randint(
                        0, 256, size=(side, side)).astype(np.uint8)
                    payloads.append(png_encode_gray(img))
                    mimes.append("image/png")
                mtypes.append("image")
            else:
                n = 256 + int(i) % 1024
                payloads.append(
                    wav_encode_pcm16(
                        (rng.standard_normal(n) * 3000).astype(np.int16)
                    )
                )
                mtypes.append("audio")
                mimes.append("audio/wav")
        return pd.DataFrame(
            {
                "media_id": ids,
                "media_type": mtypes,
                "payload": payloads,
                "mime": mimes,
                "source_url": [f"https://media.example.com/{i}" for i in ids],
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


class MediaDecoder:
    """Actor-pool decode/feature stage. Baseline JPEG, PNG and WAV are
    decoded FOR REAL (native codecs above); other mimes (MP3/video/
    progressive JPEG) raise NotImplementedError at the exact call site
    a PIL/ffmpeg decoder slots into. ``feature_dim`` fixes the output vector width so downstream
    schema is stable across media types.

    Batch sizing: media rows are fat — callers must size map_batches by
    BYTES (small ``batch_size``), not rows; see ``decode_media``.
    """

    def __init__(self, feature_dim: int = 8):
        self.dim = feature_dim

    def _features(self, payload: bytes, mime: str) -> np.ndarray:
        if mime in ("image/png", "image/jpeg"):
            img = (
                png_decode_gray(payload)
                if mime == "image/png"
                else jpeg_decode_gray(payload)
            ).astype(np.float32)
            h, w = img.shape
            edge = float(np.abs(np.diff(img, axis=1)).mean()) if w > 1 else 0.0
            f = [
                img.mean() / 255.0,
                img.std() / 255.0,
                float(np.percentile(img, 25)) / 255.0,
                float(np.percentile(img, 50)) / 255.0,
                float(np.percentile(img, 75)) / 255.0,
                edge / 255.0,
                h / 4096.0,
                w / 4096.0,
            ]
        elif mime == "audio/wav":
            samples, rate = wav_decode_pcm16(payload)
            s = samples.astype(np.float32) / 32768.0
            zc = float(np.mean(np.abs(np.diff(np.sign(s))) > 0)) if len(s) > 1 else 0.0
            f = [
                float(np.sqrt(np.mean(s * s))),  # rms
                float(np.abs(s).mean()),
                float(np.abs(s).max(initial=0.0)),
                zc,
                len(s) / float(rate),  # duration sec
                rate / 48000.0,
                0.0,
                0.0,
            ]
        else:
            raise NotImplementedError(
                f"decoding {mime} requires an external media library not "
                "present in this environment (baseline JPEG/PNG/WAV are "
                "decoded natively); plug PIL/ffmpeg here for MP3/video/"
                "progressive JPEG"
            )
        v = np.asarray(f, dtype=np.float32)
        if len(v) < self.dim:
            v = np.pad(v, (0, self.dim - len(v)))
        return v[: self.dim]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = [
            self._features(p, m) for p, m in zip(batch["payload"], batch["mime"])
        ]
        out = batch.drop(columns=["payload"])  # features replace fat bytes
        out["feature"] = feats
        out["payload_bytes"] = [len(p) for p in batch["payload"]]
        return out


def decode_media(ds: ray.data.Dataset, concurrency: int = 4, batch_size: int = 64):
    """The decode stage wiring: small batches (fat binary rows), actor
    pool, zero-copy pass-through of metadata columns."""
    return ds.map_batches(
        MediaDecoder,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


class MediaResizer:
    """Actor-pool resize / frame-sample stage over opaque binary media
    columns — REAL kernels for the formats the stdlib codecs above
    cover, loud NotImplementedError at the exact slot a PIL/ffmpeg
    kernel plugs into for the rest.

    - ``image/png``: decode → NEAREST-NEIGHBOR resample of the grayscale
      plane to ``size × size`` (index-map resample, pure numpy — the
      deterministic stand-in for a PIL resize) → re-encode PNG.
    - ``audio/wav``: FRAME-SAMPLE — keep every ``stride``-th PCM frame
      and divide the sample rate by ``stride``, preserving duration
      (the audio analog of video frame sampling).
    - ``image/jpeg``: decode (baseline codec) → same nearest-neighbor
      resample → re-encode baseline JPEG.
    - anything else (MP3 / video/* / progressive JPEG):
      NotImplementedError.

    Output rows keep metadata, replace ``payload`` with the resampled
    bytes, and add ``out_h/out_w`` (images; -1 for audio) and
    ``out_frames`` (audio; -1 for images). Same byte-budget batching
    contract as :class:`MediaDecoder`."""

    def __init__(self, size: int = 16, stride: int = 4):
        if size < 1 or stride < 1:
            raise ValueError("size and stride must be >= 1")
        self.size = size
        self.stride = stride

    def _one(self, payload: bytes, mime: str) -> tuple[bytes, int, int, int]:
        if mime == "image/png":
            img = png_decode_gray(payload)
            h, w = img.shape
            rr = (np.arange(self.size) * h) // self.size
            cc = (np.arange(self.size) * w) // self.size
            return png_encode_gray(img[rr][:, cc]), self.size, self.size, -1
        if mime == "image/jpeg":
            img = jpeg_decode(payload)  # (h, w) gray or (h, w, 3) color
            h, w = img.shape[:2]
            rr = (np.arange(self.size) * h) // self.size
            cc = (np.arange(self.size) * w) // self.size
            out = img[rr][:, cc]
            enc = (
                jpeg_encode_color(out, quality=90)
                if out.ndim == 3
                else jpeg_encode_gray(out, quality=90)
            )
            return enc, self.size, self.size, -1
        if mime == "audio/wav":
            samples, rate = wav_decode_pcm16(payload)
            dec = samples[:: self.stride]
            return (
                wav_encode_pcm16(dec, max(1, rate // self.stride)),
                -1, -1, int(dec.size),
            )
        raise NotImplementedError(
            f"resampling {mime} requires an external media library not "
            "present in this environment; plug PIL/ffmpeg here"
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        res = [self._one(p, m) for p, m in zip(batch["payload"], batch["mime"])]
        out = batch.copy()
        out["payload"] = [r[0] for r in res]
        out["out_h"] = pd.array([r[1] for r in res], dtype="int64")
        out["out_w"] = pd.array([r[2] for r in res], dtype="int64")
        out["out_frames"] = pd.array([r[3] for r in res], dtype="int64")
        return out


def resize_media(
    ds: ray.data.Dataset,
    size: int = 16,
    stride: int = 4,
    concurrency: int = 4,
    batch_size: int = 64,
):
    """Resize/frame-sample stage wiring: byte-budgeted batches, actor
    pool (codec state + index maps live per actor, not per batch)."""
    return ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"size": size, "stride": stride},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )
