"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries exist
in this container — see the deterministic fake below), but the Ray-side
plumbing is real and tested: schema, byte-budgeted batch sizing, actor-pool
signatures, and output layout are exactly what a real decoder stage needs.
Swap ``_decode_stub`` for a PIL/ffmpeg call and nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("source_url", pa.string()),
    ]
)


def synthesize_media(ds: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    """Deterministic fake media payloads derived from the documents table
    (stands in for real WARC image/audio payloads)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        payloads = []
        for i in ids:
            rng = np.random.RandomState(int(i) % (2**31))
            payloads.append(rng.bytes(256 + int(i) % 1024))
        return pd.DataFrame(
            {
                "media_id": ids,
                "media_type": ["image" if i % 3 else "audio" for i in ids],
                "payload": payloads,
                "mime": ["image/png" if i % 3 else "audio/wav" for i in ids],
                "source_url": [f"https://media.example.com/{i}" for i in ids],
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


class MediaDecoder:
    """Actor-pool decode/feature stage. Real decoders (PIL, torchaudio,
    ffmpeg) are unavailable in this container; ``strict=True`` raises
    NotImplementedError at the exact call site a real decoder slots into,
    ``strict=False`` substitutes a deterministic fake feature vector so the
    distributed plumbing is exercisable end-to-end.

    Batch sizing: media rows are fat — callers must size map_batches by
    BYTES (small ``batch_size``), not rows; see ``decode_media``.
    """

    def __init__(self, strict: bool = False, feature_dim: int = 8):
        self.strict = strict
        self.dim = feature_dim

    def _decode_stub(self, payload: bytes, media_type: str) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "media decode requires an image/audio library not present in "
                "this environment; plug PIL/ffmpeg here"
            )
        arr = np.frombuffer(payload[: self.dim * 4].ljust(self.dim * 4, b"\0"), dtype=np.uint8)
        return arr[: self.dim].astype(np.float32) / 255.0

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = [
            self._decode_stub(p, t) for p, t in zip(batch["payload"], batch["media_type"])
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
