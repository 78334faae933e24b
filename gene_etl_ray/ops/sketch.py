"""Mergeable sketches — the pre-aggregate-then-merge pattern for
approximate aggregation at scale (emit one serialized sketch per batch,
merge the tiny sketches in a second stage; sketches are designed to be
mergeable, so no row-level shuffle is ever needed).

HyperLogLog implementation follows the published HLL algorithm
(Flajolet et al. 2007) with the standard bias corrections.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


class HyperLogLog:
    """Fixed-seed, numpy-vectorized HLL over 64-bit hashes."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if self.m >= 128:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)
        else:
            self.alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(self.m, 0.7)

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining bits + 1, vectorized via
        # float64 exponent extraction (exact for the top 53 bits, capped)
        nz = rest != 0
        lz = np.full(len(h), 64 - self.p, dtype=np.int64)
        f = rest[nz].astype(np.float64)
        lz_nz = 63 - ((f.view(np.int64) >> 52) - 1023)
        lz[nz] = np.minimum(lz_nz, 64 - self.p)
        rank = (lz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def add(self, values) -> None:
        arr = np.asarray(values, dtype=object)
        self.add_hashes(pd.util.hash_array(arr, categorize=False))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        self.registers = np.maximum(self.registers, other.registers)
        return self

    def estimate(self) -> float:
        est = self.alpha * self.m**2 / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * self.m and zeros:
            est = self.m * np.log(self.m / zeros)  # small-range correction
        return float(est)

    def serialize(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(data, dtype=np.uint8).copy()
        return h


def approx_distinct(ds: ray.data.Dataset, column: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column): one HLL per batch, merged
    driver-side — bytes moved = batches × 2^p, independent of row count."""

    def sketch(batch: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        col = batch.column(column).to_pylist()
        if col:
            h.add(col)
        return pa.table({"sketch": pa.array([h.serialize()], pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow").take_all()
    acc = HyperLogLog(p)
    for r in parts:
        acc.merge(HyperLogLog.deserialize(r["sketch"], p))
    return acc.estimate()
