"""Per-partition high-watermark checkpoints + lake metadata.

Reference analog: the gzip JSON checkpoint + batch-id existence check used
as crude resume (``persist.py:339-383``, ``persist.py:273-295``). Here:
each partition records ``{last_committed_epoch, max_seq}`` atomically; a
global ``_epochs/epoch=<e>.json`` record is written LAST, after every
touched partition's manifest+checkpoint, so a partition's effective
watermark is ``max(own checkpoint, last fully-committed global epoch)``.
A crash between partition commits leaves some partitions ahead — resume
replays the epoch and per-partition filtering skips the already-committed
ones (at-least-once replay + idempotent LWW merge + manifest epoch guard
= exactly-once observable state).

Scale note: per-commit we write one small JSON per *touched* partition plus
one global record — not one per partition of the lake — so commit cost is
O(touched), independent of total partition count.
"""

from __future__ import annotations

import glob
import json
import os

from gene_etl_ray.state.manifest import atomic_write_json


def checkpoint_path(lake_dir: str, pkey: int) -> str:
    return os.path.join(lake_dir, "_checkpoints", f"part={pkey:05d}.json")


def write_checkpoint(lake_dir: str, pkey: int, epoch: int, max_seq: int) -> None:
    atomic_write_json(
        checkpoint_path(lake_dir, pkey),
        {"pkey": pkey, "last_committed_epoch": epoch, "max_seq": max_seq},
    )


def read_checkpoint(lake_dir: str, pkey: int) -> dict | None:
    p = checkpoint_path(lake_dir, pkey)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def write_global_epoch(lake_dir: str, epoch: int, info: dict) -> None:
    atomic_write_json(
        os.path.join(lake_dir, "_epochs", f"epoch={epoch:05d}.json"),
        {"epoch": epoch, **info},
    )


def event_time_watermark(lake_dir: str) -> int | None:
    """Committed event-time watermark: max ``max_warc_ts_us`` over every
    global epoch record (µs), or None on a fresh lake / pre-0.4 records.
    Derived ONLY from the per-group records written LAST in the commit
    sequence — never from partition manifests — so a resume of a
    half-committed group computes exactly the watermark the crashed
    attempt used and re-makes identical lateness admission decisions."""
    out: int | None = None
    for f in glob.glob(os.path.join(lake_dir, "_epochs", "epoch=*.json")):
        with open(f) as fh:
            rec = json.load(fh)
        m = rec.get("max_warc_ts_us")
        if m is not None and (out is None or int(m) > out):
            out = int(m)
    return out


def last_global_epoch(lake_dir: str) -> int:
    files = glob.glob(os.path.join(lake_dir, "_epochs", "epoch=*.json"))
    if not files:
        return -1
    return max(int(os.path.basename(f)[6:-5]) for f in files)


def effective_watermarks(lake_dir: str, num_partitions: int) -> dict[int, int]:
    """pkey → highest epoch whose effects are durably committed for it."""
    g = last_global_epoch(lake_dir)
    out = {}
    cdir = os.path.join(lake_dir, "_checkpoints")
    per_part: dict[int, int] = {}
    if os.path.isdir(cdir):
        for n in os.listdir(cdir):
            if n.startswith("part=") and n.endswith(".json"):
                with open(os.path.join(cdir, n)) as f:
                    c = json.load(f)
                per_part[c["pkey"]] = c["last_committed_epoch"]
    for k in range(num_partitions):
        out[k] = max(g, per_part.get(k, -1))
    return out


def meta_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_meta", "lake.json")


def read_lake_meta(lake_dir: str) -> dict | None:
    # a committed-but-unfinalized repartition overlay carries the NEW
    # meta (num_partitions flip) — it and the manifest set publish in one
    # atomic rename, so readers must take both from the same source
    from gene_etl_ray.state.manifest import read_repart_overlay

    ov = read_repart_overlay(lake_dir)
    if ov is not None and "meta" in ov:
        return ov["meta"]
    p = meta_path(lake_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def write_lake_meta(lake_dir: str, meta: dict) -> None:
    atomic_write_json(meta_path(lake_dir), meta)
