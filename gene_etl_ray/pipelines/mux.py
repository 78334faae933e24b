"""Multi-producer WAL multiplexer — N binlog shards → ONE consumer WAL.

The ingest engine consumes a single WAL with contiguous epoch numbering
(`discover_epochs`' gap rule is what makes crash/resume watermarks safe).
Real CDC deployments have many producers — binlog shards, per-crawler
change feeds — each emitting its own contiguous segment sequence. This
module merges them into one consumer WAL honoring that contract, the
same shape as N Kafka partitions feeding one ordered consumer group.

Protocol (crash-safe, idempotent, append-only):

1. per-source discovery uses the same contiguity rule as the consumer
   (`discover_epochs`): a torn or not-yet-visible segment holds back that
   source's later segments, never the other sources';
2. new (source, src_epoch) pairs above each source's consumed cursor are
   ordered deterministically — by (src_epoch, source_index) — and each is
   RESERVED a global epoch number by atomically rewriting the mapping
   file ``_mux.json`` BEFORE any data is copied;
3. reserved segments are then REWRITTEN tmp→atomic-rename into
   ``epoch=<g>.parquet`` with the envelope ``epoch`` column restamped to
   the global number — the consumer's watermark filter trusts the in-row
   epoch, so a shard-local epoch leaking through would be filtered as
   already-committed. The rewrite is deterministic (same bytes on every
   retry).

A crash between (2) and (3) leaves reserved numbers with missing files:
the consumer's contiguity rule holds every later epoch back (a missing
file is exactly the "not yet visible" case it exists for), and the next
mux run re-copies precisely the reserved-but-missing files to their
already-fixed numbers. Global numbers are therefore immutable once
assigned — a segment the consumer has committed can never change content
— and re-running mux with no new input is a no-op.

Event-time correctness does not depend on arrival interleaving: the lake
merge is LWW on (warc_ts, seq), and out-of-order delivery is already the
engine's tested normal case, so a lagging shard whose segments get later
global numbers converges to the same state.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from gene_etl_ray.state.manifest import atomic_write_json


def _mux_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_mux.json")


def read_mux_state(out_dir: str) -> dict:
    p = _mux_path(out_dir)
    if not os.path.exists(p):
        return {"assignments": {}}
    with open(p) as f:
        return json.load(f)


def merge_wals(source_dirs: list[str], out_dir: str) -> dict:
    """Append every newly-visible segment from ``source_dirs`` into the
    consumer WAL at ``out_dir``. Returns a report with the number of
    segments appended and per-source cursors. Safe to re-run at any
    point, including mid-crash. Takes the single-writer lock on
    ``out_dir`` for the whole reserve→copy window: two concurrent mux
    runs could otherwise both read ``_mux.json``, reserve conflicting
    global numbers, and let the losing atomic_write orphan a segment
    already copied under a now-remapped number."""
    from gene_etl_ray.pipelines.ingest import discover_epochs
    from gene_etl_ray.state.lock import acquire, release

    os.makedirs(out_dir, exist_ok=True)
    acquire(out_dir)
    try:
        return _merge_wals_locked(source_dirs, out_dir, discover_epochs)
    finally:
        release(out_dir)


def _merge_wals_locked(source_dirs, out_dir, discover_epochs) -> dict:
    state = read_mux_state(out_dir)
    assignments: dict[str, list] = state["assignments"]
    done = {(int(s), int(e)) for s, e in assignments.values()}

    # Phase A: discover candidates per source under the source-local
    # contiguity rule, skipping pairs already assigned.
    candidates: list[tuple[int, int, str]] = []  # (src_epoch, src_idx, file)
    for i, d in enumerate(source_dirs):
        for e, f in sorted(discover_epochs(d).items()):
            if (i, e) not in done:
                candidates.append((e, i, f))
    candidates.sort()

    # Phase B: reserve global numbers atomically (mapping first).
    next_g = 1 + max((int(g) for g in assignments), default=-1)
    new_entries: list[tuple[int, str]] = []  # (global, source file)
    for e, i, f in candidates:
        assignments[str(next_g)] = [i, e]
        new_entries.append((next_g, f))
        done.add((i, e))
        next_g += 1
    if new_entries:
        atomic_write_json(_mux_path(out_dir), {"assignments": assignments})

    # Phase C: copy any reserved-but-missing segment (covers both the
    # fresh reservations above and a prior run's crash window). The
    # source path for old reservations re-derives from the mapping.
    copied = 0
    by_pair = {
        (int(s), int(e)): int(g) for g, (s, e) in assignments.items()
    }
    src_files: dict[tuple[int, int], str] = {}
    for i, d in enumerate(source_dirs):
        for e, f in discover_epochs(d).items():
            src_files[(i, e)] = f
    for (i, e), g in sorted(by_pair.items(), key=lambda kv: kv[1]):
        final = os.path.join(out_dir, f"epoch={g:05d}.parquet")
        if os.path.exists(final):
            continue
        src = src_files.get((i, e))
        if src is None:
            raise FileNotFoundError(
                f"mux mapping names source {i} epoch {e} (global {g}) but the "
                f"segment is no longer visible in {source_dirs[i]!r} — "
                "source WALs must not be truncated past the mux cursor"
            )
        tmp = final + ".tmp"
        t = pq.read_table(src)
        idx = t.schema.get_field_index("epoch")
        if idx >= 0:
            t = t.set_column(
                idx,
                t.schema.field(idx),
                pa.array([g] * t.num_rows, t.schema.field(idx).type),
            )
        pq.write_table(t, tmp)
        with open(tmp, "rb+") as fh:
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, final)
        copied += 1

    cursors = {}
    for i in range(len(source_dirs)):
        got = [e for (s, e) in by_pair if s == i]
        cursors[str(i)] = 1 + max(got) if got else 0
    return {
        "appended": len(new_entries),
        "copied": copied,
        "total_segments": len(assignments),
        "cursors": cursors,
    }
