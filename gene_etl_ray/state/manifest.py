"""Two-phase manifest commit — the exactly-once sink protocol.

Replaces the reference's constraint-based idempotency (unique natural key +
insert-or-skip on IntegrityError, ``models.py:152``, ``persist.py:152-185``)
with a rename-then-manifest protocol (north_rule "two-phase manifest
commit"):

  phase 1: each merge task writes ``part=<k>/.tmp-epoch=<e>-g<g>.parquet``
           and fsyncs it — retried Ray tasks just overwrite their own temp
           file, harmless;
  phase 2: the driver renames temp → final (``os.replace``, atomic) and
           atomically rewrites ``_manifests/part=<k>.json`` naming the
           partition's CURRENT file set with a monotonic epoch id.

Readers only trust manifested files: a torn write (temp or even a renamed
final file with no manifest entry) is invisible. Superseded files are
garbage-collected best-effort AFTER the manifest points away from them.
"""

from __future__ import annotations

import json
import os


def atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(tmp, "w") as f:
        json.dump(obj, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    _fsync_dir(os.path.dirname(path))


def _fsync_dir(d: str) -> None:
    try:
        fd = os.open(d, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
    except OSError:
        pass


def manifest_path(lake_dir: str, pkey: int) -> str:
    return os.path.join(lake_dir, "_manifests", f"part={pkey:05d}.json")


def repart_overlay_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_manifests", "REPART.json")


def read_repart_overlay(lake_dir: str) -> dict | None:
    """The repartition overlay — a TOTAL manifest set published by ONE
    atomic rename (`pipelines.ingest.repartition_lake`). While present it
    is authoritative for every partition manifest AND the lake meta; the
    per-partition JSON files on disk are the superseded layout. The next
    locked writer materializes it (:func:`finalize_repartition`)."""
    p = repart_overlay_path(lake_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def finalize_repartition(lake_dir: str) -> bool:
    """Materialize a committed repartition overlay: write each partition's
    manifest file, persist the new lake meta, GC old-layout data files,
    then remove the overlay (LAST — it stays authoritative throughout, so
    a crash at any step just re-runs this idempotently). Callers must hold
    the writer lock. Returns True if an overlay was finalized."""
    ov = read_repart_overlay(lake_dir)
    if ov is None:
        return False
    for k, m in ov["manifests"].items():
        atomic_write_json(manifest_path(lake_dir, int(k)), m)
    # meta path duplicated from state.checkpoint to avoid an import cycle
    atomic_write_json(os.path.join(lake_dir, "_meta", "lake.json"), ov["meta"])
    for f in ov.get("gc", []):
        for p in (f, f + ".bloom"):
            try:
                os.remove(p)
            except OSError:
                pass
    os.remove(repart_overlay_path(lake_dir))
    _fsync_dir(os.path.join(lake_dir, "_manifests"))
    return True


def read_manifest(lake_dir: str, pkey: int) -> dict | None:
    ov = read_repart_overlay(lake_dir)
    if ov is not None:
        return ov["manifests"].get(str(pkey))
    p = manifest_path(lake_dir, pkey)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def history_path(lake_dir: str, pkey: int, epoch: int) -> str:
    return os.path.join(
        lake_dir, "_manifests", "history", f"part={pkey:05d}.epoch={epoch:05d}.json"
    )


def archived_epochs_index(lake_dir: str) -> dict[int, list[int]]:
    """pkey → sorted archived epochs, from ONE directory listing — the
    batch-resolution index (per-partition relisting would make snapshot
    resolution O(P² × commits))."""
    hdir = os.path.join(lake_dir, "_manifests", "history")
    out: dict[int, list[int]] = {}
    if not os.path.isdir(hdir):
        return out
    for n in os.listdir(hdir):
        if n.startswith("part=") and n.endswith(".json") and ".epoch=" in n:
            k, e = n[5:-5].split(".epoch=")
            out.setdefault(int(k), []).append(int(e))
    for v in out.values():
        v.sort()
    return out


def archived_files(lake_dir: str) -> set[str]:
    """Every data file referenced by ANY archived manifest — the set a
    retention-aware GC / orphan check must treat as accounted for."""
    hdir = os.path.join(lake_dir, "_manifests", "history")
    out: set[str] = set()
    if not os.path.isdir(hdir):
        return out
    for n in os.listdir(hdir):
        if n.endswith(".json"):
            try:
                with open(os.path.join(hdir, n)) as f:
                    out.update(json.load(f)["files"])
            except (OSError, ValueError, KeyError):
                pass
    return out


def read_manifest_asof(
    lake_dir: str,
    pkey: int,
    epoch: int,
    index: dict[int, list[int]] | None = None,
) -> dict | None:
    """The partition's archived manifest with the greatest epoch ≤
    ``epoch`` (time-travel resolution). None if the partition did not
    exist yet at that epoch, or retention was off. Pass ``index`` (from
    :func:`archived_epochs_index`) when resolving many partitions."""
    if index is None:
        index = archived_epochs_index(lake_dir)
    import bisect

    epochs = index.get(pkey, [])
    i = bisect.bisect_right(epochs, epoch)
    if i == 0:
        return None
    with open(history_path(lake_dir, pkey, epochs[i - 1])) as f:
        return json.load(f)


def commit_partition(
    lake_dir: str,
    pkey: int,
    epoch: int,
    tmp_files: list[str],
    stats: dict,
    append: bool = False,
    force: bool = False,
    retain: bool = False,
    defer_gc: bool = False,
) -> dict:
    """Phase 2 for one partition: rename temp files to final names, then
    atomically publish the manifest. ``append=False`` (copy-on-write):
    the new files REPLACE the partition's state and superseded files are
    GC'd. ``append=True`` (merge-on-read): the new files are ADDED to the
    current file list — read-side LWW resolves across them. ``force``
    bypasses the epoch-idempotency guard (compaction rewrites at an
    already-committed epoch). ``retain`` (snapshot retention / time
    travel): ALSO archive this manifest under ``_manifests/history/`` and
    skip the GC, so every committed epoch's file set stays reconstructable
    (`read_manifest_asof`). Returns the new manifest."""
    old = read_manifest(lake_dir, pkey)
    if old is not None and old["epoch"] >= epoch and not force:
        # already committed by a previous (crashed-after-commit) run — the
        # epoch-idempotency guard, reference analog ``persist.py:273-295``
        if retain and not os.path.exists(history_path(lake_dir, pkey, old["epoch"])):
            # crashed between current-manifest write and its archive:
            # backfill the archive from the live manifest
            atomic_write_json(history_path(lake_dir, pkey, old["epoch"]), old)
        return old
    finals = []
    for tmp in tmp_files:
        d, base = os.path.split(tmp)
        final = os.path.join(d, base.removeprefix(".tmp-"))
        # commit the file's bloom sidecar with the same rename protocol
        # (readers treat a missing sidecar as "cannot prune")
        if os.path.exists(tmp + ".bloom"):
            os.replace(tmp + ".bloom", final + ".bloom")
        os.replace(tmp, final)
        finals.append(final)
    _fsync_dir(os.path.join(lake_dir, f"part={pkey:05d}"))
    if append and old is not None:
        finals = list(old["files"]) + finals
    # per-file zone maps (basename → {rows, ts_min_us, ts_max_us}):
    # carried at manifest top level, merged across mor appends, pruned to
    # the surviving file set — readers prune time-range scans with zero
    # file IO (`read_lake(ts_min/ts_max)`)
    file_stats = dict((old or {}).get("file_stats") or {}) if append else {}
    file_stats.update(stats.get("file_stats") or {})
    # never mutate the CALLER's stats dict (a retry or post-commit log
    # that reuses it would silently lose the zone-map entry)
    stats = {k: v for k, v in stats.items() if k != "file_stats"}
    manifest = {"pkey": pkey, "epoch": epoch, "files": sorted(set(finals)), "stats": stats}
    keep = {os.path.basename(f) for f in manifest["files"]}
    file_stats = {b: s for b, s in file_stats.items() if b in keep}
    if file_stats:
        manifest["file_stats"] = file_stats
    atomic_write_json(manifest_path(lake_dir, pkey), manifest)
    if retain:
        # archive AFTER the current manifest is live (a crash between the
        # two leaves current-state correct; the archive is re-written on
        # the idempotent recommit)
        atomic_write_json(history_path(lake_dir, pkey, epoch), manifest)
        return manifest
    # GC files superseded by this manifest (safe: readers already
    # re-pointed). ``defer_gc`` (gc_grace_seconds > 0): leave superseded
    # files on disk for in-flight readers; `vacuum_lake` removes them
    # once older than the grace.
    if defer_gc:
        return manifest
    if old is not None:
        for f in old["files"]:
            if f not in manifest["files"]:
                for p in (f, f + ".bloom"):
                    try:
                        os.remove(p)
                    except OSError:
                        pass
    return manifest


def current_files(lake_dir: str, pkeys: list[int] | None = None) -> dict[int, list[str]]:
    """Map pkey → manifested current files (only committed data is visible)."""
    mdir = os.path.join(lake_dir, "_manifests")
    if not os.path.isdir(mdir):
        return {}
    ov = read_repart_overlay(lake_dir)
    if ov is not None:
        ms = {int(k): m for k, m in ov["manifests"].items()}
        if pkeys is not None:
            ms = {k: ms[k] for k in pkeys if k in ms}
        return {k: ms[k]["files"] for k in sorted(ms)}
    out: dict[int, list[str]] = {}
    if pkeys is None:
        names = [n for n in os.listdir(mdir) if n.startswith("part=") and n.endswith(".json")]
        pkeys = [int(n[5:-5]) for n in names]
    for k in pkeys:
        m = read_manifest(lake_dir, k)
        if m:
            out[k] = m["files"]
    return out
