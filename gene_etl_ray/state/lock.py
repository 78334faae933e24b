"""Single-writer lake lock.

The commit protocol assumes one writer per lake (manifests are
last-writer-wins JSON replaces — two concurrent committers could lose an
update). The lock file is created ATOMICALLY WITH ITS CONTENT via
``os.link`` of a pre-written temp file, so no reader can ever observe an
empty/partial lock. Stealing is an atomic ``os.rename`` of the observed
lock to a per-claimant name — exactly one claimant wins the rename,
everyone else retries — so two crash-recovering writers can never both
acquire (a bare unlink-and-retry would let one remove the other's FRESH
lock).

Staleness is decided per deployment shape:
- SAME host as the owner: ``os.kill(pid, 0)`` probes liveness directly.
- DIFFERENT host (shared lake storage, the multi-node case): pids are
  meaningless across hosts, so the lock carries a heartbeat (its mtime,
  refreshed by :func:`heartbeat` once per commit group); a foreign lock
  is stale only after ``lease_sec`` without a heartbeat. A live remote
  writer is therefore never stolen from just because its pid number
  happens to be dead locally.
"""

from __future__ import annotations

import json
import os
import socket
import time

#: a writer heartbeats once per commit group (seconds-to-minutes cadence);
#: 15 min of silence across a shared filesystem means the writer is gone
LEASE_SEC = 900.0


class LakeLockedError(RuntimeError):
    pass


def _lock_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_meta", "writer.lock")


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


def acquire(lake_dir: str, lease_sec: float = LEASE_SEC) -> None:
    path = _lock_path(lake_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    host = socket.gethostname()
    # host in the claim name: two hosts sharing the lake can carry EQUAL
    # pids (containers), and a shared {path}.claim.<pid> would let one
    # claimant truncate/delete the other's in-flight claim file
    tmp = f"{path}.claim.{host}.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"pid": os.getpid(), "host": host}, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        while True:
            try:
                os.link(tmp, path)  # atomic create WITH content
                return
            except FileExistsError:
                pass
            try:
                with open(path) as f:
                    owner = json.load(f)
            except FileNotFoundError:
                continue  # released/stolen between link and read — retry
            except (OSError, ValueError):
                owner = {}  # unreadable should be impossible (atomic create)
            owner_pid = int(owner.get("pid", -1))
            owner_host = owner.get("host", host)  # legacy locks: assume local
            if owner_host == host:
                # pid probe AND lease recency: the probe alone can pin a
                # dead writer's lock forever when the OS recycles its pid
                # for an unrelated long-lived process — a live owner
                # heartbeats, so a stale mtime overrides the probe
                alive = owner_pid != -1 and _pid_alive(owner_pid)
                if alive:
                    try:
                        alive = (
                            time.time() - os.path.getmtime(path)
                        ) < lease_sec
                    except OSError:
                        continue  # lock vanished under us — retry
            else:
                # cross-host: liveness = heartbeat recency, never pid probes
                try:
                    alive = (time.time() - os.path.getmtime(path)) < lease_sec
                except OSError:
                    continue  # lock vanished under us — retry
            if alive:
                raise LakeLockedError(
                    f"lake {lake_dir} is being written by live pid "
                    f"{owner_pid} on {owner_host}"
                )
            # stale: atomically steal — only ONE claimant wins this rename
            steal = f"{path}.stale.{os.getpid()}"
            try:
                os.rename(path, steal)
            except FileNotFoundError:
                continue  # somebody else stole it first — retry
            try:
                os.remove(steal)
            except OSError:
                pass
    finally:
        try:
            os.remove(tmp)
        except OSError:
            pass


def heartbeat(lake_dir: str) -> None:
    """Refresh the lock's liveness signal (mtime) AND re-validate
    ownership: if the lock no longer names this (pid, host) — e.g. a
    standby on another host stole it after a lease expiry during an
    over-long commit group — raise instead of silently refreshing the
    thief's lock and continuing to commit (split-brain guard). Called
    per commit group and per partition commit, so the lease is renewed
    at the granularity of the critical section. Residual risk without a
    CAS primitive on the shared store: a steal in the instant between
    validation and the next manifest replace; LEASE_SEC >> commit
    cadence keeps that window theoretical."""
    path = _lock_path(lake_dir)
    try:
        with open(path) as f:
            owner = json.load(f)
        if int(owner.get("pid", -1)) != os.getpid() or owner.get(
            "host", socket.gethostname()
        ) != socket.gethostname():
            raise LakeLockedError(
                f"writer lock for {lake_dir} was taken over by pid "
                f"{owner.get('pid')} on {owner.get('host')} — aborting commit"
            )
        os.utime(path, None)
    except FileNotFoundError:
        # a MISSING lock is exactly the steal-in-progress signature (the
        # thief renames the stale lock away before linking its own) — a
        # short re-check separates that from a transient FS hiccup, and
        # if the lock is still gone or renamed to someone else we must
        # NOT keep committing (split-brain)
        time.sleep(0.05)
        try:
            with open(path) as f:
                owner = json.load(f)
        except (OSError, ValueError):
            raise LakeLockedError(
                f"writer lock for {lake_dir} disappeared mid-commit "
                "(lease expired and was stolen?) — aborting"
            ) from None
        if int(owner.get("pid", -1)) != os.getpid() or owner.get(
            "host", socket.gethostname()
        ) != socket.gethostname():
            raise LakeLockedError(
                f"writer lock for {lake_dir} was taken over by pid "
                f"{owner.get('pid')} on {owner.get('host')} — aborting commit"
            )
        os.utime(path, None)
    except (OSError, ValueError):
        # lock UNREADABLE (but present): keep going — failing an ingest
        # over a transient metadata read would be worse
        pass


def release(lake_dir: str) -> None:
    try:
        os.remove(_lock_path(lake_dir))
    except OSError:
        pass
