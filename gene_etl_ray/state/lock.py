"""Single-writer lake lock.

The commit protocol assumes one writer per lake (manifests are
last-writer-wins JSON replaces — two concurrent committers could lose an
update). The lock file is created ATOMICALLY WITH ITS CONTENT via
``os.link`` of a pre-written temp file, so no reader can ever observe an
empty/partial lock. A lock whose owner pid is dead is stale; stealing is
an atomic ``os.rename`` of the observed lock to a per-claimant name —
exactly one claimant wins the rename, everyone else retries — so two
crash-recovering writers can never both acquire (a bare unlink-and-retry
would let one remove the other's FRESH lock).
"""

from __future__ import annotations

import json
import os


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


def acquire(lake_dir: str) -> None:
    path = _lock_path(lake_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.claim.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"pid": os.getpid()}, f)
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
                    owner = json.load(f).get("pid", -1)
            except FileNotFoundError:
                continue  # released/stolen between link and read — retry
            except (OSError, ValueError):
                owner = -1  # unreadable should be impossible (atomic create)
            if owner != -1 and _pid_alive(owner):
                raise LakeLockedError(
                    f"lake {lake_dir} is being written by live pid {owner}"
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


def release(lake_dir: str) -> None:
    try:
        os.remove(_lock_path(lake_dir))
    except OSError:
        pass
