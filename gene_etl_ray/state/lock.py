"""Single-writer lake lock.

The commit protocol assumes one writer per lake (manifests are
last-writer-wins JSON replaces — two concurrent committers could lose an
update). ``acquire`` takes an O_EXCL lock file carrying the owner pid; a
lock whose pid is dead is stale and reclaimed (a crashed writer never
blocks resume — crash-recovery is the normal path, SURVEY §4).
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
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                json.dump({"pid": os.getpid()}, f)
            return
        except FileExistsError:
            try:
                with open(path) as f:
                    owner = json.load(f).get("pid", -1)
            except (OSError, ValueError):
                owner = -1
            if owner != -1 and owner != os.getpid() and _pid_alive(owner):
                raise LakeLockedError(
                    f"lake {lake_dir} is being written by live pid {owner}"
                ) from None
            # stale (dead owner / unreadable) → reclaim and retry
            try:
                os.remove(path)
            except OSError:
                pass


def release(lake_dir: str) -> None:
    try:
        os.remove(_lock_path(lake_dir))
    except OSError:
        pass
