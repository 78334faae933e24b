"""Durable-state unit tests: manifest commit protocol (torn writes),
checkpoints, generator determinism."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from gene_etl_ray.fixtures import generate_events
from gene_etl_ray.state.checkpoint import (
    effective_watermarks,
    last_global_epoch,
    write_checkpoint,
    write_global_epoch,
)
from gene_etl_ray.state.manifest import commit_partition, current_files, read_manifest


def _tmpfile(lake, pkey, epoch, g=0):
    d = os.path.join(lake, f"part={pkey:05d}")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, f".tmp-epoch={epoch:05d}-g{g:09d}.parquet")
    pq.write_table(pa.table({"url": ["https://a.com"]}), p)
    return p


class TestManifest:
    def test_commit_renames_and_publishes(self, tmp_path):
        lake = str(tmp_path)
        tmp = _tmpfile(lake, 3, 1)
        m = commit_partition(lake, 3, 1, [tmp], {"rows": 1})
        assert not os.path.exists(tmp)
        assert all(os.path.exists(f) for f in m["files"])
        assert current_files(lake)[3] == m["files"]

    def test_torn_write_invisible(self, tmp_path):
        """Temp file exists but manifest doesn't → readers see nothing
        (north_rule exactly-once; SURVEY §5.2 torn-write case)."""
        lake = str(tmp_path)
        _tmpfile(lake, 0, 1)
        assert current_files(lake) == {}

    def test_recommit_same_epoch_is_noop(self, tmp_path):
        lake = str(tmp_path)
        m1 = commit_partition(lake, 1, 2, [_tmpfile(lake, 1, 2)], {})
        # a crashed-then-retried commit of the same epoch must not re-point
        stale = _tmpfile(lake, 1, 2, g=1)
        m2 = commit_partition(lake, 1, 2, [stale], {})
        assert m2["files"] == m1["files"]

    def test_supersede_gc(self, tmp_path):
        lake = str(tmp_path)
        m1 = commit_partition(lake, 1, 1, [_tmpfile(lake, 1, 1)], {})
        m2 = commit_partition(lake, 1, 2, [_tmpfile(lake, 1, 2)], {})
        assert read_manifest(lake, 1)["epoch"] == 2
        assert not os.path.exists(m1["files"][0])  # old file GC'd
        assert os.path.exists(m2["files"][0])


class TestCheckpoints:
    def test_effective_watermark_is_max_of_local_and_global(self, tmp_path):
        lake = str(tmp_path)
        assert last_global_epoch(lake) == -1
        write_checkpoint(lake, 2, epoch=5, max_seq=100)
        write_global_epoch(lake, 3, {})
        wm = effective_watermarks(lake, 4)
        assert wm == {0: 3, 1: 3, 2: 5, 3: 3}


class TestGenerator:
    def test_deterministic(self, tmp_path):
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        generate_events(a, n_urls=50, n_events=200, n_epochs=2)
        generate_events(b, n_urls=50, n_events=200, n_epochs=2)
        for e in range(2):
            ta = pq.read_table(os.path.join(a, f"epoch={e:05d}.parquet"))
            tb = pq.read_table(os.path.join(b, f"epoch={e:05d}.parquet"))
            assert ta.equals(tb)

    def test_knobs_present(self, tmp_path):
        meta = generate_events(
            str(tmp_path / "e"),
            n_urls=100,
            n_events=1000,
            n_epochs=2,
            tie_frac=0.2,
            out_of_order_frac=0.2,
            delete_frac=0.1,
        )
        assert meta["n_ties"] > 0 and meta["n_ooo"] > 0 and meta["n_deletes"] > 0


class TestLock:
    def test_exclusive_while_owner_alive(self, tmp_path):
        import json
        import os

        import pytest

        from gene_etl_ray.state.lock import LakeLockedError, acquire, release

        lake = str(tmp_path)
        # a LIVE foreign owner (pid 1 always exists) blocks acquisition
        os.makedirs(os.path.join(lake, "_meta"))
        with open(os.path.join(lake, "_meta", "writer.lock"), "w") as f:
            json.dump({"pid": 1}, f)
        with pytest.raises(LakeLockedError):
            acquire(lake)

    def test_stale_lock_reclaimed(self, tmp_path):
        import json
        import os

        from gene_etl_ray.state.lock import acquire, release

        lake = str(tmp_path)
        os.makedirs(os.path.join(lake, "_meta"))
        with open(os.path.join(lake, "_meta", "writer.lock"), "w") as f:
            json.dump({"pid": 999999999}, f)  # dead pid
        acquire(lake)  # reclaims
        release(lake)
        assert not os.path.exists(os.path.join(lake, "_meta", "writer.lock"))

    def test_foreign_host_lock_not_stolen_while_heartbeating(self, tmp_path):
        """A lock owned on ANOTHER host must never be stolen based on a
        local pid probe — only after the heartbeat lease expires."""
        import json
        import os
        import time

        import pytest

        from gene_etl_ray.state.lock import LakeLockedError, acquire, heartbeat

        lake = str(tmp_path)
        os.makedirs(os.path.join(lake, "_meta"))
        path = os.path.join(lake, "_meta", "writer.lock")
        with open(path, "w") as f:
            # dead-locally pid, but a DIFFERENT host with a fresh heartbeat
            json.dump({"pid": 999999999, "host": "other-node"}, f)
        with pytest.raises(LakeLockedError):
            acquire(lake)
        # expired lease: steal succeeds
        old = time.time() - 10_000
        os.utime(path, (old, old))
        acquire(lake, lease_sec=900)
        # heartbeat refreshes mtime
        t0 = os.path.getmtime(path)
        time.sleep(0.05)
        heartbeat(lake)
        assert os.path.getmtime(path) >= t0

    def test_live_self_owner_refused(self, tmp_path):
        """A held lock refuses re-acquisition even from the owner pid
        (no silent self-steal; regression from the review)."""
        import pytest

        from gene_etl_ray.state.lock import LakeLockedError, acquire, release

        lake = str(tmp_path)
        acquire(lake)
        with pytest.raises(LakeLockedError):
            acquire(lake)
        release(lake)
        acquire(lake)  # reacquirable after release
        release(lake)
