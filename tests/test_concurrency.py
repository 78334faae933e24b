"""REAL multi-process writer concurrency over one lake.

The lock unit tests (tests/test_state.py::TestLock) pin the primitive;
these tests pin the end-to-end contract with two OS processes racing an
actual ingest: a second writer must be refused while the first holds the
lake, must succeed once it is released, a writer that dies holding the
lock (SIGKILL-style os._exit, lock file left behind) must be stolen by
the next same-host writer, and the converged lake must equal the replay
oracle in every interleaving. Each worker owns its own Ray session in
its own process — nothing here shares the test session's Ray.
"""

import os
import subprocess
import sys
import time

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, time

mode, lake, ev = sys.argv[1], sys.argv[2], sys.argv[3]
import ray
ray.init(address="local", num_cpus=3, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

import gene_etl_ray.pipelines.ingest as ing
from gene_etl_ray.config import EngineConfig
from gene_etl_ray.state.lock import LakeLockedError

if mode == "slow":
    # stretch the critical section: every partition commit sleeps, so the
    # lock is provably held while the rival boots and tries to acquire
    orig = ing.commit_partition
    def slow_commit(*a, **k):
        time.sleep(2.0)
        return orig(*a, **k)
    ing.commit_partition = slow_commit
elif mode == "crash":
    # die WITHOUT releasing the lock after the second partition commit —
    # the SIGKILL/power-loss shape (os._exit skips every finally:)
    orig = ing.commit_partition
    state = {"n": 0}
    def crash_commit(*a, **k):
        r = orig(*a, **k)
        state["n"] += 1
        if state["n"] >= 2:
            os._exit(137)
        return r
    ing.commit_partition = crash_commit

try:
    ing.run_ingest(EngineConfig(lake_dir=lake), ev)
except LakeLockedError:
    ray.shutdown()
    sys.exit(7)
ray.shutdown()
sys.exit(0)
"""


def _spawn(script_path, mode, lake, ev):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.Popen(
        [sys.executable, script_path, mode, lake, ev],
        env=env, cwd=REPO,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )


@pytest.fixture()
def wal(tmp_path):
    from gene_etl_ray.fixtures import generate_events

    ev = str(tmp_path / "wal")
    generate_events(ev, n_urls=120, n_epochs=2, seed=31)
    return ev


def _oracle_vs_lake(lake, ev):
    from gene_etl_ray.oracle import replay_oracle
    from gene_etl_ray.pipelines.ingest import read_lake

    live = read_lake(lake).to_pandas().sort_values("url").reset_index(drop=True)
    want = replay_oracle(ev).sort_values("url").reset_index(drop=True)
    cols = [c for c in want.columns if c in live.columns]
    pd.testing.assert_frame_equal(live[cols], want[cols], check_dtype=False)


def test_second_writer_refused_then_succeeds(tmp_path, wal, ray_session):
    lake = str(tmp_path / "lake")
    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(WORKER)
    lock_path = os.path.join(lake, "_meta", "writer.lock")

    a = _spawn(script, "slow", lake, wal)
    try:
        deadline = time.time() + 120
        while not os.path.exists(lock_path):
            assert time.time() < deadline, "writer A never took the lock"
            assert a.poll() is None, f"writer A died early: {a.returncode}"
            time.sleep(0.1)
        # rival writer while A is mid-commit-group: must be REFUSED
        b = _spawn(script, "plain", lake, wal)
        assert b.wait(timeout=180) == 7, "rival writer was not refused"
        assert a.poll() is None, "A should still be committing"
    finally:
        assert a.wait(timeout=300) == 0
    assert not os.path.exists(lock_path), "lock must be released on success"

    # the refused writer retries after release: clean no-op convergence
    c = _spawn(script, "plain", lake, wal)
    assert c.wait(timeout=300) == 0
    _oracle_vs_lake(lake, wal)


def test_crashed_writer_lock_stolen_and_resumed(tmp_path, wal, ray_session):
    lake = str(tmp_path / "lake")
    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(WORKER)
    lock_path = os.path.join(lake, "_meta", "writer.lock")

    a = _spawn(script, "crash", lake, wal)
    assert a.wait(timeout=300) == 137, "crash worker must die via os._exit"
    assert os.path.exists(lock_path), "a killed writer leaves its lock behind"

    # same-host resume: dead pid is probed, lock stolen, ingest resumes
    b = _spawn(script, "plain", lake, wal)
    assert b.wait(timeout=300) == 0
    assert not os.path.exists(lock_path)
    _oracle_vs_lake(lake, wal)
