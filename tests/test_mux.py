"""Multi-producer WAL multiplexer (`pipelines.mux.merge_wals`): N binlog
shards → one consumer WAL under the reserve-then-copy protocol."""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

from gene_etl_ray.config import EngineConfig
from gene_etl_ray.fixtures import generate_events
from gene_etl_ray.oracle import replay_oracle
from gene_etl_ray.pipelines.ingest import discover_epochs, read_lake, run_ingest
from gene_etl_ray.pipelines.mux import merge_wals, read_mux_state


def _lake_df(lake):
    df = read_lake(lake).to_pandas()
    return df.sort_values("url").reset_index(drop=True)


def _assert_matches_oracle(lake, events_dir):
    got = _lake_df(lake)
    want = replay_oracle(events_dir).sort_values("url").reset_index(drop=True)
    cols = sorted(set(got.columns) & set(want.columns))
    pd.testing.assert_frame_equal(got[cols], want[cols], check_dtype=False)


@pytest.fixture
def shards(tmp_path):
    a = str(tmp_path / "shard_a")
    b = str(tmp_path / "shard_b")
    generate_events(a, n_urls=120, n_events=600, n_epochs=4, seed=11)
    generate_events(b, n_urls=120, n_events=500, n_epochs=3, seed=77)
    return a, b


def test_merge_then_ingest_converges(shards, tmp_path):
    """Two shards mux into one contiguous WAL; ingest of the merged WAL
    converges to the replay oracle over the union."""
    a, b = shards
    out = str(tmp_path / "wal")
    rep = merge_wals([a, b], out)
    assert rep["appended"] == 7 and rep["copied"] == 7
    # contiguous numbering from 0 with no gaps
    assert sorted(discover_epochs(out)) == list(range(7))
    # deterministic interleave: by (src_epoch, source_index)
    st = read_mux_state(out)["assignments"]
    assert [tuple(st[str(g)]) for g in range(7)] == [
        (0, 0), (1, 0), (0, 1), (1, 1), (0, 2), (1, 2), (0, 3)
    ]
    lake = str(tmp_path / "lake")
    run_ingest(EngineConfig(lake_dir=lake, num_partitions=4), out)
    _assert_matches_oracle(lake, out)
    # idempotent no-op re-run
    rep2 = merge_wals([a, b], out)
    assert rep2["appended"] == 0 and rep2["copied"] == 0


def test_incremental_shard_arrival_and_resume(shards, tmp_path):
    """A lagging shard catches up: its new segments get the NEXT global
    numbers (append-only), the tail loop applies only what is new, and
    the lake still converges."""
    a, b = shards
    out = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    cfg = EngineConfig(lake_dir=lake, num_partitions=4)
    merge_wals([a, b], out)
    run_ingest(cfg, out)

    # shard B produces two more segments (same producer, later epochs)
    staged = str(tmp_path / "b_more")
    generate_events(staged, n_urls=120, n_events=900, n_epochs=5, seed=77)
    for f in sorted(os.listdir(staged))[3:]:
        os.replace(os.path.join(staged, f), os.path.join(b, f))
    rep = merge_wals([a, b], out)
    assert rep["appended"] == 2
    # appended AFTER the existing assignments, never renumbered
    st = read_mux_state(out)["assignments"]
    assert tuple(st["7"]) == (1, 3) and tuple(st["8"]) == (1, 4)
    run_ingest(cfg, out)
    _assert_matches_oracle(lake, out)


def test_crash_between_reserve_and_copy(shards, tmp_path):
    """Reserved-but-missing files are re-copied byte-identically to their
    fixed numbers; meanwhile the consumer's contiguity rule holds every
    later epoch back, so nothing wrong is ever readable."""
    a, b = shards
    out = str(tmp_path / "wal")
    merge_wals([a, b], out)
    victim = os.path.join(out, "epoch=00003.parquet")
    want = open(victim, "rb").read()
    os.remove(victim)  # simulate: reservation durable, copy lost
    # the consumer stalls at the gap instead of reading past it
    assert sorted(discover_epochs(out)) == [0, 1, 2]
    rep = merge_wals([a, b], out)
    assert rep["appended"] == 0 and rep["copied"] == 1
    assert open(victim, "rb").read() == want
    assert sorted(discover_epochs(out)) == list(range(7))


def test_truncated_source_raises(shards, tmp_path):
    """A source WAL truncated past the mux cursor is a loud error, not a
    silent skip (the mapping's numbers are immutable promises)."""
    a, b = shards
    out = str(tmp_path / "wal")
    merge_wals([a, b], out)
    os.remove(os.path.join(out, "epoch=00000.parquet"))
    os.remove(os.path.join(a, "epoch=00000.parquet"))
    with pytest.raises(FileNotFoundError, match="no longer visible"):
        merge_wals([a, b], out)


def test_concurrent_mux_is_locked_out(shards, tmp_path):
    """A second muxer on the same out_dir while the lock is held by a
    live process raises instead of racing the reserve→copy window (two
    concurrent muxers could reserve conflicting global numbers and the
    losing atomic_write would orphan already-copied segments)."""
    from gene_etl_ray.state.lock import LakeLockedError, acquire, release

    a, b = shards
    out = str(tmp_path / "wal")
    os.makedirs(out, exist_ok=True)
    acquire(out)  # simulate a live concurrent muxer holding the lock
    try:
        with pytest.raises(LakeLockedError):
            merge_wals([a, b], out)
    finally:
        release(out)
    # once released, the mux proceeds normally
    rep = merge_wals([a, b], out)
    assert rep["appended"] == 7


def test_mux_cli(shards, tmp_path):
    a, b = shards
    out = str(tmp_path / "wal")
    r = subprocess.run(
        [sys.executable, "-m", "gene_etl_ray.run", "mux",
         "--sources", a, b, "--out", out],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["appended"] == 7
    assert rep["cursors"] == {"0": 4, "1": 3}
