"""Prefix-only WAL truncation (`truncate_wal`): segments whose effects
are durably committed for every partition can be deleted (or archived)
without changing any future engine behavior — the retention story that
keeps an endlessly-tailed WAL bounded at 10^10-event scale.

Safety argument under test: the bound is ``last_global_epoch`` (written
LAST in each commit group, groups commit contiguously), every
partition's effective watermark is ≥ it, and ``discover_epochs`` anchors
contiguity at the min PRESENT epoch — so a truncated prefix is invisible
to resumes, re-runs, and future tail passes.
"""

import glob
import json
import os

import pandas as pd
import pytest

from gene_etl_ray.config import EngineConfig
from gene_etl_ray.fixtures import generate_events
from gene_etl_ray.oracle import replay_oracle
from gene_etl_ray.pipelines.ingest import (
    CrashInjected,
    read_lake,
    run_ingest,
    truncate_wal,
)


def _epochs_present(ev: str) -> list[int]:
    return sorted(
        int(os.path.basename(f)[6:-8])
        for f in glob.glob(os.path.join(ev, "epoch=*.parquet"))
    )


def _assert_matches(lake_dir: str, gold: pd.DataFrame) -> None:
    live = read_lake(lake_dir).to_pandas().sort_values("url").reset_index(drop=True)
    cols = sorted(set(live.columns) & set(gold.columns))
    pd.testing.assert_frame_equal(
        live[cols], gold[cols].reset_index(drop=True), check_dtype=False
    )


def test_truncate_after_full_ingest_is_invisible(tmp_path):
    """All segments committed ⇒ all removed; the lake stays intact and a
    re-run over the truncated WAL is a clean no-op."""
    ev = str(tmp_path / "events")
    generate_events(ev, n_urls=60, n_events=240, n_epochs=4, seed=3)
    gold = replay_oracle(ev)
    cfg = EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4)
    run_ingest(cfg, ev)

    rep = truncate_wal(cfg, ev)
    assert rep["truncated_through"] == 3
    assert rep["removed"] == [0, 1, 2, 3] and rep["kept"] == []
    assert _epochs_present(ev) == []
    _assert_matches(cfg.lake_dir, gold)

    rep2 = run_ingest(cfg, ev)  # empty WAL: clean no-op, not an error
    assert rep2["events_applied"] == 0 and rep2["commits"] == []
    _assert_matches(cfg.lake_dir, gold)

    # idempotent second truncate
    assert truncate_wal(cfg, ev)["removed"] == []


def test_truncate_fresh_lake_removes_nothing(tmp_path):
    ev = str(tmp_path / "events")
    generate_events(ev, n_urls=20, n_events=60, n_epochs=3, seed=5)
    cfg = EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=2)
    rep = truncate_wal(cfg, ev)
    assert rep["truncated_through"] == -1
    assert rep["removed"] == [] and rep["kept"] == [0, 1, 2]


def test_truncate_preserves_crashed_group_segments(tmp_path):
    """A crash mid-group leaves no global record for that group — its
    segments (which the resume needs) survive truncation, and the resume
    over the truncated WAL converges byte-identically."""
    ev = str(tmp_path / "events")
    generate_events(ev, n_urls=60, n_events=240, n_epochs=4, seed=9)
    gold = replay_oracle(ev)
    # stage: commit groups 0-1 cleanly, then crash mid group 2
    hidden = {}
    for e in (2, 3):
        p = os.path.join(ev, f"epoch={e:05d}.parquet")
        hidden[e] = p + ".hidden"
        os.rename(p, hidden[e])
    cfg = EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4)
    run_ingest(cfg, ev)
    for e, h in hidden.items():
        os.rename(h, h[: -len(".hidden")])
    with pytest.raises(CrashInjected):
        run_ingest(cfg, ev, fail_after_partitions=1)  # group 2 half-committed

    rep = truncate_wal(cfg, ev)
    assert rep["truncated_through"] == 1
    assert rep["removed"] == [0, 1] and rep["kept"] == [2, 3]

    run_ingest(cfg, ev)  # resume over the truncated prefix
    _assert_matches(cfg.lake_dir, gold)


def test_truncate_then_tail_new_segments(tmp_path):
    """New segments arriving after truncation keep their absolute epoch
    numbers; contiguity anchors at the min PRESENT epoch, so the tail
    loop applies them normally."""
    ev = str(tmp_path / "events")
    generate_events(ev, n_urls=60, n_events=240, n_epochs=4, seed=13)
    gold = replay_oracle(ev)
    # stage: only epochs 0-1 visible first
    hidden = {}
    for e in (2, 3):
        p = os.path.join(ev, f"epoch={e:05d}.parquet")
        hidden[e] = p + ".hidden"
        os.rename(p, hidden[e])

    cfg = EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4)
    run_ingest(cfg, ev)
    truncate_wal(cfg, ev)
    assert _epochs_present(ev) == []

    for e, h in hidden.items():  # the producer publishes the next epochs
        os.rename(h, h[: -len(".hidden")])
    rep = run_ingest(cfg, ev)
    assert rep["events_applied"] > 0
    _assert_matches(cfg.lake_dir, gold)


def test_truncate_archive_mode_is_replayable(tmp_path):
    """Archived segments (cold-storage tier) + the remaining WAL replay
    to exactly the lake's state."""
    ev = str(tmp_path / "events")
    arc = str(tmp_path / "archive")
    generate_events(ev, n_urls=60, n_events=240, n_epochs=4, seed=21)
    cfg = EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4)
    run_ingest(cfg, ev)

    rep = truncate_wal(cfg, ev, archive_dir=arc)
    assert rep["removed"] == [0, 1, 2, 3]
    assert _epochs_present(arc) == [0, 1, 2, 3]
    gold = replay_oracle(arc)
    _assert_matches(cfg.lake_dir, gold)


def test_cli_truncate(tmp_path, capsys):
    from gene_etl_ray.run import main

    ev = str(tmp_path / "events")
    generate_events(ev, n_urls=40, n_events=120, n_epochs=3, seed=2)
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump({"lake_dir": str(tmp_path / "lake"), "num_partitions": 2}, f)
    assert main(["ingest", "--config", cfg_path, "--events", ev]) == 0
    capsys.readouterr()
    assert main(["truncate", "--config", cfg_path, "--events", ev]) == 0
    out = [
        json.loads(l)
        for l in capsys.readouterr().out.strip().splitlines()
        if l.strip().startswith("{")
    ][-1]
    assert out["removed"] == [0, 1, 2] and out["truncated_through"] == 2
