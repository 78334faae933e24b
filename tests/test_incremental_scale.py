"""Steady-state incremental-load scale shape (r4 verdict item 6): in
merge-on-read mode the per-commit cost must stay DELTA-proportional as
the lake grows, while copy-on-write per-commit cost grows with the
touched-partition size. Pinned on per-commit NEW BYTES (deterministic —
reconstructed from the retained manifest history, so superseded cow
files are still measurable) plus a generous wall-clock flatness bound.

The lake≫delta wall-clock datapoint at the ~5M-event scale lives in
BASELINE.md (bench-window measurement, same recipe)."""

import json
import os

from gene_etl_ray.config import EngineConfig
from gene_etl_ray.fixtures import generate_events
from gene_etl_ray.pipelines.ingest import run_ingest


def _per_epoch_new_bytes(lake: str) -> dict[int, int]:
    """epoch → bytes of data files first referenced at that epoch,
    summed over partitions (retention keeps every file on disk)."""
    from gene_etl_ray.state.manifest import (
        archived_epochs_index,
        history_path,
    )

    idx = archived_epochs_index(lake)
    out: dict[int, int] = {}
    for pkey, epochs in idx.items():
        prev: set[str] = set()
        for e in epochs:
            with open(history_path(lake, pkey, e)) as f:
                m = json.load(f)
            new = [p for p in m["files"] if p not in prev]
            out[e] = out.get(e, 0) + sum(os.path.getsize(p) for p in new)
            prev = set(m["files"])
    return out


def test_mor_per_commit_stays_delta_proportional(tmp_path, ray_session):
    events = str(tmp_path / "events")
    # many more urls than one commit's events: the lake KEEPS GROWING
    # across commits (the steady-state shape; with few urls the lake
    # saturates after one epoch and cow flattens too, proving nothing)
    generate_events(
        events, n_urls=30_000, n_events=60_000, n_epochs=6,
        html_size_hint=60, seed=9,
    )
    reports = {}
    for mode in ("cow", "mor"):
        lake = str(tmp_path / f"lake_{mode}")
        reports[mode] = (
            run_ingest(
                EngineConfig(
                    lake_dir=lake, num_partitions=8, epochs_per_commit=1,
                    merge_mode=mode, retain_history=True,
                ),
                events,
            ),
            _per_epoch_new_bytes(lake),
        )
    _, mor_bytes = reports["mor"]
    _, cow_bytes = reports["cow"]
    eps = sorted(mor_bytes)
    assert len(eps) == 6 and sorted(cow_bytes) == eps
    # mor: every delta commit writes ~delta-sized bytes — flat
    mor_deltas = [mor_bytes[e] for e in eps[1:]]
    assert max(mor_deltas) <= 1.7 * min(mor_deltas), mor_deltas
    # cow: each commit rewrites grown partitions — strictly growing cost
    cow_deltas = [cow_bytes[e] for e in eps[1:]]
    assert cow_deltas[-1] >= 1.8 * cow_deltas[0], cow_deltas
    # and at the last commit mor writes far less than cow
    assert mor_deltas[-1] * 2 < cow_deltas[-1], (mor_deltas, cow_deltas)
    # wall-clock flatness (generous: time-shared host) on the mor side
    secs = [c["pipeline_sec"] for c in reports["mor"][0]["commits"][1:]]
    assert max(secs) <= 6 * max(min(secs), 0.05), secs
