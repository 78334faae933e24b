"""Resumable partitioned export (`pipelines.ingest.export_lake`).

Contract under test: output equals the live view (cow AND mor), a
re-run is an all-skip no-op, further ingests re-export exactly the
touched partitions (epoch-in-filename staleness), superseded outputs
and orphan tmps are GC'd, and column-subset exports prune correctly.
"""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from gene_etl_ray.config import EngineConfig
from gene_etl_ray.fixtures import generate_events
from gene_etl_ray.pipelines.ingest import export_lake, read_lake, run_ingest


def _read_export(out_dir: str) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(out_dir, "part=*", "data.epoch=*.parquet")))
    frames = [pq.read_table(f).to_pandas() for f in files]
    return (
        pd.concat(frames, ignore_index=True)
        .sort_values("url")
        .reset_index(drop=True)
    )


def _live(lake: str) -> pd.DataFrame:
    return (
        read_lake(lake).to_pandas().sort_values("url").reset_index(drop=True)
    )


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_export_equals_live_view_then_noop(tmp_path, ray_session, mode):
    ev, lake, out = str(tmp_path / "wal"), str(tmp_path / "lake"), str(tmp_path / "out")
    generate_events(ev, n_urls=150, n_epochs=3, seed=13)
    run_ingest(EngineConfig(lake_dir=lake, merge_mode=mode), ev)

    rep = export_lake(lake, out)
    assert rep["exported"] > 0 and rep["skipped"] == 0
    want = _live(lake)
    got = _read_export(out)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )
    assert rep["rows"] == len(want)

    # resume with nothing new: every partition skips, nothing rewritten
    mtimes = {f: os.path.getmtime(f)
              for f in glob.glob(os.path.join(out, "part=*", "*.parquet"))}
    rep2 = export_lake(lake, out)
    assert rep2["exported"] == 0
    assert rep2["skipped"] == rep["partitions"]
    assert mtimes == {f: os.path.getmtime(f)
                      for f in glob.glob(os.path.join(out, "part=*", "*.parquet"))}


def test_incremental_ingest_reexports_only_touched_partitions(tmp_path, ray_session):
    import shutil

    staged, ev = str(tmp_path / "staged"), str(tmp_path / "wal")
    lake, out = str(tmp_path / "lake"), str(tmp_path / "out")
    generate_events(staged, n_urls=150, n_events=450, n_epochs=3, seed=21)
    os.makedirs(ev)
    segs = sorted(os.listdir(staged))
    for f in segs[:-1]:
        shutil.copy(os.path.join(staged, f), os.path.join(ev, f))
    cfg = EngineConfig(lake_dir=lake, num_partitions=16)
    run_ingest(cfg, ev)
    export_lake(lake, out)

    # second wave: the last epoch arrives -> touches a subset of partitions
    shutil.copy(os.path.join(staged, segs[-1]), os.path.join(ev, segs[-1]))
    run_ingest(cfg, ev)

    from gene_etl_ray.state.lineage import read_lineage

    touched = {int(r["pkey"]) for r in read_lineage(lake) if int(r["epoch"]) >= 2}
    rep = export_lake(lake, out)
    assert rep["exported"] == len(touched), (rep, touched)
    assert rep["skipped"] == rep["partitions"] - len(touched)

    want = _live(lake)
    got = _read_export(out)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )
    # superseded epochs were GC'd: exactly one output file per partition
    for d in glob.glob(os.path.join(out, "part=*")):
        assert len(os.listdir(d)) == 1, os.listdir(d)


def test_stale_and_orphan_outputs_are_replaced(tmp_path, ray_session):
    ev, lake, out = str(tmp_path / "wal"), str(tmp_path / "lake"), str(tmp_path / "out")
    generate_events(ev, n_urls=60, n_epochs=2, seed=33)
    run_ingest(EngineConfig(lake_dir=lake), ev)
    rep = export_lake(lake, out)
    some = sorted(glob.glob(os.path.join(out, "part=*")))[0]
    # plant a crashed run's garbage: an orphan tmp and a stale-epoch file
    open(os.path.join(some, ".tmp-data.epoch=00099.1234.parquet"), "wb").close()
    open(os.path.join(some, "data.epoch=00000.parquet"), "wb").close()
    real = glob.glob(os.path.join(some, "data.epoch=*.parquet"))
    os.remove(max(real))  # lose the real output too: partition must re-export

    rep2 = export_lake(lake, out)
    assert rep2["exported"] == 1
    assert rep2["skipped"] == rep["partitions"] - 1
    assert sorted(os.listdir(some)) == [os.path.basename(max(real))]
    want = _live(lake)
    got = _read_export(out)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )


def test_param_change_invalidates_resume(tmp_path, ray_session):
    """Re-running with different export params (column subset) into the
    same out_dir must RE-EXPORT, not skip — the params are part of the
    filename staleness contract, so a resume can never mix views."""
    ev, lake, out = str(tmp_path / "wal"), str(tmp_path / "lake"), str(tmp_path / "out")
    generate_events(ev, n_urls=60, n_epochs=2, seed=47)
    run_ingest(EngineConfig(lake_dir=lake), ev)
    rep_full = export_lake(lake, out)
    assert rep_full["exported"] > 0

    rep_sub = export_lake(lake, out, columns=["url", "lang"])
    assert rep_sub["exported"] == rep_full["partitions"]
    assert rep_sub["skipped"] == 0
    got = _read_export(out)
    assert got.columns.tolist() == ["url", "lang"]
    # and the subset run resumes as a no-op against itself
    rep_again = export_lake(lake, out, columns=["url", "lang"])
    assert rep_again["exported"] == 0


def test_column_subset_export(tmp_path, ray_session):
    ev, lake, out = str(tmp_path / "wal"), str(tmp_path / "lake"), str(tmp_path / "out")
    generate_events(ev, n_urls=60, n_epochs=2, seed=41)
    run_ingest(EngineConfig(lake_dir=lake, merge_mode="mor"), ev)
    export_lake(lake, out, columns=["url", "lang"])
    got = _read_export(out)
    assert got.columns.tolist() == ["url", "lang"]
    want = (
        read_lake(lake, columns=["url", "lang"])
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_jsonl_export_equals_live_view(tmp_path, ray_session):
    """fmt="jsonl": line-delimited shards equal the live view (ISO
    timestamps re-parsed), resume is a no-op, and a format switch
    re-exports under its own params tag rather than mixing."""
    ev, lake, out = (str(tmp_path / "wal"), str(tmp_path / "lake"),
                     str(tmp_path / "out"))
    generate_events(ev, n_urls=60, n_epochs=2, seed=48)
    run_ingest(EngineConfig(lake_dir=lake), ev)
    rep = export_lake(lake, out, fmt="jsonl")
    assert rep["exported"] > 0
    files = sorted(glob.glob(os.path.join(out, "part=*", "data.epoch=*.jsonl")))
    assert len(files) == rep["exported"]
    got = pd.concat(
        [pd.read_json(f, lines=True) for f in files], ignore_index=True
    ).sort_values("url").reset_index(drop=True)
    want = _live(lake)
    assert got["url"].tolist() == want["url"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
    got_ts = pd.to_datetime(got["warc_ts"]).dt.tz_localize(None)
    assert (got_ts == want["warc_ts"]).all()
    # resume no-op
    rep2 = export_lake(lake, out, fmt="jsonl")
    assert rep2["exported"] == 0 and rep2["skipped"] == rep["exported"]
    # switching format re-exports (params tag covers fmt)
    rep3 = export_lake(lake, out, fmt="parquet")
    assert rep3["exported"] == rep["exported"]


def test_jsonl_export_unknown_fmt_rejected(tmp_path, ray_session):
    ev, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    generate_events(ev, n_urls=10, n_epochs=1, seed=49)
    run_ingest(EngineConfig(lake_dir=lake), ev)
    with pytest.raises(ValueError, match="unknown fmt"):
        export_lake(lake, str(tmp_path / "o"), fmt="csvx")
