"""Bad-row validation corpora (FIXTURES.md §4, parity with the
reference's crafted-bad-row validator tests, ``test_correlate.py:315-392``
/ ``validate.py:33-137``): null url, invalid op, null warc_ts, duplicate
seq (redelivery), delete of a never-inserted url, missing columns."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from gene_etl_ray.config import EngineConfig
from gene_etl_ray.pipelines.ingest import read_lake, run_ingest
from gene_etl_ray.pipelines.normalize import prevalidate_counts

BASE = 1_600_000_000_000_000


def write_epoch(d, e, rows):
    """rows: (url, ts_off, html, op, seq)"""
    os.makedirs(d, exist_ok=True)
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array(
                [None if r[1] is None else BASE + r[1] for r in rows], pa.timestamp("us")
            ),
            "html": pa.array([r[2] for r in rows], pa.binary()),
            "text": pa.nulls(len(rows), pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "op": pa.array([r[3] for r in rows], pa.string()),
            "seq": pa.array([r[4] for r in rows], pa.int64()),
            "epoch": pa.array([e] * len(rows), pa.int32()),
        }
    )
    pq.write_table(t, os.path.join(d, f"epoch={e:05d}.parquet"))


def test_bad_rows_dropped_and_counted(tmp_path):
    ev, lake = str(tmp_path / "ev"), str(tmp_path / "lake")
    write_epoch(
        ev,
        0,
        [
            ("https://ok.com/a", 1, b"<p>a</p>", "I", 0),
            (None, 2, b"<p>x</p>", "I", 1),               # null url
            ("https://ok.com/b", 3, b"<p>b</p>", "Z", 2),  # invalid op
            ("https://ok.com/c", None, b"<p>c</p>", "I", 3),  # null warc_ts
            ("https://ok.com/a", 1, b"<p>a</p>", "I", 0),  # exact redelivery
            ("https://never.com/x", 4, None, "D", 5),      # delete of unknown url
        ],
    )
    cfg = EngineConfig(lake_dir=lake, num_partitions=2)
    rep = run_ingest(cfg, ev)
    v = rep["validation"]
    assert v["null_url"] == 1 and v["invalid_op"] == 1 and v["null_warc_ts"] == 1
    # duplicate_seq is a per-batch (partial) signal — cross-batch dups are
    # the exact-dedup operator's job; here it may be 0 or 1 depending on
    # how the read splits blocks
    assert v["duplicate_seq"] in (0, 1)
    live = read_lake(lake).to_pandas()
    # only the valid insert survives; unknown-url delete stays a tombstone
    assert sorted(live["url"]) == ["https://ok.com/a"]
    stored = read_lake(lake, live_only=False).to_pandas()
    assert "https://never.com/x" in set(stored["url"])


def test_prevalidate_counts_unit():
    t = pa.table(
        {
            "url": pa.array(["https://a.com", None], pa.string()),
            "op": pa.array(["I", "Q"], pa.string()),
            "warc_ts": pa.array([1, None], pa.timestamp("us")),
            "seq": pa.array([1, 1], pa.int64()),
        }
    )
    v = prevalidate_counts(t)
    assert v == {
        "events": 2,
        "null_url": 1,
        "invalid_op": 1,
        "null_warc_ts": 1,
        "duplicate_seq": 1,
    }


def test_missing_column_hard_fails(tmp_path):
    """An event file missing a REQUIRED envelope column (seq) is a hard
    error — evolution is additive-only; the envelope is not optional."""
    import pytest

    ev, lake = str(tmp_path / "ev"), str(tmp_path / "lake")
    os.makedirs(ev)
    t = pa.table(
        {
            "url": pa.array(["https://a.com/x"], pa.string()),
            "warc_ts": pa.array([BASE], pa.timestamp("us")),
            "html": pa.array([b"<p>a</p>"], pa.binary()),
            "text": pa.nulls(1, pa.string()),
            "lang": pa.array(["en"], pa.string()),
            "op": pa.array(["I"], pa.string()),
            "epoch": pa.array([0], pa.int32()),
        }
    )
    pq.write_table(t, os.path.join(ev, "epoch=00000.parquet"))
    with pytest.raises(Exception):
        run_ingest(EngineConfig(lake_dir=lake, num_partitions=2), ev)
