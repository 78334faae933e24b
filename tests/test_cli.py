"""CLI surface tests (python -m gene_etl_ray.run) — parity with the
reference's config-driven entry points and operational endpoints."""

import json

import pytest

from gene_etl_ray.fixtures import generate_events
from gene_etl_ray.run import load_config, main


def last_json(capsys):
    """Parse the LAST JSON line of captured stdout — Ray occasionally
    interleaves a stray log/warning line into the capture."""
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.strip()]
    for l in reversed(lines):
        try:
            return json.loads(l)
        except json.JSONDecodeError:
            continue
    raise AssertionError(f"no JSON line in output: {lines!r}")


@pytest.fixture()
def events_and_config(tmp_path):
    ev = str(tmp_path / "events")
    generate_events(ev, n_urls=80, n_events=300, n_epochs=3)
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump({"lake_dir": str(tmp_path / "lake"), "num_partitions": 4}, f)
    return ev, cfg_path, str(tmp_path / "lake")


def test_cli_ingest_validate_export_stats(events_and_config, tmp_path, capsys):
    ev, cfg, lake = events_and_config
    assert main(["ingest", "--config", cfg, "--events", ev]) == 0
    rep = last_json(capsys)
    assert rep["events_in"] == 300

    assert main(["validate", "--lake", lake]) == 0
    checks = last_json(capsys)
    assert checks["one_row_per_url"]

    out_dir = str(tmp_path / "export")
    assert main(["export", "--lake", lake, "--out", out_dir, "--count"]) == 0
    exp = last_json(capsys)
    assert exp["rows"] > 0

    assert main(["stats", "--lake", lake]) == 0
    stats = last_json(capsys)
    assert stats["num_partitions"] == 4 and stats["max_committed_epoch"] == 2

    # point lookup: a live url round-trips; a never-seen url reports 0
    import pyarrow.parquet as pq
    from gene_etl_ray.state.manifest import current_files

    from gene_etl_ray.schema import DELETED_COLUMN

    some_file = next(iter(current_files(lake).values()))[0]
    ft = pq.read_table(some_file, columns=["url", DELETED_COLUMN])
    import pyarrow.compute as pc

    live = ft.filter(pc.invert(ft.column(DELETED_COLUMN)))
    url = live.column("url")[0].as_py()
    assert main(["lookup", "--lake", lake, url]) == 0
    hit = json.loads(capsys.readouterr().out.splitlines()[0])
    assert hit["url"] == url
    assert main(["lookup", "--lake", lake, "https://nope.example.org/x"]) == 0
    miss = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert miss == {"found": 0}


def test_cli_tail_until_drained(tmp_path, capsys):
    """Tail mode: first pass applies everything, second sees nothing new
    and --until-drained stops the loop; a later segment is picked up by a
    fresh tail pass (incremental arrival)."""
    import json as _json

    from gene_etl_ray.fixtures import generate_events

    ev = str(tmp_path / "ev")
    generate_events(ev, n_urls=60, n_events=200, n_epochs=2)
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        _json.dump({"lake_dir": str(tmp_path / "lake"), "num_partitions": 4}, f)
    assert main(["tail", "--config", cfg_path, "--events", ev,
                 "--interval", "0", "--until-drained"]) == 0
    lines = [_json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["events_in"] == 200 and lines[-1]["events_in"] == 0

    # new segment arrives → next tail pass applies only the delta
    generate_events(str(tmp_path / "ev2"), n_urls=60, n_events=300, n_epochs=3)
    import shutil as _sh
    _sh.copy(str(tmp_path / "ev2" / "epoch=00002.parquet"),
             str(tmp_path / "ev" / "epoch=00002.parquet"))
    assert main(["tail", "--config", cfg_path, "--events", ev,
                 "--interval", "0", "--max-loops", "1"]) == 0
    line = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < line["events_in"] <= 100


def test_cli_rejects_unknown_config_keys(tmp_path):
    p = str(tmp_path / "bad.json")
    with open(p, "w") as f:
        json.dump({"lake_dir": "/tmp/x", "not_a_knob": 1}, f)
    with pytest.raises(SystemExit, match="unknown config keys"):
        load_config(p)


def test_cli_export_rejects_unknown_columns(tmp_path, capsys):
    import json as _json

    import pytest as _pytest

    from gene_etl_ray.fixtures import generate_events
    from gene_etl_ray.config import EngineConfig
    from gene_etl_ray.pipelines.ingest import run_ingest

    ev = str(tmp_path / "ev")
    generate_events(ev, n_urls=40, n_events=120, n_epochs=2)
    lake = str(tmp_path / "lake")
    run_ingest(EngineConfig(lake_dir=lake, num_partitions=4), ev)
    with _pytest.raises(SystemExit, match="unknown columns"):
        main(["export", "--lake", lake, "--out", str(tmp_path / "o"),
              "--columns", "url, nope"])
    # whitespace in a VALID list is tolerated
    assert main(["export", "--lake", lake, "--out", str(tmp_path / "o2"),
                 "--columns", "url, lang"]) == 0


def test_cli_tail_reports_quarantined_and_exits_2(tmp_path, capsys):
    import json as _json

    from gene_etl_ray.fixtures import generate_events

    ev = str(tmp_path / "ev")
    generate_events(ev, n_urls=40, n_events=120, n_epochs=3)
    # tear the middle segment: epochs >= 1 are held back forever
    with open(f"{ev}/epoch=00001.parquet", "r+b") as f:
        f.truncate(100)
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        _json.dump({"lake_dir": str(tmp_path / "lake"), "num_partitions": 4}, f)
    rc = main(["tail", "--config", cfg_path, "--events", ev,
               "--interval", "0", "--until-drained"])
    out_lines = capsys.readouterr().out.strip().splitlines()
    assert rc == 2  # stuck, not drained
    assert _json.loads(out_lines[-1])["stuck_on_quarantined"]
    assert _json.loads(out_lines[0])["quarantined"] == 1


def test_cli_view_refreshes_and_reports(events_and_config, capsys):
    ev, cfg, lake = events_and_config
    assert main(["ingest", "--config", cfg, "--events", ev]) == 0
    capsys.readouterr()
    assert main(["view", "--lake", lake, "--top", "3"]) == 0
    rep = last_json(capsys)
    assert rep["refreshed_partitions"] > 0 and rep["n_urls"] > 0
    assert len(rep["top"]) <= 3
    # second call: everything fresh, same combined numbers
    assert main(["view", "--lake", lake]) == 0
    rep2 = last_json(capsys)
    assert rep2["refreshed_partitions"] == 0
    assert rep2["n_urls"] == rep["n_urls"] and rep2["n_tokens"] == rep["n_tokens"]


def test_cli_diff_reports_change_feed(tmp_path, capsys):
    ev = str(tmp_path / "events")
    generate_events(ev, n_urls=100, n_events=500, n_epochs=4)
    cfg_path = str(tmp_path / "cfg.json")
    lake = str(tmp_path / "lake")
    with open(cfg_path, "w") as f:
        json.dump({"lake_dir": lake, "num_partitions": 4,
                   "epochs_per_commit": 2, "retain_history": True}, f)
    assert main(["ingest", "--config", cfg_path, "--events", ev]) == 0
    capsys.readouterr()
    assert main(["diff", "--lake", lake, "--from", "1", "--to", "3"]) == 0
    rep = last_json(capsys)
    assert rep["changes"] == rep["added"] + rep["updated"] + rep["deleted"]
    assert rep["changes"] > 0 and len(rep["sample"]) <= 10


def test_cli_view_delta_strategy(tmp_path, capsys):
    """view --delta: bootstrap on first call, pure feed-apply on the
    second, identical combined numbers to the partition strategy."""
    ev = str(tmp_path / "events")
    generate_events(ev, n_urls=120, n_events=600, n_epochs=4)
    cfg_path = str(tmp_path / "cfg.json")
    lake = str(tmp_path / "lake")
    with open(cfg_path, "w") as f:
        json.dump({"lake_dir": lake, "num_partitions": 4,
                   "epochs_per_commit": 2, "retain_history": True}, f)
    assert main(["ingest", "--config", cfg_path, "--events", ev]) == 0
    capsys.readouterr()
    assert main(["view", "--lake", lake, "--delta"]) == 0
    rep = last_json(capsys)
    assert rep["strategy"] == "delta" and rep["bootstrap"] and rep["refreshed"]
    assert main(["view", "--lake", lake]) == 0
    part = last_json(capsys)
    assert part["n_urls"] == rep["n_urls"] and part["n_tokens"] == rep["n_tokens"]
    # fresh second delta call
    assert main(["view", "--lake", lake, "--delta"]) == 0
    rep2 = last_json(capsys)
    assert not rep2["refreshed"] and rep2["n_urls"] == rep["n_urls"]


def test_cli_ingest_audit_gate_exit_code(tmp_path, capsys):
    """ingest under write_audit_publish with a tripwire guard exits 3
    with the audit report; nothing is published."""
    ev = str(tmp_path / "events")
    generate_events(ev, n_urls=80, n_events=400, n_epochs=2, delete_frac=0.2)
    cfg_path = str(tmp_path / "cfg.json")
    lake = str(tmp_path / "lake")
    with open(cfg_path, "w") as f:
        json.dump({"lake_dir": lake, "num_partitions": 4,
                   "write_audit_publish": True, "audit_max_delete_frac": 0.0}, f)
    assert main(["ingest", "--config", cfg_path, "--events", ev]) == 3
    rep = last_json(capsys)
    assert rep["audit_failed"] and not rep["audit"]["delete_frac_ok"]
    assert main(["stats", "--lake", lake]) == 0
    stats = last_json(capsys)
    assert stats.get("partitions", 0) == 0 or stats.get("rows", 0) == 0


def test_cli_repartition(events_and_config, tmp_path, capsys):
    """repartition subcommand: layout flip + continued ingest with a
    new-P config; the lake stays queryable throughout."""
    ev, cfg, lake = events_and_config
    assert main(["ingest", "--config", cfg, "--events", ev]) == 0
    capsys.readouterr()
    assert main(["repartition", "--config", cfg, "--factor", "2"]) == 0
    rep = last_json(capsys)
    assert rep["from_partitions"] == 4 and rep["to_partitions"] == 8
    assert main(["stats", "--lake", lake]) == 0
    stats = last_json(capsys)
    assert stats["num_partitions"] == 8
    # subsequent ingests must carry the new partition count
    cfg8 = str(tmp_path / "cfg8.json")
    with open(cfg8, "w") as f:
        json.dump({"lake_dir": lake, "num_partitions": 8}, f)
    assert main(["ingest", "--config", cfg8, "--events", ev]) == 0
    assert main(["validate", "--lake", lake]) == 0


def test_cli_export_since(events_and_config, tmp_path, capsys):
    """export --since: time-range export via zone-map pruned read."""
    ev, cfg, lake = events_and_config
    assert main(["ingest", "--config", cfg, "--events", ev]) == 0
    capsys.readouterr()
    out = str(tmp_path / "exp_since")
    assert main(["export", "--lake", lake, "--out", out,
                 "--since", "2035-01-01", "--count"]) == 0
    assert last_json(capsys)["rows"] == 0  # far-future cut: empty feed
    out2 = str(tmp_path / "exp_all")
    assert main(["export", "--lake", lake, "--out", out2,
                 "--since", "2000-01-01", "--count"]) == 0
    assert last_json(capsys)["rows"] > 0


def test_cli_export_resumable(events_and_config, tmp_path, capsys):
    ev, cfg, lake = events_and_config
    assert main(["ingest", "--config", cfg, "--events", ev]) == 0
    capsys.readouterr()
    out_dir = str(tmp_path / "rexport")
    assert main(["export", "--lake", lake, "--out", out_dir, "--resumable"]) == 0
    rep = last_json(capsys)
    assert rep["exported"] > 0 and rep["skipped"] == 0 and rep["rows"] > 0
    # re-run resumes: everything skips
    assert main(["export", "--lake", lake, "--out", out_dir, "--resumable"]) == 0
    rep2 = last_json(capsys)
    assert rep2["exported"] == 0 and rep2["skipped"] == rep["partitions"]
    # time-travel flags are a different contract
    import pytest as _pt
    with _pt.raises(SystemExit):
        main(["export", "--lake", lake, "--out", out_dir,
              "--resumable", "--asof", "1"])


def test_cli_compact_cluster_rows(tmp_path, capsys):
    """compact --cluster-rows: time-clustered layout via the CLI — the
    MOR lake folds into bounded warc_ts-sorted files per partition and
    stays validate-clean."""
    ev = str(tmp_path / "events")
    generate_events(ev, n_urls=200, n_events=900, n_epochs=4)
    lake = str(tmp_path / "lake")
    cfg = str(tmp_path / "cfg.json")
    with open(cfg, "w") as f:
        json.dump(
            {"lake_dir": lake, "num_partitions": 2,
             "epochs_per_commit": 2, "merge_mode": "mor"}, f,
        )
    assert main(["ingest", "--config", cfg, "--events", ev]) == 0
    capsys.readouterr()
    assert main(["compact", "--config", cfg, "--cluster-rows", "30"]) == 0
    rep = last_json(capsys)
    assert rep["compacted"] == 2
    from gene_etl_ray.state.manifest import current_files

    by_part = current_files(lake)
    assert max(len(fs) for fs in by_part.values()) > 1  # clustered layout
    assert main(["validate", "--lake", lake]) == 0
    v = last_json(capsys)
    assert v["one_row_per_url"] is True


def test_cli_vacuum(tmp_path, capsys):
    """vacuum subcommand: deferred orphans removed once past grace."""
    ev = str(tmp_path / "events")
    generate_events(ev, n_urls=60, n_events=240, n_epochs=2)
    lake = str(tmp_path / "lake")
    cfg = str(tmp_path / "cfg.json")
    with open(cfg, "w") as f:
        json.dump(
            {"lake_dir": lake, "num_partitions": 2,
             "epochs_per_commit": 1, "gc_grace_seconds": 3600}, f,
        )
    assert main(["ingest", "--config", cfg, "--events", ev]) == 0
    capsys.readouterr()
    assert main(["vacuum", "--config", cfg]) == 0
    rep = last_json(capsys)
    assert rep["deleted"] == 0 and rep["deferred"] > 0
    import glob as g
    import os

    for f in g.glob(os.path.join(lake, "part=*", "*.parquet")):
        os.utime(f, (1, 1))
    assert main(["vacuum", "--config", cfg]) == 0
    rep2 = last_json(capsys)
    assert rep2["deleted"] == rep["deferred"] and rep2["deferred"] == 0
    assert main(["validate", "--lake", lake]) == 0


def test_cli_query_runs_registry_entry(tmp_path, capsys):
    """`run query <name>` — the ad-hoc analytics surface: runs a
    registry query over a table dir, prints JSON rows + a summary line,
    exports full results to parquet, and lists names on a miss."""
    assert main(["query", "q1_pricing_summary",
                 "--sf-dir", "/root/testdata/sf0.001", "--limit", "2"]) == 0
    rep = last_json(capsys)
    assert rep["query"] == "q1_pricing_summary"
    assert rep["rows"] >= rep["shown"] >= 1

    out = str(tmp_path / "q.parquet")
    assert main(["query", "docs_repetition_stats",
                 "--sf-dir", "/root/testdata/sf0.001", "--out", out]) == 0
    rep = last_json(capsys)
    import pyarrow.parquet as pq
    assert pq.read_metadata(out).num_rows == rep["rows"] == 500

    assert main(["query", "no_such_query"]) == 2
    rep = last_json(capsys)
    assert "q1_pricing_summary" in rep["available"]


def test_cli_transform_named_ops(events_and_config, capsys):
    """transform --op textlen adds + fills the derived column; reextract
    refuses on a lake without stored html; unknown ops error loudly."""
    import pandas as pd

    from gene_etl_ray.pipelines.ingest import read_lake

    ev, cfg, lake = events_and_config
    assert main(["ingest", "--config", cfg, "--events", ev]) == 0
    capsys.readouterr()

    assert main(["transform", "--config", cfg, "--op", "textlen"]) == 0
    rep = last_json(capsys)
    assert rep["compacted"] > 0
    df = read_lake(lake).to_pandas()
    assert "text_len" in df.columns
    lens = df["text"].str.len()
    got = df["text_len"]
    assert (got.fillna(-1).to_numpy() == lens.fillna(-1).to_numpy()).all()

    # default lakes drop the html payload after extraction: reextract
    # must refuse rather than silently no-op
    with pytest.raises(Exception, match="keep_html"):
        main(["transform", "--config", cfg, "--op", "reextract"])
    with pytest.raises(Exception, match="unknown transform op"):
        main(["transform", "--config", cfg, "--op", "nope"])


def test_cli_expire(events_and_config, tmp_path, capsys):
    ev, cfg, lake = events_and_config
    assert main(["ingest", "--config", cfg, "--events", ev]) == 0
    capsys.readouterr()
    out = str(tmp_path / "expiry_wal")
    # everything is older than "now" → every live row expires
    assert main(["expire", "--config", cfg, "--out", out,
                 "--older-than-days", "0"]) == 0
    rep = last_json(capsys)
    assert rep["expired"] > 0 and rep["segments"] >= 1
    import glob as _glob
    assert _glob.glob(out + "/epoch=*.parquet")
