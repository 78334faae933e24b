"""CLI surface tests (python -m gene_etl_ray.run) — parity with the
reference's config-driven entry points and operational endpoints."""

import json

import pytest

from gene_etl_ray.fixtures import generate_events
from gene_etl_ray.run import load_config, main


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
    rep = json.loads(capsys.readouterr().out)
    assert rep["events_in"] == 300

    assert main(["validate", "--lake", lake]) == 0
    checks = json.loads(capsys.readouterr().out)
    assert checks["one_row_per_url"]

    out_dir = str(tmp_path / "export")
    assert main(["export", "--lake", lake, "--out", out_dir, "--count"]) == 0
    exp = json.loads(capsys.readouterr().out)
    assert exp["rows"] > 0

    assert main(["stats", "--lake", lake]) == 0
    stats = json.loads(capsys.readouterr().out)
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
