"""REST serving layer (gene_etl_ray/serve.py) — endpoint-parity checks
against the reference's Flask surface (app.py:58-428): health, config
inspect/validate, async ingest job lifecycle, query results,
statistics and validation, all driven through a real HTTP socket on
loopback."""

import json
import socket
import threading
import time
import urllib.request

import pytest

from gene_etl_ray.config import EngineConfig
from gene_etl_ray.fixtures import generate_events


def _sockets_allowed() -> bool:
    try:
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        s.close()
        return True
    except OSError:
        return False


pytestmark = pytest.mark.skipif(
    not _sockets_allowed(), reason="loopback sockets unavailable")


def _get(port: int, path: str):
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=30
        ) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:  # 4xx/5xx still carry JSON
        return e.code, json.loads(e.read())


def _delete(port: int, path: str):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", method="DELETE")
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(port: int, path: str, payload: dict):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def server(tmp_path, ray_session):
    from gene_etl_ray.serve import make_server

    cfg = EngineConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4)
    srv = make_server(cfg=cfg, sf_dir="/root/testdata/sf0.001")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv.server_address[1], cfg, tmp_path
    finally:
        srv.shutdown()
        srv.server_close()


def test_health_config_and_validation_endpoints(server):
    port, cfg, _ = server
    assert _get(port, "/health") == (200, {"status": "healthy"})
    code, body = _get(port, "/api/v1/config")
    assert code == 200 and body["config_hash"] == cfg.hash()
    assert body["config"]["num_partitions"] == 4
    # config validation: unknown keys / bad values fail loudly
    code, ok = _post(port, "/api/v1/config/validate",
                     {"lake_dir": "/tmp/x", "merge_mode": "mor"})
    assert code == 200 and ok["valid"]
    code, bad = _post(port, "/api/v1/config/validate",
                      {"lake_dir": "/tmp/x", "merge_mode": "bogus"})
    assert code == 200 and not bad["valid"] and "merge_mode" in bad["error"]
    code, bad2 = _post(port, "/api/v1/config/validate",
                       {"lake_dir": "/tmp/x", "no_such_knob": 1})
    assert code == 200 and not bad2["valid"]


def test_results_endpoint_runs_registry_query(server):
    port, _, _ = server
    code, body = _get(
        port, "/api/v1/results?query=distinct_event_types&limit=3")
    assert code == 200 and body["rows"] >= 3
    assert len(body["data"]) == 3 and "event_type" in body["data"][0]
    code, err = _get(port, "/api/v1/results?query=nope")
    assert code == 404 and "unknown query" in err["error"]


def test_ingest_job_lifecycle_and_statistics(server):
    port, cfg, tmp_path = server
    ev = str(tmp_path / "events")
    generate_events(ev, n_urls=120, n_events=600, n_epochs=3, seed=3)
    code, sub = _post(port, "/api/v1/etl/run", {"events_dir": ev})
    assert code == 202
    job = sub["job_id"]
    deadline = time.time() + 120
    while time.time() < deadline:
        code, st = _get(port, f"/api/v1/etl/jobs/{job}")
        assert code == 200
        if st["status"] != "running":
            break
        time.sleep(0.5)
    assert st["status"] == "succeeded", st
    assert st["events_in"] == 600 and st["commits"] >= 1
    code, stats = _get(port, "/api/v1/statistics")
    assert code == 200 and stats["committed_partitions"] >= 1
    assert stats["max_committed_epoch"] >= 0
    code, checks = _get(port, "/api/v1/validation")
    assert code == 200 and checks["one_row_per_url"]
    code, jl = _get(port, "/api/v1/etl/jobs")
    assert code == 200 and any(j["job_id"] == job for j in jl["jobs"])
    assert _get(port, "/api/v1/etl/jobs/zzz")[0] == 404
    # DELETE drops the record (reference app.py:211 parity)
    assert _delete(port, "/api/v1/etl/jobs/zzz")[0] == 404
    code, body = _delete(port, f"/api/v1/etl/jobs/{job}")
    assert code == 200 and body["job_id"] == job
    assert _get(port, f"/api/v1/etl/jobs/{job}")[0] == 404
    code, jl = _get(port, "/api/v1/etl/jobs")
    assert code == 200 and not any(j["job_id"] == job for j in jl["jobs"])
