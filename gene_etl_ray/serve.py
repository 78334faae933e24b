"""Read-mostly REST serving layer — stdlib-only parity with the
reference's Flask app (``/root/reference/app.py:58-428``): health,
config inspect/validate, async ingest jobs, query results, lake
statistics and validation, re-expressed over the Ray-Data engine. The
handler threads only COORDINATE (an ingest job runs the normal
``run_ingest`` Dataset pipeline; a results call runs a registry query)
— Ray does the distributed work, exactly like the CLI.

The server never calls ``ray.init``: the process that owns the session
starts it (``python -m gene_etl_ray.run serve`` does, standalone Ray
Data auto-init covers the rest). Endpoints:

    GET  /health
    GET  /api/v1/config                     (config the server holds)
    POST /api/v1/config/validate            {json config} → ok/errors
    POST /api/v1/etl/run                    {"events_dir": ...} → job id
    GET  /api/v1/etl/jobs                   job registry
    GET  /api/v1/etl/jobs/<id>
    DELETE /api/v1/etl/jobs/<id>            drop job from the registry
    GET  /api/v1/results?query=<name>&limit=N   registry query rows
    GET  /api/v1/statistics                 lake summary
    GET  /api/v1/validation                 validate_lake checks
"""

from __future__ import annotations

import json
import os
import threading
import traceback
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from gene_etl_ray.config import EngineConfig


def lake_stats(lake: str) -> dict:
    """Lake summary — the statistics endpoint's payload (shared with
    ``run.py stats``; parity with ``app.py:323-383``)."""
    from gene_etl_ray.state.checkpoint import (
        effective_watermarks,
        read_lake_meta,
    )
    from gene_etl_ray.state.lineage import read_lineage
    from gene_etl_ray.state.manifest import current_files

    meta = read_lake_meta(lake) or {}
    files = current_files(lake)
    lineage = read_lineage(lake)
    wm = effective_watermarks(
        lake, meta.get("num_partitions", 0) or len(files) or 1)
    out = {
        "num_partitions": meta.get("num_partitions"),
        "config_hash": meta.get("config_hash"),
        "committed_partitions": len(files),
        "current_files": sum(len(v) for v in files.values()),
        "max_committed_epoch": max(wm.values()) if wm else -1,
        "lineage_records": len(lineage),
    }
    metrics_path = os.path.join(lake, "_meta", "metrics.json")
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            out["last_run"] = json.load(f)
    return out


class _Jobs:
    """In-memory async job registry (the reference's job model,
    ``app.py:112-233``): one worker thread per submitted ingest; the
    engine's two-phase commit makes a job idempotent and a crashed
    job's re-run convergent, so the registry itself needs no
    durability."""

    def __init__(self) -> None:
        self.lock = threading.Lock()
        self.jobs: dict[str, dict] = {}

    def submit(self, cfg: EngineConfig, events_dir: str) -> str:
        job_id = uuid.uuid4().hex[:12]
        with self.lock:
            self.jobs[job_id] = {
                "job_id": job_id, "status": "running",
                "events_dir": events_dir, "lake_dir": cfg.lake_dir,
            }

        def run() -> None:
            from gene_etl_ray.pipelines.ingest import run_ingest

            try:
                rep = run_ingest(cfg, events_dir)
                with self.lock:
                    # .get: the job may have been DELETEd mid-run — the
                    # dropped record just isn't updated (the ingest
                    # itself is idempotent, so letting it run to
                    # convergence is safe)
                    self.jobs.get(job_id, {}).update(
                        status="succeeded",
                        events_in=rep.get("events_in"),
                        events_applied=rep.get("events_applied"),
                        commits=len(rep.get("commits") or []),
                    )
            except Exception as exc:  # surfaced via the job record
                with self.lock:
                    self.jobs.get(job_id, {}).update(
                        status="failed", error=f"{type(exc).__name__}: {exc}")

        threading.Thread(target=run, daemon=True).start()
        return job_id

    def get(self, job_id: str) -> dict | None:
        with self.lock:
            j = self.jobs.get(job_id)
            return dict(j) if j else None

    def list(self) -> list[dict]:
        with self.lock:
            return [dict(j) for j in self.jobs.values()]

    def delete(self, job_id: str) -> dict | None:
        """Remove a job from the registry (reference app.py:211
        semantics: DELETE drops the tracker entry). Best-effort for a
        running job — its daemonic worker thread keeps running to
        convergence (safe: the two-phase commit is idempotent) but its
        record is gone and late status updates are dropped."""
        with self.lock:
            return self.jobs.pop(job_id, None)


def make_server(
    host: str = "127.0.0.1",
    port: int = 0,
    cfg: EngineConfig | None = None,
    sf_dir: str | None = None,
) -> ThreadingHTTPServer:
    """Build (not start) the server; ``server_address[1]`` is the bound
    port (pass 0 for ephemeral). Call ``serve_forever`` / ``shutdown``."""
    jobs = _Jobs()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet: logs go to the engine logger
            pass

        def _send(self, code: int, payload: dict | list) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802 (stdlib API)
            try:
                u = urlparse(self.path)
                q = {k: v[0] for k, v in parse_qs(u.query).items()}
                if u.path == "/health":
                    self._send(200, {"status": "healthy"})
                elif u.path == "/api/v1/config":
                    if cfg is None:
                        self._send(404, {"error": "no config loaded"})
                    else:
                        from dataclasses import asdict

                        self._send(200, {"config": asdict(cfg),
                                         "config_hash": cfg.hash()})
                elif u.path == "/api/v1/etl/jobs":
                    self._send(200, {"jobs": jobs.list()})
                elif u.path.startswith("/api/v1/etl/jobs/"):
                    j = jobs.get(u.path.rsplit("/", 1)[1])
                    self._send(200, j) if j else self._send(
                        404, {"error": "unknown job"})
                elif u.path == "/api/v1/results":
                    from gene_etl_ray.queries import QUERIES

                    name = q.get("query")
                    if name not in QUERIES:
                        self._send(
                            404,
                            {"error": f"unknown query {name!r}",
                             "queries": sorted(QUERIES)})
                        return
                    sd = q.get("sf", sf_dir)
                    if not sd:
                        self._send(400, {"error": "no sf dir configured"})
                        return
                    limit = int(q.get("limit", "1000"))
                    res = QUERIES[name](sd)
                    df = res.to_pandas() if hasattr(res, "to_pandas") else res
                    self._send(200, {
                        "query": name, "rows": len(df),
                        "truncated": len(df) > limit,
                        "data": json.loads(
                            df.head(limit).to_json(orient="records")),
                    })
                elif u.path == "/api/v1/statistics":
                    lake = q.get("lake", cfg.lake_dir if cfg else None)
                    if not lake:
                        self._send(400, {"error": "no lake configured"})
                    else:
                        self._send(200, lake_stats(lake))
                elif u.path == "/api/v1/validation":
                    from gene_etl_ray.pipelines.ingest import validate_lake

                    lake = q.get("lake", cfg.lake_dir if cfg else None)
                    if not lake:
                        self._send(400, {"error": "no lake configured"})
                    else:
                        self._send(200, validate_lake(lake))
                else:
                    self._send(404, {"error": "not found"})
            except Exception:
                self._send(500, {"error": traceback.format_exc(limit=3)})

        def do_POST(self) -> None:  # noqa: N802
            try:
                u = urlparse(self.path)
                n = int(self.headers.get("Content-Length") or 0)
                body = json.loads(self.rfile.read(n) or b"{}")
                if u.path == "/api/v1/config/validate":
                    try:
                        c = EngineConfig(**body)
                        self._send(200, {"valid": True,
                                         "config_hash": c.hash()})
                    except (TypeError, ValueError) as exc:
                        self._send(200, {"valid": False,
                                         "error": str(exc)})
                elif u.path == "/api/v1/etl/run":
                    if cfg is None and "config" not in body:
                        self._send(400, {"error": "no config"})
                        return
                    run_cfg = (EngineConfig(**body["config"])
                               if "config" in body else cfg)
                    ev = body.get("events_dir")
                    if not ev:
                        self._send(400, {"error": "events_dir required"})
                        return
                    self._send(202, {"job_id": jobs.submit(run_cfg, ev),
                                     "status": "running"})
                else:
                    self._send(404, {"error": "not found"})
            except Exception:
                self._send(500, {"error": traceback.format_exc(limit=3)})

        def do_DELETE(self) -> None:  # noqa: N802
            try:
                u = urlparse(self.path)
                if u.path.startswith("/api/v1/etl/jobs/"):
                    job_id = u.path.rsplit("/", 1)[1]
                    if jobs.delete(job_id) is None:
                        self._send(404, {"error": "Job not found",
                                         "job_id": job_id})
                    else:
                        self._send(200,
                                   {"message": "Job deleted successfully",
                                    "job_id": job_id})
                else:
                    self._send(404, {"error": "not found"})
            except Exception:
                self._send(500, {"error": traceback.format_exc(limit=3)})

    return ThreadingHTTPServer((host, port), Handler)
