"""CLI entry point — ``ray job submit -- python -m gene_etl_ray.run ...``.

Parity with the reference's config-driven entry points
(``etl/__init__.py:323-341`` ``run_etl_pipeline(config_path|config)``,
``README.md:56-61``): the whole run is parameterized by a JSON/YAML config
file, no code changes to retune (§2.10). Subcommands mirror the
reference's operational surface (run / validate / export / stats,
``app.py:58-428``).

This module owns a Ray session ONLY when executed as a script; as a
library nothing here calls ray.init (driver contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from gene_etl_ray.config import EngineConfig


def load_config(path: str) -> EngineConfig:
    """JSON (or YAML when pyyaml is importable) → validated EngineConfig.
    Unknown keys are a hard error — parity with the reference's
    ``extra = "forbid"`` config discipline (``config.py:172-174``)."""
    with open(path) as f:
        raw = f.read()
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml  # type: ignore

            data = yaml.safe_load(raw)
        except ImportError as e:
            raise SystemExit("yaml config requires pyyaml; use JSON") from e
    else:
        data = json.loads(raw)
    known = set(EngineConfig.__dataclass_fields__)
    unknown = set(data) - known
    if unknown:
        raise SystemExit(f"unknown config keys: {sorted(unknown)}")
    return EngineConfig(**data)


def cmd_ingest(args) -> int:
    from gene_etl_ray.pipelines.ingest import AuditFailedError, run_ingest

    cfg = load_config(args.config)
    try:
        report = run_ingest(cfg, args.events)
    except AuditFailedError as e:
        # WAP gate tripped: nothing published; staged snapshot kept for
        # inspection under <lake>/_manifests/staged/
        print(json.dumps({"audit_failed": True, "audit": e.report}, default=str))
        return 3
    print(json.dumps(report, default=str))
    return 0


def cmd_truncate(args) -> int:
    """Prefix-only WAL cleanup (segments fully committed for every
    partition; optionally archived instead of deleted)."""
    from gene_etl_ray.pipelines.ingest import truncate_wal

    cfg = load_config(args.config)
    print(json.dumps(truncate_wal(cfg, args.events, args.archive)))
    return 0


def cmd_mux(args) -> int:
    """Multi-producer WAL multiplexer: merge N producer shards into the
    single consumer WAL (crash-safe reserve-then-copy, idempotent)."""
    from gene_etl_ray.pipelines.mux import merge_wals

    print(json.dumps(merge_wals(args.sources, args.out)))
    return 0


def cmd_vacuum(args) -> int:
    """Delete deferred-GC orphans older than the configured grace."""
    from gene_etl_ray.pipelines.ingest import vacuum_lake

    cfg = load_config(args.config)
    print(json.dumps(vacuum_lake(cfg)))
    return 0


def cmd_validate(args) -> int:
    from gene_etl_ray.pipelines.ingest import consistency_report, validate_lake

    checks = validate_lake(args.lake)
    checks["consistency"] = consistency_report(args.lake)
    print(json.dumps(checks))
    ok = checks["one_row_per_url"] and all(checks["consistency"].values())
    return 0 if ok else 1


def cmd_export(args) -> int:
    """Export the live view to plain partitioned Parquet (no engine
    metadata) — parity with the reference's Parquet archival export
    (``io.py:289-335``), minus its manual pagination: Ray Data writes one
    file per block natively."""
    from gene_etl_ray.pipelines.ingest import read_lake

    cols = [c.strip() for c in args.columns.split(",") if c.strip()] if args.columns else None
    if cols:
        from gene_etl_ray.state.checkpoint import read_lake_meta
        from gene_etl_ray.pipelines.ingest import _schema_from_hex

        meta = read_lake_meta(args.lake)
        if meta:
            known = set(_schema_from_hex(meta["schema_hex"]).names)
            unknown = [c for c in cols if c not in known]
            if unknown:
                raise SystemExit(
                    f"unknown columns: {unknown}; lake has {sorted(known)}"
                )
    if args.format != "parquet" and not args.resumable:
        raise SystemExit("--format jsonl requires --resumable")
    if args.resumable:
        if args.asof is not None or args.since or args.until:
            raise SystemExit(
                "--resumable exports the CURRENT live view; it cannot be "
                "combined with --asof/--since/--until"
            )
        from gene_etl_ray.pipelines.ingest import export_lake

        rep = export_lake(
            args.lake, args.out, columns=cols,
            live_only=not args.include_tombstones,
            fmt=args.format,
        )
        print(json.dumps({"out": args.out, **rep}))
        return 0
    ds = read_lake(
        args.lake,
        live_only=not args.include_tombstones,
        columns=cols,
        asof_epoch=args.asof,
        ts_min=args.since,
        ts_max=args.until,
    )
    out: dict = {"out": args.out}
    if args.count:
        # counting re-executes the lazy pipeline; do it only on request
        out["rows"] = ds.count()
    ds.write_parquet(args.out)
    print(json.dumps(out))
    return 0


def cmd_compact(args) -> int:
    from gene_etl_ray.pipelines.ingest import compact_lake, maybe_compact

    cfg = load_config(args.config)
    if args.max_depth is not None:
        rep = maybe_compact(
            cfg, max_delta_files=args.max_depth,
            cluster_rows=args.cluster_rows,
        )
    else:
        rep = compact_lake(cfg, cluster_rows=args.cluster_rows)
    print(json.dumps(rep))
    return 0


def cmd_transform(args) -> int:
    """Exactly-once distributed column backfill over the stored lake —
    the lakehouse UPDATE (see ``pipelines.ingest.transform_lake``).
    ``--op`` picks a named backfill: ``reextract`` re-runs the frozen
    html→text extractor over keep_html lakes; ``textlen`` derives a new
    ``text_len`` column (additive schema evolution)."""
    from gene_etl_ray.pipelines.ingest import _named_transform, transform_lake

    cfg = load_config(args.config)
    fn, fields = _named_transform(args.op)
    print(json.dumps(transform_lake(cfg, fn, add_fields=fields)))
    return 0


def cmd_expire(args) -> int:
    """Row-level TTL retention: emit deletion events for live rows whose
    winning warc_ts is older than the cutoff into a WAL directory (see
    ``pipelines.ingest.build_expiry_wal``) — mux into the consumer WAL
    and ingest; nothing mutates outside the normal change-data path."""
    import time as _time

    from gene_etl_ray.pipelines.ingest import build_expiry_wal

    cfg = load_config(args.config)
    if args.older_than_us is not None:
        cut = args.older_than_us
    else:
        cut = int((_time.time() - args.older_than_days * 86_400) * 1e6)
    print(json.dumps(build_expiry_wal(cfg, args.out, cut)))
    return 0


def cmd_repartition(args) -> int:
    """Online partition scale-out: grow the lake's partition count by an
    integer factor (shuffle-free per-partition split, atomic overlay
    publish — see ``pipelines.ingest.repartition_lake``). Subsequent
    ingest configs must carry the new ``num_partitions``."""
    from gene_etl_ray.pipelines.ingest import repartition_lake

    cfg = load_config(args.config)
    print(json.dumps(repartition_lake(cfg, args.factor)))
    return 0


def cmd_stats(args) -> int:
    """Lake summary — parity with the statistics endpoint
    (``app.py:323-383``) and the grouped summary view
    (``models.py:268-284``)."""
    from gene_etl_ray.state.checkpoint import effective_watermarks, read_lake_meta
    from gene_etl_ray.state.lineage import read_lineage
    from gene_etl_ray.state.manifest import current_files

    meta = read_lake_meta(args.lake) or {}
    files = current_files(args.lake)
    lineage = read_lineage(args.lake)
    wm = effective_watermarks(args.lake, meta.get("num_partitions", 0) or len(files) or 1)
    out = {
        "num_partitions": meta.get("num_partitions"),
        "config_hash": meta.get("config_hash"),
        "committed_partitions": len(files),
        "current_files": sum(len(v) for v in files.values()),
        "max_committed_epoch": max(wm.values()) if wm else -1,
        "lineage_records": len(lineage),
    }
    metrics_path = os.path.join(args.lake, "_meta", "metrics.json")
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            out["last_run"] = json.load(f)
    print(json.dumps(out))
    return 0


def cmd_tail(args) -> int:
    """Continuous WAL tailing: repeated ``run_ingest`` passes as new
    epoch segments appear (the streaming-shaped operational mode, SURVEY
    §2.9 'tailing'). Each pass applies only not-yet-committed epochs;
    ``--until-drained`` stops after a pass that found nothing new,
    ``--max-loops`` bounds the loop for scripted runs."""
    import time as _time

    from gene_etl_ray.pipelines.ingest import run_ingest

    cfg = load_config(args.config)
    loops = 0
    while True:
        rep = run_ingest(cfg, args.events)
        quarantined = rep.get("quarantined_segments", [])
        print(
            json.dumps(
                {
                    "loop": loops,
                    "events_in": rep["events_in"],
                    "events_applied": rep["events_applied"],
                    "commits": len(rep["commits"]),
                    "quarantined": len(quarantined),
                }
            ),
            flush=True,
        )
        loops += 1
        if args.max_loops and loops >= args.max_loops:
            return 0
        if args.until_drained and rep["events_in"] == 0:
            if quarantined:
                # "drained" but torn segments are holding later epochs
                # back — that is a stuck tail, not a clean catch-up
                print(json.dumps({"stuck_on_quarantined": quarantined}))
                return 2
            return 0
        _time.sleep(args.interval)


def cmd_view(args) -> int:
    """Incrementally refresh the domain_stats materialized view and
    print it. Default strategy: partition-invalidation IVM (recompute
    only partitions committed to since the last refresh). ``--delta``:
    change-feed-driven maintenance (apply diff_snapshots deltas to the
    O(domains) state — requires retain_history; work is O(changed
    urls), never a partition rescan after bootstrap)."""
    if args.delta:
        from gene_etl_ray.state.mview import read_view_delta, refresh_view_delta

        rep = refresh_view_delta(args.lake)
        df = read_view_delta(args.lake)
        header = {
            "strategy": "delta",
            "refreshed": rep["refreshed"],
            "epoch": rep.get("epoch"),
            "bootstrap": rep.get("bootstrap", False),
            "changed_domains": rep.get("changed_domains"),
        }
    else:
        from gene_etl_ray.state.mview import read_view, refresh_view

        rep = refresh_view(args.lake)
        df = read_view(args.lake)
        header = {
            "strategy": "partition",
            "refreshed_partitions": len(rep["refreshed"]),
            "fresh_partitions": rep["fresh"],
        }
    print(
        json.dumps(
            {
                **header,
                "domains": len(df),
                "n_urls": int(df["n_urls"].sum()) if len(df) else 0,
                "n_tokens": int(df["n_tokens"].sum()) if len(df) else 0,
                "top": df.sort_values(["n_urls", "domain"], ascending=[False, True])
                .head(args.top)
                .to_dict("records"),
            }
        )
    )
    return 0


def cmd_diff(args) -> int:
    """Change feed between two committed snapshots (requires
    retain_history): prints per-kind counts and up to --sample rows."""
    from gene_etl_ray.pipelines.ingest import diff_snapshots

    df = diff_snapshots(args.lake, getattr(args, "from"), args.to).to_pandas()
    counts = (
        df["change"].value_counts().to_dict() if "change" in df.columns else {}
    )
    sample = (
        df.sort_values(["change", "url"]).head(args.sample) if len(df) else df
    )
    print(
        json.dumps(
            {
                "from": getattr(args, "from"),
                "to": args.to,
                "changes": int(len(df)),
                "added": int(counts.get("added", 0)),
                "updated": int(counts.get("updated", 0)),
                "deleted": int(counts.get("deleted", 0)),
                "sample": [
                    {"url": r.url, "change": r.change}
                    for r in sample.itertuples()
                ],
            }
        )
    )
    return 0


def cmd_lookup(args) -> int:
    """Point lookup — the query/serving surface of the reference's REST
    query endpoint (``app.py:386-428``), as a CLI subcommand over the
    partition-pruned ``lookup_urls`` read path."""
    from gene_etl_ray.pipelines.ingest import lookup_urls

    t = lookup_urls(args.lake, args.url)
    cols = [c for c in t.schema.names if c != "html"]
    rows = t.select(cols).to_pylist()
    for r in rows:
        # timestamps aren't JSON-serializable; render them
        r = {k: (str(v) if hasattr(v, "isoformat") else v) for k, v in r.items()}
        print(json.dumps(r))
    if not rows:
        print(json.dumps({"found": 0}))
    return 0


def cmd_query(args) -> int:
    """Run a registry query by name over a testdata-shaped table dir —
    the ad-hoc analytics surface of the reference's REST query endpoints
    (``app.py:386-428``), CLI-shaped: every operator in the
    ``queries.QUERIES`` registry is addressable by name; results stream
    to stdout as JSON lines (head-limited) or to a parquet file."""
    import pandas as pd

    from gene_etl_ray.queries import QUERIES

    if args.name not in QUERIES:
        print(json.dumps({"error": f"unknown query {args.name!r}",
                          "available": sorted(QUERIES)}))
        return 2
    res = QUERIES[args.name](args.sf_dir)
    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    if args.out:
        res.to_parquet(args.out, index=False)
        print(json.dumps({"query": args.name, "rows": len(res),
                          "out": args.out}))
        return 0
    head = res.head(args.limit)
    for r in head.to_dict(orient="records"):
        r = {k: (str(v) if hasattr(v, "isoformat") else v) for k, v in r.items()}
        print(json.dumps(r, default=str))
    print(json.dumps({"query": args.name, "rows": len(res),
                      "shown": len(head)}))
    return 0


def cmd_serve(args) -> int:
    """REST serving layer (``serve.make_server`` — stdlib http.server):
    full-surface parity with the reference's Flask app
    (``app.py:58-428``): health, config inspect/validate, async ingest
    jobs, query results, statistics, validation."""
    from gene_etl_ray.serve import make_server

    cfg = load_config(args.config) if args.config else None
    srv = make_server(
        host=args.host, port=args.port, cfg=cfg, sf_dir=args.sf_dir)
    print(json.dumps({"serving": list(srv.server_address)}), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="gene_etl_ray", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest", help="apply uncommitted epochs to the lake")
    pi.add_argument("--config", required=True)
    pi.add_argument("--events", required=True)
    pi.set_defaults(fn=cmd_ingest)

    pt_ = sub.add_parser(
        "truncate", help="prefix-only WAL cleanup of fully-committed segments"
    )
    pt_.add_argument("--config", required=True)
    pt_.add_argument("--events", required=True)
    pt_.add_argument("--archive", default=None,
                     help="move segments here instead of deleting (replayable)")
    pt_.set_defaults(fn=cmd_truncate)

    pm = sub.add_parser(
        "mux", help="merge N producer WAL shards into one consumer WAL"
    )
    pm.add_argument("--sources", nargs="+", required=True,
                    help="producer WAL directories (binlog shards)")
    pm.add_argument("--out", required=True, help="consumer WAL directory")
    pm.set_defaults(fn=cmd_mux)

    pvac = sub.add_parser(
        "vacuum",
        help="delete superseded files past the gc_grace_seconds window",
    )
    pvac.add_argument("--config", required=True)
    pvac.set_defaults(fn=cmd_vacuum)

    pv = sub.add_parser("validate", help="post-validation checks on the lake")
    pv.add_argument("--lake", required=True)
    pv.set_defaults(fn=cmd_validate)

    pe = sub.add_parser("export", help="export the live view to plain parquet")
    pe.add_argument("--lake", required=True)
    pe.add_argument("--out", required=True)
    pe.add_argument("--include-tombstones", action="store_true")
    pe.add_argument("--columns", default=None,
                    help="comma-separated column subset (pruned at the read)")
    pe.add_argument("--count", action="store_true",
                    help="also report the row count (extra pass over the lake)")
    pe.add_argument("--format", choices=("parquet", "jsonl"),
                    default="parquet",
                    help="resumable-export shard format (jsonl = the "
                         "line-delimited form training-data consumers "
                         "read; requires --resumable)")
    pe.add_argument("--resumable", action="store_true",
                    help="partitioned resumable export: one epoch-named file "
                         "per lake partition, re-runs skip finished partitions "
                         "and refresh stale ones (current live view only; "
                         "incompatible with --asof/--since/--until)")
    pe.add_argument("--asof", type=int, default=None,
                    help="time travel: export the lake as of this committed "
                         "epoch (requires retain_history)")
    pe.add_argument("--since", default=None,
                    help="only rows whose winning warc_ts >= this timestamp "
                         "(zone-map file pruning — the changed-since-T feed)")
    pe.add_argument("--until", default=None,
                    help="only rows whose winning warc_ts <= this timestamp")
    pe.set_defaults(fn=cmd_export)

    ps = sub.add_parser("stats", help="lake summary + last run metrics")
    ps.add_argument("--lake", required=True)
    ps.set_defaults(fn=cmd_stats)

    pc_ = sub.add_parser(
        "compact", help="fold merge-on-read delta files back to one per partition"
    )
    pc_.add_argument("--config", required=True)
    pc_.add_argument(
        "--cluster-rows",
        type=int,
        default=None,
        help="time-clustered layout: sort winners by warc_ts and write "
        "files of at most this many rows (tight zone-map ranges; enables "
        "within-partition pruning for time-range reads)",
    )
    pc_.add_argument(
        "--max-depth",
        type=int,
        default=None,
        help="policy gate: compact only when some partition holds more "
        "than this many delta files (metadata-only when it declines — "
        "the steady-state MOR maintenance loop)",
    )
    pc_.set_defaults(fn=cmd_compact)

    pex = sub.add_parser(
        "expire",
        help="emit TTL deletion events (rows older than the cutoff) "
        "into a WAL dir — mux + ingest to apply; pure change data",
    )
    pex.add_argument("--config", required=True)
    pex.add_argument("--out", required=True, help="expiry WAL directory")
    g = pex.add_mutually_exclusive_group(required=True)
    g.add_argument("--older-than-days", type=float, default=None)
    g.add_argument("--older-than-us", type=int, default=None,
                   help="absolute cutoff, epoch microseconds")
    pex.set_defaults(fn=cmd_expire)

    ptr = sub.add_parser(
        "transform",
        help="exactly-once column backfill over the stored lake "
        "(the lakehouse UPDATE; named ops: reextract | textlen)",
    )
    ptr.add_argument("--config", required=True)
    ptr.add_argument("--op", required=True)
    ptr.set_defaults(fn=cmd_transform)

    pr = sub.add_parser(
        "repartition",
        help="grow the lake's partition count by an integer factor "
        "(shuffle-free split, atomic layout flip)",
    )
    pr.add_argument("--config", required=True)
    pr.add_argument("--factor", type=int, required=True)
    pr.set_defaults(fn=cmd_repartition)

    pt = sub.add_parser("tail", help="loop ingest passes as new WAL segments appear")
    pt.add_argument("--config", required=True)
    pt.add_argument("--events", required=True)
    pt.add_argument("--interval", type=float, default=5.0)
    pt.add_argument("--max-loops", type=int, default=0)
    pt.add_argument("--until-drained", action="store_true")
    pt.set_defaults(fn=cmd_tail)

    pw = sub.add_parser(
        "view", help="incremental-refresh + print the domain_stats materialized view"
    )
    pw.add_argument("--lake", required=True)
    pw.add_argument("--top", type=int, default=10)
    pw.add_argument(
        "--delta", action="store_true",
        help="maintain from the change feed (requires retain_history)",
    )
    pw.set_defaults(fn=cmd_view)

    pd_ = sub.add_parser(
        "diff", help="change feed between two snapshots (requires retain_history)"
    )
    pd_.add_argument("--lake", required=True)
    pd_.add_argument("--from", type=int, required=True)
    pd_.add_argument("--to", type=int, required=True)
    pd_.add_argument("--sample", type=int, default=10)
    pd_.set_defaults(fn=cmd_diff)

    pl = sub.add_parser("lookup", help="point lookup of urls (partition-pruned read)")
    pl.add_argument("--lake", required=True)
    pl.add_argument("url", nargs="+", help="url(s) to look up")
    pl.set_defaults(fn=cmd_lookup)

    pq = sub.add_parser(
        "query", help="run a registry query by name over a table dir"
    )
    pq.add_argument("name", help="query name from the registry")
    pq.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                    help="directory of parquet tables")
    pq.add_argument("--out", default=None,
                    help="write full result to this parquet file")
    pq.add_argument("--limit", type=int, default=20,
                    help="rows printed to stdout (default 20)")
    pq.set_defaults(fn=cmd_query)

    psv = sub.add_parser(
        "serve", help="REST serving layer (health/config/jobs/results)"
    )
    psv.add_argument("--host", default="127.0.0.1")
    psv.add_argument("--port", type=int, default=8642)
    psv.add_argument("--config", default=None,
                     help="EngineConfig json for stats/jobs endpoints")
    psv.add_argument("--sf-dir", default=None,
                     help="default table dir for /api/v1/results")
    psv.set_defaults(fn=cmd_serve)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        sys.exit(main())
    finally:
        ray.shutdown()
