"""Incremental materialized-view maintenance (partition-invalidation IVM).

The view ``domain_stats`` = per-domain (url host) statistics over the
lake's LIVE rows: ``n_urls`` and whitespace-token total ``n_tokens``.

One shard per lake partition at
``_mv/<view>/part=<k>.epoch=<e>.parquet``, where ``<e>`` is the MANIFEST
epoch the shard reflects. :func:`refresh_view` recomputes ONLY the
shards whose epoch is behind their partition's manifest — exactly the
increment the CDC commits touched, so a refresh after a commit group is
O(touched partitions) regardless of lake size (the reference recomputes
its summary views from the full results table per run,
``models.py:241-284``; this is the incremental equivalent). The shard
computation runs distributed: a column-pruned read of just the stale
partitions' files, ``groupby(pkey).map_groups`` so each shard is written
by the task holding that partition — bulk rows never visit the driver.

Shard writes are atomic (tmp + ``os.replace``) and idempotent: a crashed
refresh leaves either the old shard or the new one, never a torn file,
and the next refresh redoes whatever is still stale. Compaction rewrites
a partition at its CURRENT epoch without changing live rows, so an
epoch-equal shard stays valid by construction. Concurrent refreshers are
not coordinated (last writer wins on a byte-identical file) — run under
the writer lock if refreshing inside an ingest loop.

Reading the view concatenates the tiny pre-aggregated shards driver-side
and combines per domain: bytes read = O(partitions × domains-per-
partition), independent of row count.
"""

from __future__ import annotations

import glob
import os
import re

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

DOMAIN_VIEW = "domain_stats"
_SHARD_RE = re.compile(r"part=(\d+)\.epoch=(\d+)\.parquet$")
_SHARD_SCHEMA = pa.schema(
    [("domain", pa.string()), ("n_urls", pa.int64()), ("n_tokens", pa.int64())]
)


def _mv_dir(lake_dir: str, view: str) -> str:
    return os.path.join(lake_dir, "_mv", view)


def shard_epochs(lake_dir: str, view: str = DOMAIN_VIEW) -> dict[int, tuple[int, str]]:
    """pkey → (epoch, path) of the newest shard per partition."""
    out: dict[int, tuple[int, str]] = {}
    for p in glob.glob(os.path.join(_mv_dir(lake_dir, view), "part=*.parquet")):
        m = _SHARD_RE.search(os.path.basename(p))
        if not m:
            continue
        k, e = int(m.group(1)), int(m.group(2))
        if k not in out or e > out[k][0]:
            out[k] = (e, p)
    return out


def _domain_stats_shard(group: pa.Table, mor: bool) -> pd.DataFrame:
    """Per-domain live stats for one partition's rows (pre-aggregated)."""
    if mor:
        from gene_etl_ray.pipelines.ingest import _resolve_lww

        group = _resolve_lww(group)
    live = group.filter(pc.invert(group.column("is_deleted")))
    df = pd.DataFrame(
        {
            "url": live.column("url").to_pandas(),
            "text": live.column("text").to_pandas(),
        }
    )
    df["domain"] = df["url"].str.extract(r"^[a-z][a-z0-9+.-]*://([^/]+)", expand=False)
    df["n_tokens"] = df["text"].fillna("").str.split().str.len().astype("int64")
    agg = df.groupby("domain", as_index=False, dropna=False).agg(
        n_urls=("url", "size"), n_tokens=("n_tokens", "sum")
    )
    agg["n_urls"] = agg["n_urls"].astype("int64")
    agg["n_tokens"] = agg["n_tokens"].astype("int64")
    return agg.sort_values("domain").reset_index(drop=True)


def refresh_view(lake_dir: str, view: str = DOMAIN_VIEW) -> dict:
    """Bring the view's shards up to the lake's manifests. Returns
    ``{"refreshed": [pkeys...], "fresh": n_already_current}``."""
    from gene_etl_ray.pipelines.ingest import _schema_from_hex, read_lake_meta
    from gene_etl_ray.state.manifest import read_manifest

    assert view == DOMAIN_VIEW, f"unknown view {view!r}"
    meta = read_lake_meta(lake_dir)
    if meta is None:
        return {"refreshed": [], "fresh": 0}
    mdir = os.path.join(lake_dir, "_manifests")
    pkeys = [
        int(n[5:-5])
        for n in os.listdir(mdir)
        if n.startswith("part=") and n.endswith(".json")
    ] if os.path.isdir(mdir) else []
    shards = shard_epochs(lake_dir, view)
    manifests = {k: read_manifest(lake_dir, k) for k in pkeys}
    stale = {
        k: m for k, m in manifests.items()
        if m is not None and shards.get(k, (-1, ""))[0] < m["epoch"]
    }
    if not stale:
        return {"refreshed": [], "fresh": len(pkeys)}

    out_dir = _mv_dir(lake_dir, view)
    os.makedirs(out_dir, exist_ok=True)
    schema = _schema_from_hex(meta["schema_hex"])
    mor = meta.get("merge_mode") == "mor"
    need = ["url", "text", "pkey", "is_deleted"] + (["warc_ts", "seq"] if mor else [])
    read_cols = [c for c in need if schema.get_field_index(c) >= 0]
    sub_schema = pa.schema([schema.field(c) for c in read_cols])
    files = [f for m in stale.values() for f in m["files"]]
    epochs = {k: m["epoch"] for k, m in stale.items()}

    def write_shard(group: pa.Table) -> pd.DataFrame:
        k = group.column("pkey")[0].as_py()
        agg = _domain_stats_shard(group, mor)
        e = epochs[int(k)]
        final = os.path.join(out_dir, f"part={int(k):05d}.epoch={e:05d}.parquet")
        tmp = final + f".tmp{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(agg, schema=_SHARD_SCHEMA), tmp)
        os.replace(tmp, final)
        return pd.DataFrame({"pkey": [int(k)], "epoch": [e], "domains": [len(agg)]})

    ds = ray.data.read_parquet(files, columns=read_cols, schema=sub_schema)
    report = ds.groupby("pkey").map_groups(write_shard, batch_format="pyarrow").to_pandas()
    # zero groups (every stale partition's files hold 0 rows) loses the schema
    done = set(report["pkey"].tolist()) if "pkey" in report.columns else set()
    # a stale partition whose files hold 0 rows produces no group — its
    # live set is empty; publish an empty shard so it stops reading stale
    for k in set(stale) - done:
        e = epochs[k]
        final = os.path.join(out_dir, f"part={k:05d}.epoch={e:05d}.parquet")
        tmp = final + f".tmp{os.getpid()}"
        pq.write_table(_SHARD_SCHEMA.empty_table(), tmp)
        os.replace(tmp, final)
    # GC superseded shards (after the new ones are visible)
    fresh = shard_epochs(lake_dir, view)
    for p in glob.glob(os.path.join(out_dir, "part=*.parquet")):
        m = _SHARD_RE.search(os.path.basename(p))
        if m and fresh.get(int(m.group(1)), (None, None))[1] != p:
            try:
                os.remove(p)
            except OSError:
                pass
    return {"refreshed": sorted(stale), "fresh": len(pkeys) - len(stale)}


def read_view(lake_dir: str, view: str = DOMAIN_VIEW) -> pd.DataFrame:
    """Combined view: concat the per-partition shards (tiny,
    pre-aggregated) and merge per domain. Reflects the lake as of the
    last :func:`refresh_view`."""
    # a concurrent refresher may GC a listed shard between the glob and the
    # read (it publishes the replacement FIRST, so re-globbing always sees
    # a complete set) — retry the listing on FileNotFoundError
    parts: list[pd.DataFrame] = []
    for _attempt in range(3):
        shards = shard_epochs(lake_dir, view)
        if not shards:
            return pd.DataFrame({"domain": pd.Series([], dtype="object"),
                                 "n_urls": pd.Series([], dtype="int64"),
                                 "n_tokens": pd.Series([], dtype="int64")})
        try:
            parts = [pq.read_table(p).to_pandas() for _, p in shards.values()]
            break
        except FileNotFoundError:
            if _attempt == 2:
                raise
    df = pd.concat(parts, ignore_index=True)
    out = df.groupby("domain", as_index=False, dropna=False).agg(
        n_urls=("n_urls", "sum"), n_tokens=("n_tokens", "sum")
    )
    out["n_urls"] = out["n_urls"].astype("int64")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out.sort_values("domain").reset_index(drop=True)
