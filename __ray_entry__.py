"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC ingest pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose the operator registry
(gene_etl_ray.queries) for the driver's DuckDB correctness gate.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in gene_etl_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: derive a deterministic
    CDC change log from the documents table, ingest it through the full
    engine (normalize → extract → partition → LWW merge → manifest
    commit), return the live lake table."""
    from gene_etl_ray.queries import cdc_ingest_lake

    return cdc_ingest_lake("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from gene_etl_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from gene_etl_ray.queries import (
        ORACLE_SQL,
        cdc_diff_oracle_sql,
        cdc_domain_stats_oracle_sql,
        cdc_expiry_oracle_sql,
        cdc_late_dl_oracle_sql,
        cdc_late_oracle_sql,
        cdc_mux_oracle_sql,
        cdc_oracle_sql,
        cdc_scd2_oracle_sql,
        cdc_since_oracle_sql,
        csv_events_oracle_sql,
        jsonl_events_oracle_sql,
    )

    d = dict(ORACLE_SQL)
    # the driver's gate runs at sf0.01; cdc_oracle_sql generates the
    # deterministic change log (idempotent) so DuckDB can read the same
    # files the engine ingests, regardless of query/oracle run order
    d["cdc_ingest_lake"] = cdc_oracle_sql("/root/testdata/sf0.01")
    d["cdc_snapshot_diff"] = cdc_diff_oracle_sql("/root/testdata/sf0.01")
    # multi-producer shards muxed into one consumer WAL: the oracle
    # replays the MUXED files, gating renumbering + envelope restamp
    d["cdc_mux_ingest"] = cdc_mux_oracle_sql("/root/testdata/sf0.01")
    # mid-stream partition scale-out must converge to the SAME final
    # state — identical LWW oracle, layout-independent by construction
    d["cdc_repartitioned_lake"] = cdc_oracle_sql("/root/testdata/sf0.01")
    # recency feed: live rows whose winning warc_ts >= T (zone-map read)
    d["cdc_changed_since"] = cdc_since_oracle_sql("/root/testdata/sf0.01")
    # event-time lateness contract: watermark-rejected events must be
    # absent from the lake (SQL simulates the per-group watermark with
    # window functions) and present — with reason — in the dead-letter sink
    d["cdc_lateness_lake"] = cdc_late_oracle_sql("/root/testdata/sf0.01")
    d["cdc_late_dead_letters"] = cdc_late_dl_oracle_sql("/root/testdata/sf0.01")
    # incremental materialized view == full recomputation from the log
    d["cdc_domain_stats_view"] = cdc_domain_stats_oracle_sql("/root/testdata/sf0.01")
    # retention expiry as change data: the twin replays the consumer WAL
    # INCLUDING the TTL deletion segment the engine emitted
    d["cdc_expired_lake"] = cdc_expiry_oracle_sql("/root/testdata/sf0.01")
    # SCD2 audit trail: validity intervals over the same change log
    d["cdc_scd2_history"] = cdc_scd2_oracle_sql("/root/testdata/sf0.01")
    # source-format parity: the oracle reads the IDENTICAL JSONL/CSV
    # files the engine reads (builders idempotently derive them)
    d["events_jsonl_hourly"] = jsonl_events_oracle_sql("/root/testdata/sf0.01")
    d["events_csv_type_stats"] = csv_events_oracle_sql("/root/testdata/sf0.01")
    return d
