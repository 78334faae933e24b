"""gene_etl_ray — a Ray-Data-native CDC / incremental-ingest engine.

Built from scratch on ray.data.Dataset pipelines (map_batches over
zero-copy Arrow batches, actor pools for stateful stages, groupby-style
hash shuffles). Reproduces the capability surface of the reference
batch-ETL system (jrapisarda/gene-etl — keyed idempotent sink, batch/epoch
identity, checkpoint/resume, partitioned parallelism, stateful per-worker
compute, pre/post validation, lineage) re-instantiated as a CDC engine:

- WAL-style change log (insert/update/delete keyed by ``url``) read as
  zero-copy Arrow via ``ray.data.read_parquet``;
- deterministic stateful html→text extraction in map_batches actor pools;
- hash-partitioning on ``url`` with explicit hot-key salting;
- last-writer-wins merge on ``(warc_ts, seq)`` with tombstones;
- additive schema evolution (null-backfill + type widening);
- two-phase manifest commit (temp file → fsync → rename → manifest) for
  exactly-once semantics;
- per-partition high-watermark checkpoints + lineage records so a killed
  job resumes and converges to a byte-identical final state.

No code is ported from the reference; docstrings cite reference
``file:line`` spans only to document capability parity.
"""

from gene_etl_ray.config import EngineConfig, config_hash
from gene_etl_ray.schema import EVENT_SCHEMA, lake_schema_for

__all__ = ["EngineConfig", "config_hash", "EVENT_SCHEMA", "lake_schema_for"]
__version__ = "0.3.0"
