"""Corpus curation: the composite training-data preparation pipeline.

quality filter → exact dedup → near-dup cluster removal, each stage the
engine's own operator, composed the way a 100-TB pretraining-corpus
cleanup actually runs (reference analog: the chained filter pipeline,
``filters.py:184-229``; the dedup/uniqueness sink, ``persist.py:164-177``):

1. quality gate — vectorized predicate chain over derived columns
   (language, length bounds, shouting ratio);
2. exact dedup — content-hash groupby, min-doc_id winner;
3. near-dup removal — MinHash-LSH candidates exactly verified by
   trigram Jaccard ≥ threshold, connected components by min-label
   propagation, one survivor (min doc_id) per duplicate family.

Every stage is deterministic, so the WHOLE pipeline has a DuckDB oracle
(queries.CURATION_SQL): the quality/dedup stages as plain SQL, the
component stage as a recursive transitive-closure CTE.

Scale: stage outputs are checkpointed to scratch parquet between stages
(the survivors dataset is consumed three times downstream: signature
pass, candidate-doc lookup, final anti-filter — re-reading a checkpoint
beats re-executing the lineage, and nothing pins the object store).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
import ray.data

from gene_etl_ray.ops import dedup


def curate_documents(
    ds: ray.data.Dataset,
    lang: str = "en",
    min_chars: int = 100,
    max_chars: int = 20000,
    max_upper_ratio: float = 0.3,
    jaccard_threshold: float = 0.9,
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """Run the full curation pipeline; returns the surviving doc ids
    (sorted) — the curated-corpus membership list."""

    from gene_etl_ray.ops.text import quality_filter_frame

    def quality(b):
        return quality_filter_frame(
            b, lang=lang, min_chars=min_chars, max_chars=max_chars,
            max_upper_ratio=max_upper_ratio,
        ).select([id_col, "text"])

    q = ds.map_batches(quality, batch_format="pyarrow")
    deduped = dedup.exact_dedup(q, column="text", id_col=id_col)

    scratch_root = os.environ.get("GENE_ETL_SCRATCH", "/tmp")
    ckpt = tempfile.mkdtemp(prefix="curate_dedup_", dir=scratch_root)
    try:
        deduped.select_columns([id_col, "text"]).write_parquet(ckpt)
        survivors = ray.data.read_parquet(ckpt)
        pairs = dedup.ngram_jaccard_pairs(
            survivors, threshold=jaccard_threshold, id_col=id_col
        )
        comp = dedup.connected_components(pairs, id_col=id_col)
        losers = (
            set(comp.loc[comp[id_col] != comp["cluster_id"], id_col].astype(int))
            if not comp.empty
            else set()
        )
        out = (
            survivors.map_batches(
                lambda b: b.loc[~b[id_col].isin(losers), [id_col]],
                batch_format="pandas",
            )
            .to_pandas()
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    if id_col not in out.columns:
        # zero survivors: the empty checkpoint reads back schemaless
        return pd.DataFrame({id_col: pd.Series([], dtype="int64")})
    out[id_col] = out[id_col].astype("int64")
    return out.sort_values(id_col).reset_index(drop=True)
