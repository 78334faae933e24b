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

import numpy as np
import pandas as pd
import ray
import ray.data

from gene_etl_ray.ops import dedup

#: Survivor-row bound for select_training_corpus's fused in-task fast
#: path (stages 2-4 on the slim 5-column table): below it, one worker
#: task replaces ~6 fixed-cost Dataset executions; above it, the
#: distributed cap/budget/split path runs. 2M slim rows ≈ 150 MB in
#: one task — the KNN_INTASK_ROWS convention.
SELECT_INTASK_ROWS = 2_000_000

#: Novelty-survivor id-set bound for the broadcast semi filter in
#: select_training_corpus: below it the sorted int64 id array ships
#: once via ray.put (≤ ~40 MB) and the semi join is a shuffle-free
#: searchsorted; above it the partitioned semi join runs.
KEPT_BROADCAST_ROWS = 5_000_000


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


def prepare_training_sequences(
    ds: ray.data.Dataset,
    *,
    lang: str = "en",
    min_chars: int = 100,
    max_chars: int = 20000,
    max_upper_ratio: float = 0.3,
    max_dup_word_frac: float = 0.6,
    max_top_bigram_frac: float = 0.12,
    decon_min_hits: int = 2,
    bench_mod: int = 97,
    budget: int = 256,
    bucket_size: int = 32,
    id_col: str = "doc_id",
) -> "pd.DataFrame":
    """END-TO-END training-data preparation — the full preprocessing
    chain a pretraining corpus runs, each stage the engine's own
    operator: quality gate → Gopher repetition gate → benchmark
    decontamination (bench grams from the FULL corpus, scored on the
    survivors) → exact dedup (min-id winner) → greedy sequence packing.
    Returns the per-sequence fill table (bucket, seq_id, n_docs,
    seq_tokens) — the batch plan a trainer would consume.

    Every stage is a shuffle-free map_batches pass except the dedup
    groupby and the pack's bounded-key bucket shuffle; document text
    flows only until dedup, after which just (id, n_tokens) rows move.
    Deterministic end to end, so the WHOLE chain has a DuckDB oracle
    (queries.TRAINING_PIPELINE_SQL: the gates as chained CTEs, the pack
    as a recursive per-bucket row_number chain)."""
    from gene_etl_ray.ops.text import (
        decontaminate,
        pack_sequences,
        quality_filter_frame,
        repetition_stats,
    )

    def quality(b):
        return quality_filter_frame(
            b, lang=lang, min_chars=min_chars, max_chars=max_chars,
            max_upper_ratio=max_upper_ratio,
        ).select([id_col, "text"])

    q = ds.map_batches(quality, batch_format="pyarrow")

    def rep_gate(b: pd.DataFrame) -> pd.DataFrame:
        keep = (b["dup_word_frac"] <= max_dup_word_frac) & (
            b["top_bigram_frac"] < max_top_bigram_frac
        )
        return b.loc[keep, [id_col, "text"]]

    r = repetition_stats(q, id_col=id_col, keep_columns=True).map_batches(
        rep_gate, batch_format="pandas"
    )

    def decon_gate(b: pd.DataFrame) -> pd.DataFrame:
        keep = ~b["contaminated"] & ~b["is_benchmark"]
        return b.loc[keep, [id_col, "text"]]

    c = decontaminate(
        r, id_col=id_col, min_hits=decon_min_hits, bench_mod=bench_mod,
        bench_ds=ds, keep_columns=True,
    ).map_batches(decon_gate, batch_format="pandas")

    surv = dedup.exact_dedup(c, column="text", id_col=id_col)
    return (
        pack_sequences(surv, id_col=id_col, budget=budget, bucket_size=bucket_size)
        .to_pandas()
        .sort_values(["bucket", "seq_id"])
        .reset_index(drop=True)
    )


def select_training_corpus(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    cap_per_source: int = 150,
    budget_halves: tuple[int, int] = (1, 2),
) -> pd.DataFrame:
    """The SELECTION half of corpus prep, chained the way a pretraining
    recipe runs it (the cleaning half is ``prepare_training_sequences``):

      1. novelty gate — keep docs whose distinct trigrams are ≥ half
         novel (``2·n_novel ≥ n_distinct``, integer-exact: boilerplate
         reshuffles drop, original text stays),
      2. domain cap — top ``cap_per_source`` docs per source by
         (n_chars DESC, id): no domain dominates,
      3. token budget — the best survivors until half the surviving
         whitespace tokens are spent (two-pass threshold search),
      4. deterministic 80/10/10 split assignment.

    Every stage is deterministic and integer-thresholded, so the WHOLE
    composition sits under one value-hash oracle
    (SELECT_CORPUS_SQL). Text is read for the novelty/token kernels
    and dropped before anything exchanges: the cap/budget/split stages
    move only (id, source, n_chars, n_tokens_ws) rows."""
    from gene_etl_ray.ops.relational import partitioned_join
    from gene_etl_ray.ops.select import (
        assign_split,
        per_group_cap,
        token_budget_select,
    )
    from gene_etl_ray.ops.text import novelty_score, token_count_ws

    # stage 1: novelty gate (integer-exact compare; ids only exchange)
    nov = novelty_score(ds, id_col=id_col, text_col=text_col)

    def keep_novel(b: pd.DataFrame) -> pd.DataFrame:
        m = 2 * b["n_novel"].to_numpy() >= b["n_distinct"].to_numpy()
        return b.loc[m, [id_col]]

    # checkpoint both semi-join inputs: id-only / 4-scalar-per-doc
    # tables (object store + spill holds them at any corpus size). The
    # join's sort otherwise re-executes the novelty shuffle and the
    # full-text token pass once per downstream consumption — measured
    # ~2x the composite's wall at sf0.1.
    kept = nov.map_batches(keep_novel, batch_format="pandas").materialize()

    # slim row shape for every later stage: text never leaves this pass
    slim = token_count_ws(ds).select_columns(
        [id_col, source_col, "n_chars", "n_tokens_ws"]
    ).materialize()
    n_kept = kept.count()
    if n_kept <= KEPT_BROADCAST_ROWS:
        # small survivor-id set: broadcast a sorted id array once
        # (ray.put) and semi-filter with a vectorized searchsorted —
        # no exchange at all, replacing the partitioned join's fixed
        # union+shuffle execution (~1.5 s at bench scale). Above the
        # bound (novelty keeps most of a 10^10-doc corpus), the
        # partitioned semi join runs as before.
        kept_ids = np.sort(
            kept.to_pandas()[id_col].to_numpy(np.int64)
        ) if n_kept else np.empty(0, np.int64)
        idref = ray.put(kept_ids)

        def semi(b: pd.DataFrame) -> pd.DataFrame:
            ids_sorted = ray.get(idref)
            if not ids_sorted.size:
                return b.iloc[0:0]
            v = b[id_col].to_numpy(np.int64)
            pos = np.searchsorted(ids_sorted, v)
            posc = np.minimum(pos, ids_sorted.size - 1)
            return b[(pos < ids_sorted.size) & (ids_sorted[posc] == v)]

        s1 = slim.map_batches(semi, batch_format="pandas")
    else:
        s1 = partitioned_join(slim, kept, id_col, id_col, how="semi")

    s1 = s1.materialize()
    n_survivors = s1.count()

    if n_survivors <= SELECT_INTASK_ROWS:
        # bounded-survivor fast path (the KNN_INTASK_ROWS convention):
        # stages 2-4 are pure functions of the SLIM survivor table
        # (4 scalars + source per doc) — below the bound, ONE worker
        # task resolves the block refs and fuses cap → budget → split
        # in pandas, replacing ~6 fixed-cost Dataset executions (the
        # dominant cost of this composite at bench scale, r4 verdict
        # item 8). Refs resolve inside the task; the driver receives
        # only the final selected frame, which is this function's
        # return value anyway. Semantics pinned equal to the
        # distributed path by tests/test_select.py.
        import ray as _ray

        cap_k = cap_per_source
        h0, h1 = budget_halves

        @_ray.remote(num_cpus=1)
        def fused(*parts: pd.DataFrame) -> pd.DataFrame:
            df = pd.concat(list(parts), ignore_index=True)
            if not len(df):
                return pd.DataFrame(
                    columns=[id_col, source_col, "n_chars",
                             "n_tokens_ws", "split"])
            # stage 2: per-source cap, best-first (n_chars DESC, id)
            df = df.sort_values(
                [source_col, "n_chars", id_col],
                ascending=[True, False, True], kind="mergesort")
            df = df.groupby(source_col, sort=False).head(cap_k)
            # stage 3: maximal (score DESC, id) prefix within budget —
            # the QUALIFY running-sum definition token_budget_select
            # implements distributed
            total = int(df["n_tokens_ws"].sum())
            budget = (h0 * total) // h1
            df = df.sort_values(
                ["n_chars", id_col], ascending=[False, True],
                kind="mergesort")
            df = df[df["n_tokens_ws"].cumsum() <= budget]
            # stage 4: deterministic split (assign_split's hash)
            ids = df[id_col].to_numpy(np.uint64)
            b = ((ids * np.uint64(2654435761)) % np.uint64(2**32)) \
                % np.uint64(100)
            df = df.assign(split=np.where(
                b < 80, "train", np.where(b < 90, "valid", "test")))
            return df.reset_index(drop=True)

        refs = s1.to_pandas_refs()
        out = (
            pd.DataFrame(ray.get(fused.remote(*refs)))
            if refs
            else pd.DataFrame(
                columns=[id_col, source_col, "n_chars",
                         "n_tokens_ws", "split"])
        )
    else:
        # stage 2: domain cap (consumes the semi output once — its own
        # bucketed exchange re-sorts over the checkpointed survivors)
        s2 = per_group_cap(
            s1,
            [source_col], cap_per_source, ["n_chars", id_col], [False, True]
        )

        # stage 3: token budget = half the survivors' tokens (exact
        # ints). Checkpoint the slim survivor table first: the budget
        # op consumes its input up to four times (total, score sums,
        # tie pass, final filter) and each lazy re-execution would
        # otherwise re-run the novelty shuffle. The table is 4 scalar
        # columns per doc — object store (with spill) holds it at any
        # corpus the cluster can hold.
        s2 = s2.materialize()
        total = int(s2.sum("n_tokens_ws") or 0)
        budget = (budget_halves[0] * total) // budget_halves[1]
        s3 = token_budget_select(
            s2, "n_chars", "n_tokens_ws", budget, id_col=id_col)

        # stage 4: split
        out = assign_split(s3, id_col=id_col).to_pandas()
    if out.empty:  # Ray wart: empty to_pandas() drops the schema
        out = pd.DataFrame(
            columns=[id_col, source_col, "n_chars", "n_tokens_ws", "split"]
        )
    out = (
        out[[id_col, source_col, "n_chars", "n_tokens_ws", "split"]]
        .sort_values(id_col)
        .reset_index(drop=True)
    )
    # the semi join's union-schema null-fill floats the int columns of
    # whichever side lacks them — restore the contract dtypes
    for c in (id_col, "n_chars", "n_tokens_ws"):
        out[c] = out[c].astype("int64")
    return out
