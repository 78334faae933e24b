"""Deduplication operators over the ``documents`` table.

The CDC kernel family (SURVEY §2.7) extended to the near-dup operators a
training-data pipeline needs. All are Ray-Data-first:

- exact: vectorized content-hash per batch → hash-partitioned groupby →
  keep the min-doc_id row per hash (deterministic winner);
- MinHash+LSH: shingle→minhash signature per batch (numpy), explode to
  (band, band_hash) rows, groupby band buckets → candidate pairs →
  verified by true Jaccard — only candidate pairs are verified, never the
  full cross product;
- SimHash: 64-bit signatures per batch; near-dup pairs via pigeonhole
  block banding (exact recall for Hamming < blocks);
- n-gram Jaccard: exact pairwise verification within LSH buckets;
- embedding cosine near-dup lives in ``ops.knn``.

Scale: signatures are fixed-width numpy per batch; the only shuffles are
groupbys on hash/band columns (uniformly distributed by construction).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from gene_etl_ray.ops.util import per_process

_TOKEN = re.compile(r"\w+", re.UNICODE)

# per-worker-process cache of broadcast candidate-doc dicts (keyed by
# ObjectRef hex): ray.get deserializes pure-Python dicts on every call
_DOCS_CACHE: dict = {}

# fixed 64-bit mix constants (splitmix64) — deterministic across processes
def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    return x ^ (x >> np.uint64(31))


def _hash_strings(vals: list[str]) -> np.ndarray:
    return pd.util.hash_array(np.asarray(vals, dtype=object), categorize=False)


def content_hash(ds: ray.data.Dataset, column: str = "text") -> ray.data.Dataset:
    """Append a deterministic 64-bit content hash (vectorized)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch["content_hash"] = pd.util.hash_array(
            batch[column].to_numpy(dtype=object), categorize=False
        ).astype("uint64")
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def exact_dedup(
    ds: ray.data.Dataset, column: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Exact dedup: one row per distinct ``column`` value; the winner is the
    min ``id_col`` (deterministic). Hash-partition + per-group first —
    the D1 seen-set check (``validate.py:447-476``) done distributed."""
    hashed = content_hash(ds, column)

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="mergesort").head(1)

    return hashed.groupby("content_hash").map_groups(first, batch_format="pandas")


def _shingles(text: str, k: int) -> set[str]:
    toks = _TOKEN.findall(text.lower())
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


class MinHasher:
    """Stateful minhash stage: permutation constants built once per actor
    (the actor-pool pattern, ST2 analog ``correlate.py:25-33``)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, 2**61, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.randint(0, 2**61, size=num_perm, dtype=np.uint64)
        self.k = shingle_k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if not sh:
            return np.zeros(self.num_perm, dtype=np.uint64)
        h = _hash_strings(sorted(sh))  # (n_shingles,)
        # universal hashing: min over (a*h + b) per permutation
        vals = (h[None, :] * self.a[:, None] + self.b[:, None]) & np.uint64(
            0xFFFFFFFFFFFFFFFF
        )
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch["text"]])
        batch["minhash"] = list(sigs)
        return batch


def minhash_lsh_candidates(
    ds: ray.data.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """MinHash+LSH near-dup candidate pairs, verified by signature
    similarity. Pipeline: signature per doc (actor pool) → explode to one
    (band, band_hash, id) row per band → groupby band bucket → pairs within
    bucket → dedup pairs → estimated Jaccard from full signatures.
    Returns a small pandas frame (id_a, id_b, est_jaccard)."""
    rows_per_band = num_perm // bands
    sigged = ds.map_batches(
        per_process(MinHasher, num_perm=num_perm, shingle_k=shingle_k),
        batch_format="pandas",
    )

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        # ship ONLY (id, band, band_hash) through the shuffle — attaching
        # the full signature to each of the `bands` rows would amplify
        # shuffle volume ~bands-fold; signatures are re-joined for the
        # surviving candidate pairs only. Fully vectorized: reshape the
        # signature matrix to (n, bands, rows_per_band), mix + wrap-sum
        # along the last axis.
        n = len(batch)
        if n == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "band": pd.Series([], dtype="int64"),
                    "band_hash": pd.Series([], dtype="int64"),
                }
            )
        sig = np.stack(batch["minhash"].to_numpy()).astype(np.uint64)
        mixed = _mix64(sig.reshape(n, bands, rows_per_band))
        bh = mixed.sum(axis=2, dtype=np.uint64).astype(np.int64)  # 2^64 wrap
        return pd.DataFrame(
            {
                id_col: np.repeat(batch[id_col].to_numpy(), bands),
                "band": np.tile(np.arange(bands, dtype=np.int64), n),
                "band_hash": bh.ravel(),
            }
        )

    # persist (id, signature) to scratch parquet ONCE: both the band
    # explode and the candidate verification read it back — nothing pins
    # O(corpus) signature bytes in the object store for the query's
    # lifetime (at 10^10 docs the pinned set would be terabytes)
    import shutil
    import tempfile

    # Scratch location: single-node defaults to /tmp; on a MULTI-NODE
    # cluster point GENE_ETL_SCRATCH at shared storage (same requirement
    # as the lake itself) — write tasks run on arbitrary nodes and the
    # re-read resolves paths from the driver.
    import os as _os

    scratch_root = _os.environ.get("GENE_ETL_SCRATCH", "/tmp")
    sig_dir = tempfile.mkdtemp(prefix="minhash_sigs_", dir=scratch_root)

    def to_arrow_sigs(b: pd.DataFrame) -> pa.Table:
        # explicit fixed_size_list<uint64> — a pandas column of ndarrays
        # would round-trip through Ray's tensor extension, whose dtype
        # string doesn't survive a parquet write+read
        n = len(b)
        sig = (
            np.stack(b["minhash"].to_numpy()).astype(np.uint64)
            if n
            else np.zeros((0, num_perm), np.uint64)
        )
        return pa.table(
            {
                id_col: pa.array(b[id_col].to_numpy(), pa.int64()),
                "minhash": pa.FixedSizeListArray.from_arrays(
                    pa.array(sig.ravel(), pa.uint64()), num_perm
                ),
            }
        )

    try:
        sigged.map_batches(to_arrow_sigs, batch_format="pandas").write_parquet(sig_dir)
        sig_ds = ray.data.read_parquet(sig_dir)
        exploded = sig_ds.map_batches(explode, batch_format="pandas")
        return _candidates_from_bands(exploded, sig_ds, id_col)
    finally:
        shutil.rmtree(sig_dir, ignore_errors=True)


def _candidates_from_bands(
    exploded: ray.data.Dataset, sig_ds: ray.data.Dataset, id_col: str
) -> pd.DataFrame:

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64"),
                }
            )
        ids = np.sort(g[id_col].to_numpy())
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj]})

    pairs = (
        exploded.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
    pairs = pairs.drop_duplicates().reset_index(drop=True)
    # signature lookup for candidate ids only (the small surviving set).
    # Arrow-side filter: keeps `minhash` a fixed-size-list column (an
    # empty pandas block with an object column trips Ray's block-size
    # estimator — the BENCH_r01 'cannot call vectorize' log noise)
    need_arr = pa.array(sorted(set(pairs["id_a"]) | set(pairs["id_b"])))
    sig_df = (
        sig_ds.map_batches(
            lambda b: b.select([id_col, "minhash"]).filter(
                pc.is_in(b.column(id_col), value_set=need_arr)
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    sig_of = dict(zip(sig_df[id_col], sig_df["minhash"]))
    sa = np.stack([sig_of[i] for i in pairs["id_a"]])
    sb = np.stack([sig_of[i] for i in pairs["id_b"]])
    pairs["est_jaccard"] = (sa == sb).mean(axis=1)
    return pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def near_dup_clusters(
    ds: ray.data.Dataset,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    max_rounds: int = 20,
) -> pd.DataFrame:
    """Near-duplicate CLUSTERS: MinHash-LSH candidate pairs above
    ``threshold`` → connected components by iterative min-label
    propagation. Each round: broadcast the current (small) label map into
    a vectorized edge relabel, then a groupby-min over (node, candidate
    label) — the distributed pattern; converges in ≤ graph-diameter
    rounds. Returns (id, cluster_id) for every doc in some cluster, where
    cluster_id = min doc id of the component."""
    pairs = minhash_lsh_candidates(
        ds, num_perm=num_perm, bands=bands, shingle_k=shingle_k, id_col=id_col
    )
    pairs = pairs[pairs["est_jaccard"] >= threshold]
    return connected_components(pairs, id_col=id_col, max_rounds=max_rounds)


def connected_components(
    pairs: pd.DataFrame, id_col: str = "doc_id", max_rounds: int = 20
) -> pd.DataFrame:
    """Connected components over an (id_a, id_b) pair frame via iterative
    min-label propagation (distributed relabel + groupby-min per round).
    Returns (id, cluster_id = min id of the component) for every node in
    some pair. Shared by near_dup_clusters and the curation pipeline."""
    if pairs.empty:
        return pd.DataFrame({id_col: [], "cluster_id": []})
    edges = pd.concat(
        [
            pairs.rename(columns={"id_a": "src", "id_b": "dst"})[["src", "dst"]],
            pairs.rename(columns={"id_b": "src", "id_a": "dst"})[["src", "dst"]],
        ],
        ignore_index=True,
    )
    edges_ds = ray.data.from_pandas(edges)
    labels = {n: n for n in set(edges["src"])}
    for _ in range(max_rounds):
        lab = dict(labels)  # broadcast once per round (tiny: one int/node)

        def relabel(b: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {"node": b["dst"].to_numpy(), "label": b["src"].map(lab).to_numpy()}
            )
            return out

        msgs = (
            edges_ds.map_batches(relabel, batch_format="pandas")
            .groupby("node")
            .map_groups(
                lambda g: pd.DataFrame(
                    {"node": [g["node"].iloc[0]], "label": [g["label"].min()]}
                ),
                batch_format="pandas",
            )
            .to_pandas()
        )
        # vectorized label update (one map + min per round; the label map
        # is one int per node IN SOME DUP CLUSTER — at web scale dup
        # families are a small fraction of the corpus, which is the
        # partitioning assumption this driver-held map relies on)
        cur = pd.Series(labels)
        prop = msgs.set_index("node")["label"]
        nxt = pd.concat([cur, prop]).groupby(level=0).min()
        # pointer-jumping (path compression): follow label→label chains
        # to their current minimum so convergence is O(log diameter)
        # rounds, not O(diameter) — a 10^6-long near-dup chain would
        # otherwise exhaust max_rounds and silently mislabel
        while True:
            ll = nxt.map(nxt)
            jumped = np.minimum(nxt, ll.fillna(nxt))
            if (jumped == nxt).all():
                break
            nxt = jumped
        changed = bool((nxt < cur.reindex(nxt.index)).any())
        labels = nxt.to_dict()
        if not changed:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "— raise max_rounds (labels would be silently wrong)"
        )
    out = pd.DataFrame(
        {id_col: list(labels), "cluster_id": [labels[n] for n in labels]}
    )
    return out.sort_values([id_col]).reset_index(drop=True)


class SimHasher:
    """64-bit SimHash signatures (token-hash bit voting), built per actor."""

    def __init__(self, seed: int = 11):
        self.seed = seed
        self._bits = np.arange(64, dtype=np.uint64)

    def signature(self, text: str) -> int:
        toks = _TOKEN.findall(text.lower())
        if not toks:
            return 0
        h = _hash_strings(toks)
        bits = ((h[:, None] >> self._bits[None, :]) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        return int(((votes > 0).astype(np.uint64) << self._bits).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["simhash"] = [self.signature(t) for t in batch["text"]]
        return batch


def simhash_signatures(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(per_process(SimHasher), batch_format="pandas")


def ngram_jaccard_pairs(
    ds: ray.data.Dataset, threshold: float = 0.5, shingle_k: int = 3, id_col: str = "doc_id"
) -> pd.DataFrame:
    """Exact n-gram Jaccard similarity over MinHash-LSH candidate pairs —
    LSH prunes the quadratic space; only candidates are verified with true
    shingle sets (broadcast doc lookup)."""
    cand = minhash_lsh_candidates(ds, shingle_k=shingle_k, id_col=id_col)
    if cand.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    need = set(cand["id_a"]) | set(cand["id_b"])
    need_arr = pa.array(list(need))
    docs = (
        ds.map_batches(
            lambda b: b.filter(
                pc.is_in(b.column(id_col), value_set=need_arr)
            ).select([id_col, "text"]),
            batch_format="pyarrow",
        )
        .to_pandas()
        .set_index(id_col)["text"]
        .to_dict()
    )
    # verification runs distributed over the candidate-pair list (a
    # map_batches stage, not a driver loop); the candidate-doc lookup is
    # put to the object store ONCE, and each worker process deserializes
    # it ONCE (module-level cache keyed by ref) — not once per task
    docs_ref = ray.put(docs)

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        key = docs_ref.hex()
        dd = _DOCS_CACHE.get(key)
        if dd is None:
            dd = _DOCS_CACHE[key] = ray.get(docs_ref)
        cache: dict[int, set[str]] = {}

        def sh(i: int) -> set[str]:
            if i not in cache:
                cache[i] = _shingles(dd[i], shingle_k)
            return cache[i]

        rows = []
        for ia, ib in zip(b["id_a"].to_numpy(), b["id_b"].to_numpy()):
            sa, sb = sh(ia), sh(ib)
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                rows.append((ia, ib, j))
        if not rows:
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64"),
                    "jaccard": pd.Series([], dtype="float64"),
                }
            )
        return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])

    out = (
        ray.data.from_pandas(cand[["id_a", "id_b"]])
        .map_batches(verify, batch_format="pandas", batch_size=4096)
        .to_pandas()
    )
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def simhash_near_dup_pairs(
    ds: ray.data.Dataset,
    max_hamming: int = 3,
    blocks: int = 4,
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """SimHash near-dup PAIRS with exact recall for the given radius:
    split each 64-bit signature into ``blocks`` equal bit-blocks — two
    signatures within Hamming distance < ``blocks`` must share at least
    one identical block (pigeonhole), so grouping on (block_idx,
    block_value) surfaces every such pair; candidates are then verified
    by full Hamming distance. One shuffle, candidate-only verification —
    no all-pairs anywhere."""
    if not (0 < blocks <= 64) or 64 % blocks:
        raise ValueError("blocks must divide 64")
    if max_hamming >= blocks:
        raise ValueError(
            "pigeonhole recall guarantee requires max_hamming < blocks"
        )
    width = 64 // blocks
    mask = (1 << width) - 1
    sigged = simhash_signatures(ds)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        if n == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "simhash": pd.Series([], dtype="int64"),
                    "blk": pd.Series([], dtype="int64"),
                    "blk_val": pd.Series([], dtype="int64"),
                }
            )
        sig = b["simhash"].to_numpy(dtype=np.uint64)
        out_blk = np.tile(np.arange(blocks, dtype=np.int64), n)
        shifts = (np.arange(blocks, dtype=np.uint64) * np.uint64(width))
        vals = ((sig[:, None] >> shifts[None, :]) & np.uint64(mask)).astype(np.int64)
        return pd.DataFrame(
            {
                id_col: np.repeat(b[id_col].to_numpy(), blocks),
                "simhash": np.repeat(sig.astype(np.int64), blocks),
                "blk": out_blk,
                "blk_val": vals.ravel(),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "hamming": pd.Series([], dtype="int64"),
            }
        )
        if len(g) < 2:
            return empty
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        sig = g["simhash"].to_numpy().astype(np.uint64)
        ii, jj = np.triu_indices(len(ids), k=1)
        x = sig[ii] ^ sig[jj]
        # popcount via uint8 view (no np.bit_count dependency)
        ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
        keep = ham <= max_hamming
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "id_a": ids[ii[keep]],
                "id_b": ids[jj[keep]],
                "hamming": ham[keep].astype(np.int64),
            }
        )

    out = (
        sigged.map_batches(explode, batch_format="pandas")
        .groupby(["blk", "blk_val"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "hamming": pd.Series([], dtype="int64"),
            }
        )
    return (
        out.drop_duplicates(["id_a", "id_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def dedup_chunks(
    ds: ray.data.Dataset,
    chunk_tokens: int = 15,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Cross-document CHUNK-level dedup (the CCNet/RefinedWeb passage
    pattern): every document is split into fixed ``chunk_tokens``-token
    chunks, a chunk that appears in >= ``min_docs`` DISTINCT documents is
    removed from ALL of them, and each document is reassembled from its
    surviving chunks in order (documents with nothing left are dropped).
    Boilerplate/template passages shared across pages vanish corpus-wide
    without deleting the unique remainder of any page.

    Two passes, both streaming:

    1. frequency: per-batch distinct (chunk, doc) pairs are the combiner,
       ONE groupby on the chunk text counts distinct docs; only chunks at
       or above the threshold — the duplicated tail, tiny relative to the
       corpus — are gathered and broadcast via ``ray.put`` (for key sets
       too large to gather, swap the exact set for ``build_bloom`` +
       exact re-verify, the same composite the semi-join path uses).
    2. rewrite: a second pass over the corpus re-chunks each doc, drops
       banned chunks, and reassembles — no shuffle at all.

    Reference capability family: composite-key uniqueness / dedup
    (models.py keyed-results uniqueness), re-expressed at passage
    granularity for webtext.
    """

    def chunks_of(text: str) -> list[str]:
        toks = text.split(" ")
        return [
            " ".join(toks[i : i + chunk_tokens])
            for i in range(0, len(toks), chunk_tokens)
        ]

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        ids, chs = [], []
        for did, txt in zip(b[id_col].to_numpy(), b[text_col]):
            for ch in chunks_of(txt):
                ids.append(did)
                chs.append(ch)
        return pd.DataFrame({"chunk": chs, id_col: ids}).drop_duplicates()

    def ndocs(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g[id_col].nunique())
        if n < min_docs:
            return pd.DataFrame({"chunk": pd.Series([], dtype="object")})
        return pd.DataFrame({"chunk": [g["chunk"].iloc[0]]})

    banned = (
        ds.map_batches(pairs, batch_format="pandas")
        .groupby("chunk")
        .map_groups(ndocs, batch_format="pandas")
        .to_pandas()["chunk"]
    )
    banned_ref = ray.put(frozenset(banned))

    def rewrite(b: pd.DataFrame) -> pd.DataFrame:
        ban = ray.get(banned_ref)
        out_ids, out_txt, out_n = [], [], []
        for did, txt in zip(b[id_col].to_numpy(), b[text_col]):
            kept = [c for c in chunks_of(txt) if c not in ban]
            if kept:
                out_ids.append(did)
                out_txt.append(" ".join(kept))
                out_n.append(len(kept))
        return pd.DataFrame(
            {
                id_col: pd.Series(out_ids, dtype="int64"),
                "text_clean": pd.Series(out_txt, dtype="object"),
                "n_chunks_kept": pd.Series(out_n, dtype="int64"),
            }
        )

    return ds.map_batches(rewrite, batch_format="pandas")
