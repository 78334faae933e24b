"""Corpus-selection operators for training-data curation: global
token-budget selection, per-group caps, and deterministic mixture
sampling. Reference analog: the reference selects rows only by static
predicates (``etl/filters.py``); these extend that to the
data-dependent selection policies a webtext pipeline runs before
training (budgeted prefix by quality, domain caps, source mixing) —
each deterministic, so exact membership is SQL-oracle-checkable.

All three are designed for the 100-TB shape:

- ``token_budget_select`` never sorts or materializes the corpus: two
  small aggregation passes compute a global ``(score, id)`` cut point
  on the driver (bytes ~ distinct scores + one id-bucket table), then
  one broadcast filter selects. No all-to-all over the data.
- ``per_group_cap`` is one hash-bucketed exchange with vectorized
  in-bucket head(k) — the grouped top-k shape.
- ``mixture_sample`` computes per-group keep-rates from a tiny counts
  groupby in exact integer arithmetic and filters by multiplicative
  hash — no shuffle of the data at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from gene_etl_ray.ops.dedup import bucketed_group_apply

_KNUTH = 2654435761  # multiplicative hash constant (shared with
# relational.deterministic_sample so SQL twins stay uniform)


def token_budget_select(
    ds: ray.data.Dataset,
    score_col: str,
    tokens_col: str,
    budget: int,
    id_col: str = "doc_id",
    tie_buckets: int = 4096,
) -> ray.data.Dataset:
    """Keep the maximal prefix of rows — ordered by ``(score_col`` DESC,
    ``id_col`` ASC) — whose inclusive running ``tokens_col`` sum stays
    ≤ ``budget``: "take the best documents until the token budget is
    full", the selection every LLM pre-training mix ends with.
    Equivalent SQL: ``QUALIFY SUM(tokens) OVER (ORDER BY score DESC,
    id) <= budget``.

    Distributed as a threshold search, NOT a global sort:

    1. one small groupby computes per-score token sums; the driver
       prefix-scans the distinct-score table (descending) to find the
       boundary score ``s*`` — the first score class that overflows.
       Driver bytes = O(distinct scores): exact for integer-quantized
       scores (the intended use); a continuous score would need a
       weighted-quantile sketch in this slot.
    2. the tie class ``score == s*`` is resolved by id without
       gathering it: a second groupby over ``id // bucket_width``
       sub-buckets prefix-scans bucket sums on the driver, and only
       the single boundary bucket's rows (≤ n_ties / tie_buckets) are
       pulled to pick the exact cut id.
    3. one broadcast ``(s*, cut_id)`` filter selects; each row is
       read twice and moved zero times.

    Scores/tokens must be integers (driver arithmetic is exact Python
    int; float scores would also hit DuckDB float-boundary divergence
    in the oracle). Ties beyond ``id_col`` don't exist (ids unique).
    """
    # pass 1: per-score token sums + per-score max id (combiner inside
    # map_batches keeps the exchange at distinct-score size, not rows;
    # the max id seeds the tie pass's bucket width without re-scanning)
    def score_partials(t: pa.Table) -> pa.Table:
        g = t.group_by(score_col).aggregate(
            [(tokens_col, "sum"), (id_col, "max")]
        )
        return pa.table(
            {
                "score": g.column(score_col),
                "tok": g.column(f"{tokens_col}_sum"),
                "mid": g.column(f"{id_col}_max"),
            }
        )

    # the partials are already combined per batch (≤ distinct scores per
    # block), so the final merge is a driver-side pandas groupby — the
    # grouped_aggregate_partial contract (O(distinct scores × blocks)
    # driver bytes) — instead of paying a distributed sort for a table
    # this small (measured ~1.5 s fixed per Ray sort at any size)
    parts = ds.map_batches(score_partials, batch_format="pyarrow").to_pandas()
    per_score = (
        parts.groupby("score", as_index=False)
        .agg(tok=("tok", "sum"), mid=("mid", "max"))
        .sort_values("score", ascending=False)
    )
    scores = per_score["score"].to_numpy()
    sums = [int(v) for v in per_score["tok"].to_numpy()]
    mids = [int(v) for v in per_score["mid"].to_numpy()]
    budget = int(budget)

    cum = 0
    s_star = None
    remaining = 0
    tie_max_id = 0
    for s, tok, mid in zip(scores, sums, mids):
        if cum + tok > budget:
            s_star = s
            remaining = budget - cum  # budget left for the tie class
            tie_max_id = mid
            break
        cum += tok
    if s_star is None:
        return ds  # everything fits

    s_star_py = int(s_star)

    def keep_filter(cut_id: int | None):
        # score > s* always kept; ties kept up to cut_id (None: no ties)
        def fn(t: pa.Table) -> pa.Table:
            sc = t.column(score_col)
            m = pc.greater(sc, s_star_py)
            if cut_id is not None:
                tie = pc.and_(
                    pc.equal(sc, s_star_py),
                    pc.less_equal(t.column(id_col), cut_id),
                )
                m = pc.or_(m, tie)
            return t.filter(m)

        return fn

    if remaining <= 0:
        return ds.map_batches(keep_filter(None), batch_format="pyarrow")

    # pass 2: resolve the tie class by id via bucketed prefix sums
    ties = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column(score_col), s_star_py)),
        batch_format="pyarrow",
    ).select_columns([id_col, tokens_col])

    width = max(1, (tie_max_id + tie_buckets) // tie_buckets)

    def tie_partials_w(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"b": pa.array([], pa.int64()), "tok": pa.array([], pa.int64())}
            )
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        g = (
            pa.table(
                {
                    "b": pa.array(ids // width, pa.int64()),
                    "tok": t.column(tokens_col),
                }
            )
            .group_by("b")
            .aggregate([("tok", "sum")])
        )
        return pa.table({"b": g.column("b"), "tok": g.column("tok_sum")})

    # driver merge again: ≤ tie_buckets partial rows per block of ONE
    # score class — no distributed sort for a bounded bucket table
    buckets = (
        ties.map_batches(tie_partials_w, batch_format="pyarrow")
        .to_pandas()
        .groupby("b", as_index=False)["tok"]
        .sum()
        .sort_values("b")
    )
    cut_id = None
    for b, tok in zip(
        buckets["b"].to_numpy(), (int(v) for v in buckets["tok"].to_numpy())
    ):
        if tok > remaining:
            # boundary bucket: pull ONLY its rows (≤ n_ties/tie_buckets)
            lo, hi = int(b) * width, (int(b) + 1) * width
            part = (
                ties.map_batches(
                    lambda t, lo=lo, hi=hi: t.filter(
                        pc.and_(
                            pc.greater_equal(t.column(id_col), lo),
                            pc.less(t.column(id_col), hi),
                        )
                    ),
                    batch_format="pyarrow",
                )
                .to_pandas()
                .sort_values(id_col)
            )
            csum = part[tokens_col].cumsum()
            fit = part.loc[csum <= remaining, id_col]
            if len(fit):
                cut_id = int(fit.iloc[-1])
            break
        remaining -= tok
        cut_id = (int(b) + 1) * width - 1  # whole bucket fits

    return ds.map_batches(keep_filter(cut_id), batch_format="pyarrow")


def per_group_cap(
    ds: ray.data.Dataset,
    keys: list[str],
    k: int,
    order_by: list[str],
    ascending: list[bool],
) -> ray.data.Dataset:
    """At most ``k`` rows per key-group, best-first by ``order_by`` —
    the C4/Gopher-style domain cap ("keep the top-k documents per
    domain"). One hash-bucketed exchange; per-bucket work is a
    vectorized sort + ``groupby.head(k)`` over whole groups
    (``bucketed_group_apply`` co-locates each key exactly once)."""

    def cap_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            keys + order_by, ascending=[True] * len(keys) + list(ascending),
            kind="mergesort",
        )
        return g.groupby(keys, sort=False).head(k).reset_index(drop=True)

    return bucketed_group_apply(ds, keys, cap_bucket)


def mixture_sample(
    ds: ray.data.Dataset,
    group_col: str,
    weights,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic down-sample to a target group mixture: keep-rates
    are chosen so kept counts are ∝ integer ``weights`` and the
    binding group (smallest count/weight) keeps everything — the
    "source mixing" step of a pre-training data recipe, downsample-only
    (no replication). ``weights`` is a ``{group: int}`` map or a
    callable ``group -> int`` (evaluated over the observed groups).
    Membership is a pure function of ``id_col`` via
    multiplicative hashing, so the exact kept set is reproducible on
    any cluster and SQL-expressible.

    Exactness: rates are computed on the driver from a tiny per-group
    counts table in pure Python integer arithmetic
    (``rate_pm = (10000 * c_min * w_g) // (w_min * c_g)``, argmin by
    exact cross-multiplied fractions) — no float ever enters, so the
    DuckDB twin reproduces rates bit-for-bit. Driver bytes = O(groups).
    The data itself is never shuffled: one counts groupby + one
    broadcast filter."""
    counts = ds.groupby(group_col).count().to_pandas()
    cmap = dict(
        zip(counts[group_col].tolist(), (int(v) for v in counts["count()"]))
    )
    if callable(weights):
        weights = {g: int(weights(g)) for g in cmap}
    missing = set(cmap) - set(weights)
    if missing:
        raise ValueError(f"mixture_sample: no weight for groups {sorted(missing)}")
    # argmin of c/w by exact integer cross-multiplication (scale every
    # ratio by lcm(weights) so the comparison key is an exact int),
    # group-name tiebreak (matches the SQL twin's ORDER BY ... LIMIT 1)
    lcm = _lcm_all(weights[g] for g in cmap)
    best = min(cmap, key=lambda g: (cmap[g] * (lcm // weights[g]), g))
    c_min, w_min = cmap[best], weights[best]
    rate_pm = {
        g: min(10000, (10000 * c_min * weights[g]) // (w_min * cmap[g]))
        for g in cmap
    }

    groups = list(rate_pm)
    group_arr = pa.array(groups, pa.string())
    rates_arr = np.array([rate_pm[g] for g in groups], dtype=np.uint64)

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        idx = pc.index_in(t.column(group_col), value_set=group_arr).to_numpy(
            zero_copy_only=False
        )
        r = rates_arr[idx]
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids * np.uint64(_KNUTH)) % np.uint64(2**32)) % np.uint64(10000)
        return t.filter(pa.array(h < r))

    return ds.map_batches(fn, batch_format="pyarrow")


def _lcm_all(vals) -> int:
    import math

    out = 1
    for v in vals:
        out = out * v // math.gcd(out, v)
    return out


def assign_split(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    pct: tuple[int, int] = (80, 10),
    names: tuple[str, str, str] = ("train", "valid", "test"),
) -> ray.data.Dataset:
    """Deterministic train/valid/test assignment by multiplicative id
    hashing: ``bucket = (id * K mod 2^32) mod 100``; buckets
    ``< pct[0]`` → train, ``< pct[0]+pct[1]`` → valid, else test.
    A pure function of the id — stable across runs, clusters and
    re-partitioning (a random split would reshuffle membership every
    run and leak eval docs into training on any retry). Map-only, zero
    shuffle; membership is SQL-expressible."""
    cut1, cut2 = int(pct[0]), int(pct[0]) + int(pct[1])
    lut = pa.array(names, pa.string())

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((ids * np.uint64(_KNUTH)) % np.uint64(2**32)) % np.uint64(100)
        idx = np.where(b < cut1, 0, np.where(b < cut2, 1, 2)).astype(np.int64)
        return t.append_column("split", pc.take(lut, pa.array(idx)))

    return ds.map_batches(fn, batch_format="pyarrow")


def _score_counts(
    ds: ray.data.Dataset, score_col: str, id_col: str
) -> pd.DataFrame:
    """Distinct-score row counts + per-score max id, descending by
    score. One combiner-style aggregation; driver bytes = O(distinct
    scores). Shared by :func:`rank_cut` callers that need several cut
    points (e.g. NTILE labels) so the corpus is scanned once per cut
    family, not once per cut."""

    def partials(t: pa.Table) -> pa.Table:
        g = t.group_by(score_col).aggregate([([], "count_all"), (id_col, "max")])
        return pa.table(
            {
                "score": g.column(score_col),
                "n": pc.cast(g.column("count_all"), pa.int64()),
                "mid": g.column(f"{id_col}_max"),
            }
        )

    parts = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    return (
        parts.groupby("score", as_index=False)
        .agg(n=("n", "sum"), mid=("mid", "max"))
        .sort_values("score", ascending=False)
    )


def rank_cut(
    ds: ray.data.Dataset,
    score_col: str,
    n: int,
    id_col: str = "doc_id",
    tie_buckets: int = 4096,
    score_counts: pd.DataFrame | None = None,
) -> tuple[str, int | None, int | None]:
    """Exact cut point of the n-th row in ``(score DESC, id ASC)``
    order, WITHOUT a global sort: returns ``(mode, s_star, cut_id)``
    where membership of the top-n set is ``score > s_star OR
    (score == s_star AND id <= cut_id)`` (``mode`` is ``"all"`` /
    ``"empty"`` when the set is trivially everything / nothing).

    The count-budget sibling of :func:`token_budget_select`'s threshold
    search: pass 1 prefix-scans the distinct-score counts table on the
    driver to find the boundary score class; pass 2 resolves the tie
    class by id via per-id-bucket counts, pulling ONLY the single
    boundary bucket's ids (≤ n_ties / tie_buckets rows). Scores and ids
    must be integers (exact driver arithmetic; ids unique)."""
    n = int(n)
    if n <= 0:
        return ("empty", None, None)
    per_score = (
        _score_counts(ds, score_col, id_col)
        if score_counts is None
        else score_counts
    )
    scores = per_score["score"].to_numpy()
    counts = [int(v) for v in per_score["n"].to_numpy()]
    mids = [int(v) for v in per_score["mid"].to_numpy()]

    cum = 0
    s_star = None
    remaining = 0
    tie_max_id = 0
    for s, c, mid in zip(scores, counts, mids):
        if cum + c > n:
            s_star = int(s)
            remaining = n - cum  # rows still owed from the tie class
            tie_max_id = mid
            break
        cum += c
    if s_star is None:
        return ("all", None, None)
    if remaining <= 0:
        return ("cut", s_star, None)

    # resolve the tie class by id: bucketed counts -> boundary bucket
    ties = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column(score_col), s_star)),
        batch_format="pyarrow",
    ).select_columns([id_col])
    width = max(1, (tie_max_id + tie_buckets) // tie_buckets)

    def bucket_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"b": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        g = (
            pa.table({"b": pa.array(ids // width, pa.int64())})
            .group_by("b")
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"b": g.column("b"), "n": pc.cast(g.column("count_all"), pa.int64())}
        )

    buckets = (
        ties.map_batches(bucket_counts, batch_format="pyarrow")
        .to_pandas()
        .groupby("b", as_index=False)["n"]
        .sum()
        .sort_values("b")
    )
    cut_id = None
    for b, c in zip(
        buckets["b"].to_numpy(), (int(v) for v in buckets["n"].to_numpy())
    ):
        if c >= remaining:
            # boundary bucket: pull ONLY its ids and take the
            # remaining-th smallest
            lo, hi = int(b) * width, (int(b) + 1) * width
            part = (
                ties.map_batches(
                    lambda t, lo=lo, hi=hi: t.filter(
                        pc.and_(
                            pc.greater_equal(t.column(id_col), lo),
                            pc.less(t.column(id_col), hi),
                        )
                    ),
                    batch_format="pyarrow",
                )
                .to_pandas()[id_col]
                .to_numpy()
            )
            part.sort()
            cut_id = int(part[remaining - 1])
            break
        remaining -= c
    return ("cut", s_star, cut_id)


def _cut_mask(
    t: pa.Table, cut: tuple, score_col: str, id_col: str
) -> pa.Array:
    """Vectorized membership test of a :func:`rank_cut` cut point."""
    mode, s_star, cut_id = cut
    if mode == "all":
        return pa.array(np.ones(t.num_rows, dtype=bool))
    if mode == "empty":
        return pa.array(np.zeros(t.num_rows, dtype=bool))
    sc = t.column(score_col)
    m = pc.greater(sc, s_star)
    if cut_id is not None:
        m = pc.or_(
            m,
            pc.and_(
                pc.equal(sc, s_star), pc.less_equal(t.column(id_col), cut_id)
            ),
        )
    return m


def top_fraction_select(
    ds: ray.data.Dataset,
    score_col: str,
    num: int,
    den: int,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Keep exactly the top ``⌊num/den · N⌋`` rows by ``(score DESC,
    id ASC)`` — the corpus-percentile quality filter ("keep the best
    quarter by score"). SQL twin: ``QUALIFY ROW_NUMBER() OVER (ORDER BY
    score DESC, id) * den <= COUNT(*) OVER () * num``. One tiny count,
    one :func:`rank_cut` threshold search, one broadcast filter — the
    data never sorts and never shuffles."""
    total = ds.count()
    cut = rank_cut(ds, score_col, (total * int(num)) // int(den), id_col)
    if cut[0] == "all":
        return ds
    return ds.map_batches(
        lambda t: t.filter(_cut_mask(t, cut, score_col, id_col)),
        batch_format="pyarrow",
    )


def ntile_label(
    ds: ray.data.Dataset,
    score_col: str,
    tiles: int,
    id_col: str = "doc_id",
    out_col: str = "tile",
) -> ray.data.Dataset:
    """Label every row with its SQL ``NTILE(tiles)`` bucket (1-based)
    in ``(score DESC, id ASC)`` order — the CCNet-style head/middle/
    tail partition of a corpus by a quality score, as a LABEL rather
    than a filter. Standard NTILE allocation: the first ``N mod tiles``
    buckets get one extra row.

    Distributed shape: the distinct-score counts table is computed ONCE
    (:func:`_score_counts`), each of the ``tiles-1`` boundary ranks is
    resolved to an exact ``(score, id)`` cut on the driver, and one
    map stage labels rows by counting which cuts contain them — no
    sort, no shuffle, O(distinct scores) driver bytes."""
    total = ds.count()
    tiles = int(tiles)
    base, rem = divmod(total, tiles)
    counts = _score_counts(ds, score_col, id_col)
    cuts = []
    boundary = 0
    for k in range(tiles - 1):
        boundary += base + (1 if k < rem else 0)
        cuts.append(
            rank_cut(ds, score_col, boundary, id_col, score_counts=counts)
        )

    def label(t: pa.Table) -> pa.Table:
        inside = np.zeros(t.num_rows, dtype=np.int64)
        for cut in cuts:
            inside += np.asarray(_cut_mask(t, cut, score_col, id_col))
        return t.append_column(
            out_col, pa.array(tiles - inside, pa.int64())
        )

    return ds.map_batches(label, batch_format="pyarrow")


def deterministic_shuffle_rank(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    seed: int = 42,
    bucket_hex: int = 3,
) -> ray.data.Dataset:
    """Deterministic global training-order shuffle: every row gets a
    dense rank 0..n-1 in the order of ``md5("<seed>:<id>")`` — the
    seeded shuffle a training run wants (stable across retries, so a
    resumed epoch reads the same order; change ``seed`` per epoch for
    a fresh permutation). Equivalent SQL: ``row_number() OVER (ORDER BY
    md5(seed || ':' || id), id) - 1``.

    Scale shape — a GLOBAL ORDER BY with no distributed sort: md5 keys
    are uniform, and lexicographic order on the hex digest is prefix-
    consistent, so the first ``bucket_hex`` hex chars (default 4096
    buckets) split the total order into contiguous ranges. One
    per-batch count combiner gives per-bucket sizes; the driver prefix-
    sums 4096 ints into global offsets (broadcast once); ONE hash
    exchange on the bucket key then sorts each bucket locally and
    stamps rank = offset + local position. Exchange carries (id, key)
    pairs, never payload; driver bytes are O(buckets). Hot buckets
    can't exist (md5 is uniform) — skew-free by construction."""
    import hashlib

    import ray

    pre = f"{seed}:"

    def key_batch(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy()
        keys = [hashlib.md5((pre + str(i)).encode()).hexdigest() for i in ids]
        return pd.DataFrame(
            {
                id_col: ids,
                "skey": keys,
                "bucket": np.array(
                    [int(k[:bucket_hex], 16) for k in keys], dtype=np.int64
                ),
            }
        )

    # checkpoint the keyed table: the md5-per-row keying (this op's
    # dominant cost) would otherwise execute twice — once for the counts
    # pass below, again inside bucketed_group_apply's lazy re-execution
    keyed = ds.map_batches(key_batch, batch_format="pandas").materialize()

    def bucket_counts(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["bucket"].value_counts()
        return pd.DataFrame(
            {"bucket": vc.index.to_numpy(np.int64),
             "n": vc.to_numpy(np.int64)}
        )

    counts = (
        keyed.map_batches(bucket_counts, batch_format="pandas")
        .to_pandas()
        .groupby("bucket", sort=True)["n"]
        .sum()
    )
    offsets = np.zeros(16 ** bucket_hex, dtype=np.int64)
    np.add.at(offsets, counts.index.to_numpy(np.int64), counts.to_numpy())
    offsets = np.concatenate([[0], np.cumsum(offsets)[:-1]])
    oref = ray.put(offsets)

    def stamp(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 "rank": pd.Series([], dtype=np.int64)}
            )
        # the frame holds WHOLE buckets (bucketed_group_apply contract):
        # per-bucket work is vectorized — one sort + cumcount
        g = g.sort_values(["bucket", "skey", id_col], kind="mergesort")
        base = ray.get(oref)[g["bucket"].to_numpy(np.int64)]
        pos = g.groupby("bucket", sort=False).cumcount().to_numpy(np.int64)
        return pd.DataFrame(
            {id_col: g[id_col].to_numpy(), "rank": base + pos}
        )

    return bucketed_group_apply(keyed, ["bucket"], stamp)


def _es_keys(ids, w: np.ndarray, seed: int) -> np.ndarray:
    """Shared Efraimidis-Spirakis key derivation: u = md5(seed:id)'s
    first 13 hex chars (52 bits — mantissa-exact in BOTH engines, so the
    SQL twin sees the SAME double) scaled to [0,1), key = u**(1/w).
    Single source of truth for weighted_sample AND
    grouped_weighted_sample — the constants here are load-bearing for
    their oracles."""
    import hashlib

    pre = f"{seed}:"
    u = (
        np.array(
            [
                int(hashlib.md5((pre + str(i)).encode()).hexdigest()[:13], 16)
                for i in ids
            ],
            dtype=np.float64,
        )
        / np.float64(16.0**13)
    )
    return u ** (1.0 / w)


def weighted_sample(
    ds: ray.data.Dataset,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 7,
) -> pd.DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    row i gets key ``u_i^(1/w_i)`` with ``u_i`` a deterministic
    hash-uniform in [0,1); the top-k keys ARE a weight-proportional
    sample without replacement — the curation primitive for "take 1M
    docs biased toward quality/length" without a corpus shuffle.
    Deterministic (u from md5(seed:id), 52 mantissa-exact bits), so
    exact membership is SQL-oracle-checkable.

    Scale shape: one streaming pass; each batch emits a tie-widened
    partial top-k, the driver merges ≤ blocks×k rows and takes the
    global top-k (key DESC, id ASC) — same contract as ``top_k``. Rows
    with weight ≤ 0 or null can never be sampled and are dropped, as
    the SQL twin's WHERE does. Returns (id, weight, es_key) pandas."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[weight_col].notna() & (b[weight_col] > 0)]
        if not len(b):
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 weight_col: pd.Series([], dtype=np.float64),
                 "es_key": pd.Series([], dtype=np.float64)}
            )
        ids = b[id_col].to_numpy()
        w = b[weight_col].to_numpy(np.float64)
        out = pd.DataFrame(
            {id_col: ids, weight_col: b[weight_col].to_numpy(),
             "es_key": _es_keys(ids, w, seed)}
        )
        if len(out) <= k:
            return out
        kth = out["es_key"].nlargest(k).iloc[-1]
        return out[out["es_key"] >= kth]  # tie-widened partial top-k

    tops = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return (
        tops.sort_values(["es_key", id_col], ascending=[False, True],
                         kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def grouped_weighted_sample(
    ds: ray.data.Dataset,
    group_col: str,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 7,
) -> ray.data.Dataset:
    """Stratified A-ES: an independent weighted sample WITHOUT
    replacement of ``k`` rows per group (per-domain / per-source
    quotas — the "cap each source but bias toward quality inside it"
    selection). Same deterministic keys as ``weighted_sample``; the
    per-group top-k runs inside ONE hash-bucketed exchange
    (``bucketed_group_apply``) with vectorized in-bucket head(k) —
    the grouped top-k shape, no global sort. Equivalent SQL:
    ``QUALIFY row_number() OVER (PARTITION BY group ORDER BY es_key
    DESC, id) <= k``."""

    def key_batch(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[weight_col].notna() & (b[weight_col] > 0)]
        if not len(b):
            return pd.DataFrame(
                {group_col: pd.Series([], dtype=object),
                 id_col: pd.Series([], dtype=np.int64),
                 weight_col: pd.Series([], dtype=np.float64),
                 "es_key": pd.Series([], dtype=np.float64)}
            )
        ids = b[id_col].to_numpy()
        w = b[weight_col].to_numpy(np.float64)
        return pd.DataFrame(
            {group_col: b[group_col].to_numpy(),
             id_col: ids,
             weight_col: b[weight_col].to_numpy(),
             "es_key": _es_keys(ids, w, seed)}
        )

    keyed = ds.map_batches(key_batch, batch_format="pandas")

    def head_k(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [group_col, "es_key", id_col],
            ascending=[True, False, True], kind="mergesort",
        )
        return g.groupby(group_col, sort=False).head(k)

    return bucketed_group_apply(keyed, [group_col], head_k)
