"""Distributed dense linear algebra over an embedding column
(``list<float>``): Gram matrix, covariance, and PCA.

Reference analog: the reference's flagship statistical engine is a
blocked upper-triangle pairwise kernel over a wide matrix
(``/root/reference/etl/correlate.py:34-113`` — tile driver at
``:63-77``).  Here the same compute shape is expressed as ONE
mergeable matmul partial per batch: every batch contributes a d×d
``X.T @ X`` tile plus column sums and a count, all encoded as long-form
``(i, j, v)`` rows, and a single tiny groupby-sum merges them.  Driver
and exchange bytes are O(d²) per batch regardless of row count — the
k-means-partials pattern (``ops/knn.py:361``) applied to second
moments — so the operator holds at 100 TB: the fact table is scanned
once, nothing is sorted, nothing row-sized moves.

PCA rides on top: the d×d covariance is assembled from the same single
pass (cov = (G − n·μμᵀ)/(n−1)), eigendecomposed on the driver (d ≤ a
few thousand — microseconds), and the top-k components are broadcast
into a stateless projection ``map_batches``.  Sign is made
deterministic (largest-|entry| coordinate positive) so outputs are
reproducible across BLAS builds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum


def _batch_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix, zero-copy on the
    contiguous fast path (flatten respects slice offsets)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    t = col.type
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        flat = col.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // n
        return flat.astype(np.float64, copy=False).reshape(n, d)
    # Ray's ArrowTensorArray (from_pandas of ndarray cells) or object rows
    arr = col.to_numpy(zero_copy_only=False)
    return np.stack(arr).astype(np.float64, copy=False)


def second_moment_table(
    ds: ray.data.Dataset, vec_col: str = "embedding"
) -> pd.DataFrame:
    """One distributed pass → the complete second-moment statistics as
    a tiny long-form table of ``(i, j, v)`` rows:

    - ``i >= 0, j >= i``:  Gram entries  G[i,j] = Σ x_i·x_j  (upper
      triangle; G is symmetric),
    - ``i >= 0, j == -1``: column sums   s[i]   = Σ x_i,
    - ``i == -1, j == -1``: row count    n.

    Per-batch partial = one float64 matmul + a column sum; merge = one
    groupby-sum over ≤ d(d+1)/2 + d + 1 keys.  Everything downstream
    (gram, covariance, PCA, Pearson-matrix) reads this table."""

    def partials(t: pa.Table) -> pa.Table:
        X = _batch_matrix(t.column(vec_col))
        if X.shape[0] == 0:
            return pa.table(
                {
                    "i": pa.array([], pa.int64()),
                    "j": pa.array([], pa.int64()),
                    "v": pa.array([], pa.float64()),
                }
            )
        d = X.shape[1]
        G = X.T @ X
        iu, ju = np.triu_indices(d)
        i = np.concatenate([iu, np.arange(d), [-1]])
        j = np.concatenate([ju, np.full(d, -1), [-1]])
        v = np.concatenate([G[iu, ju], X.sum(axis=0), [float(X.shape[0])]])
        return pa.table({"i": i, "j": j, "v": v})

    out = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("v"))
        .to_pandas()
    )
    return out.rename(columns={"sum(v)": "v"}).sort_values(
        ["i", "j"]
    ).reset_index(drop=True)


def _unpack(moments: pd.DataFrame) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, sums[d], gram[d,d]) from the long-form moment table."""
    n = int(moments.loc[(moments["i"] == -1) & (moments["j"] == -1), "v"].iloc[0])
    s_rows = moments[(moments["i"] >= 0) & (moments["j"] == -1)]
    d = len(s_rows)
    sums = np.zeros(d)
    sums[s_rows["i"].to_numpy()] = s_rows["v"].to_numpy()
    g_rows = moments[moments["j"] >= 0]
    G = np.zeros((d, d))
    gi = g_rows["i"].to_numpy()
    gj = g_rows["j"].to_numpy()
    G[gi, gj] = g_rows["v"].to_numpy()
    G[gj, gi] = g_rows["v"].to_numpy()
    return n, sums, G


def gram_matrix(ds: ray.data.Dataset, vec_col: str = "embedding") -> pd.DataFrame:
    """Upper-triangle Gram matrix Σ x_i·x_j as (i, j, g) rows —
    SQL-oracle-checkable (self-join over unnested elements)."""
    m = second_moment_table(ds, vec_col)
    out = m[m["j"] >= 0].rename(columns={"v": "g"}).reset_index(drop=True)
    out["i"] = out["i"].astype("int64")
    out["j"] = out["j"].astype("int64")
    return out


def covariance_matrix(
    ds: ray.data.Dataset, vec_col: str = "embedding"
) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean[d], sample covariance[d,d]) from one distributed pass."""
    n, sums, G = _unpack(second_moment_table(ds, vec_col))
    mu = sums / n
    cov = (G - n * np.outer(mu, mu)) / (n - 1)
    return n, mu, cov


class PCAFit:
    """Driver-held PCA model: broadcast once into projection tasks."""

    __slots__ = ("mean", "components", "explained_variance", "n")

    def __init__(self, mean, components, explained_variance, n):
        self.mean = mean
        self.components = components  # (k, d)
        self.explained_variance = explained_variance
        self.n = n


def pca_fit(ds: ray.data.Dataset, k: int, vec_col: str = "embedding") -> PCAFit:
    """Top-k principal components of the embedding column.  The data
    pass is the O(d²)-partial moment sweep; the eigendecomposition is a
    d×d driver-side ``eigh``.  Component sign is canonicalized: the
    largest-|entry| coordinate of each component is made positive, so
    the fit is deterministic across BLAS implementations."""
    n, mu, cov = covariance_matrix(ds, vec_col)
    w, V = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = V[:, order].T  # (k, d)
    for r in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    return PCAFit(mu, comps, w[order], n)


def pca_project(
    ds: ray.data.Dataset,
    fit: PCAFit,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Project each vector onto the fitted components → one
    ``pc_<r>`` float64 column per component.  Stateless vectorized
    map: (X − μ) @ Vᵀ per batch; the (k, d) model rides the closure
    (serialized once into the object store, read per task)."""
    mu = fit.mean
    comps_T = fit.components.T  # (d, k)
    k = comps_T.shape[1]

    def project(t: pa.Table) -> pa.Table:
        X = _batch_matrix(t.column(vec_col))
        if X.shape[0] == 0:
            cols = {id_col: pa.array([], t.schema.field(id_col).type)}
            for r in range(k):
                cols[f"pc_{r}"] = pa.array([], pa.float64())
            return pa.table(cols)
        P = (X - mu) @ comps_T
        cols = {id_col: t.column(id_col)}
        for r in range(k):
            cols[f"pc_{r}"] = pa.array(P[:, r])
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def logreg_train(
    ds: ray.data.Dataset,
    label_col: str,
    vec_col: str = "embedding",
    n_iters: int = 20,
    lr: float = 0.5,
    l2: float = 0.0,
) -> np.ndarray:
    """Distributed binary logistic regression (the fastText-style
    quality-classifier slot every curation pipeline has): full-batch
    gradient descent where each iteration broadcasts the weight vector
    ONCE (``ray.put``, O(d) bytes) and every batch emits ONE mergeable
    partial — the d-dim gradient sum plus count — so the driver sees
    O(d) bytes per batch and the corpus never materializes. The same
    partials pattern as k-means (``ops/knn.py``) and the Gram pass
    above, applied to ∇NLL.

    Deterministic: w₀ = 0, fixed step, float64 partial sums (blocking-
    invariant up to addition order, pinned in tests at 1e-9). ``l2``
    adds ridge shrinkage (never on the implicit intercept-free form —
    this is the raw linear score; append a 1-feature upstream for a
    bias). Labels must be 0/1 (or boolean). Returns w (d,) float64."""
    import ray

    d = None
    w = None
    for _ in range(n_iters):
        wref = ray.put(w)

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            wv = ray.get(wref)
            x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            y = b[label_col].to_numpy(np.float64)
            z = np.zeros(len(x)) if wv is None else x @ wv
            p = 1.0 / (1.0 + np.exp(-z))
            g = x.T @ (p - y)  # (d,) gradient sum for this batch
            return pd.DataFrame(
                {"g": [g.tobytes()], "n": [np.int64(len(x))]}
            )

        parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
        if not len(parts) or "n" not in parts.columns:
            raise ValueError(
                "logreg_train: empty dataset (no rows survived the read)"
            )
        n = int(parts["n"].sum())
        grad = np.sum(
            [np.frombuffer(v, dtype=np.float64) for v in parts["g"]], axis=0
        )
        if d is None:
            d = grad.shape[0]
            w = np.zeros(d)
        w = w - lr * (grad / n + l2 * w)
    return w


def logreg_score(
    ds: ray.data.Dataset,
    w: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "score",
) -> ray.data.Dataset:
    """Stateless scoring pass: broadcast w once, per-batch sigmoid(Xw)."""
    import ray

    wref = ray.put(np.asarray(w, dtype=np.float64))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        wv = ray.get(wref)
        if not len(b):
            b[out_col] = pd.Series([], dtype=np.float64)
            return b
        x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        b = b.copy()
        b[out_col] = 1.0 / (1.0 + np.exp(-(x @ wv)))
        return b

    return ds.map_batches(score, batch_format="pandas")


def grouped_vector_mean(
    ds: ray.data.Dataset,
    group_col: str,
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Per-group mean vector (class centroids, doc-from-chunk embedding
    averaging, cluster prototypes): every batch emits ONE mergeable
    partial per group — the d-dim vector sum plus count — and the
    driver merge is O(groups·d) bytes regardless of corpus size; the
    same partials pattern as k-means / the Gram pass. Returns the
    centroids LONG-FORM (group, dim, mean_val) — dim is 1-based to
    match SQL's generate_subscripts — so the result is directly
    SQL-comparable (unnest + per-dimension avg twin)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, sub in b.groupby(group_col, sort=False):
            x = np.stack(sub[vec_col].to_numpy()).astype(np.float64)
            rows.append(
                {group_col: g, "s": x.sum(axis=0).tobytes(),
                 "n": np.int64(len(x))}
            )
        return pd.DataFrame(rows, columns=[group_col, "s", "n"])

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = []
    for g, sub in parts.groupby(group_col, sort=True):
        s = np.sum(
            [np.frombuffer(v, dtype=np.float64) for v in sub["s"]], axis=0
        )
        mean = s / sub["n"].sum()
        out.append(
            pd.DataFrame(
                {group_col: g, "dim": np.arange(1, len(mean) + 1,
                                                dtype=np.int64),
                 "mean_val": mean}
            )
        )
    return pd.concat(out, ignore_index=True)
