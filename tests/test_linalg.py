"""ops/linalg: distributed Gram / covariance / PCA invariants in the
full 64-dim regime (the d=1 exact regime is gated by the DuckDB oracle
on ``embeddings_pca_axis``)."""

import numpy as np
import pandas as pd
import ray.data

from gene_etl_ray.ops import linalg

SF = "/root/testdata/sf0.001"


def _load():
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet").repartition(7)
    df = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return ds, X


def test_gram_matches_numpy():
    ds, X = _load()
    out = linalg.gram_matrix(ds)
    G = X.T @ X
    d = X.shape[1]
    assert len(out) == d * (d + 1) // 2
    got = np.zeros((d, d))
    got[out["i"], out["j"]] = out["g"]
    iu = np.triu_indices(d)
    np.testing.assert_allclose(got[iu], G[iu], rtol=1e-10, atol=1e-9)


def test_covariance_matches_numpy():
    ds, X = _load()
    n, mu, cov = linalg.covariance_matrix(ds)
    assert n == X.shape[0]
    np.testing.assert_allclose(mu, X.mean(axis=0), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        cov, np.cov(X, rowvar=False), rtol=1e-8, atol=1e-10
    )


def test_pca_invariants():
    ds, X = _load()
    k = 8
    fit = linalg.pca_fit(ds, k=k)
    C = fit.components
    # orthonormal components
    np.testing.assert_allclose(C @ C.T, np.eye(k), atol=1e-10)
    # deterministic sign: max-|entry| coordinate positive
    for r in range(k):
        assert C[r, np.argmax(np.abs(C[r]))] > 0
    # eigenvalues descending and each equals the variance of its projection
    assert np.all(np.diff(fit.explained_variance) <= 1e-12)
    P = linalg.pca_project(ds, fit).to_pandas().sort_values("vec_id")
    proj = P[[f"pc_{r}" for r in range(k)]].to_numpy()
    np.testing.assert_allclose(
        proj.var(axis=0, ddof=1), fit.explained_variance, rtol=1e-8
    )
    # projections match the direct computation (P and X both vec_id-sorted)
    Xc = X - X.mean(axis=0)
    ref = Xc @ C.T
    np.testing.assert_allclose(proj, ref, rtol=1e-8, atol=1e-10)


def test_pca_reconstruction_error_bounded():
    ds, X = _load()
    d = X.shape[1]
    full = linalg.pca_fit(ds, k=d)
    k = 8
    fit = linalg.pca_fit(ds, k=k)
    Xc = X - fit.mean
    P = Xc @ fit.components.T
    recon = P @ fit.components
    # mean squared residual == sum of trailing eigenvalues (scaled)
    resid = ((Xc - recon) ** 2).sum() / (X.shape[0] - 1)
    tail = full.explained_variance[k:].sum()
    np.testing.assert_allclose(resid, tail, rtol=1e-8)


def test_empty_and_single_batch():
    X = np.arange(12, dtype=np.float64).reshape(4, 3)
    ds = ray.data.from_pandas(
        pd.DataFrame({"vec_id": np.arange(4), "embedding": list(X)})
    )
    out = linalg.gram_matrix(ds)
    G = X.T @ X
    got = np.zeros((3, 3))
    got[out["i"], out["j"]] = out["g"]
    iu = np.triu_indices(3)
    np.testing.assert_allclose(got[iu], G[iu])


def _logreg_data(n=240, dim=6, blocks=1, margin=3.0):
    rng = np.random.RandomState(12)
    y = (np.arange(n) % 2).astype(np.float64)
    x = rng.randn(n, dim)
    x[:, 0] += margin * (2 * y - 1)  # separable along dim 0
    df = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64),
         "embedding": list(x), "y": y}
    )
    return df, ray.data.from_pandas(df, override_num_blocks=blocks)


def test_logreg_converges_on_separable_labels():
    df, ds = _logreg_data()
    w = linalg.logreg_train(ds, "y", n_iters=60, lr=1.0)
    x = np.stack(df["embedding"].to_numpy())
    acc = (((x @ w) > 0) == (df["y"].to_numpy() > 0.5)).mean()
    assert acc > 0.95
    # the separating dimension dominates the learned weights
    assert abs(w[0]) == max(abs(w))


def test_logreg_blocking_invariant():
    _, ds1 = _logreg_data(blocks=1)
    _, ds7 = _logreg_data(blocks=7)
    w1 = linalg.logreg_train(ds1, "y", n_iters=5, lr=0.5)
    w7 = linalg.logreg_train(ds7, "y", n_iters=5, lr=0.5)
    np.testing.assert_allclose(w1, w7, atol=1e-9)


def test_logreg_l2_shrinks_weights():
    _, ds = _logreg_data()
    w0 = linalg.logreg_train(ds, "y", n_iters=20, lr=0.5, l2=0.0)
    w9 = linalg.logreg_train(ds, "y", n_iters=20, lr=0.5, l2=0.5)
    assert np.linalg.norm(w9) < np.linalg.norm(w0)


def test_logreg_score_matches_formula():
    df, ds = _logreg_data(n=50)
    w = linalg.logreg_train(ds, "y", n_iters=3, lr=0.5)
    out = (
        linalg.logreg_score(ds, w)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    x = np.stack(df["embedding"].to_numpy())
    np.testing.assert_allclose(
        out["score"].to_numpy(), 1 / (1 + np.exp(-(x @ w))), atol=1e-12
    )


def test_grouped_vector_mean_matches_numpy_and_blocking_invariant():
    rng = np.random.RandomState(3)
    n, d = 150, 5
    lab = (np.arange(n) % 4).astype(np.int64)
    x = rng.randn(n, d)
    df = pd.DataFrame(
        {"label": lab, "embedding": list(x),
         "vec_id": np.arange(n, dtype=np.int64)}
    )
    outs = []
    for blocks in (1, 6):
        out = linalg.grouped_vector_mean(
            ray.data.from_pandas(df, override_num_blocks=blocks), "label"
        )
        outs.append(out)
        for g in range(4):
            want = x[lab == g].mean(axis=0)
            got = out[out["label"] == g].sort_values("dim")["mean_val"]
            np.testing.assert_allclose(got.to_numpy(), want, atol=1e-9)
    pd.testing.assert_frame_equal(
        outs[0].round(9), outs[1].round(9)
    )
