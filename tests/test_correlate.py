"""Literal rank-statistics kernels (`ops.correlate`): Spearman / Kendall /
Pearson grouped correlation, blocked all-pairs matrices, BH-FDR, and the
end-to-end corr→p→q pipeline — reference parity for
``/root/reference/etl/correlate.py:34-189`` (method dispatch :124-131,
fdr_bh :149-189, blocked upper-triangle driver :63-77). Test style
mirrors the reference's own suite: invariants on seeded inputs
(rho∈[-1,1], p/q∈[0,1], q ≥ p, pair count = C(n,2)), not golden values.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data

from gene_etl_ray.ops.correlate import (
    _kendall_tau_b,
    _pearson,
    _rank_average,
    bh_fdr,
    corr_p_value,
    corr_with_fdr,
    grouped_bh_fdr,
    grouped_corr,
    pairwise_corr_matrix,
    t_sf_two_sided,
)


def test_rank_average_matches_pandas_ties():
    x = np.array([3.0, 1.0, 3.0, 2.0, 1.0, 3.0])
    want = pd.Series(x).rank(method="average").to_numpy()
    np.testing.assert_allclose(_rank_average(x), want)


def test_kendall_blocked_equals_exhaustive():
    rng = np.random.RandomState(3)
    x = rng.randint(0, 10, 300).astype(float)
    y = rng.randint(0, 10, 300).astype(float)
    full = _kendall_tau_b(x, y, block=4096)  # single block
    tiled = _kendall_tau_b(x, y, block=37)  # many ragged blocks
    assert abs(full - tiled) < 1e-12
    # perfect monotone relation -> tau == 1
    z = np.arange(50, dtype=float)
    assert abs(_kendall_tau_b(z, 2 * z + 1) - 1.0) < 1e-12
    assert abs(_kendall_tau_b(z, -z) + 1.0) < 1e-12


def test_bh_fdr_reference_invariants():
    rng = np.random.RandomState(7)
    p = rng.rand(200)
    q = bh_fdr(p)
    assert ((0 <= q) & (q <= 1)).all()
    assert (q >= p - 1e-15).all()  # q >= p (reference test_correlate.py:139)
    # monotone in p after sorting
    o = np.argsort(p)
    assert (np.diff(q[o]) >= -1e-15).all()
    # tie-order invariance
    p2 = np.array([0.02, 0.01, 0.02, 0.01, 0.5])
    q2 = bh_fdr(p2)
    assert q2[0] == q2[2] and q2[1] == q2[3]


def test_t_sf_and_corr_p_bounds():
    p = t_sf_two_sided(np.array([0.0, 1.0, 5.0, -5.0]), 12.0)
    assert p[0] == 1.0 and 0 < p[1] < 1 and p[2] == p[3] < 0.01
    rho = np.array([0.0, 0.5, -0.5, 0.999, 1.0])
    n = np.full(5, 30.0)
    pv = corr_p_value(rho, n)
    assert ((0 <= pv) & (pv <= 1)).all()
    assert pv[0] == 1.0 and pv[1] == pv[2] and pv[3] > pv[4] == 0.0
    # |rho| ordering: larger effect -> smaller p
    assert pv[1] < pv[0] and pv[3] < pv[1]


def test_corr_p_df1_closed_form():
    """df=1 (n=3) has the closed form p = 1 - (2/pi)*atan(|t|) — the
    identity the corr_fdr_significant DuckDB oracle evaluates. The
    general incomplete-beta kernel must agree to well under the 6-dp
    rounding the gate hashes at."""
    rho = np.linspace(-0.999999, 0.999999, 20001)
    n = np.full_like(rho, 3.0)
    p = corr_p_value(rho, n)
    t = rho * np.sqrt(1.0 / np.maximum(1.0 - rho * rho, 1e-300))
    closed = 1.0 - 2.0 * np.arctan(np.abs(t)) / np.pi
    assert np.abs(p - closed).max() < 1e-9


def test_grouped_corr_methods(ray_session):
    rng = np.random.RandomState(11)
    n = 400
    df = pd.DataFrame(
        {
            "g": np.repeat(["a", "b"], n // 2),
            "x": rng.randint(0, 25, n).astype(float),
        }
    )
    df["y"] = df["x"] * 3.0 + rng.randn(n)
    ds = ray.data.from_pandas(df)
    for method in ("spearman", "pearson", "kendall"):
        out = grouped_corr(ds, "g", "x", "y", method=method)
        assert list(out["g"]) == ["a", "b"]
        assert ((out["rho"] > 0.9) & (out["rho"] <= 1.0)).all(), (method, out)
        assert (out["n"] == n // 2).all()
    with pytest.raises(ValueError):
        grouped_corr(ds, "g", "x", "y", method="nope")


def test_grouped_bh_fdr_rowset_preserved(ray_session):
    rng = np.random.RandomState(13)
    df = pd.DataFrame(
        {
            "g": np.repeat(["a", "b", "c"], 50),
            "id": np.arange(150),
            "p": rng.rand(150),
        }
    )
    out = grouped_bh_fdr(ray.data.from_pandas(df), "g", "p").to_pandas()
    assert sorted(out["id"]) == list(range(150))
    assert ((out["q_value"] >= out["p"] - 1e-15)).all()
    # per-group correction equals the standalone kernel
    for g, sub in out.groupby("g"):
        np.testing.assert_allclose(
            np.sort(sub["q_value"]), np.sort(bh_fdr(sub["p"].to_numpy()))
        )


def test_pairwise_corr_matrix_blocked_vs_numpy(ray_session):
    rng = np.random.RandomState(17)
    n_samples, n_vars = 60, 9
    m = rng.randn(n_samples, n_vars)
    long = pd.DataFrame(
        {
            "s": np.repeat(np.arange(n_samples), n_vars),
            "v": np.tile([f"v{i:02d}" for i in range(n_vars)], n_samples),
            "val": m.ravel(),
        }
    )
    out = pairwise_corr_matrix(
        ray.data.from_pandas(long), "v", "s", "val", block_size=4
    )
    # C(n,2) pairs, var_a < var_b (reference test_correlate.py:165-167)
    assert len(out) == n_vars * (n_vars - 1) // 2
    assert (out["var_a"] < out["var_b"]).all()
    want = np.corrcoef(m, rowvar=False)
    for _, r in out.iterrows():
        i, j = int(r["var_a"][1:]), int(r["var_b"][1:])
        assert abs(r["rho"] - want[i, j]) < 1e-10
    assert (out["n"] == n_samples).all()


def test_pairwise_corr_matrix_fill_and_groups(ray_session):
    # missing cells are filled (pivot fill_null parity) and cohorts are
    # independent barriers
    long = pd.DataFrame(
        {
            "coh": ["c1"] * 5 + ["c2"] * 6,
            "s": [0, 0, 1, 1, 2, 0, 0, 1, 1, 2, 2],
            "v": ["a", "b", "a", "b", "a", "a", "b", "a", "b", "a", "b"],
            "val": [1.0, 2.0, 2.0, 4.0, 3.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0],
        }
    )
    out = pairwise_corr_matrix(
        ray.data.from_pandas(long), "v", "s", "val", group_col="coh", fill=0.0
    )
    assert set(out["coh"]) == {"c1", "c2"}
    c2 = out[out["coh"] == "c2"].iloc[0]
    assert abs(c2["rho"] - 1.0) < 1e-12  # identical columns -> rho 1


def test_corr_with_fdr_end_to_end(ray_session):
    rng = np.random.RandomState(19)
    n_samples, n_vars = 40, 6
    base = rng.randn(n_samples)
    cols = {}
    for i in range(n_vars):
        # first three correlated with base, rest independent
        cols[f"v{i}"] = base + rng.randn(n_samples) * (0.1 if i < 3 else 100.0)
    rows = []
    for coh in ("x", "y"):
        for s in range(n_samples):
            for v, arr in cols.items():
                rows.append((coh, s, v, arr[s] + (1.0 if coh == "y" else 0.0)))
    long = pd.DataFrame(rows, columns=["coh", "s", "v", "val"])
    out = corr_with_fdr(
        ray.data.from_pandas(long), "v", "s", "val", "coh", method="spearman"
    )
    per = n_vars * (n_vars - 1) // 2
    assert len(out) == 2 * per
    assert ((out["rho"].abs() <= 1.0) | out["rho"].isna()).all()
    assert ((0 <= out["p_value"]) & (out["p_value"] <= 1)).all()
    assert (out["q_value"] >= out["p_value"] - 1e-15).all()
    # the three planted strong pairs are significant in both cohorts
    strong = out[
        out["var_a"].isin(["v0", "v1", "v2"]) & out["var_b"].isin(["v0", "v1", "v2"])
    ]
    assert strong["significant"].all()


def test_welch_ttest_matches_closed_form_and_p_value():
    """grouped_welch_ttest vs a single-process Welch computation,
    including the p-value via the repo's own Student SF, across
    blockings; a cohort with n<2 yields NaN."""
    import ray.data as rd

    from gene_etl_ray.ops.correlate import (
        grouped_welch_ttest,
        t_sf_two_sided,
    )

    rng = np.random.RandomState(21)
    n = 400
    grp = np.array(["g1", "g2"])[np.arange(n) % 2]
    coh = np.array(["a", "b"])[(np.arange(n) // 2) % 2]
    val = rng.randn(n) * 10 + np.where(coh == "a", 3.0, 0.0)
    # g2/b gets only ONE row -> NaN for g2
    keep = ~((grp == "g2") & (coh == "b") & (np.arange(n) > 3))
    df = pd.DataFrame({"g": grp[keep], "c": coh[keep], "v": val[keep]})
    for blocks in (1, 7):
        out = grouped_welch_ttest(
            rd.from_pandas(df, override_num_blocks=blocks),
            "g", "c", "v", "a", "b",
        )
        r1 = out[out["g"] == "g1"].iloc[0]
        a = df[(df.g == "g1") & (df.c == "a")]["v"].to_numpy()
        b = df[(df.g == "g1") & (df.c == "b")]["v"].to_numpy()
        va, vb = a.var(ddof=1), b.var(ddof=1)
        se2 = va / len(a) + vb / len(b)
        t = (a.mean() - b.mean()) / np.sqrt(se2)
        dof = se2**2 / (
            (va / len(a)) ** 2 / (len(a) - 1)
            + (vb / len(b)) ** 2 / (len(b) - 1)
        )
        assert abs(r1["t_stat"] - t) < 1e-9
        assert abs(r1["welch_df"] - dof) < 1e-6
        want_p = float(t_sf_two_sided(np.array([t]), dof)[0])
        assert abs(r1["p_value"] - want_p) < 1e-12
        assert np.isnan(out[out["g"] == "g2"]["t_stat"].iloc[0])


def test_chi2_independence_matches_closed_form():
    """chi2_independence vs a hand-computed contingency statistic,
    blocking-invariant; independent uniform columns give a small χ²,
    a perfectly dependent pair gives ~n·(k-1)."""
    import ray.data as rd

    from gene_etl_ray.ops.correlate import chi2_independence

    rng = np.random.RandomState(9)
    n = 600
    a = rng.randint(0, 3, n)
    b = rng.randint(0, 4, n)
    df = pd.DataFrame({"a": a.astype(str), "b": b.astype(np.int64)})
    outs = [
        chi2_independence(rd.from_pandas(df, override_num_blocks=k),
                          "a", "b")
        for k in (1, 6)
    ]
    piv = pd.crosstab(df["a"], df["b"]).to_numpy(dtype=float)
    exp = piv.sum(1, keepdims=True) @ piv.sum(0, keepdims=True) / n
    want = ((piv - exp) ** 2 / exp).sum()
    for out in outs:
        assert abs(out["chi2"][0] - want) < 1e-9
        assert int(out["df"][0]) == 6 and int(out["n"][0]) == n
    # perfect dependence: b == a ⇒ χ² = n·(k−1)
    dep = pd.DataFrame({"a": a.astype(str), "b": a.astype(np.int64)})
    out = chi2_independence(rd.from_pandas(dep), "a", "b")
    assert abs(out["chi2"][0] - n * 2) < 1e-9


def test_mann_whitney_matches_scipy_formula_and_handles_ties():
    """grouped_mann_whitney vs a hand-computed U/z with heavy ties,
    blocking-invariant; a missing cohort yields NaN."""
    import ray.data as rd

    from gene_etl_ray.ops.correlate import grouped_mann_whitney

    rng = np.random.RandomState(3)
    n = 300
    coh = np.array(["a", "b"])[np.arange(n) % 2]
    # integer values => heavy ties (the tie-corrected z path matters)
    val = rng.randint(0, 20, n).astype(np.float64)
    val[coh == "a"] += 2  # real location shift
    df = pd.DataFrame({"g": ["x"] * n, "c": coh, "v": val})
    df.loc[len(df)] = ["y", "a", 1.0]  # group y: cohort b missing -> NaN
    for blocks in (1, 5):
        out = grouped_mann_whitney(
            rd.from_pandas(df, override_num_blocks=blocks),
            "g", "c", "v", "a", "b",
        )
        rx = out[out["g"] == "x"].iloc[0]
        a = df[(df.g == "x") & (df.c == "a")]["v"].to_numpy()
        b = df[(df.g == "x") & (df.c == "b")]["v"].to_numpy()
        both = np.concatenate([a, b])
        order = both.argsort(kind="mergesort")
        ranks = np.empty(len(both))
        # average ranks with ties
        sv = both[order]
        rr = np.arange(1, len(both) + 1, dtype=np.float64)
        uniq, inv, cnt = np.unique(sv, return_inverse=True,
                                   return_counts=True)
        csum = np.concatenate([[0], np.cumsum(cnt)])
        avg = (csum[:-1] + 1 + csum[1:]) / 2.0
        ranks[order] = avg[inv]
        na, nb = len(a), len(b)
        u = ranks[:na].sum() - na * (na + 1) / 2
        nn = na + nb
        tt = float((cnt.astype(float) ** 3 - cnt).sum())
        var = na * nb / 12 * ((nn + 1) - tt / (nn * (nn - 1)))
        z = (u - na * nb / 2) / np.sqrt(var)
        assert abs(rx["u_stat"] - u) < 1e-9
        assert abs(rx["z"] - z) < 1e-12
        assert rx["z"] > 3  # the planted shift is detected
        assert np.isnan(out[out["g"] == "y"]["u_stat"].iloc[0])


def test_grouped_ols_matches_polyfit_and_edge_cases():
    """grouped_ols vs numpy.polyfit per group, blocking-invariant;
    null rows are dropped (regr_* semantics); a zero-x-variance group
    and an n<2 group yield NaN."""
    import ray.data as rd

    from gene_etl_ray.ops.correlate import grouped_ols

    rng = np.random.RandomState(33)
    n = 300
    grp = np.array(["g1", "g2"])[np.arange(n) % 2]
    x = rng.rand(n) * 50
    y = 3.5 * x + 7.0 + rng.randn(n) * 4
    df = pd.DataFrame({"g": grp, "x": x, "y": y})
    # null rows must not count toward n
    df.loc[5, "y"] = np.nan
    df.loc[8, "x"] = np.nan
    # a constant-x group and a single-row group
    extra = pd.DataFrame(
        {"g": ["flat", "flat", "flat", "tiny"],
         "x": [2.0, 2.0, 2.0, 1.0], "y": [1.0, 2.0, 3.0, 9.0]}
    )
    df = pd.concat([df, extra], ignore_index=True)
    for blocks in (1, 7):
        out = grouped_ols(
            rd.from_pandas(df, override_num_blocks=blocks), "g", "x", "y"
        )
        for gname in ("g1", "g2"):
            sub = df[(df.g == gname)].dropna(subset=["x", "y"])
            slope, intercept = np.polyfit(sub.x, sub.y, 1)
            r = np.corrcoef(sub.x, sub.y)[0, 1]
            row = out[out["g"] == gname].iloc[0]
            assert row["n"] == len(sub)
            assert abs(row["slope"] - slope) < 1e-9
            assert abs(row["intercept"] - intercept) < 1e-7
            assert abs(row["r2"] - r * r) < 1e-9
        assert np.isnan(out[out["g"] == "flat"]["slope"].iloc[0])
        assert np.isnan(out[out["g"] == "tiny"]["slope"].iloc[0])


def test_quantile_normalize_equalizes_distributions(ray_session):
    """After quantile normalization every column holds the IDENTICAL
    sorted value multiset (the defining property, Bolstad et al. 2003),
    and that multiset is the rank-wise mean of the columns' sorted
    values."""
    import ray.data as rd

    from gene_etl_ray.ops.correlate import quantile_normalize

    rng = np.random.RandomState(8)
    n, k = 40, 4
    rows = []
    for var in range(1, k + 1):
        for s in range(n):
            if (s + var) % 7 == 0:
                continue  # holes: densify must fill them
            rows.append((s, var, float(rng.gamma(2.0, 10.0 * var))))
    df = pd.DataFrame(rows, columns=["s", "var", "v"])
    out = quantile_normalize(
        rd.from_pandas(df, override_num_blocks=3), "var", "s", "v"
    ).to_pandas()
    assert len(out) == n * k
    cols = {
        var: np.sort(g["qnorm_value"].to_numpy())
        for var, g in out.groupby("var")
    }
    base = cols[1]
    for var in range(2, k + 1):
        np.testing.assert_allclose(cols[var], base, rtol=0, atol=1e-12)
    # the shared distribution is the mean of per-column sorted values
    dense = df.pivot_table(index="s", columns="var", values="v",
                           aggfunc="min", fill_value=0.0)
    dense = dense.reindex(index=range(n), fill_value=0.0).fillna(0.0)
    want = np.sort(dense.to_numpy(), axis=0).mean(axis=1)
    np.testing.assert_allclose(base, np.sort(want), atol=1e-12)


def test_grouped_rint_properties(ray_session):
    """RINT invariants: monotone in the input within a cohort, ties map
    to the same z, symmetric distribution (mean ~ 0), and the z of the
    median rank is ~0."""
    import ray.data as rd

    from gene_etl_ray.ops.correlate import grouped_rint

    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "g": np.repeat(["a", "b"], 101),
        "v": np.concatenate([rng.gamma(2, 5, 101),
                             np.round(rng.gamma(2, 5, 101))]),  # ties in b
    })
    out = grouped_rint(rd.from_pandas(df), "g", "v").to_pandas()
    for g, sub in out.groupby("g"):
        sub = sub.sort_values("v")
        assert (np.diff(sub["rint"].to_numpy()) >= -1e-12).all()
        assert abs(sub["rint"].mean()) < 0.05
        same_v = sub.groupby("v")["rint"].nunique()
        assert (same_v == 1).all()  # ties share a z


def test_fisher_exact_known_values(ray_session):
    """Fisher 2×2 vs published values: the tea-tasting [[3,1],[1,3]]
    two-sided p = 0.485714…, a perfectly-associated [[8,0],[0,8]] table
    p = 2/C(16,8) = 0.000155…, and independence → p = 1."""
    import ray.data as rd

    from gene_etl_ray.ops.correlate import fisher_exact_2x2

    def run(a, b, c, d):
        rows = ([(True, True)] * a + [(True, False)] * b
                + [(False, True)] * c + [(False, False)] * d)
        df = pd.DataFrame(rows, columns=["x", "y"])
        return float(fisher_exact_2x2(
            rd.from_pandas(df), "x", "y")["p_value"][0])

    assert abs(run(3, 1, 1, 3) - 0.4857142857) < 1e-9
    assert abs(run(8, 0, 0, 8) - 2.0 / 12870.0) < 1e-9
    assert abs(run(5, 5, 5, 5) - 1.0) < 1e-9


def test_fisher_degenerate_odds_ratio(ray_session):
    """Odds-ratio conventions at the table edges (r4 ADVICE): both
    diagonals zero → 0/0 → NaN (as R/scipy report); inf only when the
    numerator diagonal is non-zero."""
    import ray.data as rd

    from gene_etl_ray.ops.correlate import fisher_exact_2x2

    def odds(a, b, c, d):
        rows = ([(True, True)] * a + [(True, False)] * b
                + [(False, True)] * c + [(False, False)] * d)
        df = pd.DataFrame(rows, columns=["x", "y"])
        return float(fisher_exact_2x2(
            rd.from_pandas(df), "x", "y")["odds_ratio"][0])

    assert np.isnan(odds(5, 0, 0, 0))     # a*d == 0 and b*c == 0
    assert np.isinf(odds(4, 0, 0, 4))     # a*d > 0, b*c == 0
    assert odds(2, 1, 1, 2) == 4.0        # regular table


def test_anova_zero_within_variance_is_inf(ray_session):
    """Perfect within-group homogeneity with distinct means: F → +inf
    (maximally significant), not NaN (r4 ADVICE)."""
    import ray.data as rd

    from gene_etl_ray.ops.correlate import oneway_anova_f

    df = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 4,
                       "v": [1.0] * 4 + [2.0] * 4})
    out = oneway_anova_f(rd.from_pandas(df), "g", "v")
    assert np.isinf(out["f_stat"][0]) and out["f_stat"][0] > 0
    # all-identical values across groups stays NaN (ssb == 0 too)
    df2 = pd.DataFrame({"g": ["a", "a", "b", "b"], "v": [1.0] * 4})
    assert np.isnan(oneway_anova_f(rd.from_pandas(df2), "g", "v")["f_stat"][0])


def test_by_fdr_is_harmonic_scaled_bh():
    """BY == BH with every pre-clip value scaled by c(n) = Σ 1/i, and
    q_BY >= q_BH elementwise (the conservativeness guarantee)."""
    from gene_etl_ray.ops.correlate import bh_fdr

    rng = np.random.RandomState(2)
    p = rng.uniform(size=37)
    bh = bh_fdr(p)
    by = bh_fdr(p, dependence=True)
    cm = (1.0 / np.arange(1, len(p) + 1)).sum()
    np.testing.assert_allclose(by, np.minimum(bh * cm, 1.0), atol=1e-12)
    assert (by >= bh - 1e-12).all()
