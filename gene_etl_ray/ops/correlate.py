"""Rank statistics: Spearman / Kendall / Pearson grouped correlation,
blocked all-pairs correlation matrices, and Benjamini-Hochberg FDR.

This closes the reference's actual statistical engine LITERALLY (not just
by shape): the ``spearmanr/pearsonr/kendalltau`` method dispatch
(``/root/reference/etl/correlate.py:124-131``), the blocked
upper-triangle all-pairs correlation driver
(``correlate.py:34-113``, block loop ``:63-77``) and the per-cohort
BH-FDR rank transform (``correlate.py:149-189``) — re-expressed Ray-Data
first:

- grouped two-column correlation = ONE hash shuffle on the cohort key +
  a vectorized in-group kernel (ranks are a per-group transform, so the
  group is the natural barrier — the A7 "full-group barrier" operator);
- the all-pairs matrix = per-cohort pivot + tiled numpy matmuls over
  upper-triangle blocks (the reference's ``block_size`` tiling, as Arrow
  batch tiles);
- BH-FDR = the percent-rank machinery applied to p-values: sort p within
  the cohort, q_i = suffix-min of p_(j)·n/j, clipped to 1 — exactly
  ``multipletests(method='fdr_bh')`` semantics (tie-order invariant: all
  tied p share the same suffix, hence the same q).

No scipy in this environment, so the t-distribution survival function
used for Spearman/Pearson p-values is the standard regularized
incomplete-beta continued fraction (Lentz), pure numpy; its invariants
(p∈[0,1], monotone in |rho|, q ≥ p after BH) are pinned the same way the
reference pins its own p-values (``tests/test_correlate.py:46-47``,
``:139``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def _rank_average(x: np.ndarray) -> np.ndarray:
    """Average ranks (1-based, ties → mean of tied positions) — the
    spearmanr tie convention, vectorized."""
    order = np.argsort(x, kind="mergesort")
    sx = x[order]
    # rank span per tie-group: first..last position, average them
    n = len(x)
    first = np.zeros(n, dtype=np.int64)
    new = np.ones(n, dtype=bool)
    new[1:] = sx[1:] != sx[:-1]
    grp = np.cumsum(new) - 1
    counts = np.bincount(grp)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    avg = starts[grp] + (counts[grp] + 1) / 2.0  # 1-based average rank
    out = np.empty(n, dtype=np.float64)
    out[order] = avg
    return out


def _pearson(x: np.ndarray, y: np.ndarray) -> float:
    xm = x - x.mean()
    ym = y - y.mean()
    denom = np.sqrt((xm * xm).sum() * (ym * ym).sum())
    if denom == 0.0:
        return np.nan
    return float((xm * ym).sum() / denom)


def _kendall_tau_b(x: np.ndarray, y: np.ndarray, block: int = 2048) -> float:
    """Kendall tau-b via blocked pairwise sign comparison: O(n²) work
    tiled into ``block``-sized strips so memory stays O(n·block). For
    cohort-sized groups (the reference's unit of work) this is the
    simple exact kernel; beyond ~10⁵ rows per cohort switch to the
    O(n log n) merge-sort inversion count."""
    n = len(x)
    if n < 2:
        return np.nan
    cd = 0  # C - D
    for i0 in range(0, n, block):
        xi = x[i0 : i0 + block, None]
        yi = y[i0 : i0 + block, None]
        # only pairs (i, j) with j > i: compare strip against the tail
        xj = x[None, i0 + 1 :]
        yj = y[None, i0 + 1 :]
        # mask to strict upper triangle within the strip offset
        ii = np.arange(i0, min(i0 + block, n))[:, None]
        jj = np.arange(i0 + 1, n)[None, :]
        mask = jj > ii
        s = np.sign(xi - xj) * np.sign(yi - yj)
        cd += int(s[mask].sum())
    n0 = n * (n - 1) // 2

    def tie_term(v: np.ndarray) -> int:
        _, c = np.unique(v, return_counts=True)
        return int((c * (c - 1) // 2).sum())

    n1, n2 = tie_term(x), tie_term(y)
    denom = np.sqrt(float(n0 - n1) * float(n0 - n2))
    if denom == 0.0:
        return np.nan
    return float(cd / denom)


def _betacf(a: float, b: float, x: np.ndarray) -> np.ndarray:
    """Continued fraction for the regularized incomplete beta (Lentz),
    vectorized over x — standard public-domain numerics."""
    MAXIT, EPS, FPMIN = 200, 3e-12, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = np.ones_like(x)
    d = 1.0 - qab * x / qap
    d = np.where(np.abs(d) < FPMIN, FPMIN, d)
    d = 1.0 / d
    h = d.copy()
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < FPMIN, FPMIN, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < FPMIN, FPMIN, c)
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < FPMIN, FPMIN, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < FPMIN, FPMIN, c)
        d = 1.0 / d
        delta = d * c
        h *= delta
        if np.all(np.abs(delta - 1.0) < EPS):
            break
    return h


def _betainc_reg(a: float, b: float, x: np.ndarray) -> np.ndarray:
    """Regularized incomplete beta I_x(a, b), vectorized."""
    from math import lgamma

    x = np.clip(np.asarray(x, dtype=np.float64), 0.0, 1.0)
    ln_beta = lgamma(a + b) - lgamma(a) - lgamma(b)
    with np.errstate(divide="ignore"):
        front = np.exp(
            ln_beta + a * np.log(np.where(x > 0, x, 1.0))
            + b * np.log1p(-np.where(x < 1, x, 0.0))
        )
    use_direct = x < (a + 1.0) / (a + b + 2.0)
    out = np.empty_like(x)
    xd = np.where(use_direct, x, 0.5)
    out_d = front * _betacf(a, b, xd) / a
    xs = np.where(~use_direct, x, 0.5)
    front_s = np.exp(
        ln_beta + a * np.log(np.where(xs > 0, xs, 1.0))
        + b * np.log1p(-np.where(xs < 1, xs, 0.0))
    )
    out_s = 1.0 - front_s * _betacf(b, a, 1.0 - xs) / b
    out = np.where(use_direct, out_d, out_s)
    out = np.where(x <= 0.0, 0.0, out)
    out = np.where(x >= 1.0, 1.0, out)
    return out


def t_sf_two_sided(t: np.ndarray, df: float) -> np.ndarray:
    """Two-sided Student-t survival p-value: P(|T| >= |t|) =
    I_{df/(df+t²)}(df/2, 1/2)."""
    t = np.asarray(t, dtype=np.float64)
    x = df / (df + t * t)
    return _betainc_reg(df / 2.0, 0.5, x)


def corr_p_value(rho: np.ndarray, n: np.ndarray) -> np.ndarray:
    """t-test p-value for a (Spearman/Pearson) correlation — the
    reference's per-pair significance (``correlate.py:124-135``)."""
    rho = np.asarray(rho, dtype=np.float64)
    n = np.asarray(n, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = rho * np.sqrt((n - 2.0) / np.maximum(1.0 - rho * rho, 1e-300))
    out = np.ones_like(rho)
    ok = (n > 2) & np.isfinite(rho)
    if ok.any():
        # df varies per row; group identical df values (cohort-constant
        # in practice) to keep the betainc calls vectorized
        for df in np.unique(n[ok]):
            m = ok & (n == df)
            out[m] = t_sf_two_sided(t[m], df - 2.0)
    out = np.where(ok & (np.abs(rho) >= 1.0), 0.0, out)
    return np.clip(out, 0.0, 1.0)


def bh_fdr(p: np.ndarray, dependence: bool = False) -> np.ndarray:
    """Benjamini-Hochberg adjusted q-values (``fdr_bh`` semantics):
    sort p, q_(i) = min_{j>=i} p_(j)·n/j clipped to 1, unsort. Tie-order
    invariant. Vectorized (one sort + one reverse cummin).
    ``dependence=True`` applies the Benjamini-Yekutieli correction
    (``fdr_by``): the n/j factor multiplies by the harmonic number
    c(n) = Σ 1/i — valid under ARBITRARY test dependence, the
    conservative variant genomics pipelines reach for when tests
    correlate (linked genes)."""
    p = np.asarray(p, dtype=np.float64)
    n = len(p)
    if n == 0:
        return p.copy()
    order = np.argsort(p, kind="mergesort")
    cm = float((1.0 / np.arange(1, n + 1)).sum()) if dependence else 1.0
    ranked = p[order] * (n * cm) / np.arange(1, n + 1)
    q_sorted = np.minimum.accumulate(ranked[::-1])[::-1]
    q_sorted = np.clip(q_sorted, 0.0, 1.0)
    out = np.empty(n, dtype=np.float64)
    out[order] = q_sorted
    return out


def grouped_corr(
    ds: ray.data.Dataset,
    key: str,
    x: str,
    y: str,
    method: str = "spearman",
    rho_name: str = "rho",
) -> pd.DataFrame:
    """Per-cohort two-column correlation with the reference's method
    dispatch (spearman | pearson | kendall, ``correlate.py:124-131``):
    ONE hash shuffle on the cohort key, then a fully vectorized in-group
    kernel (average-rank transform for spearman, blocked pairwise signs
    for kendall). Returns (key, rho, n) sorted by key."""
    if method not in ("spearman", "pearson", "kendall"):
        raise ValueError(f"unknown correlation method {method!r}")

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        xv = g[x].to_numpy(dtype=np.float64)
        yv = g[y].to_numpy(dtype=np.float64)
        if method == "spearman":
            rho = _pearson(_rank_average(xv), _rank_average(yv))
        elif method == "pearson":
            rho = _pearson(xv, yv)
        else:
            rho = _kendall_tau_b(xv, yv)
        return pd.DataFrame(
            {key: [g[key].iloc[0]], rho_name: [rho], "n": [np.int64(len(g))]}
        )

    out = (
        ds.groupby(key)
        .map_groups(per_group, batch_format="pandas")
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(key).reset_index(drop=True)


def grouped_bh_fdr(
    ds: ray.data.Dataset,
    key: str,
    p_col: str,
    q_name: str = "q_value",
    dependence: bool = False,
) -> ray.data.Dataset:
    """Per-cohort BH-FDR (``correlate.py:149-189``): the A7 full-group
    barrier — every p of a cohort must be ranked together, so the cohort
    is the shuffle key and the correction is a vectorized per-group
    transform. Appends ``q_name``; row set unchanged."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g[q_name] = bh_fdr(
            g[p_col].to_numpy(dtype=np.float64), dependence=dependence)
        return g

    return ds.groupby(key).map_groups(per_group, batch_format="pandas")


def pairwise_corr_matrix(
    ds: ray.data.Dataset,
    var_col: str,
    sample_col: str,
    value_col: str,
    group_col: str | None = None,
    method: str = "pearson",
    fill: float = 0.0,
    block_size: int = 256,
) -> pd.DataFrame:
    """Blocked all-pairs correlation (the reference's flagship compute,
    ``correlate.py:34-113``): pivot the long (sample, var, value) table
    to a samples × vars matrix per cohort (missing cells → ``fill``,
    parity with ``pivot(...).fill_null(0.0)`` at ``filters.py:60-64``),
    then correlate every var pair via UPPER-TRIANGLE BLOCK TILES — each
    tile is one centered matmul, O(block² · samples) — and emit long
    rows (var_a < var_b, rho, n). One shuffle on the cohort key; within
    a cohort the matrix is the barrier, exactly like the reference's
    per-cohort matrix.

    Partitioning assumption (documented per the custom-operator rule):
    one cohort's pivoted matrix fits a worker — vars_per_cohort ×
    samples doubles. At 10-TB fact scale with bounded cohort width
    that holds; an unbounded-width cohort needs the tile loop hoisted
    to its own task fan-out (tile ids as a Dataset)."""

    def per_cohort(g: pd.DataFrame) -> pd.DataFrame:
        mat = g.pivot_table(
            index=sample_col,
            columns=var_col,
            values=value_col,
            # "min", not "first": when the input carries duplicate
            # (sample, var) observations the winning cell must not
            # depend on shuffle arrival order ("first" does — it made
            # lineitem_corr_fdr_pipeline nondeterministic before it was
            # value-gated). Where (sample, var) is unique — every other
            # caller — min == first.
            aggfunc="min",
            fill_value=fill,
        ).sort_index(axis=1)
        names = list(mat.columns)
        m = mat.to_numpy(dtype=np.float64)  # samples × vars
        if method == "spearman":
            m = np.apply_along_axis(_rank_average, 0, m)
        elif method != "pearson":
            raise ValueError(f"matrix method {method!r} not supported")
        n_samples, n_vars = m.shape
        mc = m - m.mean(axis=0, keepdims=True)
        norms = np.sqrt((mc * mc).sum(axis=0))
        rows_a, rows_b, rhos = [], [], []
        for a0 in range(0, n_vars, block_size):
            a1 = min(a0 + block_size, n_vars)
            for b0 in range(a0, n_vars, block_size):
                b1 = min(b0 + block_size, n_vars)
                tile = mc[:, a0:a1].T @ mc[:, b0:b1]
                denom = norms[a0:a1, None] * norms[None, b0:b1]
                with np.errstate(divide="ignore", invalid="ignore"):
                    r = np.where(denom > 0, tile / denom, np.nan)
                ia, jb = np.nonzero(
                    np.arange(a0, a1)[:, None] < np.arange(b0, b1)[None, :]
                )
                rows_a.extend(names[a0 + i] for i in ia)
                rows_b.extend(names[b0 + j] for j in jb)
                rhos.extend(r[ia, jb])
        out = pd.DataFrame(
            {
                "var_a": rows_a,
                "var_b": rows_b,
                "rho": np.asarray(rhos, dtype=np.float64),
                "n": np.int64(n_samples),
            }
        )
        if group_col is not None:
            out.insert(0, group_col, g[group_col].iloc[0])
        return out

    if group_col is None:
        tagged = ds.map_batches(
            lambda b: b.assign(__cohort=0), batch_format="pandas"
        )
        out = (
            tagged.groupby("__cohort")
            .map_groups(per_cohort, batch_format="pandas")
            .to_pandas()
        )
    else:
        out = (
            ds.groupby(group_col)
            .map_groups(per_cohort, batch_format="pandas")
            .to_pandas()
        )
    out["n"] = out["n"].astype("int64")
    sort_cols = ([group_col] if group_col else []) + ["var_a", "var_b"]
    return out.sort_values(sort_cols).reset_index(drop=True)


def corr_with_fdr(
    ds: ray.data.Dataset,
    var_col: str,
    sample_col: str,
    value_col: str,
    group_col: str,
    method: str = "spearman",
    alpha: float = 0.05,
) -> pd.DataFrame:
    """The reference's END-TO-END statistical pipeline in one call
    (``correlate.py:249-295``): per cohort, all-pairs correlation over
    the pivoted matrix → t-test p-value per pair → per-cohort BH-FDR →
    significance flag at ``alpha``. Returns
    (group, var_a, var_b, rho, p_value, q_value, n, significant)."""
    out = pairwise_corr_matrix(
        ds, var_col, sample_col, value_col, group_col=group_col, method=method
    )
    out["p_value"] = corr_p_value(out["rho"].to_numpy(), out["n"].to_numpy())
    parts = []
    for _, g in out.groupby(group_col, sort=True):
        g = g.copy()
        g["q_value"] = bh_fdr(g["p_value"].to_numpy())
        parts.append(g)
    res = pd.concat(parts, ignore_index=True) if parts else out.assign(q_value=[])
    res["significant"] = res["q_value"] < alpha
    return res.sort_values([group_col, "var_a", "var_b"]).reset_index(drop=True)


def grouped_welch_ttest(
    ds: ray.data.Dataset,
    group_col: str,
    cohort_col: str,
    value_col: str,
    cohort_a,
    cohort_b,
) -> pd.DataFrame:
    """Per-group Welch two-sample t-test between two cohorts — the
    hypothesis-testing slot beside the correlation engine (the
    reference tests gene-pair effects per illness cohort;
    ``correlate.py:124-189`` family). Fully distributed via MERGEABLE
    per-batch moments: each batch emits (n, Σx, Σx²) per
    (group, cohort); the driver merge is O(groups) and computes

      t  = (m_a − m_b) / √(s²_a/n_a + s²_b/n_b)
      df = (s²_a/n_a + s²_b/n_b)² /
           ((s²_a/n_a)²/(n_a−1) + (s²_b/n_b)²/(n_b−1))   (Welch–
      p  = 2·SF_t(|t|, df)                                Satterthwaite)

    with s² the SAMPLE variance. t and df are closed-form arithmetic —
    SQL-oracle-able; p uses the repo's own regularized-incomplete-beta
    Student SF (``t_sf_two_sided``). Groups with a cohort of n < 2 get
    NaN. Returns (group, n_a, n_b, t_stat, welch_df, p_value)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[cohort_col].isin([cohort_a, cohort_b])]
        if not len(b):
            return pd.DataFrame(
                {group_col: pd.Series([], dtype=object),
                 "c": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64),
                 "s": pd.Series([], dtype=np.float64),
                 "q": pd.Series([], dtype=np.float64)}
            )
        v = b[value_col].to_numpy(dtype=np.float64)
        g = b.assign(__v=v, __v2=v * v).groupby(
            [group_col, cohort_col], sort=False, as_index=False
        ).agg(n=("__v", "size"), s=("__v", "sum"), q=("__v2", "sum"))
        return g.rename(columns={cohort_col: "c"})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    m = parts.groupby([group_col, "c"], as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"), q=("q", "sum")
    )
    rows = []
    for gval, sub in m.groupby(group_col, sort=True):
        stats = {}
        for _, r in sub.iterrows():
            n = int(r["n"])
            mean = r["s"] / n
            var = (r["q"] - n * mean * mean) / (n - 1) if n > 1 else np.nan
            stats[r["c"]] = (n, mean, var)
        a = stats.get(cohort_a)
        b_ = stats.get(cohort_b)
        if a is None or b_ is None or a[0] < 2 or b_[0] < 2:
            rows.append((gval, a[0] if a else 0, b_[0] if b_ else 0,
                         np.nan, np.nan, np.nan))
            continue
        (na, ma, va), (nb, mb, vb) = a, b_
        se2 = va / na + vb / nb
        t = (ma - mb) / np.sqrt(se2)
        df = se2 * se2 / (
            (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
        )
        p = float(t_sf_two_sided(np.array([t]), df)[0])
        rows.append((gval, na, nb, t, df, p))
    out = pd.DataFrame(
        rows,
        columns=[group_col, "n_a", "n_b", "t_stat", "welch_df", "p_value"],
    )
    out["n_a"] = out["n_a"].astype("int64")
    out["n_b"] = out["n_b"].astype("int64")
    return out.reset_index(drop=True)


def chi2_independence(
    ds: ray.data.Dataset,
    a_col: str,
    b_col: str,
) -> pd.DataFrame:
    """Pearson χ² test of independence between two categorical columns
    (bot-vs-human event-mix, language-vs-source drift — the categorical
    sibling of the correlation engine). Pure counts, so the distributed
    shape is one (a, b) count combiner per batch and an
    O(|A|·|B|)-cell driver merge; the statistic
    ``Σ (O − E)² / E`` with ``E = row·col/n`` and
    ``df = (|A|−1)(|B|−1)`` is closed-form arithmetic — fully
    SQL-oracle-able. Null categories are their own level, as SQL
    GROUP BY treats them. Returns one row (chi2, df, n)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby([a_col, b_col], sort=False, dropna=False,
                      as_index=False).size()
        return g.rename(columns={"size": "n"})

    cells = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby([a_col, b_col], dropna=False, as_index=False)["n"]
        .sum()
    )
    n = float(cells["n"].sum())
    piv = cells.pivot_table(
        index=a_col, columns=b_col, values="n", fill_value=0,
        aggfunc="sum", dropna=False,
    ).to_numpy(dtype=np.float64)
    row = piv.sum(axis=1, keepdims=True)
    col = piv.sum(axis=0, keepdims=True)
    expected = row @ col / n
    chi2 = float(((piv - expected) ** 2 / expected).sum())
    df = (piv.shape[0] - 1) * (piv.shape[1] - 1)
    return pd.DataFrame(
        {"chi2": [chi2], "df": [np.int64(df)], "n": [np.int64(n)]}
    )


def grouped_mann_whitney(
    ds: ray.data.Dataset,
    group_col: str,
    cohort_col: str,
    value_col: str,
    cohort_a,
    cohort_b,
) -> pd.DataFrame:
    """Per-group Mann–Whitney U (Wilcoxon rank-sum) between two cohorts
    — the nonparametric sibling of ``grouped_welch_ttest`` for skewed
    webtext metrics where means mislead. A full-group barrier op (A7):
    the combined sample's AVERAGE ranks must be assigned per group, so
    the group is the shuffle key and the in-group kernel is the same
    vectorized average-rank transform Spearman uses. Emits the exact U
    for cohort a (``U = R_a − n_a(n_a+1)/2``) and the tie-corrected
    normal approximation
    ``z = (U − n_a·n_b/2) / √(n_a·n_b/12 · ((n+1) − Σ(t³−t)/(n(n−1))))``
    — both closed-form arithmetic, SQL-oracle-able (average ranks =
    ``RANK() + (ties−1)/2``). Groups missing a cohort yield NaN.
    Returns (group, n_a, n_b, u_stat, z)."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        gval = g[group_col].iloc[0]
        g = g[g[cohort_col].isin([cohort_a, cohort_b])]
        va = g.loc[g[cohort_col] == cohort_a, value_col].to_numpy(np.float64)
        vb = g.loc[g[cohort_col] == cohort_b, value_col].to_numpy(np.float64)
        na, nb = len(va), len(vb)
        if na == 0 or nb == 0:
            return pd.DataFrame(
                {group_col: [gval], "n_a": [np.int64(na)],
                 "n_b": [np.int64(nb)], "u_stat": [np.nan], "z": [np.nan]}
            )
        both = np.concatenate([va, vb])
        ranks = _rank_average(both)
        r_a = float(ranks[:na].sum())
        u = r_a - na * (na + 1) / 2.0
        n = na + nb
        _, counts = np.unique(both, return_counts=True)
        tie_term = float((counts.astype(np.float64) ** 3 - counts).sum())
        var = na * nb / 12.0 * ((n + 1) - tie_term / (n * (n - 1)))
        z = (u - na * nb / 2.0) / np.sqrt(var) if var > 0 else np.nan
        return pd.DataFrame(
            {group_col: [gval], "n_a": [np.int64(na)],
             "n_b": [np.int64(nb)], "u_stat": [u], "z": [z]}
        )

    out = (
        ds.groupby(group_col)
        .map_groups(per_group, batch_format="pandas")
        .to_pandas()
    )
    out["n_a"] = out["n_a"].astype("int64")
    out["n_b"] = out["n_b"].astype("int64")
    return out.sort_values(group_col).reset_index(drop=True)


def grouped_ols(
    ds: ray.data.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
) -> pd.DataFrame:
    """Per-group simple linear regression (OLS of y on x) — the
    effect-size companion to the correlation engine (the reference
    reports correlation strength per cohort, ``correlate.py:124-189``;
    slope/intercept/R² is the same bivariate-moment family). Fully
    distributed via MERGEABLE per-batch moments: each batch emits
    (n, Σx, Σy, Σxx, Σyy, Σxy) per group — six doubles, so the driver
    merge is O(groups) regardless of row count — and the closed forms

      slope     = Sxy / Sxx          (Sxy = Σxy − n·x̄·ȳ, …)
      intercept = ȳ − slope·x̄
      r2        = Sxy² / (Sxx·Syy)

    are plain arithmetic — fully SQL-oracle-able against DuckDB's
    regr_slope / regr_intercept / regr_r2. Rows where either value is
    null are dropped (SQL regr_* semantics — n matches regr_count);
    groups with n < 2 or zero x-variance yield NaN; a constant-y group
    with varying x is a perfect fit (r2 = 1.0, regr_r2 parity). Returns
    (group, n, slope, intercept, r2)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[group_col, x_col, y_col]].dropna(subset=[x_col, y_col])
        if not len(b):
            return pd.DataFrame(
                {group_col: pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64),
                 "sx": pd.Series([], dtype=np.float64),
                 "sy": pd.Series([], dtype=np.float64),
                 "sxx": pd.Series([], dtype=np.float64),
                 "syy": pd.Series([], dtype=np.float64),
                 "sxy": pd.Series([], dtype=np.float64)}
            )
        x = b[x_col].to_numpy(dtype=np.float64)
        y = b[y_col].to_numpy(dtype=np.float64)
        g = b.assign(
            __x=x, __y=y, __xx=x * x, __yy=y * y, __xy=x * y
        ).groupby(group_col, sort=False, as_index=False).agg(
            n=("__x", "size"), sx=("__x", "sum"), sy=("__y", "sum"),
            sxx=("__xx", "sum"), syy=("__yy", "sum"), sxy=("__xy", "sum")
        )
        return g

    m = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(group_col, as_index=False)
        .agg(n=("n", "sum"), sx=("sx", "sum"), sy=("sy", "sum"),
             sxx=("sxx", "sum"), syy=("syy", "sum"), sxy=("sxy", "sum"))
    )
    n = m["n"].to_numpy(dtype=np.float64)
    mx = m["sx"].to_numpy() / n
    my = m["sy"].to_numpy() / n
    cxx = m["sxx"].to_numpy() - n * mx * mx
    cyy = m["syy"].to_numpy() - n * my * my
    cxy = m["sxy"].to_numpy() - n * mx * my
    with np.errstate(divide="ignore", invalid="ignore"):
        ok = (n >= 2) & (cxx > 0)
        slope = np.where(ok, cxy / cxx, np.nan)
        intercept = my - slope * mx
        # regr_r2 parity: a constant-y group (cyy == 0) with varying x
        # is a perfect fit -> 1.0, not NaN (verified DuckDB behavior)
        r2 = np.where(
            ok, np.where(cyy > 0, cxy * cxy / (cxx * cyy), 1.0), np.nan
        )
    out = pd.DataFrame(
        {group_col: m[group_col], "n": m["n"].astype("int64"),
         "slope": slope, "intercept": intercept, "r2": r2}
    )
    return out.sort_values(group_col).reset_index(drop=True)


def grouped_block_jackknife(
    ds: ray.data.Dataset,
    group_col: str,
    val_col: str,
    id_col: str,
    n_blocks: int = 20,
) -> pd.DataFrame:
    """Delete-one-block jackknife standard error of the per-group mean
    (Efron 1981; the distributed-friendly resampling scheme — unlike
    the bootstrap, block jackknife needs only per-(group, block) sum /
    count partials, so the exchange is |groups|·``n_blocks`` rows no
    matter how many rows stream through). Blocks are assigned by
    ``id_col % n_blocks`` — deterministic AND SQL-expressible, which is
    what puts a resampling estimator under the value-hash oracle gate.

    Per group: mean = S/N over non-null values; leave-one-out means
    θ_b = (S−s_b)/(N−n_b) over the blocks that hold data; jackknife
    SE = √((B−1)/B · Σ(θ_b − θ̄)²). Returns (group, mean, jk_se, B
    as n_blocks_used)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[group_col, val_col, id_col]].dropna(subset=[val_col])
        if not len(b):
            return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                 "__blk": pd.array([], dtype="int64"),
                                 "s": pd.Series([], dtype="float64"),
                                 "n": pd.array([], dtype="int64")})
        blk = (b[id_col].to_numpy(dtype=np.int64) % n_blocks)
        return b.assign(__blk=blk).groupby(
            [group_col, "__blk"], as_index=False, sort=False
        ).agg(s=(val_col, "sum"), n=(val_col, "count"))

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    agg = parts.groupby([group_col, "__blk"], as_index=False).agg(
        s=("s", "sum"), n=("n", "sum")
    )
    g = agg.groupby(group_col)
    agg["S"] = g["s"].transform("sum")
    agg["N"] = g["n"].transform("sum")
    agg["B"] = g["s"].transform("size")
    agg["theta"] = (agg["S"] - agg["s"]) / (agg["N"] - agg["n"])
    agg["tbar"] = agg.groupby(group_col)["theta"].transform("mean")
    dev2 = (agg["theta"] - agg["tbar"]) ** 2
    # skipna=False: a single-block group has theta = 0/0 = NaN and the
    # SQL twin's sum over an all-NULL partition is NULL — propagate NaN
    # instead of silently reporting jk_se = 0.0
    out = agg.assign(__d2=dev2).groupby(group_col, as_index=False).agg(
        S=("S", "first"), N=("N", "first"), B=("B", "first"),
        ssd=("__d2", lambda x: x.sum(skipna=False)),
    )
    out["mean"] = out["S"] / out["N"]
    out["jk_se"] = np.sqrt((out["B"] - 1.0) / out["B"] * out["ssd"])
    out["n_blocks_used"] = out["B"].astype("int64")
    return out[[group_col, "mean", "jk_se", "n_blocks_used"]].sort_values(
        group_col
    ).reset_index(drop=True)


def quantile_normalize(
    ds: ray.data.Dataset,
    var_col: str,
    sample_col: str,
    value_col: str,
    n_vars: int | None = None,
    fill: float = 0.0,
) -> ray.data.Dataset:
    """Quantile normalization (Bolstad et al. 2003) — THE cross-sample
    matrix normalizer of the reference's gene-expression domain
    (``/root/reference/etl/correlate.py`` consumes expression matrices;
    normalization is the step upstream of its correlation flagship),
    re-expressed Ray-Data-first over a long (sample_id=``sample_col``
    row entity, ``var_col`` column entity, value) table:

      1. densify: every (row, column) cell exists (missing → ``fill``),
         built as a Dataset cross of the distinct row ids × columns —
         nothing corpus-sized on the driver;
      2. per COLUMN, rank cells by (value, row-id) — row_number
         semantics with a pinned deterministic tie-break, so the whole
         op is SQL-twin-able (classic average-tie qnorm is not);
      3. the reference distribution = mean across columns of the
         r-th smallest values — ONE grouped aggregate on rank;
      4. every cell takes ref[its rank] — one partitioned int join.

    Partitioning assumption (custom-operator rule): one COLUMN's cells
    fit a worker (n_rows doubles — the per-sample barrier every qnorm
    implementation has); columns are the parallel unit, exactly the
    many-genes × few-samples shape of expression data. Returns a
    Dataset of (sample_col=row id, var_col, ``qnorm_value``)."""
    from gene_etl_ray.ops.relational import partitioned_join

    # distinct columns (tiny) — needed to densify; ranks are per column
    if n_vars is None:
        vcols = sorted(int(v) for v in ds.unique(var_col))
    else:
        vcols = list(range(1, n_vars + 1))

    # one value per (row, col): deterministic "min" collapse (duplicate
    # observations must not depend on arrival order — pivot parity)
    def cell_partial(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby([sample_col, var_col], as_index=False, sort=False)[
            value_col].min()

    from gene_etl_ray.ops.dedup import bucketed_group_apply

    cells = bucketed_group_apply(
        ds.select_columns([sample_col, var_col, value_col]),
        [sample_col], cell_partial,
    )

    # densify: rows × columns grid as a Dataset fan-out of distinct rows
    rows = bucketed_group_apply(
        ds.select_columns([sample_col]),
        [sample_col],
        lambda g: g.drop_duplicates(sample_col),
    )

    def fan(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[sample_col].to_numpy(np.int64)
        return pd.DataFrame({
            sample_col: np.repeat(ids, len(vcols)),
            var_col: np.tile(np.asarray(vcols, dtype=np.int64), len(ids)),
        })

    grid = rows.map_batches(fan, batch_format="pandas")
    # composite (row, col) key folded to one int for the single-key join
    K = np.int64(1_000_003)

    def gkey(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        s = b[sample_col].to_numpy(np.int64)
        v = b[var_col].to_numpy(np.int64)
        # id-domain guard (graph-op convention): the composite key is
        # collision-free only for 0 ≤ var < K and 0 ≤ sample < 2^53/K —
        # out-of-domain ids fail LOUDLY instead of silently colliding
        if len(v) and (
            v.min() < 0 or v.max() >= K
            or s.min() < 0 or s.max() >= (1 << 53) // K
        ):
            raise ValueError(
                "quantile_normalize composite key out of domain: "
                f"requires 0 <= {var_col} < {int(K)} and "
                f"0 <= {sample_col} < 2^53/{int(K)} — remap ids "
                "(dense-rank) first"
            )
        b["__k"] = s * K + v
        return b

    grid_k = grid.map_batches(gkey, batch_format="pandas")
    cells_k = cells.map_batches(gkey, batch_format="pandas").map_batches(
        lambda b: b[["__k", value_col]].rename(
            columns={"__k": "__ck", value_col: "__v"}),
        batch_format="pandas",
    )
    dense = partitioned_join(grid_k, cells_k, "__k", "__ck", how="left")

    def ranked(g: pd.DataFrame) -> pd.DataFrame:
        v = g["__v"].to_numpy(np.float64)
        v = np.where(np.isnan(v), fill, v)
        ids = g[sample_col].to_numpy(np.int64)
        order = np.lexsort((ids, v))
        r = np.empty(len(g), dtype=np.int64)
        r[order] = np.arange(1, len(g) + 1)
        return pd.DataFrame({
            sample_col: ids,
            var_col: g[var_col].to_numpy(np.int64),
            "__r": r,
            "__v": v,
        })

    ranked_ds = dense.groupby(var_col).map_groups(
        ranked, batch_format="pandas")

    # reference distribution: mean of the r-th smallest across columns —
    # rank-keyed grouped aggregate, O(n_rows) rows, stays a Dataset
    ref = bucketed_group_apply(
        ranked_ds.select_columns(["__r", "__v"]),
        ["__r"],
        lambda g: g.groupby("__r", as_index=False, sort=False)["__v"].mean(),
    ).map_batches(
        lambda b: b.rename(columns={"__r": "__rr", "__v": "qnorm_value"}),
        batch_format="pandas",
    )

    out = partitioned_join(
        ranked_ds.select_columns([sample_col, var_col, "__r"]),
        ref, "__r", "__rr", how="inner",
    )
    return out.map_batches(
        lambda b: b[[sample_col, var_col, "qnorm_value"]],
        batch_format="pandas",
    )


# Acklam's inverse-normal-CDF rational approximation (public-domain
# numerics, abs err ~1.15e-9): three Horner branches. The SQL twin
# evaluates the SAME polynomials with the same association, so engine
# and oracle agree to double rounding, not approximation error.
_PPF_A = (-3.969683028665376e+01, 2.209460984245205e+02,
          -2.759285104469687e+02, 1.383577518672690e+02,
          -3.066479806614716e+01, 2.506628277459239e+00)
_PPF_B = (-5.447609879822406e+01, 1.615858368580409e+02,
          -1.556989798598866e+02, 6.680131188771972e+01,
          -1.328068155288572e+01)
_PPF_C = (-7.784894002430293e-03, -3.223964580411365e-01,
          -2.400758277161838e+00, -2.549732539343734e+00,
          4.374664141464968e+00, 2.938163982698783e+00)
_PPF_D = (7.784695709041462e-03, 3.224671290700398e-01,
          2.445134137142996e+00, 3.754408661907416e+00)
_PPF_PLOW = 0.02425


def norm_ppf(p: np.ndarray) -> np.ndarray:
    """Vectorized Φ⁻¹ (Acklam). Valid on (0, 1)."""
    p = np.asarray(p, dtype=np.float64)
    a, b, c, d = _PPF_A, _PPF_B, _PPF_C, _PPF_D
    out = np.empty_like(p)
    low = p < _PPF_PLOW
    high = p > 1.0 - _PPF_PLOW
    mid = ~(low | high)
    if mid.any():
        q = p[mid] - 0.5
        r = q * q
        out[mid] = (
            (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r
             + a[5]) * q
            / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r
               + 1.0)
        )
    if low.any():
        q = np.sqrt(-2.0 * np.log(p[low]))
        out[low] = (
            ((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q
            + c[5]
        ) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0)
    if high.any():
        q = np.sqrt(-2.0 * np.log(1.0 - p[high]))
        out[high] = -(
            ((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q
            + c[5]
        ) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0)
    return out


def grouped_rint(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    out_col: str = "rint",
    offset: float = 0.375,
) -> ray.data.Dataset:
    """Per-cohort rank-based inverse normal transform — the second
    classic normalizer of the reference's statistical domain (Blom
    offset): z = Φ⁻¹((r − 0.375) / (n + 0.25)) with AVERAGE ranks, so
    tied values transform identically and the result is permutation-
    invariant. One hash shuffle on the cohort key + a vectorized
    in-group kernel (the A7 barrier shape, like grouped_corr); rows
    pass through with ``out_col`` appended."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        v = g[value_col].to_numpy(np.float64)
        r = _rank_average(v)
        g[out_col] = norm_ppf((r - offset) / (len(g) + 1.0 - 2.0 * offset))
        return g

    return ds.groupby(key).map_groups(per_group, batch_format="pandas")


def mutual_information(
    ds: ray.data.Dataset, a: str, b: str
) -> pd.DataFrame:
    """Plug-in mutual information I(A;B) = Σ p(a,b)·ln(p(a,b)/(p(a)p(b)))
    between two discrete columns (nats) — the dependence measure beside
    the χ² test (same distributed shape: one (a, b) count combiner per
    batch, O(cells) driver merge, closed-form statistic). Also returns
    the marginal entropies and the normalized MI
    I/√(H(A)·H(B)) ∈ [0, 1]. SQL-twin-able end to end."""
    from gene_etl_ray.ops.relational import grouped_aggregate_partial

    counts = grouped_aggregate_partial(ds, [a, b], sums={}, counts="n")
    n = counts["n"].to_numpy(np.float64)
    total = n.sum()
    pab = n / total
    pa = counts.groupby(a, sort=False)["n"].transform("sum").to_numpy(
        np.float64) / total
    pb = counts.groupby(b, sort=False)["n"].transform("sum").to_numpy(
        np.float64) / total
    mi = float((pab * np.log(pab / (pa * pb))).sum())

    def ent(key: str) -> float:
        m = counts.groupby(key, sort=False)["n"].sum().to_numpy(np.float64)
        p = m / total
        return float(-(p * np.log(p)).sum())

    ha, hb = ent(a), ent(b)
    denom = np.sqrt(ha * hb)
    return pd.DataFrame({
        "mi": [mi], "h_a": [ha], "h_b": [hb],
        "nmi": [mi / denom if denom > 0 else 0.0],
        "n": [np.int64(total)],
    })


def fisher_exact_2x2(
    ds: ray.data.Dataset, x: str, y: str
) -> pd.DataFrame:
    """Fisher's exact test on the 2×2 table of two boolean columns —
    the enrichment-test staple of the reference's domain (gene-set
    enrichment is a hypergeometric tail). Counts come from ONE
    distributed (x, y) combiner; the statistic is closed-form on the
    O(1) table: two-sided p = Σ pmf(k) over all tables (margins fixed)
    whose pmf ≤ pmf(observed)·(1+1e-7) — R's fisher.test convention,
    with the relative tolerance absorbing last-ulp lgamma differences
    between engines. log-pmf via lgamma:
      ln pmf(k) = lnC(r1, k) + lnC(r2, c1−k) − lnC(n, c1).
    Returns (a, b, c, d, odds_ratio, p_value)."""
    from math import lgamma

    from gene_etl_ray.ops.relational import grouped_aggregate_partial

    counts = grouped_aggregate_partial(ds, [x, y], sums={}, counts="n")
    tab = {(bool(r[x]), bool(r[y])): int(r["n"])
           for r in counts.to_dict("records")}
    a = tab.get((True, True), 0)
    b = tab.get((True, False), 0)
    c = tab.get((False, True), 0)
    d = tab.get((False, False), 0)
    r1, r2, c1, n = a + b, c + d, a + c, a + b + c + d

    def lnC(nn: int, kk: int) -> float:
        return lgamma(nn + 1) - lgamma(kk + 1) - lgamma(nn - kk + 1)

    def lnpmf(k: int) -> float:
        return lnC(r1, k) + lnC(r2, c1 - k) - lnC(n, c1)

    lo, hi = max(0, c1 - r2), min(r1, c1)
    ks = np.arange(lo, hi + 1)
    lp = np.array([lnpmf(int(k)) for k in ks])
    p_obs = np.exp(lnpmf(a))
    p = float(np.exp(lp)[np.exp(lp) <= p_obs * (1.0 + 1e-7)].sum())
    # conditional: 0/0 (both diagonals zero) is undefined → NaN, as
    # R/scipy report; inf only when the numerator diagonal is non-zero
    if b * c > 0:
        odds = (a * d) / (b * c)
    elif a * d > 0:
        odds = np.inf
    else:
        odds = np.nan
    return pd.DataFrame({
        "a": [np.int64(a)], "b": [np.int64(b)],
        "c": [np.int64(c)], "d": [np.int64(d)],
        "odds_ratio": [float(odds)],
        "p_value": [min(p, 1.0)],
    })


def oneway_anova_f(
    ds: ray.data.Dataset, group_col: str, value_col: str
) -> pd.DataFrame:
    """One-way ANOVA F statistic across cohorts — the omnibus test
    beside the pairwise Welch gate, fully distributed via MERGEABLE
    moments: each batch emits (group, n, Σx, Σx²); the driver merge is
    O(groups) and computes

      SSB = Σ_g n_g (m_g − m)²,  SSW = Σ_g (q_g − n_g m_g²)
      F = (SSB / (k−1)) / (SSW / (n−k))

    Closed-form arithmetic end to end, so the WHOLE output lands under
    a SQL twin (no distribution tail needed). Returns one row
    (f_stat, df1, df2, ss_between, ss_within)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {group_col: pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64),
                 "s": pd.Series([], dtype=np.float64),
                 "q": pd.Series([], dtype=np.float64)})
        v = b[value_col].to_numpy(np.float64)
        g = b.assign(__v=v, __v2=v * v).groupby(
            group_col, sort=False, as_index=False
        ).agg(n=("__v", "size"), s=("__v", "sum"), q=("__v2", "sum"))
        return g

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    m = parts.groupby(group_col, as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"), q=("q", "sum"))
    n_g = m["n"].to_numpy(np.float64)
    s_g = m["s"].to_numpy(np.float64)
    q_g = m["q"].to_numpy(np.float64)
    n = n_g.sum()
    k = len(m)
    mean = s_g.sum() / n
    mg = s_g / n_g
    ssb = float((n_g * (mg - mean) ** 2).sum())
    ssw = float((q_g - n_g * mg * mg).sum())
    df1, df2 = k - 1, int(n) - k
    if df1 > 0 and df2 > 0 and ssw > 0:
        f = (ssb / df1) / (ssw / df2)
    elif df1 > 0 and df2 > 0 and ssw == 0 and ssb > 0:
        # perfect within-group homogeneity with distinct means:
        # conventionally F → +inf (p → 0), not "undefined"
        f = np.inf
    else:
        f = np.nan
    return pd.DataFrame({
        "f_stat": [f], "df1": [np.int64(df1)], "df2": [np.int64(df2)],
        "ss_between": [ssb], "ss_within": [ssw],
    })
