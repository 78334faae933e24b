"""Corpus-selection operators (ops/select.py).

Pins: token_budget_select's prefix-maximality vs a brute-force running
sum (including the tie-class id cut and the boundary-bucket path with
tiny tie_buckets), per_group_cap's top-k membership, and
mixture_sample's exact integer rate arithmetic + hash membership.
"""

import numpy as np
import pandas as pd
import ray.data as rd

from gene_etl_ray.ops.select import (
    mixture_sample,
    per_group_cap,
    token_budget_select,
)


def brute_budget(df: pd.DataFrame, budget: int) -> set[int]:
    d = df.sort_values(["score", "doc_id"], ascending=[False, True])
    keep, cum = set(), 0
    for _, r in d.iterrows():
        cum += int(r["tok"])
        if cum > budget:
            break
        keep.add(int(r["doc_id"]))
    return keep


def run_budget(df: pd.DataFrame, budget: int, **kw) -> set[int]:
    out = token_budget_select(
        rd.from_pandas(df), "score", "tok", budget, **kw
    ).to_pandas()
    # Ray wart: to_pandas() on an all-empty dataset drops the schema
    return set() if out.empty else set(out["doc_id"].astype(int))


def make(n=200, seed=7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            # few distinct scores -> big tie classes (the hard path)
            "score": rng.integers(0, 5, n).astype(np.int64),
            "tok": rng.integers(1, 50, n).astype(np.int64),
        }
    )


def test_budget_matches_bruteforce_across_budgets():
    df = make()
    total = int(df["tok"].sum())
    for budget in [0, 1, total // 10, total // 3, total - 1, total, total + 5]:
        assert run_budget(df, budget) == brute_budget(df, budget), budget


def test_budget_tie_cut_mid_class_small_buckets():
    # tiny tie_buckets force the boundary-bucket refinement path
    df = make(300, seed=11)
    budget = int(df["tok"].sum()) // 2
    got = run_budget(df, budget, tie_buckets=4)
    assert got == brute_budget(df, budget)


def test_budget_keeps_all_when_budget_covers_total():
    df = make(50, seed=3)
    assert run_budget(df, int(df["tok"].sum())) == set(df["doc_id"])


def test_budget_zero_tokens_rows_inside_prefix_kept():
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "score": [9, 9, 9, 1],
            "tok": [0, 5, 5, 5],
        }
    )
    # budget 5: doc 1 (0 tok) + doc 2 (5 tok) fit; doc 3 overflows
    assert run_budget(df, 5) == {1, 2}


def test_per_group_cap_top2():
    df = pd.DataFrame(
        {
            "g": ["a"] * 4 + ["b"] * 2,
            "doc_id": [1, 2, 3, 4, 5, 6],
            "v": [10, 30, 30, 5, 1, 2],
        }
    )
    out = per_group_cap(
        rd.from_pandas(df), ["g"], 2, ["v", "doc_id"], [False, True]
    ).to_pandas()
    # a: v=30 ties broken by doc_id asc -> docs 2,3; b: both rows
    assert set(map(tuple, out[["g", "doc_id"]].to_numpy())) == {
        ("a", 2),
        ("a", 3),
        ("b", 5),
        ("b", 6),
    }


def test_mixture_sample_rates_and_membership_exact():
    # groups with counts 40/40 and weights 1/4: binding group is the
    # weight-4 one (rate 10000); the weight-1 group keeps ~1/4
    df = pd.DataFrame(
        {
            "doc_id": np.arange(80, dtype=np.int64),
            "src": ["w1"] * 40 + ["w4"] * 40,
        }
    )
    out = mixture_sample(
        rd.from_pandas(df), "src", {"w1": 1, "w4": 4}, id_col="doc_id"
    ).to_pandas()
    # exact expected membership from the integer formula
    rate = {"w1": (10000 * 40 * 1) // (4 * 40), "w4": 10000}
    h = ((df["doc_id"].to_numpy(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)) % np.uint64(10000)
    want = set(
        df.loc[[int(hv) < rate[s] for hv, s in zip(h, df["src"])], "doc_id"]
    )
    assert set(out["doc_id"]) == want
    assert (out.loc[out["src"] == "w4"]).shape[0] == 40  # binding: keep all


def test_mixture_sample_missing_weight_raises():
    df = pd.DataFrame({"doc_id": [1, 2], "src": ["a", "b"]})
    try:
        mixture_sample(rd.from_pandas(df), "src", {"a": 1}, id_col="doc_id")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "no weight" in str(e)


def test_assign_split_deterministic_and_exhaustive():
    from gene_etl_ray.ops.select import assign_split

    df = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64)})
    out = assign_split(rd.from_pandas(df)).to_pandas()
    assert set(out["split"]) == {"train", "valid", "test"}
    assert len(out) == 1000
    # pure function of the id: identical on a re-run
    out2 = assign_split(rd.from_pandas(df)).to_pandas()
    assert (out.sort_values("doc_id")["split"].to_numpy()
            == out2.sort_values("doc_id")["split"].to_numpy()).all()
    # roughly 80/10/10 under the multiplicative hash
    frac = out["split"].value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9


# --- rank_cut / top_fraction_select / ntile_label -------------------------

def brute_topn(df: pd.DataFrame, n: int) -> set[int]:
    d = df.sort_values(["score", "doc_id"], ascending=[False, True])
    return set(d["doc_id"].head(n).astype(int))


def test_rank_cut_matches_bruteforce_across_n():
    from gene_etl_ray.ops.select import _cut_mask, rank_cut
    import pyarrow as pa

    df = make(250, seed=3)
    ds = rd.from_pandas(df)
    t = pa.Table.from_pandas(df)
    for n in [0, 1, 2, 50, 124, 125, 249, 250, 400]:
        cut = rank_cut(ds, "score", n, tie_buckets=7)
        got = set(
            df.loc[np.asarray(_cut_mask(t, cut, "score", "doc_id")), "doc_id"]
            .astype(int)
        )
        assert got == brute_topn(df, n), n


def test_top_fraction_select_exact_quarter():
    from gene_etl_ray.ops.select import top_fraction_select

    df = make(201, seed=5)
    out = top_fraction_select(rd.from_pandas(df), "score", 1, 4).to_pandas()
    assert set(out["doc_id"].astype(int)) == brute_topn(df, 201 // 4)


def test_ntile_label_matches_sql_ntile():
    from gene_etl_ray.ops.select import ntile_label

    # N not divisible by tiles: first N%t tiles take the extra row
    df = make(203, seed=9)
    out = (
        ntile_label(rd.from_pandas(df), "score", 3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    d = df.sort_values(["score", "doc_id"], ascending=[False, True])
    sizes = [68, 68, 67]  # 203 = 68 + 68 + 67
    want = {}
    i = 0
    for tile, sz in enumerate(sizes, start=1):
        for doc in d["doc_id"].iloc[i : i + sz]:
            want[int(doc)] = tile
        i += sz
    got = dict(zip(out["doc_id"].astype(int), out["tile"].astype(int)))
    assert got == want


def test_prefix_key_and_incremental_dedup_planted():
    from gene_etl_ray.ops.relational import partitioned_join
    from gene_etl_ray.ops.text import prefix_key

    # 3 planted boilerplate prefixes shared across snapshot/new; doc 99
    # shares only its 11-token prefix (12th token differs) -> kept
    boiler = " ".join(f"w{i}" for i in range(12))
    near = " ".join(f"w{i}" for i in range(11)) + " DIFFERENT tail"
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 98, 99],
            "text": [
                boiler + " old tail",
                boiler + " new tail",     # dropped: same 12-tok prefix as 0
                "unique even doc text",
                "unique odd doc text",    # kept
                boiler,                   # snapshot twin (even)
                near,                     # kept: 12th token differs
            ],
        }
    )
    keyed = prefix_key(rd.from_pandas(df), 12)
    new = keyed.filter(lambda r: r["doc_id"] % 2 == 1)
    prior = keyed.filter(lambda r: r["doc_id"] % 2 == 0).select_columns(
        ["prefix_key"]
    )
    out = partitioned_join(
        new, prior, "prefix_key", "prefix_key", how="anti"
    ).to_pandas()
    assert set(out["doc_id"].astype(int)) == {3, 99}


def test_shuffle_rank_is_md5_permutation():
    import hashlib

    from gene_etl_ray.ops.select import deterministic_shuffle_rank

    ids = np.arange(300, dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids})
    out = (
        deterministic_shuffle_rank(
            rd.from_pandas(df, override_num_blocks=5), "doc_id", seed=9
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # dense permutation 0..n-1
    assert sorted(out["rank"]) == list(range(300))
    # matches the single-process md5 order exactly
    keys = {i: hashlib.md5(f"9:{i}".encode()).hexdigest() for i in ids}
    want = {
        i: r for r, i in enumerate(sorted(ids, key=lambda i: (keys[i], i)))
    }
    got = dict(zip(out["doc_id"], out["rank"]))
    assert got == want


def test_shuffle_rank_blocking_invariant_and_seed_sensitive():
    from gene_etl_ray.ops.select import deterministic_shuffle_rank

    df = pd.DataFrame({"doc_id": np.arange(150, dtype=np.int64)})
    outs = [
        deterministic_shuffle_rank(
            rd.from_pandas(df, override_num_blocks=b), "doc_id", seed=4
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        for b in (1, 7)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    other = (
        deterministic_shuffle_rank(rd.from_pandas(df), "doc_id", seed=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (outs[0]["rank"] != other["rank"]).any()


def test_weighted_sample_matches_bruteforce_and_excludes_nonpositive():
    import hashlib

    from gene_etl_ray.ops.select import weighted_sample

    rng = np.random.RandomState(8)
    n = 400
    w = rng.randint(1, 500, n).astype(np.int64)
    w[::50] = 0  # never sampleable
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "w": w})
    for blocks in (1, 6):
        got = weighted_sample(
            rd.from_pandas(df, override_num_blocks=blocks), "w", 25,
            id_col="doc_id", seed=3
        )
        # brute force single-process A-ES
        el = df[df["w"] > 0].copy()
        u = np.array(
            [
                int(hashlib.md5(f"3:{i}".encode()).hexdigest()[:13], 16)
                for i in el["doc_id"]
            ],
            dtype=np.float64,
        ) / 16.0**13
        el["es_key"] = u ** (1.0 / el["w"].to_numpy(np.float64))
        want = el.sort_values(
            ["es_key", "doc_id"], ascending=[False, True]
        ).head(25)
        assert list(got["doc_id"]) == list(want["doc_id"])
        assert (got["w"] > 0).all()


def test_weighted_sample_is_weight_biased():
    from gene_etl_ray.ops.select import weighted_sample

    # two weight classes 10:1 — heavy items must dominate the sample
    # across seeds (statistical, but deterministic given fixed seeds)
    df = pd.DataFrame(
        {"doc_id": np.arange(200, dtype=np.int64),
         "w": np.where(np.arange(200) < 100, 100, 10).astype(np.int64)}
    )
    ds = rd.from_pandas(df)
    heavy = 0
    for seed in range(5):
        out = weighted_sample(ds, "w", 20, id_col="doc_id", seed=seed)
        heavy += int((out["doc_id"] < 100).sum())
    assert heavy / (5 * 20) > 0.7


def test_grouped_weighted_sample_per_group_topk():
    import hashlib

    from gene_etl_ray.ops.select import grouped_weighted_sample

    rng = np.random.RandomState(4)
    n = 300
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": np.array(["a", "b", "c"])[np.arange(n) % 3],
            "w": rng.randint(1, 200, n).astype(np.int64),
        }
    )
    got = (
        grouped_weighted_sample(
            rd.from_pandas(df, override_num_blocks=5), "source", "w", 10,
            id_col="doc_id", seed=2
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # brute force per group
    el = df.copy()
    u = np.array(
        [
            int(hashlib.md5(f"2:{i}".encode()).hexdigest()[:13], 16)
            for i in el["doc_id"]
        ],
        dtype=np.float64,
    ) / 16.0**13
    el["es_key"] = u ** (1.0 / el["w"].to_numpy(np.float64))
    want = (
        el.sort_values(["es_key", "doc_id"], ascending=[False, True])
        .groupby("source", sort=False)
        .head(10)
        .sort_values("doc_id")
    )
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert (got.groupby("source").size() == 10).all()


def test_select_corpus_fused_equals_distributed(ray_session, monkeypatch):
    """select_training_corpus's bounded-survivor fused fast path (one
    in-task cap→budget→split) must return EXACTLY the distributed
    cap/budget/split composition (r4 verdict item 8 floor cut)."""
    from gene_etl_ray.pipelines import curate

    rng = np.random.default_rng(11)
    n = 400
    words = np.array(["alpha", "beta", "gamma", "delta", "epsi", "zeta"])
    texts = [
        " ".join(rng.choice(words, size=rng.integers(5, 40)))
        for _ in range(n)
    ]
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "source": [f"s{i % 7}" for i in range(n)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })
    src = rd.from_pandas(df, override_num_blocks=4)
    fast = curate.select_training_corpus(src, cap_per_source=30)
    monkeypatch.setattr(curate, "SELECT_INTASK_ROWS", -1)
    slow = curate.select_training_corpus(src, cap_per_source=30)
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), slow.reset_index(drop=True),
        check_dtype=False)
    assert set(fast["split"]) <= {"train", "valid", "test"}
