"""Property-based tests (hypothesis) for the engine's pure kernels —
going beyond the reference's example-based strategy (SURVEY §5.1 notes
property testing is absent there).

Properties:
- LWW resolution is a pure function of the event SET (any permutation /
  any partition into batches converges to the same winners);
- tombstone wins iff it holds the max version;
- schema evolution is idempotent, order-stable and monotone (columns are
  never lost);
- url canonicalization is idempotent;
- partition keys are stable and within range.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from gene_etl_ray.hashing import partition_keys
from gene_etl_ray.pipelines.normalize import canonicalize_url_one
from gene_etl_ray.schema import conform_table, evolve_schema

# -- LWW kernel (same semantics as _make_merge_fn / oracle) --------------


def lww_resolve(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["url", "warc_ts", "seq"], kind="mergesort")
    return df.groupby("url", as_index=False).tail(1).sort_values("url").reset_index(drop=True)


# WAL contract: ``seq`` is unique per logical event; the same (url,
# warc_ts, seq, op) row may appear MORE THAN ONCE only via at-least-once
# redelivery (an exact duplicate). The strategy draws unique seqs, then
# redelivers a random subset.
events_strategy = st.builds(
    lambda rows, dup_idx: rows + [rows[i % len(rows)] for i in dup_idx],
    st.lists(
        st.tuples(
            st.integers(0, 5),  # url id
            st.integers(0, 10),  # warc_ts
            st.sampled_from(["I", "U", "D"]),
        ),
        min_size=1,
        max_size=50,
    ).map(lambda rs: [(u, t, s, o) for s, (u, t, o) in enumerate(rs)]),
    st.lists(st.integers(0, 49), max_size=10),
)


def to_df(evts):
    return pd.DataFrame(
        {
            "url": [f"https://u{u}.com/" for u, _, _, _ in evts],
            "warc_ts": [t for _, t, _, _ in evts],
            "seq": [s for _, _, s, _ in evts],
            "op": [o for _, _, _, o in evts],
        }
    )


@settings(max_examples=200, deadline=None)
@given(events_strategy, st.randoms())
def test_lww_order_insensitive(evts, rnd):
    df = to_df(evts)
    shuffled = df.sample(frac=1, random_state=rnd.randint(0, 2**31)).reset_index(drop=True)
    a, b = lww_resolve(df), lww_resolve(shuffled)
    pd.testing.assert_frame_equal(a, b)


@settings(max_examples=200, deadline=None)
@given(events_strategy)
def test_lww_associative_over_splits(evts):
    """resolve(resolve(part1) ∪ resolve(part2)) == resolve(all) — the
    property late extraction and incremental merging rely on."""
    df = to_df(evts)
    k = len(df) // 2
    merged = lww_resolve(
        pd.concat([lww_resolve(df.iloc[:k]), lww_resolve(df.iloc[k:])], ignore_index=True)
    )
    pd.testing.assert_frame_equal(merged, lww_resolve(df))


@settings(max_examples=200, deadline=None)
@given(events_strategy)
def test_lww_winner_has_max_version(evts):
    df = to_df(evts)
    out = lww_resolve(df)
    for _, row in out.iterrows():
        grp = df[df["url"] == row["url"]]
        assert (row["warc_ts"], row["seq"]) == max(zip(grp["warc_ts"], grp["seq"]))


# -- schema evolution -----------------------------------------------------

types_strategy = st.sampled_from(
    [pa.int32(), pa.int64(), pa.float32(), pa.float64(), pa.string()]
)
schema_strategy = st.dictionaries(
    st.sampled_from(["a", "b", "c", "d"]), types_strategy, min_size=1, max_size=4
).map(lambda d: pa.schema(sorted(d.items())))


def compatible(a: pa.Schema, b: pa.Schema) -> bool:
    for f in a:
        if b.get_field_index(f.name) >= 0:
            g = b.field(f.name)
            if pa.types.is_string(f.type) != pa.types.is_string(g.type):
                return False
    return True


@settings(max_examples=200, deadline=None)
@given(schema_strategy, schema_strategy)
def test_evolution_monotone_and_idempotent(a, b):
    if not compatible(a, b):
        return
    e = evolve_schema(a, b)
    assert set(e.names) == set(a.names) | set(b.names)  # nothing lost
    assert evolve_schema(e, b).equals(e) and evolve_schema(e, a).equals(e)  # idempotent


@settings(max_examples=100, deadline=None)
@given(schema_strategy, schema_strategy)
def test_conform_roundtrip(a, b):
    if not compatible(a, b):
        return
    e = evolve_schema(a, b)
    t = a.empty_table()
    out = conform_table(t, e)
    assert out.schema.equals(e) and out.num_rows == 0


# -- normalization + partitioning ----------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=50))
def test_canonicalize_idempotent(s):
    once = canonicalize_url_one(s)
    assert canonicalize_url_one(once) == once


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=50), st.integers(1, 64))
def test_partition_keys_stable_in_range(urls, p):
    pk = partition_keys(urls, p)
    assert ((pk >= 0) & (pk < p)).all()
    assert (pk == partition_keys(list(urls), p)).all()


# -- batch fast-path vs row-wise canonicalization -------------------------

url_like = st.one_of(
    st.text(max_size=40),
    st.builds(
        lambda scheme, host, path, frag: f"{scheme}://{host}/{path}" + (f"#{frag}" if frag else ""),
        st.sampled_from(["http", "HTTP", "https", "HtTpS"]),
        st.text(alphabet="aAbB.cC-9", min_size=1, max_size=12),
        st.text(alphabet="aZ/9._", max_size=12),
        st.text(alphabet="xY1", max_size=5),
    ),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(url_like, min_size=1, max_size=30))
def test_normalize_batch_equals_rowwise(urls):
    """The vectorized fast-path in normalize_batch must agree EXACTLY with
    canonicalize_url_one — it feeds the merge key, so any divergence
    breaks engine/oracle byte-identity."""
    from gene_etl_ray.pipelines.normalize import normalize_batch

    n = len(urls)
    batch = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "op": pa.array(["I"] * n, pa.string()),
            "warc_ts": pa.array(list(range(n)), pa.timestamp("us")),
            "seq": pa.array(list(range(n)), pa.int64()),
        }
    )
    out = normalize_batch(batch)
    expected = [c for c in (canonicalize_url_one(u) for u in urls) if c is not None]
    assert out.column("url").to_pylist() == expected


# -- bucketed binary operators vs pandas reference ------------------------
# (Ray-executing: few examples, each a full mini-pipeline)

join_frames = st.tuples(
    st.lists(st.tuples(st.integers(0, 8), st.integers(0, 100)), min_size=1, max_size=25),
    st.lists(st.tuples(st.integers(0, 8), st.integers(0, 100)), min_size=1, max_size=25),
    st.integers(1, 7),  # num_buckets
)


@settings(max_examples=8, deadline=None)
@given(join_frames)
def test_partitioned_join_equals_pandas_merge(data):
    """partitioned_join must equal a plain pandas inner merge for ANY
    key distribution and bucket count — including keys exclusive to one
    side (which null-upcast the other side's columns inside bucket
    blocks; the regression behind the type-canonical hashing fix)."""
    import ray.data

    from gene_etl_ray.ops import relational

    lrows, rrows, nb = data
    left = pd.DataFrame({"k": [a for a, _ in lrows], "lv": [b for _, b in lrows]})
    right = pd.DataFrame({"rk": [a for a, _ in rrows], "rv": [b for _, b in rrows]})
    got = relational.partitioned_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        "k", "rk", num_buckets=nb,
    ).to_pandas()
    want = (
        left.merge(right, left_on="k", right_on="rk")
        .sort_values(["k", "lv", "rv"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    if want.empty:
        return  # zero-row result: column labels may be absent on empty blocks
    got = got.sort_values(["k", "lv", "rv"], kind="mergesort").reset_index(drop=True)
    for c in ("k", "lv", "rv"):
        assert got[c].astype("int64").tolist() == want[c].astype("int64").tolist()


asof_frames = st.tuples(
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 50)), min_size=1, max_size=20),
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 50)), min_size=1, max_size=20),
    st.integers(1, 5),
)


@settings(max_examples=8, deadline=None)
@given(asof_frames)
def test_asof_join_bucketed_equals_pandas_merge_asof(data):
    """asof_join_bucketed must equal a global pandas merge_asof for ANY
    by-key distribution and bucket count (the co-location invariant)."""
    import ray.data

    from gene_etl_ray.ops import relational

    lrows, rrows, nb = data
    left = pd.DataFrame(
        {
            "uid": [a for a, _ in lrows],
            "ts": pd.to_datetime([b for _, b in lrows], unit="s"),
            "eid": range(len(lrows)),
        }
    )
    right = pd.DataFrame(
        {
            "ouid": [a for a, _ in rrows],
            "ots": pd.to_datetime([b for _, b in rrows], unit="s"),
            "oid": range(len(rrows)),
        }
    )

    def prep(rg: pd.DataFrame) -> pd.DataFrame:
        # dedup ties per (key, ts) so merge_asof is deterministic
        return rg.groupby(["ouid", "ots"], as_index=False)["oid"].max()

    got = (
        relational.asof_join_bucketed(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            on_left="ts", on_right="ots", by_left="uid", by_right="ouid",
            num_buckets=nb, right_prepare=prep, out_cols=["eid", "oid"],
        )
        .to_pandas()
        .sort_values("eid", kind="mergesort")
        .reset_index(drop=True)
    )
    rdedup = prep(right).sort_values("ots", kind="mergesort")
    want = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        rdedup,
        left_on="ts", right_on="ots", left_by="uid", right_by="ouid",
        direction="backward",
    ).sort_values("eid", kind="mergesort").reset_index(drop=True)
    assert got["eid"].astype("int64").tolist() == want["eid"].astype("int64").tolist()
    g = got["oid"].fillna(-1).astype("int64").tolist()
    w = want["oid"].fillna(-1).astype("int64").tolist()
    assert g == w


# -- text preprocessing kernels (round 3) ---------------------------------


@given(
    st.lists(st.integers(1, 300), min_size=1, max_size=60),
    st.integers(1, 200),
)
@settings(max_examples=100, deadline=None)
def test_greedy_pack_matches_naive_greedy(sizes, budget):
    """The searchsorted-per-sequence kernel must equal the obvious
    per-item greedy loop, and every multi-item sequence must respect
    the budget."""
    from gene_etl_ray.ops.text import greedy_pack

    n = np.array(sizes, dtype=np.int64)
    got = greedy_pack(n, budget)
    # naive reference
    want, s, fill = [], 0, None
    for x in sizes:
        if fill is None:
            fill = x
        elif fill + x > budget:
            s += 1
            fill = x
        else:
            fill += x
        want.append(s)
    assert got.tolist() == want
    df = pd.DataFrame({"s": got, "n": sizes}).groupby("s")["n"].agg(["sum", "size"])
    over = df[df["sum"] > budget]
    assert (over["size"] == 1).all()  # only oversized singletons exceed
    # seq ids are 0..k contiguous and non-decreasing in item order
    assert got[0] == 0 and np.all(np.diff(got) >= 0) and np.all(np.diff(got) <= 1)


_tok = st.text(alphabet="ab", min_size=0, max_size=3)


@given(
    st.lists(st.lists(_tok, min_size=1, max_size=12), min_size=1, max_size=8),
    st.integers(1, 4),
)
@settings(max_examples=100, deadline=None)
def test_flat_ngrams_equals_per_doc(docs, n):
    """The flat-array n-gram kernel (one concatenated token stream,
    boundary-masked windows) must emit exactly the per-doc zip n-grams,
    in document order."""
    from gene_etl_ray.ops.text import _flat_ngrams

    toks = pd.Series(docs)
    d, g = _flat_ngrams(toks, n)
    want_d, want_g = [], []
    for i, t in enumerate(docs):
        for j in range(len(t) - n + 1):
            want_d.append(i)
            want_g.append(" ".join(t[j : j + n]))
    assert d.tolist() == want_d
    assert g.tolist() == want_g


asof_dir_frames = st.tuples(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=1, max_size=16),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=1, max_size=16),
    st.integers(1, 4),
)


@settings(max_examples=8, deadline=None)
@given(asof_dir_frames)
def test_asof_nearest_and_forward_match_bruteforce(data):
    """direction='nearest' must equal a per-row brute-force nearest with
    the PINNED tie rule (backward wins an exact-distance tie), and
    direction='forward' must equal pandas merge_asof(forward). Small
    integer timestamps make distance ties and no-match rows common —
    exactly the cases the vectorized pick has to get right."""
    import ray.data

    from gene_etl_ray.ops import relational

    lrows, rrows, nb = data
    left = pd.DataFrame(
        {
            "uid": [a for a, _ in lrows],
            "ts": pd.to_datetime([b for _, b in lrows], unit="s"),
            "eid": range(len(lrows)),
        }
    )
    right = pd.DataFrame(
        {
            "ouid": [a for a, _ in rrows],
            "ots": pd.to_datetime([b for _, b in rrows], unit="s"),
            "oid": range(len(rrows)),
        }
    )

    def prep(rg: pd.DataFrame) -> pd.DataFrame:
        return rg.groupby(["ouid", "ots"], as_index=False)["oid"].max()

    def run(direction: str) -> list[int]:
        return (
            relational.asof_join_bucketed(
                ray.data.from_pandas(left), ray.data.from_pandas(right),
                on_left="ts", on_right="ots", by_left="uid", by_right="ouid",
                num_buckets=nb, direction=direction, right_prepare=prep,
                out_cols=["eid", "oid"],
            )
            .to_pandas()
            .sort_values("eid", kind="mergesort")["oid"]
            .fillna(-1)
            .astype("int64")
            .tolist()
        )

    rdedup = prep(right)

    want_near = []
    for _, lr in left.iterrows():
        cand = rdedup[rdedup["ouid"] == lr["uid"]]
        if cand.empty:
            want_near.append(-1)
            continue
        d = (cand["ots"] - lr["ts"]).abs()
        is_fwd = (cand["ots"] > lr["ts"]).astype(int)  # backward wins ties
        best = cand.assign(d=d, f=is_fwd).sort_values(["d", "f"]).iloc[0]
        want_near.append(int(best["oid"]))
    assert run("nearest") == want_near

    want_fwd = (
        pd.merge_asof(
            left.sort_values("ts", kind="mergesort"),
            rdedup.sort_values("ots", kind="mergesort"),
            left_on="ts", right_on="ots", left_by="uid", right_by="ouid",
            direction="forward",
        )
        .sort_values("eid", kind="mergesort")["oid"]
        .fillna(-1)
        .astype("int64")
        .tolist()
    )
    assert run("forward") == want_fwd


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 120), st.integers(-5, 5)),
        min_size=1,
        max_size=30,
    ),
    st.integers(1, 4),
)
def test_sliding_windowed_agg_matches_bruteforce(rows, k):
    """Every row must land in exactly size/slide hop windows with the
    right window_start, for any k and any timestamp distribution."""
    import ray.data

    from gene_etl_ray.ops import relational

    slide = 10
    size = slide * k
    df = pd.DataFrame(
        {
            "key": [f"k{a}" for a, _, _ in rows],
            "ts": [b for _, b, _ in rows],
            "value": [float(c) for _, _, c in rows],
        }
    )
    got = (
        relational.sliding_windowed_agg(
            ray.data.from_pandas(df), "key", "ts", size_us=size, slide_us=slide,
            value="value",
        )
        .sort_values(["key", "window_start"])
        .reset_index(drop=True)
    )
    expanded = []
    for _, r in df.iterrows():
        base = (int(r["ts"]) // slide) * slide
        for j in range(k):
            expanded.append((r["key"], base - j * slide, r["value"]))
    want = (
        pd.DataFrame(expanded, columns=["key", "window_start", "value"])
        .groupby(["key", "window_start"], as_index=False)
        .agg(value_sum=("value", "sum"), n_events=("value", "size"))
        .sort_values(["key", "window_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got["key"].tolist() == want["key"].tolist()
    assert got["window_start"].astype("int64").tolist() == want["window_start"].astype("int64").tolist()
    assert np.allclose(got["value_sum"].to_numpy(), want["value_sum"].to_numpy())
    assert got["n_events"].astype("int64").tolist() == want["n_events"].astype("int64").tolist()


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)),
        min_size=2,
        max_size=40,
    ).filter(lambda rows: all(
        len({v for g2, v in rows if g2 == g}) > 1
        for g in {g for g, _ in rows}
    ))
)
def test_grouped_standardize_matches_bruteforce(rows):
    """z-score must equal (x - group mean) / group stddev_pop exactly
    (the integer rearrangement can't drift), for any group layout with
    nonzero in-group variance."""
    import ray.data

    from gene_etl_ray.ops import relational

    df = pd.DataFrame(
        {
            "g": [f"g{a}" for a, _ in rows],
            "x": [float(b) for _, b in rows],
            "rid": range(len(rows)),
        }
    )
    got = (
        relational.grouped_standardize(
            ray.data.from_pandas(df), "g", "x", id_cols=["rid"], out="z"
        )
        .to_pandas()
        .sort_values("rid")["z"]
        .to_numpy()
    )
    mu = df.groupby("g")["x"].transform("mean")
    sd = df.groupby("g")["x"].transform(lambda s: np.std(s.to_numpy()))
    want = ((df["x"] - mu) / sd).to_numpy()
    assert np.allclose(got, want, rtol=1e-12)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(-9, 9)),
        min_size=1,
        max_size=30,
    ),
    st.integers(1, 15),
)
def test_trailing_median_matches_bruteforce(rows, w):
    """Per-row brute force with SQL RANGE peer semantics: the frame is
    every same-key row with ts in [t-w, t], INCLUDING peers that sort
    after the current row."""
    import ray.data

    from gene_etl_ray.ops import relational

    df = pd.DataFrame(
        {
            "k": [f"k{a}" for a, _, _ in rows],
            "ts": [b for _, b, _ in rows],
            "v": [float(c) for _, _, c in rows],
            "rid": range(len(rows)),
        }
    )
    got = (
        relational.trailing_window_median(
            ray.data.from_pandas(df), "k", "ts", w, "v", "rid", out="m"
        )
        .to_pandas()
        .sort_values("rid")["m"]
        .to_numpy()
    )
    want = []
    for _, r in df.iterrows():
        frame = df[
            (df["k"] == r["k"]) & (df["ts"] >= r["ts"] - w) & (df["ts"] <= r["ts"])
        ]["v"].to_numpy()
        want.append(np.median(frame))
    assert np.allclose(got, want, rtol=1e-12)


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 10_000), st.integers(6, 40), st.integers(2, 8))
def test_pq_encode_and_adc_match_bruteforce(seed, n, dim4):
    """Codes must equal the per-subspace argmin (first-min tie rule),
    ADC must equal the LUT-free recompute, and pq_adc_topk must equal
    the head of the fully-sorted table."""
    import ray.data

    from gene_etl_ray.ops import knn

    rng = np.random.default_rng(seed)
    dim = dim4 * 2
    x = rng.integers(-4, 5, size=(n, dim)).astype(np.float64)
    cbs = [
        rng.integers(-4, 5, size=(3, dim4)).astype(np.float64)
        for _ in range(2)
    ]
    q = rng.integers(-4, 5, size=dim).astype(np.float64)
    ds = ray.data.from_pandas(
        pd.DataFrame({"vec_id": range(n), "embedding": list(x)})
    )
    got = (
        knn.pq_encode(ds, cbs, query=q)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    adc_want = np.zeros(n)
    for j, cb in enumerate(cbs):
        sub = x[:, j * dim4 : (j + 1) * dim4]
        d = ((sub[:, None, :] - cb[None]) ** 2).sum(axis=2)
        codes = d.argmin(axis=1)
        assert got[f"code_{j}"].to_numpy().tolist() == codes.tolist()
        qsub = q[j * dim4 : (j + 1) * dim4]
        adc_want += ((qsub[None, :] - cb[codes]) ** 2).sum(axis=1)
    assert np.allclose(got["adc_dist"].to_numpy(), np.sqrt(adc_want), rtol=1e-12)

    k = min(5, n)
    top = knn.pq_adc_topk(knn.pq_encode(ds, cbs, query=q), k=k)
    want_top = (
        got.sort_values(["adc_dist", "vec_id"], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    assert top["vec_id"].tolist() == want_top["vec_id"].tolist()
    assert np.allclose(top["adc_dist"].to_numpy(), want_top["adc_dist"].to_numpy())


# ---------------------------------------------------------------------------
# round-3 kernels: hypothesis properties beyond the fixed-seed unit tests.
# Ray round-trips are slow per example, so these run few examples — the
# value is the ADVERSARIAL shapes hypothesis finds (gaps, duplicates-free
# arbitrary ids, touching intervals), not volume.
# ---------------------------------------------------------------------------

ids_strategy = st.lists(
    st.integers(min_value=0, max_value=2**40), min_size=1, max_size=60,
    unique=True,
)


@settings(max_examples=15, deadline=None)
@given(ids_strategy, st.integers(min_value=0, max_value=9))
def test_shuffle_rank_is_exact_md5_permutation_property(ids, seed):
    import hashlib

    import ray.data as rd

    from gene_etl_ray.ops.select import deterministic_shuffle_rank

    df = pd.DataFrame({"doc_id": np.array(sorted(ids), dtype=np.int64)})
    out = (
        deterministic_shuffle_rank(
            rd.from_pandas(df, override_num_blocks=min(3, len(ids))),
            "doc_id", seed=seed,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    keys = {i: hashlib.md5(f"{seed}:{i}".encode()).hexdigest() for i in ids}
    want = {
        i: r
        for r, i in enumerate(sorted(ids, key=lambda i: (keys[i], i)))
    }
    assert dict(zip(out["doc_id"], out["rank"])) == want


intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),
        st.integers(min_value=0, max_value=60),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=15, deadline=None)
@given(intervals_strategy, intervals_strategy,
       st.integers(min_value=1, max_value=80))
def test_interval_overlap_join_equals_bruteforce_property(li, ri, width):
    import ray.data as rd

    from gene_etl_ray.ops.relational import interval_overlap_join

    L = pd.DataFrame(
        {"lid": np.arange(len(li), dtype=np.int64),
         "s": np.array([s for s, _ in li], dtype=np.int64),
         "e": np.array([s + d for s, d in li], dtype=np.int64)}
    )
    R = pd.DataFrame(
        {"rid": np.arange(len(ri), dtype=np.int64),
         "s": np.array([s for s, _ in ri], dtype=np.int64),
         "e": np.array([s + d for s, d in ri], dtype=np.int64)}
    )
    got = interval_overlap_join(
        rd.from_pandas(L), rd.from_pandas(R), ("s", "e"), ("s", "e"),
        bucket_width=width, l_cols=["lid"], r_cols=["rid"], tile=3,
    ).to_pandas()
    want = sorted(
        (int(l.lid), int(r.rid))
        for l in L.itertuples()
        for r in R.itertuples()
        if l.s <= r.e and r.s <= l.e
    )
    # an all-empty Ray dataset loses its schema through to_pandas()
    # (same documented quirk lake_df guards) — treat as the empty result
    pairs = (
        []
        if "lid" not in got.columns
        else sorted(zip(got["lid"].astype(int), got["rid"].astype(int)))
    )
    assert pairs == want


# -- round-4 pure kernels: JPEG codec and scalar quantization ------------


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    q=st.integers(min_value=35, max_value=95),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_roundtrip_dims_and_bounded_error(h, w, q, seed):
    """∀ shapes/qualities: decode(encode(img)) preserves dimensions
    exactly and stays within a quality-dependent error envelope (lossy,
    but bounded — baseline JPEG over the full quant range)."""
    from gene_etl_ray.ops.jpeg import jpeg_decode_gray, jpeg_encode_gray

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    back = jpeg_decode_gray(jpeg_encode_gray(img, quality=q))
    assert back.shape == img.shape
    err = np.abs(back.astype(int) - img.astype(int))
    # worst-case envelope: dominated by the largest quant step at the
    # chosen quality (Annex K max entry 121, libjpeg scaling), split
    # across the 64-coefficient IDCT — empirically < half the max step
    scale = 5000 // q if q < 50 else 200 - 2 * q
    step = min(255, max(1, (121 * scale + 50) // 100))
    assert err.mean() <= step, (q, err.mean(), step)


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    q=st.integers(min_value=50, max_value=95),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_color_roundtrip_dims_and_bounded_error(h, w, q, seed):
    """∀ shapes/qualities: the 4:2:0 color codec preserves dimensions
    exactly, returns (h, w, 3), and on a SMOOTH image (where chroma
    subsampling loses little) stays inside a quality-dependent error
    envelope. jpeg_decode_gray on color bytes returns the luma plane."""
    from gene_etl_ray.ops.jpeg import (
        jpeg_decode, jpeg_decode_gray, jpeg_encode_color)

    rng = np.random.RandomState(seed)
    # smooth: a random low-order 2-D ramp per channel (chroma survives)
    base = rng.randint(0, 256, size=3)
    gx, gy = rng.uniform(-2, 2, size=3), rng.uniform(-2, 2, size=3)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [np.clip(base[c] + gx[c] * xx + gy[c] * yy, 0, 255)
         for c in range(3)], axis=-1).astype(np.uint8)
    data = jpeg_encode_color(img, quality=q)
    back = jpeg_decode(data)
    assert back.shape == (h, w, 3) and back.dtype == np.uint8
    scale = 5000 // q if q < 50 else 200 - 2 * q
    step = min(255, max(1, (121 * scale + 50) // 100))
    err = np.abs(back.astype(int) - img.astype(int))
    assert err.mean() <= step + 4, (q, err.mean(), step)
    lum = jpeg_decode_gray(data)
    assert lum.shape == (h, w)
    want_luma = np.clip(np.rint(
        img.astype(float) @ np.array([0.299, 0.587, 0.114])), 0, 255)
    assert np.abs(lum.astype(float) - want_luma).mean() <= step + 4


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=50),
    d=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    scale=st.floats(min_value=1e-3, max_value=1e3),
)
def test_sq_codes_bounds_and_halfstep_error(n, d, seed, scale):
    """∀ matrices: SQ8 codes ∈ [0,255], per-dim min→0 / max→255 (when
    the dim varies), constant dims →0, and decode error ≤ half a step."""
    from gene_etl_ray.ops.knn import _sq_codes

    rng = np.random.RandomState(seed)
    x = (rng.randn(n, d) * scale).astype(np.float64)
    if d > 1:
        x[:, 0] = 7.5  # always one constant dim
    mn, mx = x.min(axis=0), x.max(axis=0)
    codes = _sq_codes(x, mn, mx)
    assert codes.min() >= 0 and codes.max() <= 255
    rngd = mx - mn
    varying = rngd > 0
    if varying.any():
        sub = codes[:, varying]
        xs = x[:, varying]
        assert (sub[xs.argmin(axis=0), np.arange(sub.shape[1])] == 0).all()
        assert (
            sub[xs.argmax(axis=0), np.arange(sub.shape[1])] == 255
        ).all()
        dec = mn[varying] + sub * rngd[varying] / 255.0
        assert np.all(np.abs(dec - xs) <= rngd[varying] / 255.0 / 2 + 1e-9)
    assert (codes[:, ~varying] == 0).all()
