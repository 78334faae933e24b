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
