"""Event normalization + pre-validation (stateless map_batches stages).

Reference parity: canonical key normalization before the keyed sink
(``persist.py:114-117`` swaps gene keys into canonical order → here urls
are canonicalized so the merge key is stable) and pre-validation checks
that drop/flag malformed rows before compute (``validate.py:33-85``).

The per-url canonicalization MUST be the exact same code path in the
engine and the single-process oracle — it feeds the merge key, so any
divergence breaks byte-identical convergence. ``canonicalize_url_one`` is
that single source of truth.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_SCHEME_HOST = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*://)([^/]*)(.*)$", re.S)
VALID_OPS = ("I", "U", "D")


def canonicalize_url_one(url: str | None) -> str | None:
    """Strip fragment, lowercase scheme + host. Pure, deterministic."""
    if url is None:
        return None
    # defragment BEFORE stripping: stripping first can leave whitespace
    # that preceded the '#' (non-idempotent; found by hypothesis)
    url = url.split("#", 1)[0].strip()
    if not url:
        return None
    m = _SCHEME_HOST.match(url)
    if m:
        url = m.group(1).lower() + m.group(2).lower() + m.group(3)
    return url


def _canonicalized(batch: pa.Table) -> pa.Table:
    """Canonicalize the url column in place (fast path: urls already
    canonical — the overwhelming case for crawl data — are detected
    vectorized and left untouched)."""
    urls = batch.column("url")
    # Vectorized fast-path detector: a url needs the slow row-wise path if
    # it has a fragment, is empty, starts/ends with anything outside
    # printable ASCII (Python strip() removes unicode whitespace RE2's \s
    # does not), or has an upper-case SCHEME or HOST (note: the host sits
    # AFTER '://' — a bare "before the first slash" check misses it; found
    # by the property test test_normalize_batch_equals_rowwise).
    needs_slow = (
        r"#|^$|^[^\x21-\x7e]|[^\x21-\x7e]$"
        r"|^[^:/?#]*[A-Z][^:/?#]*:"
        r"|^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*[A-Z]"
    )
    ok = pc.and_(
        pc.is_valid(urls),
        pc.invert(pc.match_substring_regex(urls, needs_slow)),
    )
    if not pc.all(ok).as_py():
        fixed = [canonicalize_url_one(u) for u in urls.to_pylist()]
        batch = batch.set_column(
            batch.schema.get_field_index("url"), "url", pa.array(fixed, pa.string())
        )
    return batch


def _keep_mask(batch: pa.Table, late_cutoff_us: int | None = None):
    """Admission rule: url present (post-canonicalization), op valid,
    warc_ts + seq present (the merge key and version must exist), and —
    when the lateness contract is active — ``warc_ts >= late_cutoff_us``
    (the committed event-time watermark minus the allowed lateness)."""
    keep = pc.and_(
        pc.and_(
            pc.is_valid(batch.column("url")),
            pc.is_in(batch.column("op"), value_set=pa.array(VALID_OPS)),
        ),
        pc.and_(
            pc.is_valid(batch.column("warc_ts")), pc.is_valid(batch.column("seq"))
        ),
    )
    if late_cutoff_us is not None:
        ts = pc.cast(batch.column("warc_ts"), pa.int64())
        # kleene: null warc_ts already rejected above; fill false so the
        # combined mask stays null-free
        on_time = pc.fill_null(
            pc.greater_equal(ts, pa.scalar(late_cutoff_us, pa.int64())), False
        )
        keep = pc.and_(keep, on_time)
    return keep


def normalize_batch(batch: pa.Table, late_cutoff_us: int | None = None) -> pa.Table:
    """Canonicalize urls; drop rows failing the admission rule
    (:func:`_keep_mask`). :func:`dead_letter_batch` is the exact
    complement — together they partition every batch."""
    batch = _canonicalized(batch)
    keep = _keep_mask(batch, late_cutoff_us)
    if pc.all(keep).as_py():
        return batch
    return batch.filter(keep)


def dead_letter_batch(batch: pa.Table, late_cutoff_us: int | None = None) -> pa.Table:
    """The rows :func:`normalize_batch` rejects, with a ``reason`` column
    (first failing rule: null_url → invalid_op → null_version → late) —
    the dead-letter sink's payload, kept replayable after the producer
    fixes the defect."""
    batch = _canonicalized(batch)
    rej = batch.filter(pc.invert(_keep_mask(batch, late_cutoff_us)))
    if rej.num_rows == 0:
        return rej.append_column("reason", pa.array([], pa.string()))
    import numpy as np

    null_url = pc.is_null(rej.column("url")).to_numpy(zero_copy_only=False)
    bad_op = pc.invert(
        pc.is_in(rej.column("op"), value_set=pa.array(VALID_OPS))
    ).to_numpy(zero_copy_only=False)
    null_ver = pc.or_(
        pc.is_null(rej.column("warc_ts")), pc.is_null(rej.column("seq"))
    ).to_numpy(zero_copy_only=False)
    reason = np.where(
        null_url,
        "null_url",
        np.where(bad_op, "invalid_op", np.where(null_ver, "null_version", "late")),
    )
    return rej.append_column("reason", pa.array(reason, pa.string()))


def prevalidate_counts(table: pa.Table) -> dict:
    """Cheap pre-validation metrics over the envelope columns only
    (column-pruned read). Parity: ``validate.py:33-85``'s five checks.
    ``duplicate_seq`` is a within-batch signal — exact cross-batch dup
    detection is the dedup operator family's job (LWW merge collapses
    exact redeliveries regardless)."""
    n = table.num_rows
    null_url = pc.sum(pc.is_null(table.column("url"))).as_py() or 0
    bad_op = n - (
        pc.sum(pc.is_in(table.column("op"), value_set=pa.array(VALID_OPS))).as_py() or 0
    )
    null_ts = pc.sum(pc.is_null(table.column("warc_ts"))).as_py() or 0
    dup_seq = n - pc.count_distinct(table.column("seq")).as_py()
    return {
        "events": n,
        "null_url": null_url,
        "invalid_op": bad_op,
        "null_warc_ts": null_ts,
        "duplicate_seq": dup_seq,
    }
