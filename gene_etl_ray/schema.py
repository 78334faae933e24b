"""Explicit Arrow schemas + additive schema evolution.

The reference declares a fixed schema and hard-fails on any missing column
(``io.py:190-197``, SQLAlchemy models ``models.py:21-235``). The new engine
keeps the explicit-schema discipline but replaces hard-fail with **additive
evolution** (north_rule): unknown new columns are adopted (null-backfilled
into history), and types may widen (int32→int64, int→float64,
string→large_string). Narrowing or incompatible changes remain hard errors.
"""

from __future__ import annotations

import pyarrow as pa

# Base event columns — the shape mandated by BASELINE.json `input_hint`.
BASE_COLUMNS: list[tuple[str, pa.DataType]] = [
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),  # UTC-naive; matches DuckDB / parquet norm
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
]

# CDC envelope columns (WAL-tail metadata).
ENVELOPE_COLUMNS: list[tuple[str, pa.DataType]] = [
    ("op", pa.string()),  # 'I' | 'U' | 'D'
    ("seq", pa.int64()),  # globally monotonic; LWW tiebreak after warc_ts
    ("epoch", pa.int32()),  # commit unit, contiguous from 0
]

EVENT_SCHEMA = pa.schema(BASE_COLUMNS + ENVELOPE_COLUMNS)

# Internal columns added by the engine inside the pipeline / lake files.
PKEY_COLUMN = "pkey"  # hash(url) % P
DELETED_COLUMN = "is_deleted"  # tombstone marker retained in stored partitions


def lake_schema_for(event_schema: pa.Schema, keep_html: bool = False) -> pa.Schema:
    """Lake-table schema derived from an event schema.

    One stored row per url (live or tombstone): base/evolved payload columns
    + ``warc_ts``/``seq`` (the winning LWW version) + ``epoch`` lineage +
    ``pkey`` + ``is_deleted``. Reference analog: the keyed results fact table
    with its composite natural key + lineage columns (``models.py:122-161``).
    """
    fields = []
    for f in event_schema:
        if f.name == "op":
            continue
        if f.name == "html" and not keep_html:
            continue
        fields.append(f)
    fields.append(pa.field(PKEY_COLUMN, pa.int32()))
    fields.append(pa.field(DELETED_COLUMN, pa.bool_()))
    return pa.schema(fields)


_WIDENINGS: dict[tuple[str, str], pa.DataType] = {}


def _widened(a: pa.DataType, b: pa.DataType) -> pa.DataType | None:
    """Return the widened type for (a, b) if they are widen-compatible."""
    if a.equals(b):
        return a
    order = [pa.int8(), pa.int16(), pa.int32(), pa.int64()]
    floats = [pa.float32(), pa.float64()]

    def rank(t, seq):
        for i, s in enumerate(seq):
            if t.equals(s):
                return i
        return None

    ra, rb = rank(a, order), rank(b, order)
    if ra is not None and rb is not None:
        return order[max(ra, rb)]
    fa, fb = rank(a, floats), rank(b, floats)
    if fa is not None and fb is not None:
        return floats[max(fa, fb)]
    # int + float → float64
    if (ra is not None and fb is not None) or (fa is not None and rb is not None):
        return pa.float64()
    if {str(a), str(b)} <= {"string", "large_string"}:
        return pa.large_string()
    if {str(a), str(b)} <= {"binary", "large_binary"}:
        return pa.large_binary()
    return None


def evolve_schema(current: pa.Schema, incoming: pa.Schema) -> pa.Schema:
    """Additively evolve ``current`` to also accommodate ``incoming``.

    Rules (north_rule "evolve schemas additively"):
    - a column only in ``current`` stays (new data gets nulls);
    - a column only in ``incoming`` is appended (history gets nulls);
    - a column in both must be equal or widen-compatible → widened type;
    - anything else raises ``SchemaEvolutionError``.

    Column order: ``current``'s order, then new columns in ``incoming``
    order — deterministic, so repeated evolution is stable.
    """
    cur = {f.name: f for f in current}
    out: list[pa.Field] = []
    for f in current:
        g = incoming.field(f.name) if incoming.get_field_index(f.name) >= 0 else None
        if g is None or g.type.equals(f.type):
            out.append(f)
            continue
        w = _widened(f.type, g.type)
        if w is None:
            raise SchemaEvolutionError(
                f"column {f.name!r}: cannot evolve {f.type} -> {g.type}"
            )
        out.append(pa.field(f.name, w, nullable=True))
    for g in incoming:
        if g.name not in cur:
            out.append(pa.field(g.name, g.type, nullable=True))
    return pa.schema(out)


def conform_table(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast/backfill ``table`` to exactly ``schema`` (column set + order).

    Missing columns are null-backfilled; present columns are cast (only
    widenings ever reach here via :func:`evolve_schema`). This is the
    evolution replacement for the reference's fail-on-missing projection
    (``io.py:184-199``).
    """
    n = table.num_rows
    cols = []
    for f in schema:
        idx = table.schema.get_field_index(f.name)
        if idx < 0:
            cols.append(pa.nulls(n, f.type))
        else:
            col = table.column(idx)
            if not col.type.equals(f.type):
                col = col.cast(f.type)
            cols.append(col)
    return pa.Table.from_arrays(cols, schema=schema)


class SchemaEvolutionError(ValueError):
    pass
