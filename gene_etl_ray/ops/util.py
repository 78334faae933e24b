"""Stage-callable helpers.

``per_process(Cls, **kwargs)`` wraps a callable-class stage so it runs as
plain TASKS with the instance built once per worker process (a module-
level cache keyed by constructor args). Use it for LIGHT state (regex
tables, hash constants, plane matrices): it keeps the build-once property
of the actor-pool pattern without paying the pool's multi-second ramp-up
per query. HEAVY state (the html extractor's rule tables on the hot
ingest path, model weights) should stay on real actor pools
(``map_batches(Cls, concurrency=...)``) where Ray manages lifecycle and
autoscaling.
"""

from __future__ import annotations

_CACHE: dict = {}


def per_process(cls, **kwargs):
    """A batch-callable that lazily builds ``cls(**kwargs)`` once per
    worker process and delegates to it."""
    # repr-keyed: constructor args may be unhashable (lists, arrays)
    key = (
        cls.__module__,
        cls.__qualname__,
        tuple(sorted((k, repr(v)) for k, v in kwargs.items())),
    )

    def call(batch):
        inst = _CACHE.get(key)
        if inst is None:
            inst = _CACHE[key] = cls(**kwargs)
        return inst(batch)

    # a stable name so Ray's progress/stats show the real stage
    call.__name__ = cls.__name__
    call.__qualname__ = cls.__name__
    return call


def typed_if_empty(df):
    """Pass a non-empty pandas batch through unchanged; convert an EMPTY
    one to a typed Arrow table (object → string by this repo's
    convention). Ray's block-size estimator calls ``np.vectorize`` on
    object columns, which raises on size-0 input and logs one error per
    empty block — filter-style stages (candidate picks, member drops)
    that can emit empty batches carrying text columns route their
    output through this instead."""
    if len(df):
        return df
    import pyarrow as pa

    fields = []
    for name, dt in df.dtypes.items():
        if dt == object:
            fields.append(pa.field(name, pa.string()))
        else:
            try:
                fields.append(pa.field(name, pa.from_numpy_dtype(dt)))
            except (TypeError, pa.ArrowNotImplementedError):
                fields.append(pa.field(name, pa.string()))
    return pa.schema(fields).empty_table()
