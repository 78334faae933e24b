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
