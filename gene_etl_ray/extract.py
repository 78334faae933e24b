"""Deterministic html→text extraction (the stateful transform stage).

Reference analog: the stateful per-worker compute stage
(``correlate.py:25-33`` holds config once, heavy vectorized work per call;
``io.py:31-50`` holds connections once per worker). Here the per-worker
state is the compiled rule tables of a trafilatura-style extractor, built
once in the actor's ``__init__`` and applied per Arrow batch in
``__call__`` — the map_batches actor-pool pattern mandated by north_rule.

Determinism contract (`input_hint`: "byte-identical extracted text per
url"): the extractor is a pure function of the html bytes — fixed regex
tables, no locale, no dict-order dependence, no wall clock. The same bytes
always produce the same text bytes, in any process, on any worker. Its
output is part of the golden lake state, so the algorithm below is FROZEN;
changing it invalidates all golden fixtures (SURVEY §7 step 2).

This is stdlib-only by design (no trafilatura/bs4 in the sandbox): strip
non-content blocks (script/style/head/comments), drop tags, unescape
entities, collapse whitespace.
"""

from __future__ import annotations

import html as _htmlmod
import re

import pyarrow as pa
import pyarrow.compute as pc

_RULES: list[tuple[str, str]] = [
    # (pattern, replacement) applied in this fixed order
    (r"(?is)<!--.*?-->", " "),
    (r"(?is)<script\b.*?</script\s*>", " "),
    (r"(?is)<style\b.*?</style\s*>", " "),
    (r"(?is)<head\b.*?</head\s*>", " "),
    (r"(?is)<(?:br|/p|/div|/li|/h[1-6]|/tr)\b[^>]*>", "\n"),
    (r"(?s)<[^>]*>", " "),
]
_WS_LINE = re.compile(r"[ \t\r\f\v]+")
_WS_NL = re.compile(r"\s*\n\s*")


class HtmlTextExtractor:
    """Actor-pool callable: fills ``text`` from ``html`` where text is null.

    Use as ``ds.map_batches(HtmlTextExtractor, concurrency=N,
    batch_size=B, batch_format="pyarrow")``. Rule tables are compiled once
    per actor (``__init__``), applied per batch (``__call__``).
    """

    def __init__(self) -> None:
        self._rules = [(re.compile(p), r) for p, r in _RULES]

    def extract_one(self, raw: bytes | None) -> str | None:
        if raw is None:
            return None
        text = raw.decode("utf-8", errors="replace")
        for rx, repl in self._rules:
            text = rx.sub(repl, text)
        text = _htmlmod.unescape(text)
        text = _WS_LINE.sub(" ", text)
        text = _WS_NL.sub("\n", text)
        return text.strip(" \n")

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        html_col = batch.column("html")
        need = pc.and_(pc.is_null(text), pc.is_valid(html_col))
        if pc.sum(need).as_py() == 0:
            return batch
        need_np = need.to_numpy(zero_copy_only=False)
        html_py = html_col.to_pylist()
        text_py = text.to_pylist()
        out = [
            self.extract_one(html_py[i]) if need_np[i] else text_py[i]
            for i in range(len(text_py))
        ]
        idx = batch.schema.get_field_index("text")
        return batch.set_column(idx, "text", pa.array(out, type=batch.schema.field(idx).type))


def extract_text(raw: bytes | None) -> str | None:
    """One-shot pure-function form (used by the single-process oracle)."""
    return HtmlTextExtractor().extract_one(raw)
