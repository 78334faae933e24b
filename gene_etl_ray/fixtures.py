"""Deterministic synthetic CDC change-log generator.

Parity with the reference's engineered test corpus (seeded-RNG fixtures with
deliberately constructed cases — ``tests/conftest.py:112-142``,
``seeds/02_expression.sql:59-75``), translated to the target domain of
BASELINE.json ``input_hint``: Common-Crawl-style web-page change events
``(url, warc_ts, html, text, lang)`` + CDC envelope ``(op, seq, epoch)``.

Everything is a pure function of the seed — no wall clock, no external
data. Knobs exercise the engine's hard paths: update/delete mix, hot-domain
Zipf skew (salting), out-of-order ``warc_ts`` vs ``seq``, exact ``warc_ts``
ties (seq tiebreak), and a mid-stream schema-add epoch (``fetch_status``
appears, ``content_length`` widens int32→int64).

Layout: one Parquet file per epoch (``epoch=00000.parquet``) — a WAL
segment per commit unit, so the ingest reader prunes at the file level.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["en", "de", "fr", "es", "zh", "ja", "ru", "pt"]

_VOCAB = (
    "the quick brown fox jumps over lazy dog data stream merge lake arrow ray "
    "partition shuffle epoch commit manifest checkpoint lineage schema evolve "
    "crawl page content extract deterministic replay converge throughput scale"
).split()

_BASE_TS_US = 1_600_000_000_000_000  # 2020-09-13T12:26:40Z, fixed


_PARA_POOL: list[str] | None = None
_POOL_SIZE = 4096


def _para_pool() -> list[str]:
    """Fixed pool of pre-composed paragraphs; docs are deterministic
    selections from it — O(paras) assembly instead of O(words)."""
    global _PARA_POOL
    if _PARA_POOL is None:
        V = len(_VOCAB)
        _PARA_POOL = [
            "<p>"
            + " ".join(_VOCAB[(p * 31 + i * 7 + (p * i) % 13) % V] for i in range(12))
            + "</p>"
            for p in range(_POOL_SIZE)
        ]
    return _PARA_POOL


def _make_html(url: str, rev: int, size_hint: int) -> bytes:
    """Deterministic synthetic html for (url, rev): title, paragraphs,
    script/style blocks, entities — everything the extractor must strip."""
    h = abs(hash_seedless(url)) + rev * 1_000_003
    nwords = 30 + (h % max(1, size_hint))
    pool = _para_pool()
    body = "\n".join(
        pool[(h + 97 * i) % _POOL_SIZE] for i in range(max(1, nwords // 12))
    )
    doc = (
        f"<html><head><title>{url} r{rev}</title>"
        f"<style>.x{{color:red}}</style></head>"
        f"<body><script>var v={h % 97};</script>"
        f"<h1>Rev {rev} &amp; page {h % 1000}</h1>{body}"
        f"<div>footer &copy; example</div></body></html>"
    )
    return doc.encode("utf-8")


def hash_seedless(s: str) -> int:
    """Deterministic 63-bit string hash (FNV-1a); Python's hash() is
    per-process randomized and unusable for fixtures."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0x7FFFFFFFFFFFFFFF
    return h


def generate_events(
    out_dir: str,
    n_urls: int = 500,
    n_events: int = 2000,
    n_epochs: int = 8,
    seed: int = 42,
    delete_frac: float = 0.05,
    out_of_order_frac: float = 0.1,
    tie_frac: float = 0.1,
    hot_domain_weight: float = 50.0,
    schema_add_epoch: int | None = None,
    html_size_hint: int = 120,
) -> dict:
    """Write a deterministic event log to ``out_dir`` (one file per epoch).

    Returns metadata (counts, knobs). Hot-domain skew: ~2% of domains carry
    ``hot_domain_weight``× the url mass (Zipf-ish), so some hash partitions
    see far more events than others — the salting test bed.
    """
    rng = np.random.RandomState(seed)
    n_domains = max(4, n_urls // 40)
    n_hot = max(1, n_domains // 50)
    dom_w = np.ones(n_domains)
    dom_w[:n_hot] = hot_domain_weight
    dom_of_url = rng.choice(n_domains, size=n_urls, p=dom_w / dom_w.sum())
    urls = np.array(
        [f"https://site{dom_of_url[i]:04d}.example.com/p/{i:07d}" for i in range(n_urls)],
        dtype=object,
    )
    langs = np.array([LANGS[hash_seedless(u) % len(LANGS)] for u in urls], dtype=object)

    # url popularity ~ Zipf over urls (hot urls get many revisions)
    url_w = 1.0 / np.arange(1, n_urls + 1) ** 0.8
    rng.shuffle(url_w)
    idx = rng.choice(n_urls, size=n_events, p=url_w / url_w.sum())

    seq = np.arange(n_events, dtype=np.int64)
    epoch = (seq * n_epochs // n_events).astype(np.int32)
    rev = pd.Series(idx).groupby(idx).cumcount().to_numpy()

    first = rev == 0
    op = np.where(first, "I", "U").astype(object)
    del_mask = (~first) & (rng.random(n_events) < delete_frac)
    op[del_mask] = "D"

    # warc_ts: one hour per revision + per-url offset; deterministic
    ts_us = _BASE_TS_US + rev.astype(np.int64) * 3_600_000_000 + (idx.astype(np.int64) % 997) * 1000
    # ties: revision shares the exact ts of the previous revision (seq tiebreak)
    tie = (~first) & (rng.random(n_events) < tie_frac)
    ts_us = np.where(tie, ts_us - 3_600_000_000, ts_us)
    # out-of-order: a later-seq event carries an OLDER ts (loses LWW despite
    # arriving later) — convergence must not depend on arrival order
    ooo = (~first) & (~tie) & (rng.random(n_events) < out_of_order_frac)
    ts_us = np.where(ooo, ts_us - 2 * 3_600_000_000 - 1, ts_us)

    html = np.empty(n_events, dtype=object)
    for i in range(n_events):
        if op[i] != "D":
            html[i] = _make_html(urls[idx[i]], int(rev[i]), html_size_hint)
    lang = np.where(op == "D", None, langs[idx])
    content_length = np.array([len(h) if h is not None else 0 for h in html], dtype=np.int64)
    fetch_status = np.where(op == "D", 404, 200).astype(np.int32)

    os.makedirs(out_dir, exist_ok=True)
    files = []
    for e in range(n_epochs):
        m = epoch == e
        cols: dict[str, pa.Array] = {
            "url": pa.array(urls[idx[m]], type=pa.string()),
            "warc_ts": pa.array(ts_us[m], type=pa.timestamp("us")),
            "html": pa.array(list(html[m]), type=pa.binary()),
            "text": pa.nulls(int(m.sum()), pa.string()),
            "lang": pa.array(list(lang[m]), type=pa.string()),
            "op": pa.array(list(op[m]), type=pa.string()),
            "seq": pa.array(seq[m], type=pa.int64()),
            "epoch": pa.array(epoch[m], type=pa.int32()),
        }
        if schema_add_epoch is None or e < schema_add_epoch:
            cols["content_length"] = pa.array(content_length[m], type=pa.int32())
        else:
            # mid-stream schema change: widen + add (north_rule scenario 4)
            cols["content_length"] = pa.array(content_length[m], type=pa.int64())
            cols["fetch_status"] = pa.array(fetch_status[m], type=pa.int32())
        table = pa.table(cols)
        path = os.path.join(out_dir, f"epoch={e:05d}.parquet")
        # bounded row groups: a single-row-group file caps read parallelism
        # at one task per file — splittable groups let any reader fan out
        pq.write_table(table, path, row_group_size=16384)
        files.append(path)

    return {
        "n_urls": n_urls,
        "n_events": n_events,
        "n_epochs": n_epochs,
        "seed": seed,
        "files": files,
        "n_deletes": int(del_mask.sum()),
        "n_ooo": int(ooo.sum()),
        "n_ties": int(tie.sum()),
        "schema_add_epoch": schema_add_epoch,
    }


def events_from_documents(
    sf_dir: str,
    out_dir: str,
    n_epochs: int = 4,
    revisions: int = 2,
    seed: int = 42,
    subdomain_urls: bool = False,
) -> dict:
    """Derive a deterministic change log from the driver-provided
    ``documents`` table (TESTDATA.md): each document becomes a url whose
    html wraps the document text; ``revisions`` update rounds + a few
    deletes. Ties the flagship pipeline to the sanctioned test inputs.
    ``subdomain_urls`` keys the url host by the document's ``source``
    (20 distinct domains) so per-domain aggregates are non-trivial."""
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    n = len(docs)
    rng = np.random.RandomState(seed)
    rows = []
    seq = 0
    for r in range(revisions):
        order = rng.permutation(n)
        for j in order:
            doc = docs.iloc[j]
            if subdomain_urls:
                url = f"https://{doc['source']}.docs.example.org/{int(doc['doc_id']):08d}"
            else:
                url = f"https://docs.example.org/{doc['source']}/{int(doc['doc_id']):08d}"
            if r > 0 and rng.random() < 0.04:
                rows.append((url, None, None, r, "D", seq))
            else:
                body = str(doc["text"])[:2000]
                html = (
                    f"<html><head><title>doc {int(doc['doc_id'])} r{r}</title></head>"
                    f"<body><script>var r={r};</script><p>{body}</p></body></html>"
                ).encode("utf-8")
                rows.append((url, html, str(doc["lang"]), r, "I" if r == 0 else "U", seq))
            seq += 1
    n_events = len(rows)
    os.makedirs(out_dir, exist_ok=True)
    files = []
    for e in range(n_epochs):
        lo, hi = e * n_events // n_epochs, (e + 1) * n_events // n_epochs
        chunk = rows[lo:hi]
        table = pa.table(
            {
                "url": pa.array([c[0] for c in chunk], pa.string()),
                "warc_ts": pa.array(
                    [_BASE_TS_US + c[3] * 3_600_000_000 + c[5] for c in chunk],
                    pa.timestamp("us"),
                ),
                "html": pa.array([c[1] for c in chunk], pa.binary()),
                "text": pa.nulls(len(chunk), pa.string()),
                "lang": pa.array([c[2] for c in chunk], pa.string()),
                "op": pa.array([c[4] for c in chunk], pa.string()),
                "seq": pa.array([c[5] for c in chunk], pa.int64()),
                "epoch": pa.array([e] * len(chunk), pa.int32()),
            }
        )
        path = os.path.join(out_dir, f"epoch={e:05d}.parquet")
        pq.write_table(table, path)
        files.append(path)
    return {"n_events": n_events, "n_epochs": n_epochs, "files": files}


LATE_LATENESS_US = 1_800_000_000  # 30 min of event time


def late_events_from_documents(sf_dir: str, out_dir: str) -> dict:
    """Derive a deterministic change log from the sanctioned ``documents``
    table that EXERCISES the event-time lateness contract
    (``EngineConfig.allowed_lateness_us = LATE_LATENESS_US``): besides
    inserts / updates / deletes it plants stale events — updates whose
    ``warc_ts`` lags the committed watermark by more than the allowed
    lateness, including attempts to resurrect deleted urls — that a
    lateness-enforcing engine must reject. Pure doc_id arithmetic, no RNG.

    Epoch plan (T0 = base, j = row index within the doc order):
      0: INSERT every doc at T0+j
      1: doc_id%7==0 → DELETE at T0+1h+j; doc_id%5==0 → UPDATE at T0+1h+j
      2: doc_id%3==0 → UPDATE at T0+6h+j (watermark jump);
         doc_id%11==0 → stale UPDATE at T0+10min+j  (late: W≈T0+1h, L=30min)
      3: doc_id%13==0 → stale UPDATE at T0+2h+j     (late: W≈T0+6h)
         doc_id%7==0 and doc_id%2==0 → UPDATE at T0+8h+j (legitimate
         resurrection: on time and NEWER than the tombstone — wins LWW)
         doc_id%7==0 and doc_id%2==1 → stale UPDATE at T0+30min+j
         (blocked resurrection: older than the tombstone AND late)
    """
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang", "source"]
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    T0 = _BASE_TS_US
    H = 3_600_000_000

    def html_of(doc, r):
        body = str(doc["text"])[:2000]
        return (
            f"<html><head><title>doc {int(doc['doc_id'])} r{r}</title></head>"
            f"<body><script>var r={r};</script><p>{body}</p></body></html>"
        ).encode("utf-8")

    def url_of(doc):
        return f"https://docs.example.org/{doc['source']}/{int(doc['doc_id']):08d}"

    per_epoch: list[list[tuple]] = [[], [], [], []]
    seq = 0
    for j, doc in docs.iterrows():
        d = int(doc["doc_id"])
        u, lang = url_of(doc), str(doc["lang"])
        per_epoch[0].append((u, html_of(doc, 0), lang, T0 + j, "I", None))
        if d % 7 == 0:
            per_epoch[1].append((u, None, None, T0 + H + j, "D", None))
        elif d % 5 == 0:
            per_epoch[1].append((u, html_of(doc, 1), lang, T0 + H + j, "U", None))
        if d % 3 == 0:
            per_epoch[2].append((u, html_of(doc, 2), lang, T0 + 6 * H + j, "U", None))
        if d % 11 == 0:
            per_epoch[2].append((u, html_of(doc, 92), lang, T0 + 600_000_000 + j, "U", None))
        if d % 13 == 0:
            per_epoch[3].append((u, html_of(doc, 93), lang, T0 + 2 * H + j, "U", None))
        if d % 7 == 0:
            if d % 2 == 0:
                per_epoch[3].append((u, html_of(doc, 3), lang, T0 + 8 * H + j, "U", None))
            else:
                per_epoch[3].append((u, html_of(doc, 94), lang, T0 + H // 2 + j, "U", None))

    os.makedirs(out_dir, exist_ok=True)
    files = []
    n_events = 0
    for e, chunk in enumerate(per_epoch):
        chunk = [(c[0], c[1], c[2], c[3], c[4], seq + i) for i, c in enumerate(chunk)]
        seq += len(chunk)
        n_events += len(chunk)
        table = pa.table(
            {
                "url": pa.array([c[0] for c in chunk], pa.string()),
                "warc_ts": pa.array([c[3] for c in chunk], pa.timestamp("us")),
                "html": pa.array([c[1] for c in chunk], pa.binary()),
                "text": pa.nulls(len(chunk), pa.string()),
                "lang": pa.array([c[2] for c in chunk], pa.string()),
                "op": pa.array([c[4] for c in chunk], pa.string()),
                "seq": pa.array([c[5] for c in chunk], pa.int64()),
                "epoch": pa.array([e] * len(chunk), pa.int32()),
            }
        )
        path = os.path.join(out_dir, f"epoch={e:05d}.parquet")
        pq.write_table(table, path, row_group_size=16384)
        files.append(path)
    return {"n_events": n_events, "n_epochs": 4, "files": files}
