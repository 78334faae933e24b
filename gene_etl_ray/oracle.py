"""Trivially-correct single-process replay oracle.

Computes the golden lake state for a change log by brute force in pandas:
read every event, extract text, keep the max-``(warc_ts, seq)`` version per
url, honor tombstones. The distributed engine's output must match this
byte-for-byte (SURVEY §5.2). Reference analog: the reference's keyed
results table whose natural-key uniqueness defines the converged state
(``models.py:122-161``, ``persist.py:164-177``).
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow.parquet as pq

from gene_etl_ray.extract import HtmlTextExtractor
from gene_etl_ray.pipelines.normalize import canonicalize_url_one


def replay_oracle(
    events_dir: str,
    keep_html: bool = False,
    allowed_lateness_us: int | None = None,
    epochs_per_commit: int = 1,
) -> pd.DataFrame:
    """Replay all event files sequentially; return the live table sorted by
    url: one row per non-deleted url with the winning version's payload,
    ``text`` filled by the deterministic extractor, plus
    ``warc_ts/seq/epoch`` lineage. Schema evolution falls out of
    ``pd.concat`` (missing columns → NaN; int widening automatic).

    ``allowed_lateness_us`` simulates the engine's event-time watermark
    contract: segments are replayed in commit groups of
    ``epochs_per_commit``; a group's events whose ``warc_ts`` falls below
    (max admitted warc_ts of all PRIOR groups − lateness) are rejected
    before the LWW merge — exactly the admission rule the engine applies
    (`EngineConfig.allowed_lateness_us`)."""
    files = sorted(glob.glob(os.path.join(events_dir, "epoch=*.parquet")))
    frames = [pq.read_table(f).to_pandas() for f in files]

    def admit(df: pd.DataFrame) -> pd.DataFrame:
        d = df.copy()
        d["url"] = d["url"].map(canonicalize_url_one)
        # the admission rule (normalize._keep_mask): malformed events are
        # REJECTED, never merged — url present post-canonicalization, op
        # valid, version columns present
        return d[
            d["url"].notna()
            & d["op"].isin(["I", "U", "D"])
            & d["warc_ts"].notna()
            & d["seq"].notna()
        ]

    if allowed_lateness_us is None:
        df = admit(pd.concat(frames, ignore_index=True, sort=False))
    else:
        kept: list[pd.DataFrame] = []
        watermark_us: int | None = None  # max admitted warc_ts, prior groups
        for i in range(0, len(frames), epochs_per_commit):
            g = admit(pd.concat(frames[i : i + epochs_per_commit],
                                ignore_index=True, sort=False))
            ts_us = g["warc_ts"].astype("datetime64[us]").astype("int64")
            if watermark_us is not None:
                g = g[ts_us >= watermark_us - allowed_lateness_us]
                ts_us = ts_us[g.index]
            if len(g):
                m = int(ts_us.max())
                watermark_us = m if watermark_us is None else max(watermark_us, m)
                kept.append(g)
        if not kept:
            kept = [admit(pd.concat(frames, ignore_index=True, sort=False)).iloc[0:0]]
        df = pd.concat(kept, ignore_index=True, sort=False)

    ex = HtmlTextExtractor()
    need = df["text"].isna() & df["html"].notna()
    df.loc[need, "text"] = df.loc[need, "html"].map(ex.extract_one)

    df = df.sort_values(["warc_ts", "seq"], kind="mergesort")
    winner = df.groupby("url", as_index=False).tail(1)
    live = winner[winner["op"] != "D"].copy()
    drop = ["op"] + ([] if keep_html else ["html"])
    live = live.drop(columns=drop)
    return live.sort_values("url", kind="mergesort").reset_index(drop=True)
