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


def replay_oracle(events_dir: str, keep_html: bool = False) -> pd.DataFrame:
    """Replay all event files sequentially; return the live table sorted by
    url: one row per non-deleted url with the winning version's payload,
    ``text`` filled by the deterministic extractor, plus
    ``warc_ts/seq/epoch`` lineage. Schema evolution falls out of
    ``pd.concat`` (missing columns → NaN; int widening automatic)."""
    files = sorted(glob.glob(os.path.join(events_dir, "epoch=*.parquet")))
    frames = [pq.read_table(f).to_pandas() for f in files]
    df = pd.concat(frames, ignore_index=True, sort=False)

    df["url"] = df["url"].map(canonicalize_url_one)
    # the admission rule (normalize._keep_mask): malformed events are
    # REJECTED, never merged — url present post-canonicalization, op
    # valid, version columns present
    df = df[
        df["url"].notna()
        & df["op"].isin(["I", "U", "D"])
        & df["warc_ts"].notna()
        & df["seq"].notna()
    ]

    ex = HtmlTextExtractor()
    need = df["text"].isna() & df["html"].notna()
    df.loc[need, "text"] = df.loc[need, "html"].map(ex.extract_one)

    df = df.sort_values(["warc_ts", "seq"], kind="mergesort")
    winner = df.groupby("url", as_index=False).tail(1)
    live = winner[winner["op"] != "D"].copy()
    drop = ["op"] + ([] if keep_html else ["html"])
    live = live.drop(columns=drop)
    return live.sort_values("url", kind="mergesort").reset_index(drop=True)
