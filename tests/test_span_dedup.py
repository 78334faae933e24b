"""span_dedup — ExactSubstr-style span-level dedup semantics.

Pins: keep-first-occurrence ordering, interval-union coverage for
overlapping marked spans, pass-through totality (one output row per
input doc, even with zero duplicated grams — the sentinel path), and
the linear-per-group scale claim via a flooded boilerplate gram.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gene_etl_ray.ops.dedup import span_dedup

BOILER = " ".join(f"b{i}" for i in range(8))


def run(docs: pd.DataFrame, **kw) -> pd.DataFrame:
    out = span_dedup(rd.from_pandas(docs), **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_keep_first_cut_later():
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "u1 u2 " + BOILER + " u3",
                "v1 " + BOILER + " v2 v3",
                "w1 w2 w3 w4 w5 w6 w7 w8",
            ],
        }
    )
    out = run(docs, n=8, min_count=2)
    # doc 1 is the (doc_id, start)-min occurrence: untouched
    assert out.loc[0, "clean_text"] == docs.loc[0, "text"]
    assert out.loc[0, "n_removed"] == 0
    # doc 2 loses exactly the boilerplate span
    assert out.loc[1, "clean_text"] == "v1 v2 v3"
    assert out.loc[1, "n_removed"] == 8
    # unique doc untouched
    assert out.loc[2, "clean_text"] == docs.loc[2, "text"]


def test_exact_dup_doc_fully_removed():
    t = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    out = run(pd.DataFrame({"doc_id": [5, 9], "text": [t, t]}), n=8)
    assert out.loc[0, "clean_text"] == t  # doc 5 keeps everything
    assert out.loc[1, "clean_text"] == ""  # doc 9: every gram is 2nd
    assert out.loc[1, "n_removed"] == 10


def test_within_doc_repeat_and_overlap_union():
    # the repeated 8-gram occurs twice INSIDE one doc; the second
    # occurrence's span is cut, first kept — and overlapping marked
    # spans union (coverage, not double counting)
    text = BOILER + " x1 " + BOILER + " " + BOILER
    out = run(pd.DataFrame({"doc_id": [1], "text": [text]}), n=8)
    assert out.loc[0, "clean_text"] == BOILER + " x1"
    assert out.loc[0, "n_removed"] == 16


def test_no_dup_corpus_passthrough():
    # zero duplicated grams: the sentinel keeps the left join typed and
    # every doc passes through intact
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["p q r s t u v w x", "aa bb cc dd ee ff gg hh ii"],
        }
    )
    out = run(docs, n=8)
    assert list(out["clean_text"]) == list(docs["text"])
    assert out["n_removed"].sum() == 0


def test_short_docs_no_grams():
    # docs shorter than n emit no grams and are never cut
    docs = pd.DataFrame({"doc_id": [1, 2], "text": ["one two", "one two"]})
    out = run(docs, n=8)
    assert list(out["clean_text"]) == ["one two", "one two"]


def test_flooded_gram_linear():
    # 5000 docs all embedding the same boilerplate gram: one gram group
    # of 5000 occurrences — linear work, no pair explosion; every copy
    # but the (doc_id, start)-min is cut
    nd = 5000
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(nd, dtype=np.int64),
            "text": [f"u{i}a u{i}b {BOILER} u{i}c" for i in range(nd)],
        }
    )
    out = run(docs, n=8)
    assert (out["n_removed"] == 8).sum() == nd - 1
    assert out.loc[0, "n_removed"] == 0
    assert out.loc[1, "clean_text"] == "u1a u1b u1c"
