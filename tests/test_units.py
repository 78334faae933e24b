"""Unit tests for the engine's kernels (reference test style: seeded
inputs + invariant assertions, SURVEY §5.1)."""

import numpy as np
import pyarrow as pa
import pytest

from gene_etl_ray.config import EngineConfig, config_hash
from gene_etl_ray.extract import HtmlTextExtractor, extract_text
from gene_etl_ray.hashing import group_keys, hash_urls, partition_keys
from gene_etl_ray.pipelines.normalize import canonicalize_url_one, normalize_batch
from gene_etl_ray.schema import (
    SchemaEvolutionError,
    conform_table,
    evolve_schema,
)


class TestExtractor:
    def test_strips_tags_scripts_styles(self):
        html = b"<html><head><style>x{}</style></head><body><script>bad()</script><p>Hello &amp; world</p></body></html>"
        out = extract_text(html)
        assert "Hello & world" in out
        assert "bad()" not in out and "x{}" not in out and "<p>" not in out

    def test_byte_determinism_repeated(self):
        html = ("<html><body>" + "<p>word &copy; t</p>" * 200 + "</body></html>").encode()
        a, b = extract_text(html), HtmlTextExtractor().extract_one(html)
        assert a == b
        assert extract_text(html) == a

    def test_none_passthrough(self):
        assert extract_text(None) is None

    def test_batch_path_byte_identical_to_per_doc(self):
        """The RE2 batch path and the Python-re per-doc path are TWO
        implementations of one frozen algorithm — every adversarial
        shape must produce byte-identical output: engine-divergent
        constructs (non-ASCII around \\b, unicode whitespace via
        entities), nested comment/script pathologies, invalid utf-8,
        every whitespace char, empty and entity-only docs."""
        import random

        cases = [
            b"",
            b"plain text no markup",
            b"<p>a</p>\t<p>b</p>\v\f<br>c\r\n d",
            b"<script> <!-- </script> --> text",  # comment/script nesting
            b"<!-- <script> --> real <script>x</script> tail",
            b"<script>a<style>b</style>c</script>d<style>e</style>",
            b"a &nbsp; b\n&nbsp;\nc",       # entity -> U+00A0 next to \n
            b"&amp;&lt;&gt;&quot;&copy;",   # entity-only
            "<scripté>x</script>y".encode(),  # \b divergence bait (non-ASCII)
            "héllo <p>wörld</p>  ok".encode(),  # unicode ws + words
            b"\xff\xfe<p>bad utf8</p>\xff", # invalid utf-8 -> replacement
            b"   \n\n\t \n  ",              # all-whitespace
            b"<head><title>t</title></head><body>x</body>",
        ]
        rng = random.Random(7)
        frags = [
            "<p>", "</p>", "<br>", "<script>", "</script>", "<!--", "-->",
            "&nbsp;", "&amp;", " ", "\t", "\n", "\v", "word", "\xa0", "é",
        ]
        for _ in range(300):
            cases.append(
                "".join(rng.choice(frags) for _ in range(rng.randint(0, 25))).encode()
            )
        ex = HtmlTextExtractor()
        got = ex._extract_many(cases)
        want = [ex.extract_one(c) for c in cases]
        for c, g, w in zip(cases, got, want):
            assert g == w, (c[:80], g[:80], w[:80])

    def test_batch_fills_only_null_text(self):
        ex = HtmlTextExtractor()
        t = pa.table(
            {
                "html": pa.array([b"<p>a</p>", b"<p>b</p>", None], pa.binary()),
                "text": pa.array(["keep", None, None], pa.string()),
            }
        )
        out = ex(t)
        assert out.column("text").to_pylist() == ["keep", "b", None]


class TestHashing:
    def test_deterministic_across_calls(self):
        urls = [f"https://d{i}.com/p{i}" for i in range(100)]
        assert (hash_urls(urls) == hash_urls(list(urls))).all()

    def test_partition_range_and_stability(self):
        urls = [f"https://x.com/{i}" for i in range(1000)]
        pk = partition_keys(urls, 16)
        assert pk.min() >= 0 and pk.max() < 16
        # a url's partition never changes
        assert (pk == partition_keys(urls, 16)).all()

    def test_salting_preserves_per_url_grouping(self):
        urls = np.array(["https://h.com/a"] * 50 + ["https://h.com/b"] * 50, dtype=object)
        pk, gk = group_keys(urls, 4, 8, hot_partitions={0, 1, 2, 3})
        # same url → always same group key
        assert len(set(gk[:50])) == 1 and len(set(gk[50:])) == 1
        # gkey maps back to pkey
        assert (gk // 8 == pk).all()


class TestNormalize:
    def test_canonicalize(self):
        assert canonicalize_url_one("HTTPS://ExAmple.Com/Path#frag") == "https://example.com/Path"
        assert canonicalize_url_one("  ") is None
        assert canonicalize_url_one(None) is None

    def test_batch_drops_bad_rows(self):
        t = pa.table(
            {
                "url": pa.array(["https://a.com/x", None, "https://b.com/y"], pa.string()),
                "op": pa.array(["I", "I", "Z"], pa.string()),
                "warc_ts": pa.array([1, 2, 3], pa.timestamp("us")),
                "seq": pa.array([0, 1, 2], pa.int64()),
            }
        )
        out = normalize_batch(t)
        assert out.column("url").to_pylist() == ["https://a.com/x"]


class TestSchemaEvolution:
    def test_additive_column(self):
        a = pa.schema([("x", pa.int64())])
        b = pa.schema([("x", pa.int64()), ("y", pa.string())])
        assert evolve_schema(a, b).names == ["x", "y"]
        # symmetric: removing a column never removes it from the lake
        assert evolve_schema(b, a).names == ["x", "y"]

    def test_widening(self):
        a = pa.schema([("x", pa.int32())])
        b = pa.schema([("x", pa.int64())])
        assert evolve_schema(a, b).field("x").type == pa.int64()
        c = pa.schema([("x", pa.float32())])
        assert evolve_schema(a, c).field("x").type == pa.float64()

    def test_incompatible_raises(self):
        a = pa.schema([("x", pa.string())])
        b = pa.schema([("x", pa.int64())])
        with pytest.raises(SchemaEvolutionError):
            evolve_schema(a, b)

    def test_conform_backfills_and_casts(self):
        t = pa.table({"x": pa.array([1, 2], pa.int32())})
        s = pa.schema([("x", pa.int64()), ("y", pa.string())])
        out = conform_table(t, s)
        assert out.schema == s
        assert out.column("y").null_count == 2


class TestConfig:
    def test_hash_stable_and_order_insensitive(self):
        assert config_hash({"a": 1, "b": 2}) == config_hash({"b": 2, "a": 1})

    def test_validation(self):
        with pytest.raises(ValueError):
            EngineConfig(lake_dir="/tmp/x", num_partitions=0)


class TestCrossProcessDeterminism:
    def test_extractor_bytes_identical_across_processes(self, tmp_path):
        """SURVEY §5.2: same html → same text bytes, in ANOTHER process
        (no dict-order / locale / hash-seed dependence)."""
        import subprocess
        import sys

        from gene_etl_ray.fixtures import generate_events
        import pyarrow.parquet as pq
        import os

        d = str(tmp_path / "ev")
        generate_events(d, n_urls=30, n_events=60, n_epochs=1)
        t = pq.read_table(os.path.join(d, "epoch=00000.parquet"))
        htmls = [h for h in t.column("html").to_pylist() if h is not None][:20]

        from gene_etl_ray.extract import HtmlTextExtractor

        here = [HtmlTextExtractor().extract_one(h) for h in htmls]

        script = (
            "import sys, hashlib\n"
            "sys.path.insert(0, %r)\n"
            "from gene_etl_ray.extract import HtmlTextExtractor\n"
            "import pyarrow.parquet as pq\n"
            "t = pq.read_table(%r)\n"
            "htmls = [h for h in t.column('html').to_pylist() if h is not None][:20]\n"
            "ex = HtmlTextExtractor()\n"
            "for h in htmls:\n"
            "    print(hashlib.sha256(ex.extract_one(h).encode()).hexdigest())\n"
        ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
             os.path.join(d, "epoch=00000.parquet"))
        out = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True, text=True, check=True,
            env={**os.environ, "PYTHONHASHSEED": "12345"},  # force a DIFFERENT hash seed
        ).stdout.split()
        import hashlib

        assert out == [hashlib.sha256(x.encode()).hexdigest() for x in here]
