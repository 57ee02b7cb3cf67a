"""URL canonicalization (functions/urls.py): golden pairs, the
idempotence property (canonical form is a fixed point), and variant
collapse — the engine side; cross-engine rule agreement is hash-gated
by q_text_url_canonicalize's DuckDB replay."""

from __future__ import annotations

import pytest

from setup_harvest_action_spark.functions.urls import canonicalize_url

GOLDEN = [
    ("HTTP://WWW.Example.COM:80/a/./b/?z=1&a=2#frag",
     "http://www.example.com/a/b/?a=2&z=1"),
    ("https://Example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/articles/.", "http://example.com/articles/"),
    ("http://User.Name@Example.COM/p", "http://User.Name@example.com/p"),
    ("http://example.com/p?", "http://example.com/p"),
    ("http://example.com/p?b=2&a=1&", "http://example.com/p?a=1&b=2"),
    ("http://example.com/a/././b", "http://example.com/a/b"),
    # /../ deliberately NOT resolved (documented conservative choice)
    ("http://example.com/a/../b", "http://example.com/a/../b"),
]


@pytest.fixture(scope="module")
def canon(spark):
    def run(urls):
        import pyspark.sql.functions as F

        df = spark.createDataFrame([(u,) for u in urls], "url string")
        return [
            r["c"]
            for r in df.select(
                canonicalize_url(F.col("url")).alias("c")
            ).collect()
        ]

    return run


def test_golden_pairs(canon):
    got = canon([u for u, _ in GOLDEN])
    for (src, want), out in zip(GOLDEN, got):
        assert out == want, src


def test_idempotent_fixed_point(canon):
    once = canon([u for u, _ in GOLDEN])
    twice = canon(once)
    assert once == twice


def test_variants_collapse_to_one(canon):
    variants = [
        "http://example.com/page?a=1&b=2",
        "HTTP://EXAMPLE.COM:80/page?b=2&a=1",
        "http://Example.com/page?b=2&a=1#top",
        "http://example.com:80/page/.?a=1&b=2",
    ]
    # the fourth differs in path ('/page/' vs '/page') — deliberate
    out = canon(variants)
    assert out[0] == out[1] == out[2] == "http://example.com/page?a=1&b=2"
    assert out[3] == "http://example.com/page/?a=1&b=2"
