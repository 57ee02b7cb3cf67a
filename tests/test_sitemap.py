"""Sitemaps (functions/sitemap.py): urlset + sitemapindex roundtrips
(plain and gzipped, with and without the sitemaps.org namespace), the
50k protocol cap, loc-less entry skipping, and malformed-XML
refusal."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pytest

from setup_harvest_action_spark.functions.sitemap import (
    SITEMAP_MAX_URLS,
    encode_sitemap,
    encode_sitemap_index,
    parse_sitemap,
)


def test_urlset_roundtrip_plain_and_gzipped():
    entries = [
        {"loc": f"https://x.example/p{i}", "lastmod": f"2026-01-{i+1:02d}",
         "changefreq": "daily", "priority": "0.8"}
        for i in range(5)
    ]
    for gz in (False, True):
        blob = encode_sitemap(entries, gzipped=gz)
        assert (blob[:2] == b"\x1f\x8b") == gz
        parsed = parse_sitemap(blob)
        assert parsed["kind"] == "urlset"
        assert [e["loc"] for e in parsed["entries"]] == \
            [e["loc"] for e in entries]
        assert parsed["entries"][2]["lastmod"] == "2026-01-03"
        assert parsed["entries"][0]["changefreq"] == "daily"


def test_sitemapindex_roundtrip():
    shards = [
        {"loc": f"https://x.example/sitemap-{i}.xml.gz",
         "lastmod": "2026-02-01"}
        for i in range(3)
    ]
    parsed = parse_sitemap(encode_sitemap_index(shards, gzipped=True))
    assert parsed["kind"] == "index"
    assert [e["loc"] for e in parsed["entries"]] == \
        [s["loc"] for s in shards]


def test_namespace_agnostic_parse():
    bare = (
        b"<?xml version='1.0'?><urlset><url><loc>https://a/1</loc>"
        b"<lastmod>2026-03-01</lastmod></url>"
        b"<url><lastmod>2026-03-02</lastmod></url>"  # loc-less: skipped
        b"</urlset>"
    )
    parsed = parse_sitemap(bare)
    assert len(parsed["entries"]) == 1
    assert parsed["entries"][0]["loc"] == "https://a/1"
    # and the namespaced form the encoder writes parses identically
    ns = encode_sitemap([{"loc": "https://a/1", "lastmod": "2026-03-01"}])
    assert b'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"' in ns
    assert parse_sitemap(ns)["entries"][0]["lastmod"] == "2026-03-01"


def test_protocol_cap_and_refusals():
    with pytest.raises(ValueError, match="protocol cap"):
        encode_sitemap(
            [{"loc": "x"}] * (SITEMAP_MAX_URLS + 1)
        )
    with pytest.raises(ET.ParseError):
        parse_sitemap(b"<urlset><url></urlset>")
    with pytest.raises(ValueError, match="not a sitemap"):
        parse_sitemap(b"<html><body>404</body></html>")
