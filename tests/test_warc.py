"""WARC container (sources/warc.py): Content-Length-driven framing
(including the adversarial body that embeds a fake record header),
gzip-member layout, HTTP parsing, and clean failures on truncation /
corruption."""

from __future__ import annotations

import gzip
import random
import zlib

import pytest

from setup_harvest_action_spark.sources.warc import (
    encode_warc,
    http_response,
    parse_warc,
)

PAGES = [
    ("https://x.example/1", "<html><body><p>page one body</p></body></html>"),
    ("https://x.example/2", "<html><body><p>page two body</p></body></html>"),
    ("https://x.example/3", "<html><body><p>page three</p></body></html>"),
]


def test_roundtrip_plain_and_gzip_members():
    for gz in (False, True):
        blob = encode_warc(PAGES, gzip_members=gz)
        recs = parse_warc(blob)
        assert [r["type"] for r in recs] == ["warcinfo"] + ["response"] * 3
        for (uri, html), rec in zip(PAGES, recs[1:]):
            assert rec["uri"] == uri
            assert rec["http_status"] == 200
            assert rec["http_body"].decode() == html
    # gzip layout is one member per record (seekable production shape)
    blob = encode_warc(PAGES, gzip_members=True)
    assert blob.count(b"\x1f\x8b\x08") == 4


def test_body_containing_fake_record_header_does_not_split():
    """THE framing trap: a response body that legally contains
    '\\r\\n\\r\\nWARC/1.0' — separator-scanning readers split here;
    Content-Length framing must not."""
    evil = (
        "<html><body><p>quoted: </p><pre>\r\n\r\nWARC/1.0\r\n"
        "WARC-Type: response\r\nContent-Length: 9999\r\n\r\n</pre>"
        "<p>after the fake header</p></body></html>"
    )
    blob = encode_warc([("https://x.example/evil", evil)] + PAGES)
    recs = parse_warc(blob)
    assert len(recs) == 1 + 1 + len(PAGES)
    assert recs[1]["http_body"].decode() == evil
    assert recs[2]["uri"] == PAGES[0][0]


def test_truncation_raises_cleanly():
    blob = encode_warc(PAGES)
    full = len(parse_warc(blob))
    for cut in range(10, len(blob), max(1, len(blob) // 120)):
        try:
            recs = parse_warc(blob[:cut])
        except ValueError:
            continue
        # a cut landing exactly on a record boundary parses a prefix
        assert len(recs) <= full


def test_bitflips_never_hang_or_crash_uncleanly():
    blob = bytearray(encode_warc(PAGES, gzip_members=True))
    rng = random.Random(321)
    for _ in range(150):
        i = rng.randrange(len(blob))
        bit = 1 << rng.randrange(8)
        blob[i] ^= bit
        try:
            recs = parse_warc(bytes(blob))
            assert isinstance(recs, list)
        except (ValueError, EOFError, gzip.BadGzipFile, OSError, zlib.error):
            pass
        finally:
            blob[i] ^= bit


def test_http_response_framing():
    r = http_response("<p>x</p>", status=404)
    assert r.startswith(b"HTTP/1.1 404")
    blob = encode_warc([("https://x.example/missing", "<p>gone</p>")])
    # swap in a 404 manually: non-200 records are skipped by the
    # pipeline (pinned here at parse level: status surfaces)
    recs = parse_warc(blob)
    assert recs[1]["http_status"] == 200


def test_three_layouts_parse_identically():
    """r16: plain / gzip-members / single-stream-gzip must all yield
    the identical record sequence, and the full capture triple
    (request + response + metadata) must survive each layout."""
    from setup_harvest_action_spark.sources.warc import (
        WARC_LAYOUTS,
        encode_warc,
        parse_warc,
    )

    pages = [
        ("https://h.example/a", "<html><body>alpha</body></html>"),
        ("https://h.example/b", "<html><body>beta</body></html>"),
    ]
    parses = {
        lay: parse_warc(
            encode_warc(pages, layout=lay, with_request_metadata=True)
        )
        for lay in WARC_LAYOUTS
    }
    types = [r["type"] for r in parses["plain"]]
    assert types == [
        "warcinfo",
        "request", "response", "metadata",
        "request", "response", "metadata",
    ]
    base = [(r["type"], r["uri"], r["payload"]) for r in parses["plain"]]
    for lay, recs in parses.items():
        assert [(r["type"], r["uri"], r["payload"]) for r in recs] == base, lay
    # the request record carries a real HTTP/1.1 request line + Host
    req = parses["plain"][1]
    assert req["payload"].startswith(b"GET /a HTTP/1.1\r\nHost: h.example")
    # metadata refers back to its response record
    meta = parses["plain"][3]
    resp = parses["plain"][2]
    assert meta["headers"]["warc-refers-to"] == resp["headers"]["warc-record-id"]


def test_wet_roundtrip_and_refers_to():
    """r16: conversion records round-trip UTF-8 text byte-exactly in
    every layout and link back to the response record id."""
    from setup_harvest_action_spark.sources.warc import (
        WARC_LAYOUTS,
        encode_wet,
        parse_warc,
    )

    entries = [
        ("https://h.example/a", "plain extracted text"),
        ("https://h.example/b", "naïve — żółć ©"),  # non-ASCII
    ]
    for lay in WARC_LAYOUTS:
        recs = parse_warc(encode_wet(entries, layout=lay))
        assert [r["type"] for r in recs] == [
            "warcinfo", "conversion", "conversion",
        ], lay
        got = [
            (r["uri"], r["payload"].decode("utf-8"))
            for r in recs
            if r["type"] == "conversion"
        ]
        assert got == entries, lay
        for r in recs[1:]:
            assert r["headers"]["content-type"] == "text/plain"
            assert r["headers"]["warc-refers-to"].startswith("<urn:uuid:")


def test_unknown_layout_raises():
    import pytest as _pytest

    from setup_harvest_action_spark.sources.warc import encode_warc

    with _pytest.raises(ValueError):
        encode_warc([("https://h.example/a", "x")], layout="zip")


def test_wat_envelope_shape_and_roundtrip():
    """r16: WAT metadata records carry the Common-Crawl-shaped JSON
    envelope (status, headers, raw links) and round-trip in every
    layout with the refers-to chain intact."""
    import json

    from setup_harvest_action_spark.sources.warc import (
        WARC_LAYOUTS,
        encode_wat,
        parse_warc,
    )

    captures = [
        (
            "https://h.example/a",
            200,
            {"content-type": "text/html"},
            ["/x", "../y", "https://o.example/z#f"],
        ),
        ("https://h.example/b", 404, {}, []),
    ]
    for lay in WARC_LAYOUTS:
        recs = parse_warc(encode_wat(captures, layout=lay))
        metas = [r for r in recs if r["type"] == "metadata"]
        assert len(metas) == 2, lay
        for rec, (uri, status, headers, links) in zip(metas, captures):
            assert rec["headers"]["content-type"] == "application/json"
            assert rec["headers"]["warc-refers-to"].startswith("<urn:uuid:")
            env = json.loads(rec["payload"].decode("utf-8"))["Envelope"]
            assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == uri
            resp = env["Payload-Metadata"]["HTTP-Response-Metadata"]
            assert resp["Response-Message"]["Status"] == status
            assert resp["Headers"] == headers
            assert [x["url"] for x in resp["HTML-Metadata"]["Links"]] == links
