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


# --- r17: chunked transfer coding + content codings --------------------------


def _coded_record(coding: str, body: bytes = b"x" * 700):
    from setup_harvest_action_spark.sources.warc import encode_warc_http

    blob = encode_warc_http(
        [("https://x.example/c", body, "text/plain", coding)],
        layout="plain",
    )
    return body, parse_warc(blob)[1]


def test_all_codings_decode_identically():
    from setup_harvest_action_spark.sources.warc import HTTP_CODINGS

    body = ("mixed content é ünïcode " * 40).encode("utf-8")
    for coding in HTTP_CODINGS:
        _, rec = _coded_record(coding, body)
        assert "http_error" not in rec, (coding, rec.get("http_error"))
        assert rec["http_body"] == body, coding
    # chunked responses carry no Content-Length, the wire reality
    _, rec = _coded_record("chunked", body)
    assert "content-length" not in rec["http_headers"]
    assert rec["http_headers"]["transfer-encoding"] == "chunked"


def test_chunked_body_spans_multiple_chunks():
    from setup_harvest_action_spark.sources.warc import _chunk_body

    body = b"a" * 700
    framed = _chunk_body(body)
    # 256-byte chunks -> 3 data chunks + the zero last-chunk
    assert framed.count(b"\r\n100\r\n") + framed.startswith(b"100\r\n") >= 1
    assert framed.endswith(b"0\r\n\r\n")


def test_deflate_both_wrappings_decode():
    from setup_harvest_action_spark.sources.warc import _decode_content

    body = b"deflate realism " * 30
    assert _decode_content(zlib.compress(body), "deflate") == body
    raw = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    assert (
        _decode_content(raw.compress(body) + raw.flush(), "deflate") == body
    )


def test_truncated_chunk_is_per_record_error_not_hang():
    """A chunk whose declared size overruns the payload must surface
    as http_error on THAT record; sibling records still parse."""
    from setup_harvest_action_spark.sources.warc import _record

    # declared chunk size 0x400 but only 10 bytes follow
    evil = b"400\r\n0123456789"
    bad = http_response(body=b"ignored")  # placeholder to build head
    head = bad.split(b"\r\n\r\n")[0]
    head = head.replace(
        b"Content-Length: 7", b"Transfer-Encoding: chunked"
    )
    payload = head + b"\r\n\r\n" + evil
    blob = _record(
        "response",
        payload,
        uri="https://x.example/trunc",
        content_type="application/http;msgtype=response",
    ) + encode_warc(PAGES)
    recs = parse_warc(blob)
    assert "truncated chunk" in recs[0]["http_error"]
    assert "http_body" not in recs[0]
    assert recs[2]["http_body"]  # siblings unaffected


def test_corrupt_gzip_member_is_per_record_error():
    from setup_harvest_action_spark.sources.warc import encode_warc_http

    body = b"will be corrupted " * 50
    blob = bytearray(
        encode_warc_http(
            [("https://x.example/g", body, "text/plain", "gzip")],
            layout="plain",
        )
    )
    # flip a byte deep inside the gzip'd HTTP body (past the headers)
    blob[-20] ^= 0xFF
    recs = parse_warc(bytes(blob))
    rec = recs[1]
    assert "http_error" in rec and "gzip" in rec["http_error"]
    assert "http_body" not in rec


def test_unsupported_content_coding_refused_honestly():
    from setup_harvest_action_spark.sources.warc import _record

    resp = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        b"Content-Encoding: br\r\nContent-Length: 4\r\n\r\nXXXX"
    )
    blob = _record(
        "response",
        resp,
        uri="https://x.example/br",
        content_type="application/http;msgtype=response",
    )
    rec = parse_warc(blob)[0]
    assert "unsupported content-encoding" in rec["http_error"]
    assert "http_body" not in rec


def test_malformed_chunk_size_is_per_record_error():
    from setup_harvest_action_spark.sources.warc import _record

    resp = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        b"Transfer-Encoding: chunked\r\n\r\nzz!\r\ndata\r\n0\r\n\r\n"
    )
    blob = _record(
        "response",
        resp,
        uri="https://x.example/badsize",
        content_type="application/http;msgtype=response",
    )
    rec = parse_warc(blob)[0]
    assert "malformed chunk size" in rec["http_error"]


def test_chunk_extensions_and_trailers_tolerated():
    from setup_harvest_action_spark.sources.warc import _dechunk_body

    framed = (
        b"5;ext=1\r\nhello\r\n6\r\n world\r\n0\r\n"
        b"X-Trailer: v\r\n\r\n"
    )
    assert _dechunk_body(framed) == b"hello world"


# --- r17: payload digests + revisit records ----------------------------------


def test_payload_digest_convention():
    from setup_harvest_action_spark.sources.warc import payload_digest

    # sha1 of empty payload, base32 — the wild's spelling
    assert payload_digest(b"") == "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ"
    blob = encode_warc(PAGES, gzip_members=True)
    for rec in parse_warc(blob):
        if rec["type"] == "response":
            assert rec["headers"]["warc-payload-digest"] == payload_digest(
                rec["http_body"]
            )


def test_recrawl_writes_revisit_for_unchanged_and_resolves():
    from setup_harvest_action_spark.sources.warc import (
        REVISIT_PROFILE,
        encode_warc_recrawl,
        resolve_revisits,
    )

    blob1 = encode_warc(PAGES)
    digests, bodies = {}, {}
    for rec in parse_warc(blob1):
        if rec["type"] == "response":
            d = rec["headers"]["warc-payload-digest"]
            digests[rec["uri"]] = d
            bodies[d] = rec["http_body"]
    # page 2 changes; 1 and 3 unchanged
    round2 = [
        (PAGES[0][0], PAGES[0][1]),
        (PAGES[1][0], PAGES[1][1].replace("two", "TWO!")),
        (PAGES[2][0], PAGES[2][1]),
    ]
    blob2 = encode_warc_recrawl(round2, digests, layout="plain")
    recs = parse_warc(blob2)
    types = [r["type"] for r in recs]
    assert types == ["warcinfo", "revisit", "response", "revisit"]
    rev = recs[1]
    assert rev["headers"]["warc-profile"] == REVISIT_PROFILE
    assert rev["headers"]["warc-refers-to"]
    assert rev["http_body"] == b""  # no body bytes re-stored
    resolved = resolve_revisits(recs, bodies)
    got = {r["uri"]: r["http_body"].decode() for r in resolved}
    assert got == {u: h for u, h in round2}
    # storage dedup is real once bodies outweigh record headers (the
    # tiny fixture pages above don't): realistic ~8 KiB pages, one
    # changed of three
    big = [
        (f"https://x.example/big/{i}", f"<html><body>{'w' * 8192}{i % 2}</body></html>")
        for i in range(3)
    ]
    d1 = {
        r["uri"]: r["headers"]["warc-payload-digest"]
        for r in parse_warc(encode_warc(big))
        if r["type"] == "response"
    }
    big2 = [big[0], (big[1][0], big[1][1].replace("w", "v", 1)), big[2]]
    assert len(encode_warc_recrawl(big2, d1, layout="plain")) < len(
        encode_warc(big2)
    ) * 0.5


def test_unresolvable_revisit_raises():
    from setup_harvest_action_spark.sources.warc import (
        encode_warc_recrawl,
        payload_digest,
        resolve_revisits,
    )

    digests = {u: payload_digest(h.encode()) for u, h in PAGES}
    blob = encode_warc_recrawl(PAGES, digests, layout="plain")
    with pytest.raises(ValueError, match="unresolvable revisit"):
        resolve_revisits(parse_warc(blob), {})


def test_wat_triple_envelopes_all_three_record_types():
    """r17: triple WATs describe warcinfo + request + response, carry
    the payload digest in WARC-Header-Metadata, and roundtrip in
    every layout."""
    import json

    from setup_harvest_action_spark.sources.warc import (
        WARC_LAYOUTS,
        encode_wat,
        payload_digest,
    )

    captures = [
        (
            "https://h.example/a?q=1",
            200,
            {"content-type": "text/html"},
            ["/x"],
            payload_digest(b"body-a"),
        ),
        ("https://h.example/b", 404, {}, [], payload_digest(b"body-b")),
    ]
    for lay in WARC_LAYOUTS:
        recs = parse_warc(encode_wat(captures, layout=lay, triple=True))
        metas = [r for r in recs if r["type"] == "metadata"]
        # 1 warcinfo envelope + (request + response) per capture
        assert len(metas) == 1 + 2 * len(captures), lay
        envs = [
            json.loads(r["payload"].decode("utf-8"))["Envelope"]
            for r in metas
        ]
        kinds = [e["WARC-Header-Metadata"]["WARC-Type"] for e in envs]
        assert kinds == ["warcinfo", "request", "response"] * 1 + [
            "request",
            "response",
        ]
        assert (
            envs[0]["Payload-Metadata"]["WARC-Info-Metadata"]["software"]
            == "setup-harvest-action-spark"
        )
        req = envs[1]["Payload-Metadata"]["HTTP-Request-Metadata"][
            "Request-Message"
        ]
        assert req == {
            "Method": "GET",
            "Path": "/a?q=1",
            "Version": "HTTP/1.1",
        }
        for env, cap in zip(envs[2::2], captures):
            assert (
                env["WARC-Header-Metadata"]["WARC-Payload-Digest"] == cap[4]
            )


# --- r17 post-close: SURT + CDX ----------------------------------------------


def test_surt_key_rules():
    from setup_harvest_action_spark.sources.warc import surt_key

    assert surt_key("https://Host3.example/doc/42") == "example,host3)/doc/42"
    assert surt_key("http://a.b.c.example/") == "example,c,b,a)/"
    assert surt_key("https://x.example/Path/?Q=1") == "example,x)/path/?q=1"
    assert surt_key("https://x.example") == "example,x)/"


def test_cdx_members_seek_back_to_records():
    from setup_harvest_action_spark.sources.warc import cdx_index

    blob = encode_warc(PAGES, layout="gzip_members")
    idx = cdx_index(blob, "t.warc.gz")
    assert [e["url"] for e in idx] == sorted(u for u, _ in PAGES)
    assert idx == sorted(idx, key=lambda e: e["urlkey"])
    assert {e["addressing"] for e in idx} == {"member"}  # r18 marker
    for e in idx:
        member = blob[e["offset"] : e["offset"] + e["length"]]
        rec = parse_warc(gzip.decompress(member))[0]
        assert rec["uri"] == e["url"]
        assert rec["headers"]["warc-payload-digest"] == e["digest"]
        assert e["mime"] == "text/html" and e["status"] == 200
    # offsets tile the file with no gaps past the warcinfo member
    ends = {e["offset"] + e["length"] for e in idx}
    starts = {e["offset"] for e in idx}
    assert len(starts) == len(PAGES)
    assert max(ends) == len(blob)


def test_cdx_plain_layout_and_revisit_records():
    from setup_harvest_action_spark.sources.warc import (
        cdx_index,
        encode_warc_recrawl,
        payload_digest,
    )

    digests = {u: payload_digest(h.encode()) for u, h in PAGES}
    blob = encode_warc_recrawl(PAGES, digests, layout="plain")
    idx = cdx_index(blob)
    assert {e["record_type"] for e in idx} == {"revisit"}
    assert {e["addressing"] for e in idx} == {"plain"}  # r18 marker
    for e in idx:
        rec = parse_warc(blob[e["offset"] : e["offset"] + e["length"]])[0]
        assert rec["type"] == "revisit" and rec["uri"] == e["url"]


def test_cdx_stream_gzip_documented_degradation():
    """single-stream gzip has no member seek; the index still forms
    (decompressed spans) — exactly why the spec discourages it."""
    from setup_harvest_action_spark.sources.warc import cdx_index

    blob = encode_warc(PAGES, layout="gzip_stream")
    idx = cdx_index(blob)
    assert [e["url"] for e in idx] == sorted(u for u, _ in PAGES)
    # r18: the degraded byte space is MARKED, not implicit
    assert {e["addressing"] for e in idx} == {"decompressed"}
    plain = gzip.decompress(blob)
    for e in idx:
        rec = parse_warc(plain[e["offset"] : e["offset"] + e["length"]])[0]
        assert rec["uri"] == e["url"]


def test_negative_chunk_size_is_error_not_infinite_loop():
    """int(b'-6', 16) parses — a negative size walked pos backward
    forever (r17 review catch).  Strict-hex rejection pins it."""
    from setup_harvest_action_spark.sources.warc import _dechunk_body

    with pytest.raises(ValueError, match="malformed chunk size"):
        _dechunk_body(b"1\r\nA\r\n-6\r\n")
    with pytest.raises(ValueError, match="malformed chunk size"):
        _dechunk_body(b"+2\r\nAB\r\n0\r\n\r\n")
    with pytest.raises(ValueError, match="malformed chunk size"):
        _dechunk_body(b"0x2\r\nAB\r\n0\r\n\r\n")


def test_negative_content_length_is_error_not_backward_walk():
    """Same hang class at the WARC framing layer: a negative
    Content-Length must raise, not move the walk backward."""
    rec = (
        b"WARC/1.0\r\nWARC-Type: resource\r\n"
        b"WARC-Record-ID: <urn:uuid:x>\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        b"Content-Type: text/plain\r\nContent-Length: -10\r\n\r\nbody\r\n\r\n"
    )
    with pytest.raises(ValueError, match="bad Content-Length"):
        parse_warc(rec)


def test_cdx_single_record_member_file_with_warc_text_in_body():
    """The layout decision is structural (record count), not a byte
    scan: one gzip member whose HTML BODY mentions WARC/1.0 is still
    a member-seekable file and its offset must address the member."""
    from setup_harvest_action_spark.sources.warc import cdx_index

    page = [("https://x.example/about-warc",
             "<html><body><p>the WARC/1.0 and WARC/1.0 formats</p></body></html>")]
    blob = encode_warc(page, layout="gzip_members")
    idx = cdx_index(blob)
    assert len(idx) == 1
    e = idx[0]
    member = blob[e["offset"] : e["offset"] + e["length"]]
    rec = parse_warc(gzip.decompress(member))[0]
    assert rec["uri"] == page[0][0]


def test_coded_container_bitflips_never_hang():
    """150 random bitflips over a container holding all four coding
    variants: parse either succeeds (bad records carry http_error) or
    raises a clean ValueError-class — never hangs, never crashes
    uncleanly (extends the r14 fuzz to the r17 coded paths)."""
    from setup_harvest_action_spark.sources.warc import (
        HTTP_CODINGS,
        encode_warc_http,
    )

    body = ("fuzz body é " * 60).encode()
    blob = bytearray(
        encode_warc_http(
            [
                (f"https://x.example/{c}", body, "text/plain", c)
                for c in HTTP_CODINGS
            ],
            layout="plain",
        )
    )
    rng = random.Random(777)
    for _ in range(150):
        i = rng.randrange(len(blob))
        bit = 1 << rng.randrange(8)
        blob[i] ^= bit
        try:
            recs = parse_warc(bytes(blob))
            assert isinstance(recs, list)
            for r in recs:
                # the parser's promise: a record it CALLS an HTTP
                # capture either decoded (http_body) or failed
                # honestly (http_error) — a flipped WARC-Type or
                # mangled status line downgrades the record instead
                if r["type"] in ("response", "revisit") and r[
                    "payload"
                ].startswith(b"HTTP/"):
                    assert ("http_body" in r) or ("http_error" in r)
        except ValueError:
            pass
        finally:
            blob[i] ^= bit


def test_chunk_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from setup_harvest_action_spark.sources.warc import (
        _chunk_body,
        _dechunk_body,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        st.binary(max_size=2000),
        st.integers(min_value=1, max_value=512),
    )
    def rt(body, size):
        assert _dechunk_body(_chunk_body(body, size)) == body

    rt()


def test_dechunk_arbitrary_bytes_never_hang_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from setup_harvest_action_spark.sources.warc import _dechunk_body

    @settings(max_examples=120, deadline=None)
    @given(st.binary(max_size=600))
    def never_hangs(junk):
        try:
            out = _dechunk_body(junk)
            assert isinstance(out, bytes)
        except ValueError:
            pass

    never_hangs()


# --- r17 post-close: redirect resolution -------------------------------------


def _redir_rec(uri, status, location):
    from setup_harvest_action_spark.sources.warc import _record

    return _record(
        "response",
        http_response(body=b"", status=status, location=location),
        uri=uri,
        record_id=None,
        content_type="application/http;msgtype=response",
    )


def test_resolve_redirects_chain_loop_cap_dangling():
    from setup_harvest_action_spark.sources.warc import (
        _record,
        resolve_redirects,
    )

    recs = parse_warc(
        # clean 2-hop chain with a RELATIVE location on the 2nd hop
        _redir_rec("https://x.example/a", 301, "https://x.example/b")
        + _redir_rec("https://x.example/b", 307, "/final")
        + _record(
            "response",
            http_response("<p>done</p>"),
            uri="https://x.example/final",
            content_type="application/http;msgtype=response",
        )
        # loop pair
        + _redir_rec("https://x.example/l0", 302, "/l1")
        + _redir_rec("https://x.example/l1", 302, "/l0")
        # dangling: target never captured
        + _redir_rec("https://x.example/d", 308, "/nowhere")
    )
    out = resolve_redirects(recs)
    a = out["https://x.example/a"]
    assert a["outcome"] == "ok" and a["hops"] == 2
    assert a["final_uri"] == "https://x.example/final"
    assert a["record"]["http_body"] == b"<p>done</p>"
    assert out["https://x.example/l0"]["outcome"] == "redirect_loop"
    d = out["https://x.example/d"]
    assert d["outcome"] == "dangling"
    assert d["final_uri"] == "https://x.example/nowhere"


def test_resolve_redirects_hop_cap():
    from setup_harvest_action_spark.sources.warc import resolve_redirects

    blob = b"".join(
        _redir_rec(f"https://x.example/h{k}", 301, f"/h{k+1}")
        for k in range(8)
    )
    out = resolve_redirects(parse_warc(blob))
    r = out["https://x.example/h0"]
    assert r["outcome"] == "too_many_redirects" and r["hops"] == 5
    # a custom cap changes the verdict
    assert (
        resolve_redirects(parse_warc(blob), max_hops=10)[
            "https://x.example/h0"
        ]["outcome"]
        == "dangling"  # h7 -> /h8 never captured
    )


def test_length_capped_capture_truncation_contract():
    """r18: over-cap bodies store exactly cap bytes flagged
    WARC-Truncated: length with the HTTP Content-Length still
    declaring the original size; the payload digest covers the STORED
    bytes; utf8_prefix drops a dangling lead byte but raises on
    mid-stream corruption; a truncated prior capture never satisfies
    a revisit."""
    import pytest

    from setup_harvest_action_spark.sources.warc import (
        encode_warc_length_capped,
        encode_warc_recrawl,
        payload_digest,
        utf8_prefix,
    )

    full = b"x" * 90
    straddle = b"a" * 49 + "é".encode() + b"b" * 40  # 2-byte char at 49..50
    short = b"tiny"
    blob = encode_warc_length_capped(
        [
            ("https://t.example/full", full, "text/plain; charset=utf-8"),
            ("https://t.example/mid", straddle, "text/plain; charset=utf-8"),
            ("https://t.example/short", short, "text/plain; charset=utf-8"),
        ],
        50,
    )
    recs = {r["uri"]: r for r in parse_warc(blob) if r["type"] == "response"}
    f = recs["https://t.example/full"]
    assert f["headers"]["warc-truncated"] == "length"
    assert len(f["http_body"]) == 50
    assert f["http_headers"]["content-length"] == "90"  # the wire truth
    assert f["headers"]["warc-payload-digest"] == payload_digest(full[:50])
    m = recs["https://t.example/mid"]
    assert m["http_body"][-1:] == b"\xc3"  # the dangling lead byte
    assert utf8_prefix(m["http_body"]) == "a" * 49
    s = recs["https://t.example/short"]
    assert "warc-truncated" not in s["headers"]
    assert s["http_body"] == short
    # mid-stream corruption is still an error, not silently swallowed
    with pytest.raises(UnicodeDecodeError):
        utf8_prefix(b"ok\xc3then more")
    # a truncated capture's digest can never satisfy a full revisit
    blob2 = encode_warc_recrawl(
        [("https://t.example/full", "x" * 90),
         ("https://t.example/short", "tiny")],
        {
            "https://t.example/full": f["headers"]["warc-payload-digest"],
            "https://t.example/short": s["headers"]["warc-payload-digest"],
        },
    )
    types = {
        r["uri"]: r["type"]
        for r in parse_warc(blob2)
        if r["type"] in ("response", "revisit")
    }
    assert types == {
        "https://t.example/full": "response",
        "https://t.example/short": "revisit",
    }


def test_revalidation_status_rfc9110_precedence():
    """r18: If-None-Match, when present, is evaluated and
    If-Modified-Since MUST be ignored (RFC 9110 §13.1.3); date-only
    revalidation compares not-later-than; obsolete date formats parse."""
    from setup_harvest_action_spark.sources.warc import (
        http_date,
        parse_http_date,
        revalidation_status,
    )

    t0, t1 = 1700000000, 1700086400
    # entity tag wins: date says modified, tag says not -> 304
    assert revalidation_status('"a"', http_date(t0), '"a"', http_date(t1)) == 304
    # tag mismatch -> 200 even when the date would say unmodified
    assert revalidation_status('"a"', http_date(t1), '"b"', http_date(t0)) == 200
    # date-only: not later -> 304; later -> 200
    assert revalidation_status(None, http_date(t0), None, http_date(t0)) == 304
    assert revalidation_status(None, http_date(t1), None, http_date(t0)) == 304
    assert revalidation_status(None, http_date(t0), None, http_date(t1)) == 200
    # unconditional / validator-free -> 200
    assert revalidation_status(None, None, None, None) == 200
    assert revalidation_status(None, http_date(t0), None, None) == 200
    # round-trip + the obsolete rfc850 form MUST be accepted
    assert parse_http_date(http_date(t0)) == t0
    assert parse_http_date("Tuesday, 14-Nov-23 22:13:20 GMT") == t0


def test_resolve_redirects_non_redirect_3xx_is_terminal():
    """r18 (r17 advice): 304 Not Modified carries no Location by
    definition and 300/305 don't mandate one — they must resolve as
    terminal 'ok' records, not 'dangling', so conditional-revalidation
    captures compose with redirect resolution."""
    from setup_harvest_action_spark.sources.warc import (
        _record,
        resolve_redirects,
    )

    recs = parse_warc(
        _record(
            "response",
            http_response(body=b"", status=304),
            uri="https://x.example/cached",
            content_type="application/http;msgtype=response",
        )
        + _record(
            "response",
            http_response(body=b"pick one", status=300),
            uri="https://x.example/multi",
            content_type="application/http;msgtype=response",
        )
        # a 301 INTO a 304: the chain ends ok at the 304 record
        + _redir_rec("https://x.example/old", 301, "/cached")
    )
    out = resolve_redirects(recs)
    for uri, hops in (
        ("https://x.example/cached", 0),
        ("https://x.example/multi", 0),
        ("https://x.example/old", 1),
    ):
        assert out[uri]["outcome"] == "ok", uri
        assert out[uri]["hops"] == hops, uri
    assert out["https://x.example/old"]["final_uri"] == (
        "https://x.example/cached"
    )


def test_request_records_parse_method_path_and_headers():
    from setup_harvest_action_spark.sources.warc import (
        _record,
        http_request,
    )

    blob = _record(
        "request",
        http_request(
            "https://x.example/a?q=1", {"If-None-Match": '"abc"'}
        ),
        uri="https://x.example/a?q=1",
        content_type="application/http;msgtype=request",
    )
    rec = parse_warc(blob)[0]
    assert rec["http_method"] == "GET"
    assert rec["http_path"] == "/a?q=1"
    assert rec["http_headers"]["if-none-match"] == '"abc"'
    assert rec["http_headers"]["host"] == "x.example"


def test_resolve_not_modified_is_uri_keyed_and_raises_uncached():
    from setup_harvest_action_spark.sources.warc import (
        _record,
        resolve_not_modified,
    )

    r304 = _record(
        "response",
        http_response(body=b"", status=304),
        uri="https://x.example/a",
        content_type="application/http;msgtype=response",
    )
    recs = parse_warc(r304)
    out = resolve_not_modified(
        recs, {"https://x.example/a": b"<p>cached</p>"}
    )
    assert out[0]["http_body"] == b"<p>cached</p>"
    with pytest.raises(ValueError, match="no cached representation"):
        resolve_not_modified(recs, {})
