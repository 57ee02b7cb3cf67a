"""Charset layer (functions/charset.py): WHATWG precedence pins
(BOM > header > meta > default), label-alias conformance
(iso-8859-1 → windows-1252, gb2312 → gbk, bare utf-16 → LE), the
1024-byte prescan window, deterministic mojibake on mis-declared
bytes, and round-trips through every CHARSET_VARIANTS rung with
stdlib codecs as the external anchor."""

from __future__ import annotations

import pytest

from setup_harvest_action_spark.functions.charset import (
    CHARSET_VARIANTS,
    DEFAULT_ENCODING,
    charset_from_content_type,
    decode_bytes,
    encode_crawl_page,
    meta_prescan,
    resolve_label,
    sniff_charset,
)


def test_whatwg_label_aliases():
    # the aliases browsers implement (and naive pipelines get wrong)
    assert resolve_label("ISO-8859-1") == "cp1252"
    assert resolve_label("latin1") == "cp1252"
    assert resolve_label("ascii") == "cp1252"
    assert resolve_label("GB2312") == "gbk"
    assert resolve_label("utf-16") == "utf-16-le"  # bare = LE per spec
    assert resolve_label("unicodeFFFE") == "utf-16-be"
    assert resolve_label("x-sjis") == "shift_jis"
    assert resolve_label(" 'UTF-8' ") == "utf-8"  # quoted/padded
    assert resolve_label("tis-620") == "cp874"
    # non-WHATWG label known to CPython falls through to codecs.lookup
    assert resolve_label("cp437") == "cp437"
    assert resolve_label("no-such-charset") is None
    assert resolve_label(None) is None


def test_content_type_param_forms():
    assert charset_from_content_type("text/html; charset=utf-8") == "utf-8"
    assert (
        charset_from_content_type('text/html; charset="Shift_JIS"')
        == "Shift_JIS"
    )
    assert (
        charset_from_content_type("text/html;CHARSET=gb2312; foo=bar")
        == "gb2312"
    )
    assert charset_from_content_type("text/html") is None
    assert charset_from_content_type(None) is None


def test_precedence_bom_header_meta_default():
    html = "<html><head><meta charset=shift_jis></head><body>x</body></html>"
    # meta alone decides
    assert sniff_charset(html.encode())[0:2] == ("shift_jis", "meta")
    # header outranks meta
    assert sniff_charset(
        html.encode(), "text/html; charset=koi8-r"
    )[0:2] == ("koi8-r", "header")
    # BOM outranks a (lying) header
    assert sniff_charset(
        b"\xff\xfe" + "x".encode("utf-16-le"),
        "text/html; charset=iso-8859-1",
    ) == ("utf-16-le", "bom", 2)
    assert sniff_charset(b"\xef\xbb\xbfplain", None)[0:2] == (
        "utf-8",
        "bom",
    )
    # nothing declares → the WHATWG unlabeled default
    assert sniff_charset(b"<html>bare</html>") == (
        DEFAULT_ENCODING,
        "default",
        0,
    )
    # unknown labels fall through the precedence chain
    assert sniff_charset(
        b"<meta charset=bogus-enc>", "text/html; charset=also-bogus"
    )[1] == "default"


def test_meta_prescan_window_is_1024_bytes():
    pad = b"<!-- " + b"x" * 1100 + b" -->"
    late = pad + b"<meta charset=shift_jis>"
    assert meta_prescan(late) is None  # outside the spec window
    early = b"<meta charset=shift_jis>" + pad
    assert meta_prescan(early) == "shift_jis"
    # http-equiv form carries charset= inside content
    he = (
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=EUC-JP">'
    )
    assert resolve_label(meta_prescan(he)) == "euc_jp"


def test_decode_strips_bom_and_anchors_to_stdlib():
    text = "Ωμέγα decoded"
    payload = b"\xff\xfe" + text.encode("utf-16-le")
    got, codec, source = decode_bytes(payload, "text/html")
    assert (got, codec, source) == (text, "utf-16-le", "bom")
    # stdlib anchor: every variant's marker survives its own codec,
    # declared through that variant's actual channel (meta variants
    # carry their meta tag; BOM variants their BOM)
    for marker, codec, ctype, meta, bom in CHARSET_VARIANTS:
        doc = (f"<meta charset={meta}>" if meta else "") + marker
        enc = bom + doc.encode(codec)
        got, used, _ = decode_bytes(enc, ctype)
        assert got == enc[len(bom):].decode(used), codec
        assert got.endswith(marker), codec


def test_misdeclared_bytes_yield_deterministic_mojibake():
    """The crawl contract: a wrong declaration never raises — it
    yields the classic deterministic mojibake (UTF-8 'é' read as
    cp1252 is 'Ã©')."""
    payload = "café".encode("utf-8")
    got, codec, source = decode_bytes(payload, "text/html; charset=latin1")
    assert (codec, source) == ("cp1252", "header")
    assert got == "cafÃ©"
    # undecodable sequence under a strict codec → U+FFFD, no raise
    got2, _, _ = decode_bytes(b"\x81\x39ok", "text/html; charset=shift_jis")
    assert "�" in got2 and got2.endswith("ok")


def test_encode_crawl_page_variants_roundtrip():
    """encode_crawl_page → decode_bytes recovers the exact page text
    for every precedence rung, and boilerplate chars outside the
    target charset arrive as numeric character references (so the
    html parser, not the codec, restores them)."""
    from setup_harvest_action_spark.functions.html_extract import (
        main_text,
        synthesize_page,
    )

    for d in range(len(CHARSET_VARIANTS)):
        marker, codec, _ctype, _meta, _bom = CHARSET_VARIANTS[d]
        body = "plain article body words here " * 3 + marker
        page = synthesize_page(d, body, lang="en")
        payload, ctype = encode_crawl_page(d, page)
        text, used, source = decode_bytes(payload, ctype)
        assert used == codec, d
        assert main_text(text) == " ".join(body.split()), d
    # the synthesized page's © footer is outside shift_jis → must be
    # an entity in the encoded bytes, not a '?' or an exception
    page2 = synthesize_page(2, "body " + CHARSET_VARIANTS[2][0])
    payload2, _ = encode_crawl_page(2, page2)
    assert b"&#169;" in payload2


@pytest.mark.parametrize("variant", range(len(CHARSET_VARIANTS)))
def test_variant_sources_match_oracle_case(variant):
    """The charset_source column the catalog query reports must match
    the CASE expression in its DuckDB oracle."""
    want = [
        "header", "header", "meta", "header", "bom", "default",
        "utf8_valid", "meta",
    ][variant]
    marker, codec, ctype, _meta, _bom = CHARSET_VARIANTS[variant]
    from setup_harvest_action_spark.functions.html_extract import (
        synthesize_page,
    )

    payload, ct = encode_crawl_page(
        variant, synthesize_page(variant, "body " + marker)
    )
    _, _, source = decode_bytes(payload, ct)
    assert source == want


def test_transform_codec_labels_never_decide():
    """ADVICE r15 (medium): CPython's codec registry also resolves
    bytes↔bytes transforms (hex, base64, zlib, rot13) — a crawled page
    declaring one as its charset must fall through the rung, not raise
    LookupError('hex is not a text encoding') mid-pipeline."""
    for label in ("hex", "base64", "zlib", "rot13", "bz2", "quopri"):
        assert resolve_label(label) is None, label
        # the original repro: decode_bytes must not raise
        got, codec, source = decode_bytes(
            b"plain ascii body", f"text/html; charset={label}"
        )
        assert (got, codec, source) == (
            "plain ascii body", DEFAULT_ENCODING, "default",
        ), label
        got2, _, _ = decode_bytes(
            b"<meta charset=" + label.encode() + b">body", "text/html"
        )
        assert got2.endswith("body"), label
    # real text codecs still fall through codecs.lookup as before
    assert resolve_label("cp437") == "cp437"


def test_meta_utf16_remaps_to_utf8_per_spec():
    """ADVICE r15 (low): HTML spec 13.2.3.2 prescan post-processing —
    a meta-declared UTF-16 family label becomes UTF-8 (the
    ASCII-compatible prescan read it, so it cannot be UTF-16), and
    x-user-defined becomes windows-1252.  Header-declared UTF-16 is
    NOT remapped (the step is meta-specific)."""
    pay = "<meta charset=utf-16><p>héllo</p>".encode("utf-8")
    codec, source, _ = sniff_charset(pay)
    assert (codec, source) == ("utf-8", "meta")
    assert decode_bytes(pay)[0] == pay.decode("utf-8")
    pay_be = b"<meta charset=utf-16be>x"
    assert sniff_charset(pay_be)[0:2] == ("utf-8", "meta")
    pay_xud = b"<meta charset=x-user-defined>\x97body"
    assert sniff_charset(pay_xud)[0:2] == ("cp1252", "meta")
    # header rung keeps the literal WHATWG mapping (bare utf-16 = LE)
    assert sniff_charset(
        "x".encode("utf-16-le"), "text/html; charset=utf-16"
    )[0:2] == ("utf-16-le", "header")


def test_utf8_validation_rung():
    """The corpus-mode deviation (r15 verdict #2): unlabeled non-ASCII
    bytes that strict-decode as UTF-8 are UTF-8 (source utf8_valid);
    pure-ASCII and real cp1252 payloads still hit the default; the
    flag restores byte-exact browser order."""
    utf8 = "naïve — héllo żółć".encode("utf-8")
    assert sniff_charset(utf8) == ("utf-8", "utf8_valid", 0)
    assert decode_bytes(utf8)[0] == utf8.decode("utf-8")
    # pure ASCII: cp1252 and UTF-8 agree; 'default' is the honest label
    assert sniff_charset(b"plain ascii") == (DEFAULT_ENCODING, "default", 0)
    # real cp1252 bytes are NOT valid UTF-8 → default, as before
    cp = "héllo résumé".encode("cp1252")
    assert sniff_charset(cp) == (DEFAULT_ENCODING, "default", 0)
    # any declaration still outranks the rung
    assert sniff_charset(utf8, "text/html; charset=koi8-r")[1] == "header"
    # browser-exact mode: the rung is off
    assert sniff_charset(utf8, utf8_fallback=False) == (
        DEFAULT_ENCODING, "default", 0,
    )


def test_prescan_is_attribute_aware_not_a_regex():
    """The WHATWG prescan semantics a regex cannot deliver (r15):
    'charset=' inside an unrelated attribute VALUE, an HTML comment,
    or a content= without the Content-Type pragma must NOT decide —
    while every real declaration form (quoted/unquoted, '/'
    separator, case-insensitive, pragma) must."""
    assert meta_prescan(
        b'<meta name="d" content="use charset=utf-8 in headers">'
    ) is None
    assert meta_prescan(b"<!-- <meta charset=koi8-r> --><p>x</p>") is None
    assert meta_prescan(
        b'<div data-x="<meta charset=koi8-r>">ok</div>'
    ) is None
    assert meta_prescan(b'<meta content="text/html; charset=sjis">') is None
    assert meta_prescan(
        b'<meta http-equiv="Content-Type"'
        b' content="text/html; charset=EUC-JP">'
    ) == "EUC-JP"
    assert meta_prescan(b"<meta charset=utf-8>") == "utf-8"
    assert meta_prescan(b"<meta charset='shift_jis'>") == "shift_jis"
    assert meta_prescan(b'<META CHARSET="GBK">') == "GBK"
    assert meta_prescan(b"<meta/charset=big5>") == "big5"
    # a quoted '>' inside another tag's attribute doesn't end the tag
    assert meta_prescan(
        b'<a title="5 > 4"><meta charset=cp1251></a>'
    ) == "cp1251"
