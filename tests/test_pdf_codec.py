"""PDF codec (functions/pdf_codec.py): roundtrip goldens across the
show operators, string-escape and hex-string semantics, damaged-xref
fallback, honest refusals, page structure, and the truncation/bitflip
fuzz contract."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from setup_harvest_action_spark.functions.pdf_codec import (
    PDF_LINES_PER_PAGE,
    _page_text,
    encode_pdf,
    extract_pdf_text,
    synthesize_pdf,
)

CLEAN_FAILURES = (
    ValueError,
    IndexError,
    KeyError,
    EOFError,
    OverflowError,
    RecursionError,  # never actually allowed; asserted absent below
    struct.error,
    zlib.error,
)


def test_roundtrip_multi_page_all_show_operators():
    lines1 = [f"line number {i} with words" for i in range(7)]
    lines2 = ["page two starts", "and ends"]
    pages = extract_pdf_text(encode_pdf([lines1, lines2]))
    assert len(pages) == 2
    assert pages[0].split("\n") == lines1  # covers Tj, TJ and '
    assert pages[1].split("\n") == lines2


def test_escapes_and_special_characters():
    lines = [
        "parens (nested (deep)) survive",
        "backslash \\ and tab\tand percent % inside string",
    ]
    pages = extract_pdf_text(encode_pdf([lines]))
    assert pages[0].split("\n") == lines


def test_string_escape_semantics_directly():
    """The interpreter's literal-string rules: named escapes, octal,
    line continuation, and hex strings."""
    content = (
        b"BT (a\\tb\\n) Tj (oct\\101\\102) Tj (cont\\\ninued) Tj "
        b"<48656C6C6F> Tj ET"
    )
    # consecutive Tj shows CONCATENATE (the within-line rule); the
    # named escapes, octal codes, the line continuation and the hex
    # string all decode per the PDF string grammar
    assert _page_text(content) == "a\tb\noctABcontinuedHello"


def test_damaged_xref_falls_back_to_linear_scan():
    pdf = encode_pdf([["fallback body line one", "and two"]])
    good = extract_pdf_text(pdf)
    for damage in (
        pdf.replace(b"startxref", b"startxrXf"),
        pdf.replace(b"xref\n0 ", b"xrEf\n0 ", 1),
    ):
        assert extract_pdf_text(damage) == good


def test_refusals_by_name():
    with pytest.raises(ValueError, match="not a PDF"):
        extract_pdf_text(b"%PNG nope")
    pdf = encode_pdf([["x"]])
    enc = pdf.replace(
        b"/Type /Catalog", b"/Type /Catalog /Encrypt 9 0 R"
    )
    with pytest.raises(ValueError, match="encrypted"):
        extract_pdf_text(enc)


def test_synthesize_page_structure_and_recovery():
    text = "word " * 400  # forces several pages
    pdf = synthesize_pdf(5, text)
    pages = extract_pdf_text(pdf)
    assert len(pages) >= 2
    assert all(
        len(p.split("\n")) <= PDF_LINES_PER_PAGE for p in pages
    )
    joined = " ".join(" ".join(p.split()) for p in pages).strip()
    assert joined == " ".join(text.split())
    assert synthesize_pdf(5, text) == pdf  # deterministic


def test_truncation_fails_cleanly_or_consistently():
    pdf = synthesize_pdf(3, "sturdy pdf body text repeated " * 30)
    base = extract_pdf_text(pdf)
    for cut in range(8, len(pdf), max(1, len(pdf) // 200)):
        try:
            out = extract_pdf_text(pdf[:cut])
        except CLEAN_FAILURES as exc:
            assert not isinstance(exc, RecursionError), cut
            continue
        # header-only survivals must still be page-shaped strings
        assert all(isinstance(p, str) for p in out)


def test_bitflips_never_hang_or_crash_uncleanly():
    blob = bytearray(synthesize_pdf(4, "pdf fuzz corpus body " * 40))
    rng = random.Random(777)
    for _ in range(200):
        i = rng.randrange(len(blob))
        bit = 1 << rng.randrange(8)
        blob[i] ^= bit
        try:
            pages = extract_pdf_text(bytes(blob))
            assert all(isinstance(p, str) for p in pages)
        except CLEAN_FAILURES as exc:
            assert not isinstance(exc, RecursionError)
        finally:
            blob[i] ^= bit
