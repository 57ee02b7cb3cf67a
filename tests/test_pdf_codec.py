"""PDF codec (functions/pdf_codec.py): roundtrip goldens across the
show operators and BOTH file layouts (classic 1.4 xref tables; 1.5
xref streams + /ObjStm, with and without the PNG predictor),
string-escape and hex-string semantics, the Type0/ToUnicode composite
-font path (bfrange/bfchar, surrogate pairs), damaged-xref fallbacks
incl. object-stream expansion, honest refusals, page structure, and
the truncation/bitflip fuzz contract."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from setup_harvest_action_spark.functions.pdf_codec import (
    PDF_LINES_PER_PAGE,
    PDF_UNICODE_TAIL,
    _esc,
    _page_text,
    _parse_tounicode,
    _tounicode_cmap,
    encode_pdf,
    extract_pdf_text,
    synthesize_pdf,
)

LAYOUTS = [
    ("classic", False),
    ("xref_stream", False),
    ("xref_stream", True),  # + PNG Up predictor /DecodeParms
]

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


@pytest.mark.parametrize("layout,pred", LAYOUTS)
def test_roundtrip_multi_page_all_show_operators(layout, pred):
    lines1 = [f"line number {i} with words" for i in range(7)]
    lines2 = ["page two starts", "and ends"]
    pages = extract_pdf_text(
        encode_pdf([lines1, lines2], layout=layout, xref_predictor=pred)
    )
    assert len(pages) == 2
    assert pages[0].split("\n") == lines1  # covers Tj, TJ and '
    assert pages[1].split("\n") == lines2


@pytest.mark.parametrize("layout,pred", LAYOUTS)
def test_roundtrip_tounicode_composite_font(layout, pred):
    """Non-latin-1 lines route through the Type0/Identity-H font as
    hex CID strings and come back through the /ToUnicode CMap —
    including a supplementary-plane char (surrogate pair in UTF-16BE)
    and font SWITCHING mid-page (ascii lines stay on F1)."""
    lines = [
        "plain ascii line",
        "中文 line with naïve café €uro",
        "mixed Ω and 𝄞 clef plus ascii",
        "back to ascii",
    ]
    pages = extract_pdf_text(
        encode_pdf([lines], layout=layout, xref_predictor=pred)
    )
    assert pages[0].split("\n") == lines


def test_tounicode_cmap_writer_parser_pair():
    """The CMap writer and parser agree exactly: consecutive BMP
    codepoints become bfrange entries, the surrogate-pair char and
    isolated codes become bfchar — and parsing inverts the map."""
    codes = {chr(0x4E00 + i): i + 1 for i in range(10)}  # a bfrange run
    codes["𝄞"] = 11  # U+1D11E: 4-byte UTF-16BE dst, bfchar only
    codes["A"] = 12
    cm = _tounicode_cmap(codes)
    assert b"beginbfrange" in cm and b"beginbfchar" in cm
    assert _parse_tounicode(cm) == {c: ch for ch, c in codes.items()}


def test_tounicode_parser_array_form_and_edges():
    """Real-world CMaps use the bfrange ARRAY dst form; unmapped codes
    must degrade to U+FFFD, not crash."""
    cmap = (
        b"2 beginbfrange\n"
        b"<0001> <0002> [<0041> <00420043>]\n"
        b"<0010> <0012> <0061>\n"
        b"endbfrange\n"
        b"1 beginbfchar\n<0020> <D834DD1E>\nendbfchar\n"
    )
    m = _parse_tounicode(cmap)
    assert m[1] == "A" and m[2] == "BC"  # array form, multi-unit dst
    assert (m[0x10], m[0x11], m[0x12]) == ("a", "b", "c")  # increments
    assert m[0x20] == "\U0001d11e"  # surrogate pair decodes
    # unmapped code inside a show → U+FFFD via the interpreter
    fonts = {"F9": ("cid", m)}
    out = _page_text(b"BT /F9 12 Tf <0001FFFF> Tj ET", fonts)
    assert out == "A�"


def test_esc_rejects_non_latin1_by_name():
    """_esc is strict: the writer must route non-latin-1 through the
    CID path, never silently '?'-replace (the r14 advice item)."""
    with pytest.raises(UnicodeEncodeError):
        _esc("中文")


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


def test_damaged_xref_stream_falls_back_with_objstm_expansion():
    """When the 1.5 XREF stream is damaged, the linear scan only sees
    top-level objects — the page tree and catalog live INSIDE the
    /ObjStm, so recovery requires the scan's object-stream expansion."""
    lines = ["objstm fallback body", "line two here", "and third"]
    pdf = encode_pdf([lines], layout="xref_stream")
    good = extract_pdf_text(pdf)
    assert good[0].split("\n") == lines
    for damage in (
        pdf.replace(b"startxref", b"startxrXf"),
        pdf.replace(b"/Type /XRef", b"/Type /XrEf", 1),
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
    # trailer-level /Encrypt (where real PDFs put it), 1.5 layout
    pdf15 = encode_pdf([["secret"]], layout="xref_stream")
    enc15 = pdf15.replace(
        b"/Type /XRef", b"/Type /XRef /Encrypt 99 0 R", 1
    )
    with pytest.raises(ValueError, match="encrypted"):
        extract_pdf_text(enc15)
    # Type0 composite font stripped of its /ToUnicode: undecodable
    # multi-byte text must refuse by name, not emit garbage
    upd = encode_pdf([["中文 only line"]])
    import re

    stripped = re.sub(rb"/ToUnicode \d+ 0 R", b"", upd)
    with pytest.raises(ValueError, match="without /ToUnicode"):
        extract_pdf_text(stripped)


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


def test_synthesize_layout_rotation():
    """The fixture corpus spans the real-world layout mix: even ids →
    classic 1.4, odd → 1.5 xref streams, doc_id%4==3 → predictor 12 —
    and every variant recovers the same text (unicode tail included)."""
    text = "rotating layout body text " * 20 + PDF_UNICODE_TAIL
    want = " ".join(text.split())
    for d in range(4):
        blob = synthesize_pdf(d, text)
        assert blob[:9] == (b"%PDF-1.4\n" if d % 2 == 0 else b"%PDF-1.5\n")
        if d % 2:
            assert b"/Type /ObjStm" in blob and b"/Type /XRef" in blob
        if d % 4 == 3:
            assert b"/Predictor 12" in blob
        pages = extract_pdf_text(blob)
        joined = " ".join(" ".join(p.split()) for p in pages).strip()
        assert joined == want, d


# doc_id picks the layout: 4 → classic, 1 → xref stream, 3 → xref
# stream + PNG predictor (synthesize_pdf's rotation)
@pytest.mark.parametrize("doc_id", [4, 1, 3])
def test_truncation_fails_cleanly_or_consistently(doc_id):
    pdf = synthesize_pdf(
        doc_id,
        "sturdy pdf body text repeated " * 30 + PDF_UNICODE_TAIL,
    )
    for cut in range(8, len(pdf), max(1, len(pdf) // 200)):
        try:
            out = extract_pdf_text(pdf[:cut])
        except CLEAN_FAILURES as exc:
            assert not isinstance(exc, RecursionError), cut
            continue
        # header-only survivals must still be page-shaped strings
        assert all(isinstance(p, str) for p in out)


@pytest.mark.parametrize("doc_id", [4, 1, 3])
def test_bitflips_never_hang_or_crash_uncleanly(doc_id):
    blob = bytearray(
        synthesize_pdf(
            doc_id, "pdf fuzz corpus body " * 40 + PDF_UNICODE_TAIL
        )
    )
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


@pytest.mark.parametrize("layout,pred", LAYOUTS)
def test_incremental_update_appends_page(layout, pred):
    """ISO 32000 §7.5.6 incremental updates: the revision's xref
    section shadows the page-tree node, /Prev chains to the base,
    the section layout matches the base's kind — and the base alone
    still reads its original pages (append-only)."""
    from setup_harvest_action_spark.functions.pdf_codec import (
        encode_pdf_update_append_page,
    )

    base = encode_pdf(
        [["page one text here"], ["page two words"]],
        layout=layout, xref_predictor=pred,
    )
    upd = encode_pdf_update_append_page(
        base, ["revision page three", "second line"]
    )
    assert upd.startswith(base)  # strictly append-only
    pages = extract_pdf_text(upd)
    assert len(pages) == 3
    assert pages[0] == "page one text here"
    assert pages[2] == "revision page three\nsecond line"
    assert len(extract_pdf_text(base)) == 2
    # updates stack: a second revision sees the first's page tree
    upd2 = encode_pdf_update_append_page(upd, ["fourth page"])
    assert extract_pdf_text(upd2)[3] == "fourth page"
    # the update section's own kind matches the base layout
    tail = upd[len(base):]
    assert (b"trailer" in tail) == (layout == "classic")
    assert (b"/Type /XRef" in tail) == (layout == "xref_stream")


def test_incremental_update_damage_and_fuzz():
    from setup_harvest_action_spark.functions.pdf_codec import (
        encode_pdf_update_append_page,
    )

    base = synthesize_pdf(2, "sturdy update fuzz body " * 20)
    upd = encode_pdf_update_append_page(base, ["the revision line"])
    good = extract_pdf_text(upd)
    # damaged update xref -> linear scan; later offsets win, so the
    # shadowed page tree still resolves to the REVISED node
    assert extract_pdf_text(upd.replace(b"startxref", b"startxrXf")) \
        == good
    blob = bytearray(upd)
    rng = random.Random(4242)
    for _ in range(120):
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


def test_hybrid_xrefstm_trailer_path():
    """Hybrid-reference files (ISO 32000 §7.5.8.4): a CLASSIC trailer
    whose /XRefStm points at a cross-reference STREAM carrying entries
    the classic table doesn't — built here as an update whose new
    objects are reachable ONLY through the XRefStm, so a reader that
    ignored the key would miss the revision page entirely."""
    import zlib as _z

    base = encode_pdf([["hybrid base page"]], layout="classic")
    out = bytearray(base)
    # the update objects: content stream + page + shadowed page tree
    # (object numbers mirror encode_pdf's classic layout: pages node
    # is the second-to-last object, root the last)
    n_objs = base.count(b" 0 obj")
    pages_num, c_num, p_num = n_objs - 1, n_objs + 1, n_objs + 2
    comp = _z.compress(b"BT /F1 12 Tf 72 720 Td (revision page) Tj ET")
    offs = {}
    for num, body, stream in (
        (c_num,
         f"<< /Length {len(comp)} /Filter /FlateDecode >>".encode(),
         comp),
        (p_num,
         (f"<< /Type /Page /Parent {pages_num} 0 R"
          " /MediaBox [0 0 612 792]"
          " /Resources << /Font << /F1 1 0 R >> >>"
          f" /Contents {c_num} 0 R >>").encode(), None),
        (pages_num,
         (f"<< /Type /Pages /Kids [{pages_num - 1} 0 R {p_num} 0 R]"
          " /Count 2 >>").encode(), None),
    ):
        offs[num] = len(out)
        out += str(num).encode() + b" 0 obj\n" + body
        if stream is not None:
            out += b"\nstream\n" + stream + b"\nendstream"
        out += b"\nendobj\n"
    # the xref STREAM the hybrid trailer advertises
    x_num = n_objs + 3
    x_at = len(out)
    rows = b"".join(
        bytes([1]) + off.to_bytes(4, "big") + b"\x00\x00"
        for off in (offs[pages_num], offs[c_num], offs[p_num], x_at)
    )
    xcomp = _z.compress(rows)
    out += (
        str(x_num).encode() + b" 0 obj\n"
        + (f"<< /Type /XRef /Size {x_num + 1} /W [1 4 2]"
           f" /Index [{pages_num} 1 {c_num} 3]"
           f" /Root {n_objs} 0 R"
           f" /Filter /FlateDecode /Length {len(xcomp)} >>").encode()
        + b"\nstream\n" + xcomp + b"\nendstream\nendobj\n"
    )
    # a classic trailer with ZERO entries of its own: everything new
    # arrives via /XRefStm; /Prev chains to the base table
    import re

    prev = int(re.findall(rb"startxref\s+(\d+)", base)[-1])
    t_at = len(out)
    out += (
        b"xref\n0 0\n"
        + (f"trailer\n<< /Size {x_num + 1} /Root {n_objs} 0 R"
           f" /Prev {prev} /XRefStm {x_at} >>\n"
           f"startxref\n{t_at}\n%%EOF\n").encode()
    )
    pages = extract_pdf_text(bytes(out))
    assert pages == ["hybrid base page", "revision page"]
