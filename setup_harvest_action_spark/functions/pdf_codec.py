"""PDF text extraction — the web's second document format (after
HTML) in any crawled training corpus.

Minimal-but-honest, the AVI/MJPEG discipline (no PDF library exists
on this box — stated plainly; the byte-level contract is pinned by the
emitter/decoder pair NOT sharing conventions silently, by handcrafted
escape/operator goldens, and by the DuckDB hash gate: the catalog
query embeds each document's text in a real multi-page PDF and
extraction must recover it md5-exactly):

* ``encode_pdf(lines_per_page pages, layout=...)`` — a real PDF
  writer emitting BOTH file layouts so the reader is conformance-
  tested both ways: ``layout="classic"`` is PDF-1.4 (plain xref
  table, 20-byte entries, trailer/startxref); ``layout="xref_stream"``
  is PDF-1.5 (every major producer's default since ~2004): non-stream
  objects packed into a FlateDecode'd object stream (/ObjStm with
  /N + /First header pairs) and a cross-reference STREAM (/Type
  /XRef, /W [1 4 2] binary rows, optional PNG Up predictor 12 with
  /DecodeParms).  Content streams use the actual text operators
  (``Tj``, ``TJ`` arrays, the ``'`` newline-show) with literal-string
  escaping; any line with non-latin-1 text escalates to a Type0
  (Identity-H) composite font shown as 2-byte-code hex strings with
  a /ToUnicode CMap (bfrange + bfchar, UTF-16BE incl. surrogate
  pairs) — nothing is ever silently replaced.
* ``extract_pdf_text(payload)`` — a real reader: startxref → xref
  walk over BOTH layouts (classic tables with /Prev chains + hybrid
  /XRefStm; xref streams with /W, /Index, /Prev and PNG predictor
  decode), /ObjStm member loading, falling back to a linear
  ``N G obj`` scan (which also expands any object streams it finds)
  when the xref is damaged (crawled PDFs often are), an object
  tokenizer (dicts, arrays, names, numbers, refs, literal + hex
  strings, streams with indirect /Length), page-tree recursion,
  FlateDecode, and a font-aware content-stream text interpreter:
  shows concatenate within a line; ``Td/TD/T*/Tm/'/"`` separate
  lines; ``Tf`` switches between simple (latin-1) and
  ToUnicode-mapped composite fonts.

Scope is text extraction (the training-data need): no encryption,
no TIFF predictor 2, no Type0 font WITHOUT /ToUnicode (would need
embedded font cmaps), no layout reconstruction — each refused by
name, listed in the decoder docstring.  At 100 TB this is one more
Arrow-batched map stage beside the HTML extractor.
"""

from __future__ import annotations

import re as _re
import zlib as _zlib

# --- writer ------------------------------------------------------------------


def _latin1_ok(s: str) -> bool:
    try:
        s.encode("latin-1")
        return True
    except UnicodeEncodeError:
        return False


def _esc(s: str) -> bytes:
    """Literal-string escape for latin-1-encodable text.  STRICT: the
    writer routes non-latin-1 lines through the Type0/hex-CID path, so
    a UnicodeEncodeError here means a caller bypassed that routing —
    let it surface rather than silently writing '?' (the refuse-
    honestly discipline)."""
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    ).encode("latin-1")


def _cid_hex(s: str, codes: dict[str, int]) -> bytes:
    """2-byte-code hex string for a Type0 (Identity-H) show."""
    return b"<" + "".join(f"{codes[ch]:04X}" for ch in s).encode() + b">"


def _tounicode_cmap(codes: dict[str, int]) -> bytes:
    """/ToUnicode CMap stream: code → UTF-16BE.  Runs of consecutive
    codes mapping to consecutive BMP codepoints (no low-byte carry on
    either side) become bfrange entries; everything else — including
    supplementary-plane chars, whose dst is a surrogate PAIR — is a
    bfchar.  Blocks chunk at 100 entries (the spec's limit)."""
    seq = sorted((c, ord(ch)) for ch, c in codes.items())
    ranges: list[tuple[int, int, int]] = []  # (lo_code, hi_code, cp0)
    chars: list[tuple[int, str]] = []  # (code, utf16be hex)
    i = 0
    while i < len(seq):
        code0, cp0 = seq[i]
        j = i
        while (
            j + 1 < len(seq)
            and seq[j + 1] == (seq[j][0] + 1, seq[j][1] + 1)
            and seq[j + 1][1] <= 0xFFFF
            and (seq[j + 1][0] & 0xFF) != 0  # no low-byte carry (src)
            and (seq[j + 1][1] & 0xFF) != 0  # no low-byte carry (dst)
        ):
            j += 1
        if j > i and cp0 <= 0xFFFF:
            ranges.append((code0, seq[j][0], cp0))
            i = j + 1
        else:
            chars.append(
                (code0, chr(cp0).encode("utf-16-be").hex().upper())
            )
            i += 1
    body = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS)"
        b" /Supplement 0 >> def",
        b"/CMapName /Adobe-Identity-UCS def",
        b"/CMapType 2 def",
        b"1 begincodespacerange",
        b"<0000> <FFFF>",
        b"endcodespacerange",
    ]
    for k in range(0, len(ranges), 100):
        blk = ranges[k : k + 100]
        body.append(f"{len(blk)} beginbfrange".encode())
        body += [
            f"<{lo:04X}> <{hi:04X}> <{cp0:04X}>".encode()
            for lo, hi, cp0 in blk
        ]
        body.append(b"endbfrange")
    for k in range(0, len(chars), 100):
        blk = chars[k : k + 100]
        body.append(f"{len(blk)} beginbfchar".encode())
        body += [f"<{c:04X}> <{hx}>".encode() for c, hx in blk]
        body.append(b"endbfchar")
    body += [
        b"endcmap",
        b"CMapName currentdict /CMap defineresource pop",
        b"end",
        b"end",
    ]
    return b"\n".join(body)


def encode_pdf(
    pages: list[list[str]],
    layout: str = "classic",
    xref_predictor: bool = False,
) -> bytes:
    """PDF from pages of text lines.  Line i on a page cycles the show
    operator — Tj, a TJ array split mid-line (kern number between
    chunks), and the ' newline-show — so the reader's full operator
    surface is exercised by every document.  Lines containing
    non-latin-1 text switch (via ``Tf``) to a Type0/Identity-H font
    shown as hex CID strings, with a /ToUnicode CMap mapping codes
    back to Unicode — so the reader's composite-font path is exercised
    whenever the corpus has one such character.

    ``layout="classic"`` emits PDF-1.4 (plain xref table + trailer);
    ``layout="xref_stream"`` emits PDF-1.5 — non-stream objects packed
    into one /ObjStm, cross-reference as a /Type /XRef stream with
    /W [1 4 2] rows, and (``xref_predictor=True``) the PNG Up
    predictor 12 + explicit /Index the mainstream producers write."""
    if layout not in ("classic", "xref_stream"):
        raise ValueError(f"unknown PDF layout {layout!r}")
    all_lines = [ln for pg in pages for ln in pg]
    cid_chars = sorted(
        {ch for ln in all_lines if not _latin1_ok(ln) for ch in ln}
    )
    codes = {ch: i + 1 for i, ch in enumerate(cid_chars)}

    objs: list[tuple[bytes, bytes | None]] = []  # (dict, stream|None)

    def add(body: bytes, stream: bytes | None = None) -> int:
        objs.append((body, stream))
        return len(objs)

    f1 = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    f2 = None
    if codes:
        desc = add(
            b"<< /Type /FontDescriptor /FontName /SparkGraftCID"
            b" /Flags 4 /FontBBox [0 0 1000 1000] /ItalicAngle 0"
            b" /Ascent 800 /Descent -200 /CapHeight 700 /StemV 80 >>"
        )
        dfont = add(
            (
                "<< /Type /Font /Subtype /CIDFontType2 /BaseFont"
                " /SparkGraftCID /CIDSystemInfo << /Registry (Adobe)"
                " /Ordering (Identity) /Supplement 0 >>"
                f" /FontDescriptor {desc} 0 R /DW 1000 >>"
            ).encode()
        )
        cmap = _zlib.compress(_tounicode_cmap(codes))
        tou = add(
            f"<< /Length {len(cmap)} /Filter /FlateDecode >>".encode(),
            cmap,
        )
        f2 = add(
            (
                "<< /Type /Font /Subtype /Type0 /BaseFont /SparkGraftCID"
                " /Encoding /Identity-H"
                f" /DescendantFonts [{dfont} 0 R] /ToUnicode {tou} 0 R >>"
            ).encode()
        )

    content_ids = []
    for lines in pages:
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        cur = "F1"
        for i, line in enumerate(lines):
            use_cid = not _latin1_ok(line)
            fname = "F2" if use_cid else "F1"
            if fname != cur:
                ops.append(f"/{fname} 12 Tf".encode())
                cur = fname

            def show(s: str) -> bytes:
                return (
                    _cid_hex(s, codes) if use_cid else b"(" + _esc(s) + b")"
                )

            if i:
                if i % 3 == 2:
                    # the ' operator moves to the next line itself
                    ops.append(show(line) + b" '")
                    continue
                ops.append(b"0 -14 Td")
            if i % 3 == 0:
                ops.append(show(line) + b" Tj")
            else:
                cut = max(1, len(line) // 2)
                ops.append(
                    b"[ " + show(line[:cut]) + b" -20 "
                    + show(line[cut:]) + b" ] TJ"
                )
        ops.append(b"ET")
        comp = _zlib.compress(b"\n".join(ops))
        content_ids.append(
            add(
                f"<< /Length {len(comp)} /Filter /FlateDecode >>".encode(),
                comp,
            )
        )

    pages_id = len(objs) + len(pages) + 1  # after the page objects
    fonts = f"<< /F1 {f1} 0 R" + (f" /F2 {f2} 0 R" if f2 else "") + " >>"
    page_ids = [
        add(
            (
                f"<< /Type /Page /Parent {pages_id} 0 R"
                " /MediaBox [0 0 612 792]"
                f" /Resources << /Font {fonts} >> /Contents {cid} 0 R >>"
            ).encode()
        )
        for cid in content_ids
    ]
    kids = " ".join(f"{p} 0 R" for p in page_ids)
    assert add(
        (
            f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>"
        ).encode()
    ) == pages_id
    root = add(f"<< /Type /Catalog /Pages {pages_id} 0 R >>".encode())

    if layout == "classic":
        return _serialize_classic(objs, root)
    return _serialize_xref_stream(objs, root, xref_predictor)


def _serialize_classic(
    objs: list[tuple[bytes, bytes | None]], root: int
) -> bytes:
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for i, (body, stream) in enumerate(objs, 1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body
        if stream is not None:
            out += b"\nstream\n" + stream + b"\nendstream"
        out += b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root " + str(root).encode() + b" 0 R >>\n"
        + b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


def _serialize_xref_stream(
    objs: list[tuple[bytes, bytes | None]], root: int, predictor: bool
) -> bytes:
    """PDF-1.5 layout: non-stream objects in one /ObjStm; the xref is
    a /Type /XRef stream (/W [1 4 2] — type byte, 4-byte offset-or-
    objstm-number, 2-byte gen-or-index), optionally PNG-Up-predicted
    (/Predictor 12 /Columns 7) with an explicit /Index."""
    n = len(objs)
    objstm_num, xref_num = n + 1, n + 2
    members = [
        (i, body)
        for i, (body, stream) in enumerate(objs, 1)
        if stream is None
    ]
    offs, at = [], 0
    for _, body in members:
        offs.append(at)
        at += len(body) + 1
    header = " ".join(
        f"{num} {off}" for (num, _), off in zip(members, offs)
    ).encode()
    content = header + b"\n" + b"\n".join(b for _, b in members) + b"\n"
    first = len(header) + 1
    objstm_comp = _zlib.compress(content)

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    entries: dict[int, tuple[int, int, int]] = {0: (0, 0, 65535)}
    for idx, (num, _) in enumerate(members):
        entries[num] = (2, objstm_num, idx)
    for i, (body, stream) in enumerate(objs, 1):
        if stream is None:
            continue
        entries[i] = (1, len(out), 0)
        out += (
            str(i).encode() + b" 0 obj\n" + body
            + b"\nstream\n" + stream + b"\nendstream\nendobj\n"
        )
    entries[objstm_num] = (1, len(out), 0)
    out += (
        str(objstm_num).encode() + b" 0 obj\n"
        + (
            f"<< /Type /ObjStm /N {len(members)} /First {first}"
            f" /Filter /FlateDecode /Length {len(objstm_comp)} >>"
        ).encode()
        + b"\nstream\n" + objstm_comp + b"\nendstream\nendobj\n"
    )
    xref_at = len(out)
    entries[xref_num] = (1, xref_at, 0)
    size = xref_num + 1
    rows = b"".join(
        bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
        for t, f2, f3 in (entries[i] for i in range(size))
    )
    parms = ""
    index = ""
    if predictor:
        cols = 7
        enc = bytearray()
        prior = bytes(cols)
        for r in range(0, len(rows), cols):
            row = rows[r : r + cols]
            enc.append(2)  # PNG filter type 2 = Up
            enc += bytes(
                (row[i] - prior[i]) & 0xFF for i in range(cols)
            )
            prior = row
        rows = bytes(enc)
        parms = " /DecodeParms << /Predictor 12 /Columns 7 >>"
        index = f" /Index [0 {size}]"
    xref_comp = _zlib.compress(rows)
    out += (
        str(xref_num).encode() + b" 0 obj\n"
        + (
            f"<< /Type /XRef /Size {size} /W [1 4 2]{index}"
            f" /Root {root} 0 R /Filter /FlateDecode{parms}"
            f" /Length {len(xref_comp)} >>"
        ).encode()
        + b"\nstream\n" + xref_comp + b"\nendstream\nendobj\n"
        + b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


def encode_pdf_update_append_page(base: bytes, lines: list[str]) -> bytes:
    """INCREMENTAL UPDATE (ISO 32000 §7.5.6): append a revision that
    adds one page — the file-append-only edit model real-world PDFs
    accumulate (every save-in-place produces one).  The revision
    carries a new content stream, a new page object, and a REWRITTEN
    page-tree node under its ORIGINAL object number (the newest xref
    section shadows the base's entry), plus a cross-reference section
    whose /Prev chains to the base's startxref.  The section layout
    matches the base: classic bases get a classic xref table
    subsectioned per changed object; 1.5 bases get an xref STREAM
    (same /W [1 4 2] rows).  Latin-1 text only (the update fixture's
    scope — the Type0 escalation lives in the full writer); the base
    must be one of this module's own emissions or structurally
    equivalent (it is fixture machinery, like encode_warc)."""
    get, resolve, root, entries, trailer = _open_pdf(base)
    pages_ref = root.get("Pages")
    if not isinstance(pages_ref, _Ref):
        raise ValueError("base PDF catalog has no /Pages reference")
    pnode = resolve(pages_ref)
    kids = pnode.get("Kids") or []
    count = pnode.get("Count", len(kids))
    root_m = _re.search(rb"/Root\s+(\d+)\s+\d+\s+R", base)
    if not root_m:
        raise ValueError("base PDF trailer /Root not found")
    root_num = int(root_m.group(1))
    prev_m = list(_re.finditer(rb"startxref\s+(\d+)", base[-400:]))
    if not prev_m:
        raise ValueError("base PDF missing startxref")
    prev = int(prev_m[-1].group(1))
    is_classic = base[prev : prev + 4] == b"xref"

    max_num = max(entries)
    c_num, p_num = max_num + 1, max_num + 2
    ops = [b"BT /F1 12 Tf 72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append(b"0 -14 Td")
        ops.append(b"(" + _esc(line) + b") Tj")
    ops.append(b"ET")
    comp = _zlib.compress(b"\n".join(ops))
    kid_str = " ".join(
        f"{k.num} 0 R" for k in kids if isinstance(k, _Ref)
    )
    bodies = [
        (
            c_num,
            f"<< /Length {len(comp)} /Filter /FlateDecode >>".encode(),
            comp,
        ),
        (
            p_num,
            (
                f"<< /Type /Page /Parent {pages_ref.num} 0 R"
                " /MediaBox [0 0 612 792]"
                " /Resources << /Font << /F1 1 0 R >> >>"
                f" /Contents {c_num} 0 R >>"
            ).encode(),
            None,
        ),
        (
            pages_ref.num,
            (
                f"<< /Type /Pages /Kids [{kid_str} {p_num} 0 R]"
                f" /Count {count + 1} >>"
            ).encode(),
            None,
        ),
    ]
    out = bytearray(base)
    if not out.endswith(b"\n"):
        out += b"\n"
    offs: dict[int, int] = {}
    for num, body, stream in bodies:
        offs[num] = len(out)
        out += str(num).encode() + b" 0 obj\n" + body
        if stream is not None:
            out += b"\nstream\n" + stream + b"\nendstream"
        out += b"\nendobj\n"
    size = max_num + 3 + (0 if is_classic else 1)
    if is_classic:
        xref_at = len(out)
        out += (
            b"xref\n"
            + f"{pages_ref.num} 1\n{offs[pages_ref.num]:010d} 00000 n \n".encode()
            + f"{c_num} 2\n{offs[c_num]:010d} 00000 n \n".encode()
            + f"{offs[p_num]:010d} 00000 n \n".encode()
            + (
                f"trailer\n<< /Size {size} /Root {root_num} 0 R"
                f" /Prev {prev} >>\nstartxref\n{xref_at}\n%%EOF\n"
            ).encode()
        )
    else:
        x_num = max_num + 3
        xref_at = len(out)
        rows = b"".join(
            bytes([1]) + off.to_bytes(4, "big") + (0).to_bytes(2, "big")
            for off in (
                offs[pages_ref.num], offs[c_num], offs[p_num], xref_at
            )
        )
        xcomp = _zlib.compress(rows)
        out += (
            str(x_num).encode() + b" 0 obj\n"
            + (
                f"<< /Type /XRef /Size {size} /W [1 4 2]"
                f" /Index [{pages_ref.num} 1 {c_num} 3]"
                f" /Root {root_num} 0 R /Prev {prev}"
                f" /Filter /FlateDecode /Length {len(xcomp)} >>"
            ).encode()
            + b"\nstream\n" + xcomp + b"\nendstream\nendobj\n"
            + f"startxref\n{xref_at}\n%%EOF\n".encode()
        )
    return bytes(out)


# --- reader ------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Tokenizer for PDF object syntax (and content streams, which
    share it)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = self.data[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def token(self):
        """Next token: bytes for operators/keywords, or a tagged tuple
        ('name'|'str'|'num'|'ref-open', value)."""
        self._skip_ws()
        d, n = self.data, len(self.data)
        if self.pos >= n:
            return None
        c = d[self.pos]
        if c == 0x28:  # ( literal string
            return ("str", self._lit_string())
        if c == 0x3C:  # < — hex string or <<
            if d[self.pos : self.pos + 2] == b"<<":
                self.pos += 2
                return b"<<"
            return ("str", self._hex_string())
        if d[self.pos : self.pos + 2] == b">>":
            self.pos += 2
            return b">>"
        if c in b"[]{}":
            self.pos += 1
            return bytes([c])
        if c == 0x2F:  # /Name
            self.pos += 1
            start = self.pos
            while (
                self.pos < n
                and d[self.pos] not in _WS
                and d[self.pos] not in _DELIM
            ):
                self.pos += 1
            return ("name", d[start : self.pos].decode("latin-1"))
        start = self.pos
        while (
            self.pos < n
            and d[self.pos] not in _WS
            and d[self.pos] not in _DELIM
        ):
            self.pos += 1
        word = d[start : self.pos]
        if not word:  # stray delimiter we don't handle structurally
            self.pos += 1
            return bytes([c])
        try:
            return ("num", float(word) if b"." in word else int(word))
        except ValueError:
            return word

    def _lit_string(self) -> bytes:
        d, n = self.data, len(self.data)
        assert d[self.pos] == 0x28
        self.pos += 1
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash escape
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                if e in b"nrtbf":
                    out += {
                        0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                        0x62: b"\b", 0x66: b"\x0c",
                    }[e]
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    oct_digits = bytearray()
                    while (
                        len(oct_digits) < 3
                        and self.pos < n
                        and 0x30 <= d[self.pos] <= 0x37
                    ):
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                else:
                    out.append(e)
                    self.pos += 1
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
            out.append(c)
            self.pos += 1
        raise ValueError("unterminated PDF string")

    def _hex_string(self) -> bytes:
        d = self.data
        end = d.find(b">", self.pos)
        if end < 0:
            raise ValueError("unterminated hex string")
        hx = bytes(
            c for c in d[self.pos + 1 : end] if c not in _WS
        ).decode("latin-1")
        self.pos = end + 1
        if len(hx) % 2:
            hx += "0"
        return bytes.fromhex(hx)


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


def _parse_object(lex: _Lexer, depth: int = 0):
    """One object value at the lexer position: scalars, names, arrays,
    dicts (with 'N G R' folded into _Ref).  Nesting is depth-bounded —
    fuzzed bytes can fabricate pathological '[[[[...' runs."""
    tok = lex.token()
    return _parse_from(lex, tok, depth)


def _parse_from(lex: _Lexer, tok, depth: int = 0):
    if depth > 48:
        raise ValueError("PDF object nesting too deep")
    if tok == b"<<":
        d = {}
        while True:
            k = lex.token()
            if k == b">>":
                return d
            if k is None:
                raise ValueError("unterminated dict")
            if not (isinstance(k, tuple) and k[0] == "name"):
                continue  # tolerate junk keys
            d[k[1]] = _parse_object(lex, depth + 1)
    if tok == b"[":
        arr = []
        while True:
            t = lex.token()
            if t == b"]":
                return arr
            if t is None:
                raise ValueError("unterminated array")
            arr.append(_parse_from(lex, t, depth + 1))
    if isinstance(tok, tuple):
        if tok[0] == "num" and isinstance(tok[1], int):
            # lookahead for "G R" (indirect reference)
            save = lex.pos
            t2 = lex.token()
            if isinstance(t2, tuple) and t2[0] == "num":
                t3 = lex.token()
                if t3 == b"R":
                    return _Ref(tok[1])
            lex.pos = save
            return tok[1]
        return tok[1]
    if tok in (b"true", b"false", b"null"):
        return {b"true": True, b"false": False, b"null": None}[tok]
    return tok


_OBJ_RE = _re.compile(rb"(\d+)\s+(\d+)\s+obj\b")

# xref entry: ("f", file_offset) or ("s", objstm_num, index_in_stm)
_Entry = tuple


def _png_unpredict(data: bytes, columns: int) -> bytes:
    """Reverse PNG row filters (predictors 10-15; 1 byte/sample as
    xref streams use) — /Columns bytes per row, each prefixed by its
    filter-type byte."""
    row_len = columns + 1
    out = bytearray()
    prior = bytearray(columns)
    for r in range(0, len(data) - row_len + 1, row_len):
        ft = data[r]
        row = bytearray(data[r + 1 : r + 1 + columns])
        for i in range(columns):
            left = row[i - 1] if i else 0
            up = prior[i]
            ul = prior[i - 1] if i else 0
            if ft == 0:
                pass
            elif ft == 1:
                row[i] = (row[i] + left) & 0xFF
            elif ft == 2:
                row[i] = (row[i] + up) & 0xFF
            elif ft == 3:
                row[i] = (row[i] + ((left + up) >> 1)) & 0xFF
            elif ft == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = (
                    left if pa <= pb and pa <= pc
                    else up if pb <= pc else ul
                )
                row[i] = (row[i] + pred) & 0xFF
            else:
                raise ValueError(f"bad PNG filter type {ft}")
        out += row
        prior = row
    return bytes(out)


def _xref_entries(data: bytes) -> tuple[dict[int, _Entry], dict]:
    """(entries, trailer) from the xref chain — classic tables AND
    xref streams, /Prev chains across both, hybrid /XRefStm; raises on
    damage (the caller falls back to a linear scan).  Walking newest
    section first, only ABSENT object numbers insert — incremental-
    update semantics."""
    # the LAST startxref in the tail window decides — an incremental
    # update appends a new one after the base's (spec: readers start
    # from the final trailer)
    hits = list(_re.finditer(rb"startxref\s+(\d+)", data[-400:]))
    if not hits:
        raise ValueError("PDF missing startxref")
    m = hits[-1]
    entries: dict[int, _Entry] = {}
    trailer: dict = {}
    seen: set[int] = set()
    queue = [int(m.group(1))]
    for _ in range(16):  # bounded /Prev chain
        if not queue:
            return entries, trailer
        at = queue.pop(0)
        if at in seen:
            continue
        seen.add(at)
        if data[at : at + 4] == b"xref":
            nxt = _classic_xref_section(data, at, entries, trailer)
        else:
            nxt = _stream_xref_section(data, at, entries, trailer)
        queue += [int(x) for x in nxt]
    return entries, trailer


def _classic_xref_section(data, at, entries, trailer) -> list[int]:
    lex = _Lexer(data, at + 4)
    while True:
        t = lex.token()
        if t == b"trailer":
            tdict = _parse_object(lex)
            break
        if not (isinstance(t, tuple) and t[0] == "num"):
            raise ValueError("malformed xref section")
        start = t[1]
        t2 = lex.token()
        count = t2[1] if isinstance(t2, tuple) else 0
        lex._skip_ws()
        for i in range(int(count)):
            entry = data[lex.pos : lex.pos + 20]
            if len(entry) < 18:
                raise ValueError("truncated xref entry")
            if entry[17:18] == b"n":
                entries.setdefault(start + i, ("f", int(entry[:10])))
            lex.pos += 20
    nxt = []
    if isinstance(tdict, dict):
        for k in ("Root", "Encrypt"):
            if k in tdict:
                trailer.setdefault(k, tdict[k])
        # hybrid-reference file: the xref STREAM carries the /ObjStm
        # members classic consumers can't see — walk it too
        for k in ("XRefStm", "Prev"):
            if isinstance(tdict.get(k), int):
                nxt.append(tdict[k])
    return nxt


def _stream_xref_section(data, at, entries, trailer) -> list[int]:
    m = _OBJ_RE.match(data, at)
    if not m:
        raise ValueError("xref not at startxref offset")
    lex = _Lexer(data, m.end())
    d = _parse_object(lex)
    if not isinstance(d, dict) or d.get("Type") != "XRef":
        raise ValueError("xref stream not at startxref offset")
    lex._skip_ws()
    if data[lex.pos : lex.pos + 6] != b"stream":
        raise ValueError("xref stream object without stream")
    p = lex.pos + 6
    if data[p : p + 2] == b"\r\n":
        p += 2
    elif data[p : p + 1] == b"\n":
        p += 1
    length = d.get("Length")
    if not isinstance(length, int):  # direct per spec (ISO 7.5.8.2)
        raise ValueError("xref stream /Length must be direct")
    dec = _decode_stream(d, data[p : p + length])
    w = d.get("W")
    if not (
        isinstance(w, list)
        and len(w) == 3
        and all(isinstance(x, int) and 0 <= x <= 8 for x in w)
    ):
        raise ValueError("xref stream /W must be a 3-array of widths")
    size = d.get("Size")
    if not isinstance(size, int) or size < 0:
        raise ValueError("xref stream /Size must be an integer")
    index = d.get("Index", [0, size])
    if not (
        isinstance(index, list)
        and all(isinstance(x, int) and x >= 0 for x in index)
    ):
        raise ValueError("xref stream /Index must be integer pairs")
    rw = sum(w)
    pos = 0
    for k in range(0, len(index) - 1, 2):
        start, count = index[k], index[k + 1]
        for i in range(count):
            row = dec[pos : pos + rw]
            pos += rw
            if len(row) < rw:
                raise ValueError("truncated xref stream")
            o = 0
            f = []
            for width in w:
                f.append(int.from_bytes(row[o : o + width], "big"))
                o += width
            t = f[0] if w[0] else 1  # W[0]=0 defaults the type to 1
            num = start + i
            if num in entries:
                continue
            if t == 1:
                entries[num] = ("f", f[1])
            elif t == 2:
                entries[num] = ("s", f[1], f[2])
    for k in ("Root", "Encrypt"):
        if k in d:
            trailer.setdefault(k, d[k])
    return [d["Prev"]] if isinstance(d.get("Prev"), int) else []


def _scan_offsets(data: bytes) -> dict[int, _Entry]:
    """Damage fallback: linear scan for 'N G obj' headers (later
    duplicates win — incremental updates append)."""
    return {
        int(m.group(1)): ("f", m.start())
        for m in _OBJ_RE.finditer(data)
    }


def _load_object(data: bytes, off: int, get):
    """(value, stream_bytes|None) at offset ``off``; streams resolve
    an indirect /Length through ``get``."""
    m = _OBJ_RE.match(data, off)
    if not m:
        raise ValueError("object header not at offset")
    lex = _Lexer(data, m.end())
    val = _parse_object(lex)
    lex._skip_ws()
    if data[lex.pos : lex.pos + 6] == b"stream":
        p = lex.pos + 6
        if data[p : p + 2] == b"\r\n":
            p += 2
        elif data[p : p + 1] == b"\n":
            p += 1
        length = val.get("Length") if isinstance(val, dict) else None
        if isinstance(length, _Ref):
            length = get(length.num)[0]
        if not isinstance(length, int):
            raise ValueError("stream without integer /Length")
        return val, data[p : p + length]
    return val, None


def _decode_stream(d: dict, raw: bytes) -> bytes:
    filt = d.get("Filter")
    filters = (
        [] if filt is None else filt if isinstance(filt, list) else [filt]
    )
    parms = d.get("DecodeParms", d.get("DP"))
    parms_list = parms if isinstance(parms, list) else [parms] * len(filters)
    out = raw
    for f, p in zip(filters, parms_list):
        if f != "FlateDecode":
            raise ValueError(f"unsupported PDF filter {f!r}")
        out = _zlib.decompress(out)
        if isinstance(p, dict):
            pred = p.get("Predictor", 1)
            if pred == 1:
                pass
            elif pred >= 10:  # PNG row filters
                out = _png_unpredict(out, int(p.get("Columns", 1)))
            else:
                raise ValueError(f"unsupported PDF predictor {pred}")
    return out


def _parse_tounicode(cmap: bytes) -> dict[int, str]:
    """/ToUnicode CMap → {code: unicode str}.  bfchar pairs, bfrange
    with scalar dst (value increments across the run — UTF-16BE, so a
    BMP codepoint per unit) and bfrange with an explicit dst array.
    Unknown syntax is skipped, not fatal (crawl contract)."""
    out: dict[int, str] = {}

    def u16(hx: bytes) -> str:
        b = bytes.fromhex(hx.decode())
        if len(b) % 2:
            b += b"\x00"
        return b.decode("utf-16-be", "replace")

    for m in _re.finditer(rb"beginbfchar(.*?)endbfchar", cmap, _re.S):
        for pm in _re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)
        ):
            out[int(pm.group(1), 16)] = u16(pm.group(2))
    for m in _re.finditer(rb"beginbfrange(.*?)endbfrange", cmap, _re.S):
        for pm in _re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
            rb"(<[0-9A-Fa-f]+>|\[[^\]]*\])",
            m.group(1),
        ):
            lo, hi = int(pm.group(1), 16), int(pm.group(2), 16)
            dst = pm.group(3)
            if dst.startswith(b"["):
                dsts = _re.findall(rb"<([0-9A-Fa-f]+)>", dst)
                for i, dh in enumerate(dsts):
                    if lo + i <= hi:
                        out[lo + i] = u16(dh)
            else:
                dh = dst[1:-1]
                base = int(dh, 16)
                nbytes = len(dh) // 2
                for code in range(lo, hi + 1):
                    out[code] = u16(
                        f"{base + (code - lo):0{nbytes * 2}X}".encode()
                    )
    return out


def _page_text(content: bytes, fonts: dict | None = None) -> str:
    """Interpret a content stream's text operators: shows concatenate
    within a line; Td/TD/T*/Tm and the '/\" operators break lines;
    Tf switches the active font's string decoding — simple fonts are
    latin-1, fonts carrying a parsed /ToUnicode cmap decode 2-byte
    codes through it (unmapped codes → U+FFFD, never a crash).
    Non-text operators are skipped (text extraction, not layout)."""
    lex = _Lexer(content, 0)
    lines: list[str] = []
    cur: list[str] = []
    stack: list = []
    cmap: dict | None = None  # active font's code map (None = simple)

    def decode(b: bytes) -> str:
        if cmap is None:
            return b.decode("latin-1")
        return "".join(
            cmap.get(int.from_bytes(b[i : i + 2], "big"), "�")
            for i in range(0, len(b) - 1, 2)
        )

    def flush():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    while True:
        t = lex.token()
        if t is None:
            break
        if isinstance(t, tuple):
            stack.append(t[1])
            continue
        if t == b"[":
            arr = _parse_from(lex, t)
            stack.append(arr)
            continue
        if t == b"Tf":
            if fonts and len(stack) >= 2 and isinstance(stack[-2], str):
                kind, m = fonts.get(stack[-2], ("simple", None))
                cmap = m if kind == "cid" else None
        elif t == b"Tj":
            if stack and isinstance(stack[-1], bytes):
                cur.append(decode(stack[-1]))
        elif t == b"TJ":
            if stack and isinstance(stack[-1], list):
                cur.append(
                    "".join(
                        decode(x)
                        for x in stack[-1]
                        if isinstance(x, bytes)
                    )
                )
        elif t in (b"'", b'"'):
            flush()
            if stack and isinstance(stack[-1], bytes):
                cur.append(decode(stack[-1]))
        elif t in (b"Td", b"TD", b"T*", b"Tm", b"BT", b"ET"):
            flush()
        stack = stack[-8:]  # bounded operand memory
    flush()
    return "\n".join(lines)


def _open_pdf(payload: bytes):
    """Shared open machinery: (get, resolve, root, entries, trailer)
    over either xref layout with the damaged-file fallback and the
    encryption refusals — extract_pdf_text reads pages through it and
    encode_pdf_update_append_page locates the page tree with it."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    data = payload
    trailer: dict = {}
    try:
        entries, trailer = _xref_entries(data)
        if not entries:
            raise ValueError("empty xref")
    except (ValueError, _zlib.error):
        entries, trailer = _scan_offsets(data), {}
    if not entries:
        raise ValueError("PDF contains no objects")
    cache: dict[int, tuple] = {}
    objstm_cache: dict[int, tuple] = {}
    loading: set[int] = set()  # cycle guard (fuzzed xref rows can
    # point an object stream at itself or at one of its own members)

    def load_objstm(stm_num: int):
        if stm_num not in objstm_cache:
            d, raw = get(stm_num)
            if not isinstance(d, dict) or raw is None:
                raise ValueError("object stream missing")
            dec = _decode_stream(d, raw)
            first, n = d.get("First"), d.get("N")
            if not isinstance(first, int) or not isinstance(n, int):
                raise ValueError("malformed object stream header")
            hl = _Lexer(dec, 0)
            pairs = []
            for _ in range(n):
                a, b = hl.token(), hl.token()
                if not (
                    isinstance(a, tuple) and a[0] == "num"
                    and isinstance(b, tuple) and b[0] == "num"
                ):
                    raise ValueError("malformed object stream pairs")
                pairs.append((int(a[1]), int(b[1])))
            objstm_cache[stm_num] = (dec, first, pairs)
        return objstm_cache[stm_num]

    def get(num: int):
        if num not in cache:
            e = entries.get(num)
            if e is None:
                raise ValueError(f"missing PDF object {num}")
            if num in loading:
                raise ValueError("circular PDF object reference")
            loading.add(num)
            try:
                if e[0] == "f":
                    cache[num] = _load_object(data, e[1], get)
                else:  # packed in an object stream
                    dec, first, pairs = load_objstm(e[1])
                    if e[2] >= len(pairs):
                        raise ValueError("objstm index out of range")
                    cache[num] = (
                        _parse_object(
                            _Lexer(dec, first + pairs[e[2]][1])
                        ),
                        None,
                    )
            finally:
                loading.discard(num)
        return cache[num]

    def resolve(v):
        return get(v.num)[0] if isinstance(v, _Ref) else v

    if "Encrypt" in trailer:
        raise ValueError("unsupported PDF: encrypted")
    if not trailer:
        # linear-scan path: any intact /ObjStm still carries packed
        # objects the scan can't see — expand them into the entry map
        _expand_objstms(data, entries, get)

    # find the catalog: via trailer /Root when the xref path worked,
    # else regex, else the first object whose /Type is /Catalog
    root = None
    r = trailer.get("Root")
    if isinstance(r, _Ref) and r.num in entries:
        root = get(r.num)[0]
    if not isinstance(root, dict) or "Pages" not in root:
        m = _re.search(rb"/Root\s+(\d+)\s+\d+\s+R", data)
        if m and int(m.group(1)) in entries:
            try:
                root = get(int(m.group(1)))[0]
            except (ValueError, _zlib.error):
                root = None
    if not isinstance(root, dict) or "Pages" not in root:
        for num in sorted(entries):
            try:
                v = get(num)[0]
            except (ValueError, _zlib.error):
                continue
            if isinstance(v, dict) and v.get("Type") == "Catalog":
                root = v
                break
    if not isinstance(root, dict):
        raise ValueError("PDF catalog not found")
    if "Encrypt" in root:
        raise ValueError("unsupported PDF: encrypted")
    return get, resolve, root, entries, trailer


def extract_pdf_text(payload: bytes) -> list[str]:
    """Per-page text of a PDF.  Honest scope: classic xref tables
    (+/Prev, hybrid /XRefStm, incremental-update sections) AND 1.5
    xref streams (/W, /Index, PNG predictors), /ObjStm-packed
    objects, with a linear-scan fallback (incl. object-stream
    expansion) for damaged files; FlateDecode and raw streams;
    simple-font text as latin-1 and Type0 composite fonts through
    their /ToUnicode CMap.  Encrypted files, non-Flate filters, the
    TIFF predictor, and Type0 fonts WITHOUT /ToUnicode raise by
    name."""
    get, resolve, root, _entries, _trailer = _open_pdf(payload)

    pages: list[dict] = []

    def walk(node, depth=0):
        if depth > 32:
            raise ValueError("PDF page tree too deep")
        node = resolve(node)
        if not isinstance(node, dict):
            return
        if node.get("Type") == "Page":
            pages.append(node)
            return
        for kid in resolve(node.get("Kids")) or []:
            walk(kid, depth + 1)

    walk(root.get("Pages"))

    def font_decoders(pg: dict) -> dict:
        """{font name: ("cid", cmap) | ("simple", None)} from the
        page's /Resources /Font dict."""
        res = resolve(pg.get("Resources"))
        fdict = resolve(res.get("Font")) if isinstance(res, dict) else None
        out: dict = {}
        for name, fref in (fdict or {}).items():
            fd = resolve(fref)
            if not isinstance(fd, dict):
                continue
            tou = fd.get("ToUnicode")
            if isinstance(tou, _Ref):
                d, raw = get(tou.num)
                if raw is None:
                    raise ValueError("PDF /ToUnicode without a stream")
                out[name] = ("cid", _parse_tounicode(_decode_stream(d, raw)))
            elif fd.get("Subtype") == "Type0":
                raise ValueError(
                    "unsupported PDF: Type0 font without /ToUnicode"
                )
            else:
                out[name] = ("simple", None)
        return out

    out = []
    for pg in pages:
        contents = pg.get("Contents")
        if isinstance(contents, _Ref):
            # may be ONE stream or an ARRAY object of stream refs
            v, raw = get(contents.num)
            refs = v if raw is None and isinstance(v, list) else [contents]
        elif isinstance(contents, list):
            refs = contents
        else:
            refs = []
        chunks = []
        for r in refs:
            if not isinstance(r, _Ref):
                continue
            d, raw = get(r.num)
            if raw is None:
                continue
            chunks.append(_decode_stream(d, raw))
        out.append(_page_text(b"\n".join(chunks), font_decoders(pg)))
    return out


def _expand_objstms(data: bytes, entries: dict, get) -> None:
    """Linear-scan fallback helper: register members of every intact
    /Type /ObjStm found by the scan (absent numbers only — a same-
    numbered top-level object from a later incremental update wins)."""
    for num, e in sorted(entries.items()):
        if e[0] != "f":
            continue
        try:
            d, raw = get(num)
            if (
                not isinstance(d, dict)
                or d.get("Type") != "ObjStm"
                or raw is None
            ):
                continue
            dec = _decode_stream(d, raw)
            n = d.get("N")
            if not isinstance(n, int):
                continue
            hl = _Lexer(dec, 0)
            for idx in range(n):
                a, b = hl.token(), hl.token()
                if not (
                    isinstance(a, tuple) and a[0] == "num"
                    and isinstance(b, tuple) and b[0] == "num"
                ):
                    break
                entries.setdefault(int(a[1]), ("s", num, idx))
        except (ValueError, _zlib.error):
            continue


# --- catalog query -----------------------------------------------------------

from collections.abc import Iterator  # noqa: E402

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from setup_harvest_action_spark.catalog import query  # noqa: E402
from setup_harvest_action_spark.io.loaders import load_table  # noqa: E402
from setup_harvest_action_spark.io.parallelism import spread  # noqa: E402

PDF_DOCS = 300
PDF_MIN_CHARS = 30
PDF_LINE_CHARS = 60
PDF_LINES_PER_PAGE = 12

# Appended to every document before PDF synthesis so the Type0 /
# Identity-H / ToUnicode path runs UNDER THE HASH GATE on an
# otherwise-ASCII fixture corpus: latin-1-but-not-ASCII (naïve café),
# BMP CJK + Greek + numero sign, and a supplementary-plane char
# (U+1D11E MUSICAL SYMBOL G CLEF — a UTF-16 surrogate pair in the
# CMap).  The DuckDB oracle concatenates the same literal.
PDF_UNICODE_TAIL = "— naïve café 中文 Ω №42 𝄞"


def synthesize_pdf(doc_id: int, text: str) -> bytes:
    """Deterministic multi-page PDF: the document's text wrapped at
    word boundaries into <=PDF_LINE_CHARS lines, PDF_LINES_PER_PAGE
    per page — so extraction recovers the original text exactly under
    whitespace normalization (the q_multimodal_pdf_pipeline oracle).
    The file LAYOUT rotates on doc_id so the fixture corpus spans the
    real-world mix: odd ids → PDF-1.5 xref streams (+PNG predictor 12
    when doc_id % 4 == 3), even ids → classic PDF-1.4 xref tables."""
    words = " ".join(text.split()).split(" ")
    lines: list[str] = []
    cur: list[str] = []
    n = 0
    for w in words:
        if cur and n + len(w) + 1 > PDF_LINE_CHARS:
            lines.append(" ".join(cur))
            cur, n = [], 0
        cur.append(w)
        n += len(w) + 1
    if cur:
        lines.append(" ".join(cur))
    pages = [
        lines[i : i + PDF_LINES_PER_PAGE]
        for i in range(0, len(lines), PDF_LINES_PER_PAGE)
    ] or [[""]]
    return encode_pdf(
        pages,
        layout="xref_stream" if doc_id % 2 else "classic",
        xref_predictor=doc_id % 4 == 3,
    )


@query(
    "q_multimodal_pdf_pipeline",
    oracle=f"""
SELECT doc_id,
       md5(trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ', 'g'))
           || ' {PDF_UNICODE_TAIL}') AS text_md5
FROM documents
WHERE n_chars >= {PDF_MIN_CHARS} AND doc_id < {PDF_DOCS}
""",
)
def q_multimodal_pdf_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF text extraction inside the hash gate: each document's text
    (plus PDF_UNICODE_TAIL) becomes a REAL multi-page PDF — classic
    1.4 xref tables on even doc_ids, 1.5 xref STREAMS + /ObjStm-packed
    objects on odd ids (PNG predictor 12 on doc_id%4==3), FlateDecode
    content streams cycling Tj / TJ-array / ' show operators, the
    non-latin-1 tail shown through a Type0/Identity-H font with a
    /ToUnicode CMap — and ``extract_pdf_text`` — startxref → xref walk
    over BOTH layouts with a damaged-file linear-scan fallback, object
    tokenizer, ObjStm loading, page-tree recursion, font-aware
    content-stream interpreter — must recover the text md5-exactly per
    DuckDB's normalization of the raw column concatenated with the
    same literal tail.  One divergent escape rule, xref-stream row
    width, predictor delta, CMap range, or stream length flips the
    hash.  Arrow-batched mapInPandas; the page-count and operator
    goldens + truncation/bitflip fuzz live in tests/test_pdf_codec.py."""
    import hashlib

    import pandas as pd

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(
            (F.col("n_chars") >= PDF_MIN_CHARS)
            & (F.col("doc_id") < PDF_DOCS)
        )
        .select("doc_id", "text")
    )

    def extract(batches: Iterator):
        for pdf in batches:
            out = {"doc_id": [], "text_md5": []}
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                pages = extract_pdf_text(
                    synthesize_pdf(int(d), t + " " + PDF_UNICODE_TAIL)
                )
                joined = " ".join(
                    " ".join(p.split()) for p in pages
                ).strip()
                out["doc_id"].append(int(d))
                out["text_md5"].append(
                    hashlib.md5(joined.encode()).hexdigest()
                )
            yield pd.DataFrame(out)

    return spread(docs).mapInPandas(extract, "doc_id long, text_md5 string")


@query(
    "q_multimodal_pdf_update_pipeline",
    oracle=f"""
SELECT doc_id,
       md5(trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ', 'g'))
           || ' revision 2 appended for doc '
           || CAST(doc_id AS VARCHAR)) AS text_md5,
       CAST(TRUE AS BOOLEAN) AS has_update
FROM documents
WHERE n_chars >= {PDF_MIN_CHARS} AND doc_id < {PDF_DOCS}
""",
)
def q_multimodal_pdf_update_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL-UPDATE extraction under the hash gate: each
    document's base PDF (layout rotating by doc_id as in
    q_multimodal_pdf_pipeline) gains an appended-revision section —
    new content stream + new page + the page-tree node shadowed under
    its original object number, /Prev chained, classic or
    xref-stream section matching the base — and extraction of the
    UPDATED file must recover base text + the revision line
    md5-exactly.  A reader that ignored the newest xref section, or
    resolved the shadowed page tree from the base, would miss or
    duplicate the revision page and flip the hash."""
    import hashlib

    import pandas as pd

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(
            (F.col("n_chars") >= PDF_MIN_CHARS)
            & (F.col("doc_id") < PDF_DOCS)
        )
        .select("doc_id", "text")
    )

    def extract(batches: Iterator):
        for pdf in batches:
            out = {"doc_id": [], "text_md5": [], "has_update": []}
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                upd = encode_pdf_update_append_page(
                    synthesize_pdf(d, t),
                    [f"revision 2 appended for doc {d}"],
                )
                pages = extract_pdf_text(upd)
                joined = " ".join(
                    " ".join(p.split()) for p in pages
                ).strip()
                out["doc_id"].append(d)
                out["text_md5"].append(
                    hashlib.md5(joined.encode()).hexdigest()
                )
                out["has_update"].append(len(pages) >= 2)
            yield pd.DataFrame(out)

    return spread(docs).mapInPandas(
        extract, "doc_id long, text_md5 string, has_update boolean"
    )
