"""PDF text extraction — the web's second document format (after
HTML) in any crawled training corpus.

Minimal-but-honest, the AVI/MJPEG discipline (no PDF library exists
on this box — stated plainly; the byte-level contract is pinned by the
emitter/decoder pair NOT sharing conventions silently, by handcrafted
escape/operator goldens, and by the DuckDB hash gate: the catalog
query embeds each document's text in a real multi-page PDF and
extraction must recover it md5-exactly):

* ``encode_pdf(lines_per_page pages)`` — a real PDF-1.4 writer:
  catalog → page tree → per-page FlateDecode'd content streams using
  the actual text operators (``Tj``, ``TJ`` arrays, the ``'``
  newline-show), literal-string escaping, a correct xref table with
  20-byte entries and trailer/startxref.
* ``extract_pdf_text(payload)`` — a real reader: startxref → xref
  table walk (with /Prev chains) falling back to a linear ``N G obj``
  scan when the xref is damaged (crawled PDFs often are), an object
  tokenizer (dicts, arrays, names, numbers, refs, literal + hex
  strings, streams with indirect /Length), page-tree recursion,
  FlateDecode, and a content-stream text interpreter: shows
  concatenate within a line; ``Td/TD/T*/Tm/'/"`` separate lines.

Scope is text extraction (the training-data need): no encryption, no
object streams (/ObjStm), no CID/Type0 composite fonts (multi-byte
text), no layout reconstruction — each refused or degraded honestly,
listed in the decoder docstring.  At 100 TB this is one more
Arrow-batched map stage beside the HTML extractor.
"""

from __future__ import annotations

import re as _re
import zlib as _zlib

# --- writer ------------------------------------------------------------------


def _esc(s: str) -> bytes:
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    ).encode("latin-1", "replace")


def encode_pdf(pages: list[list[str]]) -> bytes:
    """PDF-1.4 from pages of text lines.  Line i on a page cycles the
    show operator — Tj, a TJ array split mid-line (kern number
    between chunks), and the ' newline-show — so the reader's full
    operator surface is exercised by every document."""
    objs: list[bytes] = []  # 1-indexed object bodies

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    page_ids = []
    content_ids = []
    for lines in pages:
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for i, line in enumerate(lines):
            if i:
                if i % 3 == 2:
                    # the ' operator moves to the next line itself
                    ops.append(b"(" + _esc(line) + b") '")
                    continue
                ops.append(b"0 -14 Td")
            if i % 3 == 0:
                ops.append(b"(" + _esc(line) + b") Tj")
            elif i % 3 == 1:
                cut = max(1, len(line) // 2)
                ops.append(
                    b"[ ("
                    + _esc(line[:cut])
                    + b") -20 ("
                    + _esc(line[cut:])
                    + b") ] TJ"
                )
            else:
                ops.append(b"(" + _esc(line) + b") '")
        ops.append(b"ET")
        raw = b"\n".join(ops)
        comp = _zlib.compress(raw)
        content_ids.append(
            add(
                b"<< /Length "
                + str(len(comp)).encode()
                + b" /Filter /FlateDecode >>\nstream\n"
                + comp
                + b"\nendstream"
            )
        )
    pages_id = len(objs) + len(pages) + 1  # after the page objects
    for cid in content_ids:
        page_ids.append(
            add(
                b"<< /Type /Page /Parent "
                + str(pages_id).encode()
                + b" 0 R /MediaBox [0 0 612 792] /Resources << /Font "
                + b"<< /F1 "
                + str(font).encode()
                + b" 0 R >> >> /Contents "
                + str(cid).encode()
                + b" 0 R >>"
            )
        )
    kids = b" ".join(str(p).encode() + b" 0 R" for p in page_ids)
    assert add(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(page_ids)).encode() + b" >>"
    ) == pages_id
    root = add(
        b"<< /Type /Catalog /Pages " + str(pages_id).encode() + b" 0 R >>"
    )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, 1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root " + str(root).encode() + b" 0 R >>\n"
        + b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
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


def _parse_object(lex: _Lexer):
    """One object value at the lexer position: scalars, names, arrays,
    dicts (with 'N G R' folded into _Ref)."""
    tok = lex.token()
    return _parse_from(lex, tok)


def _parse_from(lex: _Lexer, tok):
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
            d[k[1]] = _parse_object(lex)
    if tok == b"[":
        arr = []
        while True:
            t = lex.token()
            if t == b"]":
                return arr
            if t is None:
                raise ValueError("unterminated array")
            arr.append(_parse_from(lex, t))
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


def _xref_offsets(data: bytes) -> dict[int, int]:
    """Object offsets from the xref table chain; raises on damage (the
    caller falls back to a linear scan)."""
    tail = data[-200:]
    m = _re.search(rb"startxref\s+(\d+)", tail)
    if not m:
        raise ValueError("PDF missing startxref")
    offsets: dict[int, int] = {}
    at = int(m.group(1))
    for _ in range(16):  # bounded /Prev chain
        if data[at : at + 4] != b"xref":
            raise ValueError("xref table not at startxref offset")
        lex = _Lexer(data, at + 4)
        while True:
            save = lex.pos
            t = lex.token()
            if t == b"trailer":
                trailer = _parse_object(lex)
                prev = trailer.get("Prev") if isinstance(trailer, dict) else None
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
                    num = start + i
                    if num not in offsets:
                        offsets[num] = int(entry[:10])
                lex.pos += 20
        if prev is None:
            return offsets
        at = int(prev)
    return offsets


def _scan_offsets(data: bytes) -> dict[int, int]:
    """Damage fallback: linear scan for 'N G obj' headers."""
    return {
        int(m.group(1)): m.start() for m in _OBJ_RE.finditer(data)
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
    out = raw
    for f in filters:
        if f == "FlateDecode":
            out = _zlib.decompress(out)
        else:
            raise ValueError(f"unsupported PDF filter {f!r}")
    return out


def _page_text(content: bytes) -> str:
    """Interpret a content stream's text operators: shows concatenate
    within a line; Td/TD/T*/Tm and the '/\" operators break lines.
    Non-text operators are skipped (text extraction, not layout)."""
    lex = _Lexer(content, 0)
    lines: list[str] = []
    cur: list[str] = []
    stack: list = []

    def flush():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    while True:
        t = lex.token()
        if t is None:
            break
        if isinstance(t, tuple):
            if t[0] == "str":
                stack.append(t[1])
            else:
                stack.append(t[1])
            continue
        if t == b"[":
            arr = _parse_from(lex, t)
            stack.append(arr)
            continue
        if t == b"Tj":
            if stack and isinstance(stack[-1], bytes):
                cur.append(stack[-1].decode("latin-1"))
        elif t == b"TJ":
            if stack and isinstance(stack[-1], list):
                cur.append(
                    "".join(
                        x.decode("latin-1")
                        for x in stack[-1]
                        if isinstance(x, bytes)
                    )
                )
        elif t in (b"'", b'"'):
            flush()
            if stack and isinstance(stack[-1], bytes):
                cur.append(stack[-1].decode("latin-1"))
        elif t in (b"Td", b"TD", b"T*", b"Tm", b"BT", b"ET"):
            flush()
        stack = stack[-8:]  # bounded operand memory
    flush()
    return "\n".join(lines)


def extract_pdf_text(payload: bytes) -> list[str]:
    """Per-page text of a PDF.  Honest scope: xref tables (+/Prev)
    with a linear-scan fallback for damaged files; FlateDecode and
    raw streams; Type1/simple-font text (CID/Type0 multi-byte,
    /ObjStm-packed objects, and encrypted files raise by name)."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    data = payload
    try:
        offsets = _xref_offsets(data)
    except ValueError:
        offsets = _scan_offsets(data)
    if not offsets:
        raise ValueError("PDF contains no objects")
    cache: dict[int, tuple] = {}

    def get(num: int):
        if num not in cache:
            if num not in offsets:
                raise ValueError(f"missing PDF object {num}")
            cache[num] = _load_object(data, offsets[num], get)
        return cache[num]

    def resolve(v):
        return get(v.num)[0] if isinstance(v, _Ref) else v

    # find the catalog: via trailer /Root when the xref path worked,
    # else the first object whose /Type is /Catalog
    root = None
    m = _re.search(rb"/Root\s+(\d+)\s+\d+\s+R", data)
    if m and int(m.group(1)) in offsets:
        root = get(int(m.group(1)))[0]
    if not isinstance(root, dict) or "Pages" not in root:
        for num in sorted(offsets):
            try:
                v = get(num)[0]
            except ValueError:
                continue
            if isinstance(v, dict) and v.get("Type") == "Catalog":
                root = v
                break
    if not isinstance(root, dict):
        raise ValueError("PDF catalog not found")
    if "Encrypt" in root:
        raise ValueError("unsupported PDF: encrypted")

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
        out.append(_page_text(b"\n".join(chunks)))
    return out


# --- catalog query -----------------------------------------------------------

from collections.abc import Iterator  # noqa: E402

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from setup_harvest_action_spark.catalog import query  # noqa: E402
from setup_harvest_action_spark.io.loaders import load_table  # noqa: E402

PDF_DOCS = 300
PDF_MIN_CHARS = 30
PDF_LINE_CHARS = 60
PDF_LINES_PER_PAGE = 12


def synthesize_pdf(doc_id: int, text: str) -> bytes:
    """Deterministic multi-page PDF: the document's text wrapped at
    word boundaries into <=PDF_LINE_CHARS lines, PDF_LINES_PER_PAGE
    per page — so extraction recovers the original text exactly under
    whitespace normalization (the q_multimodal_pdf_pipeline oracle)."""
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
    return encode_pdf(pages)


@query(
    "q_multimodal_pdf_pipeline",
    oracle=f"""
SELECT doc_id,
       md5(trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ', 'g')))
         AS text_md5
FROM documents
WHERE n_chars >= {PDF_MIN_CHARS} AND doc_id < {PDF_DOCS}
""",
)
def q_multimodal_pdf_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF text extraction inside the hash gate: each document's text
    becomes a REAL multi-page PDF (xref table, page tree, FlateDecode
    content streams cycling Tj / TJ-array / ' show operators with
    literal-string escaping), and ``extract_pdf_text`` — startxref →
    xref walk with a damaged-file linear-scan fallback, object
    tokenizer, page-tree recursion, content-stream text interpreter —
    must recover the text md5-exactly per DuckDB's normalization of
    the raw column.  One divergent escape rule, operator semantics, or
    stream length flips the hash.  Arrow-batched mapInPandas; the
    page-count and operator goldens + truncation/bitflip fuzz live in
    tests/test_pdf_codec.py."""
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
                pages = extract_pdf_text(synthesize_pdf(int(d), t))
                joined = " ".join(
                    " ".join(p.split()) for p in pages
                ).strip()
                out["doc_id"].append(int(d))
                out["text_md5"].append(
                    hashlib.md5(joined.encode()).hexdigest()
                )
            yield pd.DataFrame(out)

    return docs.mapInPandas(extract, "doc_id long, text_md5 string")
