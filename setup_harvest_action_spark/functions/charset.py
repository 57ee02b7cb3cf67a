"""bytes → unicode: step 0 of every real crawl pipeline.

WARC payloads arrive as BYTES in whatever encoding the origin served —
windows-1252, shift_jis, gb2312, UTF-16 — with the charset declared in
the HTTP Content-Type header and/or a ``<meta>`` tag (often wrongly).
``html_extract`` consumes decoded text, so this layer sits between the
HTTP parse and extraction.

Sniffing precedence is the WHATWG encoding-sniffing order (HTML spec
§13.2.3.2, the order every browser implements), minus the
content-based heuristics step (frequency analysis — out of scope,
documented):

    1. BOM          (UTF-8 / UTF-16LE / UTF-16BE — overrides ALL
                     declarations, per spec)
    2. transport    (the HTTP Content-Type ``charset=`` parameter)
    3. meta prescan (``<meta charset=..>`` or the http-equiv form,
                     within the first 1024 payload bytes — the spec's
                     prescan window; a meta-declared UTF-16 label
                     remaps to UTF-8 and x-user-defined to cp1252 per
                     the spec's prescan post-processing)
    4. UTF-8 rung   (corpus-mode deviation, documented at
                     ``sniff_charset``: non-ASCII payloads that
                     strict-decode as UTF-8 are UTF-8 — unlabeled
                     UTF-8 is the most common real-web case and UTF-8
                     is self-validating; ``utf8_fallback=False``
                     restores browser order)
    5. default      windows-1252 (the WHATWG default for unlabeled
                     content in the ``en`` locale group)

Labels resolve through the WHATWG Encoding Standard's label table
(the subset whose codecs CPython ships) — notably ``iso-8859-1`` /
``latin1`` / ``ascii`` are ALIASES OF windows-1252 and ``gb2312`` is
an alias of GBK, exactly as browsers treat them; unknown-to-WHATWG
labels fall through to ``codecs.lookup`` (documented extension for
non-web corpora), then to the default.  Decoding itself is CPython's
codec machinery — the same stdlib-as-external-anchor discipline as
urllib.robotparser for robots and libxml2 for HTML (conformance pins
in tests/test_charset.py).

Scale: pure map — the sniff reads ≤1024 bytes + headers, the decode is
one C-level codecs pass per document, no shuffle anywhere.

Reference analogue: the reference client trusts requests' UTF-8 JSON
(harvest.py:96-118); a byte-level crawl engine cannot.
"""

from __future__ import annotations

import codecs as _codecs
import re as _re

# WHATWG Encoding Standard label → CPython codec name (the subset the
# stdlib ships).  Keys are the spec's lowercase labels.
_WHATWG_LABELS: dict[str, str] = {
    # utf-8
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "unicode11utf8": "utf-8", "unicode20utf8": "utf-8",
    "x-unicode20utf8": "utf-8",
    # legacy single-byte: windows-1252 swallows latin-1/ascii labels
    "windows-1252": "cp1252", "iso-8859-1": "cp1252", "iso8859-1": "cp1252",
    "iso_8859-1": "cp1252", "latin1": "cp1252", "l1": "cp1252",
    "ascii": "cp1252", "us-ascii": "cp1252", "cp1252": "cp1252",
    "x-cp1252": "cp1252", "cp819": "cp1252", "ibm819": "cp1252",
    "csisolatin1": "cp1252", "iso-ir-100": "cp1252",
    "windows-1250": "cp1250", "x-cp1250": "cp1250",
    "windows-1251": "cp1251", "x-cp1251": "cp1251",
    "windows-1253": "cp1253", "windows-1254": "cp1254",
    "windows-1255": "cp1255", "windows-1256": "cp1256",
    "windows-1257": "cp1257", "windows-1258": "cp1258",
    "windows-874": "cp874", "dos-874": "cp874", "tis-620": "cp874",
    "iso-8859-11": "cp874",
    "iso-8859-2": "iso8859-2", "latin2": "iso8859-2", "l2": "iso8859-2",
    "iso-8859-3": "iso8859-3", "iso-8859-4": "iso8859-4",
    "iso-8859-5": "iso8859-5", "iso-8859-6": "iso8859-6",
    "iso-8859-7": "iso8859-7", "iso-8859-8": "iso8859-8",
    "iso-8859-10": "iso8859-10", "iso-8859-13": "iso8859-13",
    "iso-8859-14": "iso8859-14", "iso-8859-15": "iso8859-15",
    "latin9": "iso8859-15", "iso-8859-16": "iso8859-16",
    "koi8-r": "koi8-r", "koi8": "koi8-r", "cskoi8r": "koi8-r",
    "koi8-u": "koi8-u", "koi8-ru": "koi8-u",
    "macintosh": "mac-roman", "x-mac-roman": "mac-roman",
    "mac": "mac-roman", "csmacintosh": "mac-roman",
    "x-mac-cyrillic": "mac-cyrillic", "x-mac-ukrainian": "mac-cyrillic",
    "ibm866": "cp866", "866": "cp866", "cp866": "cp866", "csibm866": "cp866",
    # legacy multi-byte: Japanese
    "shift_jis": "shift_jis", "shift-jis": "shift_jis", "sjis": "shift_jis",
    "x-sjis": "shift_jis", "ms932": "shift_jis", "ms_kanji": "shift_jis",
    "csshiftjis": "shift_jis", "windows-31j": "shift_jis",
    "euc-jp": "euc_jp", "x-euc-jp": "euc_jp",
    "cseucpkdfmtjapanese": "euc_jp",
    "iso-2022-jp": "iso2022_jp", "csiso2022jp": "iso2022_jp",
    # Chinese: the gb2312 label IS gbk per the spec
    "gbk": "gbk", "gb2312": "gbk", "gb_2312": "gbk", "gb_2312-80": "gbk",
    "chinese": "gbk", "csgb2312": "gbk", "csiso58gb231280": "gbk",
    "iso-ir-58": "gbk", "x-gbk": "gbk",
    "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5hkscs", "cn-big5": "big5",
    "csbig5": "big5", "x-x-big5": "big5",
    # Korean
    "euc-kr": "euc_kr", "korean": "euc_kr", "csksc56011987": "euc_kr",
    "windows-949": "euc_kr", "ks_c_5601-1987": "euc_kr",
    "ks_c_5601-1989": "euc_kr", "ksc5601": "euc_kr", "ksc_5601": "euc_kr",
    "iso-ir-149": "euc_kr", "cseuckr": "euc_kr",
    # utf-16: the bare label means LITTLE-endian per the spec
    "utf-16": "utf-16-le", "utf-16le": "utf-16-le",
    "ucs-2": "utf-16-le", "unicode": "utf-16-le",
    "unicodefeff": "utf-16-le", "iso-10646-ucs-2": "utf-16-le",
    "csunicode": "utf-16-le",
    "utf-16be": "utf-16-be", "unicodefffe": "utf-16-be",
}

DEFAULT_ENCODING = "cp1252"

_BOMS = (
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)

_CHARSET_PARAM_RE = _re.compile(
    r"""charset\s*=\s*["']?\s*([^\s"';,]+)""", _re.I
)

_WS_BYTES = b"\t\n\x0c\r "


def resolve_label(label: str | None) -> str | None:
    """WHATWG label → CPython codec name; falls through to
    ``codecs.lookup`` for labels the web standard doesn't define but a
    non-web corpus might carry (documented extension); None when the
    label resolves nowhere."""
    if not label:
        return None
    norm = label.strip().strip("\"'").lower()
    hit = _WHATWG_LABELS.get(norm)
    if hit:
        return hit
    try:
        info = _codecs.lookup(norm)
    except LookupError:
        return None
    # CPython's codec registry also holds bytes↔bytes transforms
    # (hex, base64, zlib, rot13, …).  A crawled page declaring
    # charset=hex must NOT route there — payload.decode('hex') raises
    # LookupError('hex is not a text encoding') mid-pipeline, breaking
    # the never-an-exception crawl contract.  CodecInfo exposes the
    # same flag bytes.decode() enforces.
    if not getattr(info, "_is_text_encoding", True):
        return None
    return info.name


def sniff_bom(payload: bytes) -> tuple[str | None, int]:
    """(codec, bom_length) — UTF-8's 3-byte BOM is checked before
    UTF-16LE's 2-byte prefix (FF FE) per the spec's ordering."""
    for bom, codec in _BOMS:
        if payload.startswith(bom):
            return codec, len(bom)
    return None, 0


def charset_from_content_type(content_type: str | None) -> str | None:
    """The ``charset=`` parameter of an HTTP Content-Type value
    (quoted or bare), or None."""
    if not content_type:
        return None
    m = _CHARSET_PARAM_RE.search(content_type)
    return m.group(1) if m else None


def _get_attribute(data: bytes, i: int) -> tuple[str, str, int] | None:
    """One attribute at position ``i`` per the WHATWG prescan's
    get-an-attribute: returns (lowercased name, value, next position)
    or None at tag end.  Handles '/' as separator, unquoted and
    single/double-quoted values (so a '>' INSIDE a quoted value never
    ends the tag — the reason the prescan is a scanner, not a
    regex)."""
    n = len(data)
    while i < n and (data[i : i + 1] in _WS_BYTES or data[i] == 0x2F):
        i += 1
    if i >= n or data[i] == 0x3E:  # '>'
        return None
    name = bytearray()
    while i < n:
        c = data[i]
        if c == 0x3D and name:  # '='
            break
        if data[i : i + 1] in _WS_BYTES or c in (0x2F, 0x3E):
            break
        name.append(c + 0x20 if 0x41 <= c <= 0x5A else c)
        i += 1
    while i < n and data[i : i + 1] in _WS_BYTES:
        i += 1
    if i >= n or data[i] != 0x3D:  # no value
        return name.decode("ascii", "replace"), "", i
    i += 1
    while i < n and data[i : i + 1] in _WS_BYTES:
        i += 1
    value = bytearray()
    if i < n and data[i] in (0x22, 0x27):  # quoted
        q = data[i]
        i += 1
        while i < n and data[i] != q:
            value.append(data[i])
            i += 1
        i += 1  # past the close quote
    else:
        while i < n and data[i : i + 1] not in _WS_BYTES and data[i] != 0x3E:
            value.append(data[i])
            i += 1
    return name.decode("ascii", "replace"), value.decode(
        "latin-1"
    ), i


def meta_prescan(payload: bytes, window: int = 1024) -> str | None:
    """The WHATWG prescan (HTML spec §13.2.3.2 'prescan a byte stream
    to determine its encoding'), attribute-level — NOT a regex, so
    ``charset=`` inside an unrelated attribute VALUE or an HTML
    comment cannot false-positive: ``<meta charset=X>`` wins
    directly; the ``http-equiv="Content-Type"`` pragma form yields
    its ``content=`` charset parameter ONLY when the pragma is
    actually present (the spec's got-pragma rule); every other tag's
    attributes are consumed quote-aware so their values are opaque.
    First match within the 1024-byte window decides."""
    data = payload[:window]
    i, n = 0, len(data)
    while i < n:
        if data[i : i + 4] == b"<!--":
            j = data.find(b"-->", i + 4)
            i = (j + 3) if j >= 0 else n
            continue
        if data[i] != 0x3C:  # '<'
            i += 1
            continue
        is_meta = data[i + 1 : i + 5].lower() == b"meta" and data[
            i + 5 : i + 6
        ] in b"\t\n\x0c\r /"
        if is_meta:
            i += 5
        elif (
            i + 1 < n
            and (0x41 <= (data[i + 1] & ~0x20) <= 0x5A or data[i + 1] == 0x2F)
        ):
            # any other tag (or end tag): skip its NAME then consume
            # attributes quote-aware so values can't leak tags
            i += 1
            while i < n and data[i : i + 1] not in _WS_BYTES and data[i] != 0x3E:
                i += 1
        else:
            i += 1
            continue
        attrs: dict[str, str] = {}
        while True:
            hit = _get_attribute(data, i)
            if hit is None:
                while i < n and data[i] != 0x3E:
                    i += 1
                i += 1
                break
            name, value, i = hit
            attrs.setdefault(name, value)
        if not is_meta:
            continue
        if "charset" in attrs and attrs["charset"].strip():
            return attrs["charset"].strip()
        if (
            attrs.get("http-equiv", "").lower() == "content-type"
            and "content" in attrs
        ):
            label = charset_from_content_type(attrs["content"])
            if label:
                return label
    return None


def _remap_meta_codec(label: str | None, codec: str | None) -> str | None:
    """The WHATWG prescan post-processing step (HTML spec §13.2.3.2
    step 5 of 'get an encoding from a meta element' / prescan step
    2.6): a meta-declared UTF-16 family label becomes UTF-8 — the
    document self-evidently is NOT UTF-16, or the ASCII-compatible
    prescan could not have read the declaration — and
    ``x-user-defined`` becomes windows-1252."""
    if codec in ("utf-16-le", "utf-16-be"):
        return "utf-8"
    if codec is None and label and label.strip().lower() == "x-user-defined":
        return "cp1252"
    return codec


def sniff_charset(
    payload: bytes,
    content_type: str | None = None,
    default: str = DEFAULT_ENCODING,
    utf8_fallback: bool = True,
) -> tuple[str, str, int]:
    """(codec, source, bom_length) with source in
    {"bom", "header", "meta", "utf8_valid", "default"} — the WHATWG
    precedence, plus one documented corpus-mode deviation: when every
    declaration rung misses AND the payload contains non-ASCII bytes
    that strict-decode as UTF-8, the answer is UTF-8 (source
    ``utf8_valid``) rather than the windows-1252 default.  Unlabeled
    UTF-8 is the single most common real-web charset case; UTF-8 is
    self-validating (a multi-byte sequence that survives strict decode
    is UTF-8 with near-certainty), so this rung is deterministic — not
    the frequency-analysis heuristics the module excludes.  Pure-ASCII
    payloads skip the rung (cp1252 and UTF-8 agree on ASCII, and
    ``default`` is the honest label); set ``utf8_fallback=False`` for
    byte-exact browser-order behavior."""
    codec, bom_len = sniff_bom(payload)
    if codec:
        return codec, "bom", bom_len
    codec = resolve_label(charset_from_content_type(content_type))
    if codec:
        return codec, "header", 0
    meta_label = meta_prescan(payload)
    codec = _remap_meta_codec(meta_label, resolve_label(meta_label))
    if codec:
        return codec, "meta", 0
    if utf8_fallback and not payload.isascii():
        try:
            payload.decode("utf-8", "strict")
            return "utf-8", "utf8_valid", 0
        except UnicodeDecodeError:
            pass
    return default, "default", 0


def decode_bytes(
    payload: bytes,
    content_type: str | None = None,
    errors: str = "replace",
) -> tuple[str, str, str]:
    """(text, codec, source): sniff then decode, stripping the BOM
    when one decided.  ``errors="replace"`` is the crawl contract —
    mis-declared bytes yield deterministic U+FFFD / mojibake, never an
    exception mid-pipeline."""
    codec, source, bom_len = sniff_charset(payload, content_type)
    return payload[bom_len:].decode(codec, errors), codec, source


# --- catalog query -----------------------------------------------------------

from collections.abc import Iterator  # noqa: E402

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from setup_harvest_action_spark.catalog import query  # noqa: E402
from setup_harvest_action_spark.io.loaders import load_table  # noqa: E402
from setup_harvest_action_spark.io.parallelism import spread_groups  # noqa: E402

CHARSET_DOCS = 300
CHARSET_MIN_CHARS = 30
CHARSET_PAGES_PER_FILE = 20

# Per-variant: (marker appended to the text — non-ASCII chars chosen
# to be NATIVELY encodable in that charset, so entity fallback can't
# mask a wrong decode), (python codec bytes are written in),
# (HTTP Content-Type header), (meta charset label injected | None),
# (BOM bytes | b"").
# The eight variants pin each precedence rung: header label + WHATWG
# alias (iso-8859-1 → cp1252, gb2312 → gbk), meta-only, a BOM
# overriding a LYING header, unlabeled cp1252 hitting the default
# (its bytes are NOT valid UTF-8, so the utf8_valid rung must pass it
# by), unlabeled UTF-8 recovered by the validation rung, and a LYING
# <meta charset=utf-16> on UTF-8 bytes exercising the spec's prescan
# UTF-16→UTF-8 remap.
CHARSET_VARIANTS: tuple[tuple[str, str, str, str | None, bytes], ...] = (
    ("šžć čap", "utf-8", "text/html; charset=utf-8", None, b""),
    (
        "café — naïve ±",
        "cp1252",
        "text/html; charset=iso-8859-1",  # WHATWG: alias of cp1252
        None,
        b"",
    ),
    (
        "日本語テキスト",
        "shift_jis",
        "text/html",  # no transport charset → meta prescan decides
        "shift_jis",
        b"",
    ),
    (
        "中文文本处理",
        "gbk",
        "text/html; charset=gb2312",  # WHATWG: gb2312 label IS gbk
        None,
        b"",
    ),
    (
        "Ωμέγα BOM wins",
        "utf-16-le",
        "text/html; charset=iso-8859-1",  # header LIES; BOM overrides
        None,
        b"\xff\xfe",
    ),
    ("résumé ©", "cp1252", "text/html", None, b""),  # unlabeled default
    (
        "żółć über łódź",
        "utf-8",
        "text/html",  # unlabeled; strict-UTF-8 validation recovers it
        None,
        b"",
    ),
    (
        "čeština remap",
        "utf-8",
        "text/html",  # meta LIES utf-16 → spec prescan remap → utf-8
        "utf-16",
        b"",
    ),
)


def encode_crawl_page(doc_id: int, html: str) -> tuple[bytes, str]:
    """(payload bytes, Content-Type header) for the doc's rotating
    charset variant; boilerplate chars outside the target charset go
    to numeric character references (what real pages do), so the
    article text itself is always natively encoded."""
    marker, codec, ctype, meta_label, bom = CHARSET_VARIANTS[
        doc_id % len(CHARSET_VARIANTS)
    ]
    if meta_label:
        html = html.replace(
            "<head>", f"<head>\n<meta charset={meta_label}>", 1
        )
    return bom + html.encode(codec, "xmlcharrefreplace"), ctype


_MARKER_SQL = " ".join(
    f"WHEN {i} THEN '{v[0]}'" for i, v in enumerate(CHARSET_VARIANTS)
)


@query(
    "q_pipeline_charset_decode",
    oracle=f"""
SELECT doc_id,
       md5(trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ', 'g'))
           || ' ' || CASE doc_id % {len(CHARSET_VARIANTS)}
                     {_MARKER_SQL} END) AS main_md5,
       CASE doc_id % {len(CHARSET_VARIANTS)}
            WHEN 0 THEN 'header' WHEN 1 THEN 'header'
            WHEN 2 THEN 'meta'   WHEN 3 THEN 'header'
            WHEN 4 THEN 'bom'    WHEN 5 THEN 'default'
            WHEN 6 THEN 'utf8_valid'
            ELSE 'meta' END AS charset_source
FROM documents
WHERE n_chars >= {CHARSET_MIN_CHARS} AND doc_id < {CHARSET_DOCS}
""",
)
def q_pipeline_charset_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl funnel's bytes→unicode layer under the hash gate:
    each document (text + a charset-native non-ASCII marker) becomes a
    crawl page ENCODED in a rotating legacy charset — utf-8,
    windows-1252 under its iso-8859-1 alias, shift_jis declared only
    by <meta> prescan, gbk under its gb2312 alias, UTF-16LE whose BOM
    overrides a LYING header, unlabeled windows-1252 hitting the
    WHATWG default, unlabeled UTF-8 recovered by the strict-validation
    rung (source ``utf8_valid`` — the corpus-mode deviation documented
    at ``sniff_charset``), and UTF-8 bytes under a LYING
    ``<meta charset=utf-16>`` that the spec's prescan post-processing
    remaps to UTF-8 — wrapped in an HTTP response inside a .warc.gz
    container.  The read side walks WARC records, parses HTTP headers,
    sniffs the charset at WHATWG precedence (BOM > header > meta >
    utf8-validation > default), decodes, strips boilerplate, and must
    recover the original text + marker md5-exactly AND report the
    precedence rung that decided each document.  The oracle re-derives
    both relationally; one alias table entry, prescan window, or
    precedence swap flips the hash.  Scale: one task per WARC file;
    the sniff reads ≤1 KiB per doc; decode is one codecs pass — all
    map-side."""
    import hashlib

    import pandas as pd

    from setup_harvest_action_spark.functions.html_extract import (
        main_text,
        synthesize_page,
    )
    from setup_harvest_action_spark.sources.warc import (
        encode_warc_responses,
        parse_warc,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(
            (F.col("n_chars") >= CHARSET_MIN_CHARS)
            & (F.col("doc_id") < CHARSET_DOCS)
        )
        .select("doc_id", "text", "lang")
        .withColumn(
            "file_id",
            (F.col("doc_id") / CHARSET_PAGES_PER_FILE).cast("int"),
        )
    )

    def one_file(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id")
        responses = []
        for d, t, lg in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
            d = int(d)
            marker = CHARSET_VARIANTS[d % len(CHARSET_VARIANTS)][0]
            body, ctype = encode_crawl_page(
                d, synthesize_page(d, t + " " + marker, lang=lg)
            )
            responses.append(
                (f"https://corpus.example/doc/{d}", body, ctype)
            )
        blob = encode_warc_responses(responses, gzip_members=True)
        rows = {"doc_id": [], "main_md5": [], "charset_source": []}
        for rec in parse_warc(blob):
            if rec["type"] != "response":
                continue
            text, _codec, source = decode_bytes(
                rec["http_body"],
                rec["http_headers"].get("content-type"),
            )
            main = main_text(text)
            rows["doc_id"].append(int(rec["uri"].rsplit("/", 1)[1]))
            rows["main_md5"].append(
                hashlib.md5(main.encode()).hexdigest()
            )
            rows["charset_source"].append(source)
        return pd.DataFrame(rows)

    return spread_groups(docs, "file_id").groupBy("file_id").applyInPandas(
        one_file, "doc_id long, main_md5 string, charset_source string"
    )
