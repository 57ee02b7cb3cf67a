"""HTML → text extraction — step 0 of a web-crawl training-data
pipeline (the reference harvests structured SPARQL, but the
north-star corpus is crawled HTML; cf. SURVEY.md §2 text-analysis
extension).

Three layers, all pure stdlib/numpy (the PNG-via-zlib discipline):

* **Parse** (`_BlockParser`, on ``html.parser.HTMLParser``): a
  single-pass tokenizer building BLOCK segments — text between
  block-level tag boundaries — with per-block facts: character count,
  characters inside ``<a>`` (→ link density), whether a
  boilerplate-role ancestor (``nav/header/footer/aside``) encloses
  it, heading level.  ``script/style/noscript/template/svg/head``
  subtrees contribute no text; character references decode via the
  stdlib (``convert_charrefs``).  The PARSING layer (tag walk, raw
  text recovery, entity decoding) is conformance-gated against
  system libxml2's HTML parser in tools/html_ab.py.
* **Extract** (`main_text`): deterministic jusText/Arc90-style
  boilerplate removal — a block survives iff NO boilerplate-role
  ancestor, link density < ``MAX_LINK_DENSITY``, and length ≥
  ``MIN_BLOCK_CHARS`` (headings exempt from the length rule when a
  surviving block follows).  Public-heuristic, rule-based, zero ML —
  at 100 TB this is a map-only Arrow-batched stage, the same slot
  trafilatura occupies in production crawls.
* **Metadata** (`html_metadata`): title, meta description, ``<html
  lang>``, canonical link — one parse, no regex-over-HTML.

The catalog query `q_text_html_extract` runs extraction INSIDE the
DuckDB hash gate: the synthesized page embeds the document's text as
the article (plus nav/footer/aside/related-links boilerplate), and
the extracted main text must hash-match the original text modulo
whitespace normalization — so "boilerplate removed, article kept,
byte-for-byte" is oracled, not asserted.
"""

from __future__ import annotations

import html as _html
from html.parser import HTMLParser

# tags whose entire subtree carries no corpus text
_SKIP_SUBTREE = frozenset(
    {"script", "style", "noscript", "template", "svg", "head", "iframe"}
)
# boilerplate-role ancestors (ARIA landmark semantics)
_BOILER_ANCESTORS = frozenset({"nav", "header", "footer", "aside"})
# tags that open/close a text block
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "section", "article", "main", "li", "ul", "ol",
        "h1", "h2", "h3", "h4", "h5", "h6", "table", "tr", "td", "th",
        "blockquote", "pre", "br", "hr", "figure", "figcaption", "dl",
        "dt", "dd", "form", "body",
    }
    | _BOILER_ANCESTORS
)
_VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)
_HEADINGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

MIN_BLOCK_CHARS = 25  # jusText-style length gate
MAX_LINK_DENSITY = 0.5


def _norm_ws(s: str) -> str:
    """Whitespace normalization shared with the DuckDB oracle:
    collapse every run to one space, trim."""
    return " ".join(s.split())


class _BlockParser(HTMLParser):
    """One pass → list of block dicts + document metadata."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._buf: list[str] = []
        self._link_chars = 0
        self._buf_chars = 0
        self._skip_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._heading: str | None = None
        self.title: str | None = None
        self._in_title = False
        self.meta_description: str | None = None
        self.lang: str | None = None
        self.canonical: str | None = None
        self.links: list[str] = []  # every <a href>, document order

    # -- block bookkeeping -------------------------------------------------
    def _flush(self) -> None:
        text = _norm_ws("".join(self._buf))
        if text:
            self.blocks.append(
                {
                    "text": text,
                    "n_chars": len(text),
                    "link_density": (
                        self._link_chars / self._buf_chars
                        if self._buf_chars
                        else 0.0
                    ),
                    "boiler_ancestor": self._boiler_depth > 0,
                    "heading": self._heading,
                }
            )
        self._buf, self._link_chars, self._buf_chars = [], 0, 0

    # -- HTMLParser hooks ----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag == "html" and self.lang is None:
            self.lang = dict(attrs).get("lang")
        if tag == "meta":
            a = dict(attrs)
            # valueless attributes ('<meta name content=x>') parse as
            # None values — `or ""` keeps the no-raise crawl contract
            if (a.get("name") or "").lower() == "description":
                self.meta_description = a.get("content")
        if tag == "link":
            a = dict(attrs)
            if (a.get("rel") or "").lower() == "canonical":
                self.canonical = a.get("href")
        if tag == "title":
            self._in_title = True
        if tag == "a":
            # capture BEFORE skip/boiler bookkeeping: a crawler follows
            # nav/footer links too — the web graph wants all of them
            href = dict(attrs).get("href")
            if href:
                self.links.append(href)
        if tag in _SKIP_SUBTREE:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _BOILER_ANCESTORS:
                self._boiler_depth += 1
            self._heading = tag if tag in _HEADINGS else None
        if tag in _VOID_TAGS and tag in _BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _VOID_TAGS:
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_title = False
        if tag in _SKIP_SUBTREE:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _BOILER_ANCESTORS:
                self._boiler_depth = max(0, self._boiler_depth - 1)
            self._heading = None

    def handle_data(self, data):
        if self._in_title:
            self.title = _norm_ws((self.title or "") + " " + data) or None
            return
        if self._skip_depth or not data:
            return
        self._buf.append(data)
        n = len(data)
        self._buf_chars += n
        if self._link_depth:
            self._link_chars += n

    def close(self):
        super().close()
        self._flush()


def parse_blocks(payload: str):
    """(blocks, parser) — the parsed block list plus metadata holder.
    html.parser never raises on malformed input (error recovery is
    the crawl contract); truncated/bit-flipped HTML degrades to fewer
    or merged blocks, pinned in tests."""
    p = _BlockParser()
    p.feed(payload)
    p.close()
    return p.blocks, p


def html_to_text(payload: str) -> str:
    """ALL text content (scripts/styles/head excluded), block-joined,
    whitespace-normalized — the layer tools/html_ab.py gates against
    libxml2's DOM text."""
    blocks, _ = parse_blocks(payload)
    return _norm_ws(" ".join(b["text"] for b in blocks))


def extract_links(payload: str) -> list[str]:
    """Every <a href> in document order (nav/footer/link-farm
    included — the crawler follows them all); raw references, to be
    resolved against the page's base URL (urls.resolve_reference)."""
    _, p = parse_blocks(payload)
    return p.links


def main_text(payload: str) -> str:
    """Boilerplate-removed article text: keep a block iff no
    nav/header/footer/aside ancestor, link density <
    MAX_LINK_DENSITY, and n_chars >= MIN_BLOCK_CHARS (a heading
    survives with a shorter text when any full block survives).
    Deterministic, rule-based; blocks join with single spaces under
    the shared normalization."""
    blocks, _ = parse_blocks(payload)
    kept = [
        b
        for b in blocks
        if not b["boiler_ancestor"]
        and b["link_density"] < MAX_LINK_DENSITY
        and (b["n_chars"] >= MIN_BLOCK_CHARS or b["heading"])
    ]
    if not any(b["n_chars"] >= MIN_BLOCK_CHARS for b in kept):
        return ""
    return _norm_ws(" ".join(b["text"] for b in kept))


def html_metadata(payload: str) -> dict:
    _, p = parse_blocks(payload)
    return {
        "title": p.title,
        "meta_description": p.meta_description,
        "lang": p.lang,
        "canonical": p.canonical,
    }


def block_stats(payload: str) -> dict:
    """Boilerplate diagnostics: how much of the page the extractor
    kept, and why the rest fell."""
    blocks, _ = parse_blocks(payload)
    total = sum(b["n_chars"] for b in blocks) or 1
    kept = [
        b
        for b in blocks
        if not b["boiler_ancestor"]
        and b["link_density"] < MAX_LINK_DENSITY
        and (b["n_chars"] >= MIN_BLOCK_CHARS or b["heading"])
    ]
    return {
        "n_blocks": len(blocks),
        "n_kept": len(kept),
        "kept_char_ratio": sum(b["n_chars"] for b in kept) / total,
        "boiler_char_ratio": sum(
            b["n_chars"] for b in blocks if b["boiler_ancestor"]
        )
        / total,
        "linkheavy_char_ratio": sum(
            b["n_chars"]
            for b in blocks
            if b["link_density"] >= MAX_LINK_DENSITY
        )
        / total,
    }


# --- deterministic page synthesis (fixture side) -----------------------------


def _chunk_text(text: str, target: int = 180) -> list[str]:
    """Split on whitespace boundaries into ~target-char paragraphs,
    every chunk >= MIN_BLOCK_CHARS (short tails merge left), so the
    extractor's length gate never drops article content."""
    words = text.split()
    chunks: list[list[str]] = [[]]
    n = 0
    for w in words:
        chunks[-1].append(w)
        n += len(w) + 1
        if n >= target:
            chunks.append([])
            n = 0
    out = [" ".join(c) for c in chunks if c]
    while len(out) > 1 and len(out[-1]) < MIN_BLOCK_CHARS:
        tail = out.pop()
        out[-1] = out[-1] + " " + tail
    return out


def synthesize_page(doc_id: int, text: str, lang: str | None = None) -> str:
    """A deterministic crawl-shaped page: nav/header with links, an
    aside ad block, a link-farm 'related' div (link density 1.0), a
    footer — and the ARTICLE, which is exactly ``text`` chunked into
    paragraphs (HTML-escaped; the parser unescapes back).  The
    extraction oracle rests on this construction: main_text(page)
    must equal _norm_ws(text)."""
    paras = "\n".join(
        f"<p>{_html.escape(c)}</p>" for c in _chunk_text(text)
    )
    lang_attr = f' lang="{lang}"' if lang else ""
    nav = " ".join(
        f'<a href="/s{i}">Section {i} overview page</a>' for i in range(6)
    )
    related = " ".join(
        f'<a href="/rel{doc_id}-{i}">Related article number {i} with a '
        f"rather long anchor text</a>"
        for i in range(4)
    )
    return f"""<!DOCTYPE html>
<html{lang_attr}>
<head>
<title>Document {doc_id} — Corpus Viewer</title>
<meta name="description" content="Synthetic crawl page for doc {doc_id}">
<link rel="canonical" href="https://corpus.example/doc/{doc_id}">
<style>body {{ margin: 0; }} .ad {{ color: red; }}</style>
<script>var tracker = "{doc_id}"; if (tracker) {{ console.log(1); }}</script>
</head>
<body>
<header><h1>Corpus Viewer</h1><nav>{nav}</nav></header>
<aside class="ad">Subscribe now! Best deals on corpus access, limited
time offer, click here to win.</aside>
<main><article>
{paras}
</article></main>
<div class="related">{related}</div>
<footer><a href="/about">About</a> <a href="/tos">Terms of
Service</a> <a href="/privacy">Privacy</a> © Corpus Viewer</footer>
</body>
</html>"""


# --- catalog queries ---------------------------------------------------------

from collections.abc import Iterator  # noqa: E402

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from setup_harvest_action_spark.catalog import query  # noqa: E402
from setup_harvest_action_spark.io.loaders import load_table  # noqa: E402

HTML_DOCS = 300
HTML_MIN_CHARS = 30  # the jusText length gate needs one full block

# The shared whitespace normalization, DuckDB spelling (the Python
# side is " ".join(s.split()); fixture text is ASCII word lists, so
# the space/tab/newline class is the complete whitespace alphabet)
_NORM_SQL = "trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ', 'g'))"


@query(
    "q_text_html_extract",
    oracle=f"""
SELECT doc_id,
       md5({_NORM_SQL}) AS main_md5,
       CAST(length({_NORM_SQL}) AS INT) AS main_len
FROM documents
WHERE n_chars >= {HTML_MIN_CHARS} AND doc_id < {HTML_DOCS}
""",
)
def q_text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate removal INSIDE the hash gate: each document's
    text is embedded as the article of a crawl-shaped page
    (nav/header, ad aside, a link-density-1.0 related-links farm,
    footer — `synthesize_page`), and `main_text` must recover EXACTLY
    the original text modulo whitespace normalization — md5-compared
    against DuckDB normalizing the raw column.  A single dropped
    paragraph, an unremoved nav link, or an entity-decoding bug flips
    the hash.  Scale: map-only Arrow-batched `mapInPandas`, zero
    shuffles — the trafilatura slot of a 100 TB crawl pipeline."""
    import hashlib

    import pandas as pd

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(
            (F.col("n_chars") >= HTML_MIN_CHARS)
            & (F.col("doc_id") < HTML_DOCS)
        )
        .select("doc_id", "text", "lang")
    )

    def extract(batches: Iterator):
        for pdf in batches:
            mains = [
                main_text(synthesize_page(int(d), t, lang=lg))
                for d, t, lg in zip(pdf["doc_id"], pdf["text"], pdf["lang"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "main_md5": [
                        hashlib.md5(m.encode()).hexdigest() for m in mains
                    ],
                    "main_len": [len(m) for m in mains],
                }
            )

    return docs.mapInPandas(
        extract, "doc_id long, main_md5 string, main_len int"
    )


@query(
    "q_text_html_metadata",
    oracle=f"""
SELECT doc_id,
       'Document ' || doc_id || ' — Corpus Viewer' AS title,
       lang,
       'https://corpus.example/doc/' || doc_id AS canonical
FROM documents
WHERE n_chars >= {HTML_MIN_CHARS} AND doc_id < {HTML_DOCS}
""",
)
def q_text_html_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata extraction oracle: title / <html lang> / canonical
    link parsed back out of the synthesized page must equal their
    deterministic construction from the document row — one parse, no
    regex-over-HTML (the parser handles attribute quoting, entity
    decoding, and head/body structure)."""
    import pandas as pd

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(
            (F.col("n_chars") >= HTML_MIN_CHARS)
            & (F.col("doc_id") < HTML_DOCS)
        )
        .select("doc_id", "text", "lang")
    )

    def extract(batches: Iterator):
        for pdf in batches:
            rows = {"doc_id": [], "title": [], "lang": [], "canonical": []}
            for d, t, lg in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
                meta = html_metadata(synthesize_page(int(d), t, lang=lg))
                rows["doc_id"].append(int(d))
                rows["title"].append(meta["title"])
                rows["lang"].append(meta["lang"])
                rows["canonical"].append(meta["canonical"])
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        extract, "doc_id long, title string, lang string, canonical string"
    )


@query("q_text_html_boilerplate_stats")
def q_text_html_boilerplate_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Block-level boilerplate diagnostics over the synthesized crawl
    pages: per-lang aggregate of kept/boilerplate/link-heavy character
    shares — the dashboard a corpus-cleaning run watches.  Rows-only
    (block segmentation is parser-internal); the per-page extractor
    itself is hash-oracled by q_text_html_extract."""
    import pandas as pd

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(
            (F.col("n_chars") >= HTML_MIN_CHARS)
            & (F.col("doc_id") < HTML_DOCS)
        )
        .select("doc_id", "text", "lang")
    )

    def stats(batches: Iterator):
        for pdf in batches:
            rows = {
                "lang": [], "n_blocks": [], "kept_char_ratio": [],
                "boiler_char_ratio": [], "linkheavy_char_ratio": [],
            }
            for d, t, lg in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
                st = block_stats(synthesize_page(int(d), t, lang=lg))
                rows["lang"].append(lg)
                rows["n_blocks"].append(st["n_blocks"])
                rows["kept_char_ratio"].append(st["kept_char_ratio"])
                rows["boiler_char_ratio"].append(st["boiler_char_ratio"])
                rows["linkheavy_char_ratio"].append(
                    st["linkheavy_char_ratio"]
                )
            yield pd.DataFrame(rows)

    per_page = docs.mapInPandas(
        stats,
        "lang string, n_blocks int, kept_char_ratio double, "
        "boiler_char_ratio double, linkheavy_char_ratio double",
    )
    return per_page.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.round(F.avg("n_blocks"), 4).alias("avg_blocks"),
        F.round(F.avg("kept_char_ratio"), 4).alias("avg_kept_ratio"),
        F.round(F.avg("boiler_char_ratio"), 4).alias("avg_boiler_ratio"),
        F.round(F.avg("linkheavy_char_ratio"), 4).alias(
            "avg_linkheavy_ratio"
        ),
    )
