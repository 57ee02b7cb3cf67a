"""Sitemaps (sitemaps.org protocol) — the crawl stack's discovery and
RECRAWL-SCHEDULING input.

robots.txt already surfaces ``Sitemap:`` lines (functions/robots.py);
this module consumes what they point at: ``<urlset>`` sitemap files
(≤50,000 URLs each, the protocol's hard cap — enforced at encode) and
``<sitemapindex>`` shard indexes, plain or gzipped, with the
``lastmod`` / ``changefreq`` / ``priority`` annotations.  XML is
written and parsed with stdlib ``xml.etree`` (namespace-aware via the
``{*}`` wildcard — real-world sitemaps carry the sitemaps.org default
namespace, copies often don't) — the operator under test is the
pipeline composition (shard → gzip → parse → schedule), not a
hand-rolled XML parser.

The recrawl decision is the part a 100 TB crawl actually runs every
cycle: join the sitemap's ``lastmod`` against the crawl state's
last-fetch timestamp — never-crawled URLs are 'new', URLs whose
lastmod moved past the last fetch are 'modified', everything else
skips.  One equi-join on the URL key, shard files as the unit of
parallelism.
"""

from __future__ import annotations

import gzip as _gzip
import io as _io
import xml.etree.ElementTree as _ET

_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"
SITEMAP_MAX_URLS = 50_000


def encode_sitemap(
    entries: list[dict], gzipped: bool = False
) -> bytes:
    """``<urlset>`` XML from entries ({loc, lastmod?, changefreq?,
    priority?}); >50,000 entries raises (the protocol cap — a real
    generator must shard instead)."""
    if len(entries) > SITEMAP_MAX_URLS:
        raise ValueError(
            f"sitemap exceeds the protocol cap: {len(entries)} urls"
        )
    root = _ET.Element("urlset", xmlns=_NS)
    for e in entries:
        u = _ET.SubElement(root, "url")
        _ET.SubElement(u, "loc").text = e["loc"]
        for k in ("lastmod", "changefreq", "priority"):
            if e.get(k) is not None:
                _ET.SubElement(u, k).text = str(e[k])
    out = _ET.tostring(root, encoding="utf-8", xml_declaration=True)
    return _gzip_bytes(out) if gzipped else out


def encode_sitemap_index(
    shards: list[dict], gzipped: bool = False
) -> bytes:
    """``<sitemapindex>`` XML from shard refs ({loc, lastmod?})."""
    root = _ET.Element("sitemapindex", xmlns=_NS)
    for s in shards:
        m = _ET.SubElement(root, "sitemap")
        _ET.SubElement(m, "loc").text = s["loc"]
        if s.get("lastmod") is not None:
            _ET.SubElement(m, "lastmod").text = str(s["lastmod"])
    out = _ET.tostring(root, encoding="utf-8", xml_declaration=True)
    return _gzip_bytes(out) if gzipped else out


def _gzip_bytes(data: bytes) -> bytes:
    buf = _io.BytesIO()
    with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(data)
    return buf.getvalue()


def parse_sitemap(payload: bytes) -> dict:
    """{"kind": "urlset"|"index", "entries": [{loc, lastmod,
    changefreq, priority}]} from plain or gzipped sitemap XML.
    Namespace-agnostic ('{*}' matching): sitemaps in the wild carry
    the sitemaps.org namespace, hand-written ones often none.
    Entries without a <loc> are skipped (they identify nothing);
    malformed XML raises ParseError by name."""
    if payload[:2] == b"\x1f\x8b":
        payload = _gzip.decompress(payload)
    root = _ET.fromstring(payload)
    tag = root.tag.rsplit("}", 1)[-1]
    if tag == "urlset":
        kind, item_tag = "urlset", "url"
    elif tag == "sitemapindex":
        kind, item_tag = "index", "sitemap"
    else:
        raise ValueError(f"not a sitemap document: root <{tag}>")

    def text(el, name):
        # '{*}' matches ANY namespace including none (ElementPath
        # wildcard semantics), so one findall covers both forms
        hit = el.find("{*}" + name)
        return hit.text.strip() if hit is not None and hit.text else None

    entries = []
    for el in root.findall("{*}" + item_tag):
        loc = text(el, "loc")
        if not loc:
            continue
        entries.append(
            {
                "loc": loc,
                "lastmod": text(el, "lastmod"),
                "changefreq": text(el, "changefreq"),
                "priority": text(el, "priority"),
            }
        )
    return {"kind": kind, "entries": entries}


# --- catalog query -----------------------------------------------------------

from collections.abc import Iterator  # noqa: E402

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from setup_harvest_action_spark.catalog import query  # noqa: E402
from setup_harvest_action_spark.io.loaders import load_table  # noqa: E402

SITEMAP_DOCS = 400
SITEMAP_SHARD = 50
_EPOCH = "2026-01-01"
_LAST_CRAWL = "2026-02-14"


@query(
    "q_pipeline_sitemap_recrawl",
    oracle=f"""
SELECT 'https://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
       strftime(DATE '{_EPOCH}' + (doc_id % 90) * INTERVAL 1 DAY,
                '%Y-%m-%d') AS lastmod,
       CASE WHEN doc_id % 11 = 3 THEN 'new' ELSE 'modified' END
         AS reason
FROM documents
WHERE doc_id < {SITEMAP_DOCS}
  AND (doc_id % 11 = 3 OR doc_id % 90 >= 45)
""",
)
def q_pipeline_sitemap_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap-driven recrawl scheduling under the hash gate: each
    50-URL shard becomes a REAL gzipped <urlset> file (lastmod =
    epoch + doc_id%90 days) that is parsed back through the XML
    layer; the entries then join the crawl state (every URL except
    doc_id%11==3 was last fetched {_LAST_CRAWL}) and the schedule
    keeps 'new' URLs (never fetched) and 'modified' ones (lastmod
    after the last fetch).  The oracle replays lastmod arithmetic and
    the decision relationally — a date-format drift, a dropped shard
    entry, or a wrong comparison flips the hash.  Scale: shard files
    are the unit of parallelism (exactly how sites publish them); the
    decision is one equi-join on the URL key."""
    import pandas as pd

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < SITEMAP_DOCS)
        .select(
            "doc_id",
            (F.col("doc_id") / SITEMAP_SHARD).cast("int").alias("shard"),
        )
    )

    def one_shard(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import datetime as _dt

        epoch = _dt.date.fromisoformat(_EPOCH)
        entries = [
            {
                "loc": f"https://corpus.example/doc/{int(d)}",
                "lastmod": (
                    epoch + _dt.timedelta(days=int(d) % 90)
                ).isoformat(),
                "changefreq": ("daily", "weekly", "monthly")[int(d) % 3],
                "priority": "0.5",
            }
            for d in sorted(pdf["doc_id"])
        ]
        blob = encode_sitemap(entries, gzipped=True)
        parsed = parse_sitemap(blob)
        return pd.DataFrame(
            {
                "url": [e["loc"] for e in parsed["entries"]],
                "lastmod": [e["lastmod"] for e in parsed["entries"]],
            }
        )

    seen = docs.groupBy("shard").applyInPandas(
        one_shard, "url string, lastmod string"
    )
    state = docs.filter(F.col("doc_id") % 11 != 3).select(
        F.concat(
            F.lit("https://corpus.example/doc/"), F.col("doc_id")
        ).alias("url"),
        F.lit(_LAST_CRAWL).alias("last_fetch"),
    )
    joined = seen.join(state, "url", "left")
    return (
        joined.filter(
            F.col("last_fetch").isNull()
            | (F.to_date("lastmod") > F.to_date("last_fetch"))
        )
        .select(
            "url",
            "lastmod",
            F.when(F.col("last_fetch").isNull(), "new")
            .otherwise("modified")
            .alias("reason"),
        )
    )
