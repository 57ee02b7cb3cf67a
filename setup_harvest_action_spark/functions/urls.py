"""URL canonicalization — the crawl pipeline's identity function.

Exact web dedup dedupes by URL before it ever hashes a byte of
content, and URL identity is convention: scheme/host case, default
ports, fragments, `/.` segments and query-parameter order all vary
across crawls of the same resource.  This module implements the
standard normalization subset (RFC 3986 §6.2.2-6.2.3 plus the
query-sort convention crawl dedup uses) as PURE built-in column
expressions — the whole operator stays inside whole-stage codegen,
zero Python, zero UDFs — and the DuckDB oracle replays every step
with its own function set, so cross-engine agreement on the full
chain is hash-gated, not asserted:

  * strip the fragment,
  * lowercase scheme and host (userinfo preserved case-sensitively,
    per the RFC),
  * drop the default port (http:80 / https:443),
  * empty path → "/", collapse "/./" segments (two fixed passes —
    identical non-overlapping global-replace semantics on both
    engines; "/../" is deliberately NOT resolved: climbing above
    root on malformed URLs corrupts identity, the conservative
    crawl choice),
  * drop an empty query; otherwise sort "k=v" parameters
    byte-lexicographically and drop empties.

Scale: map-only over any URL column; the canonical string is then the
exact-dedup / groupBy key, so canonicalization cost is one codegen'd
projection ahead of the shuffle that was happening anyway.
"""

from __future__ import annotations

import re as _re

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.io.loaders import load_table

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


# --- RFC 3986 §5: relative-reference resolution -------------------------------
#
# The other half of URL identity: a crawled page's outlinks arrive as
# relative references ("../doc/7", "//cdn.example/x", "?page=2") that
# only mean anything against the page's base URL.  Implemented to the
# RFC's §5.2 pseudocode (strict mode) and conformance-pinned against
# urllib.parse.urljoin — the stdlib-as-external-oracle discipline —
# on the RFC's own §5.4 normal AND abnormal example tables plus a
# randomized matrix (tests/test_urls.py).  Python (the algorithm is
# inherently iterative) but it runs inside the SAME Arrow-batched map
# stage that parsed the HTML, so nothing leaves the JVM twice.

# RFC 3986 appendix-B-style component split (scheme, //authority,
# path, ?query, #fragment — each None when absent)
_COMPONENT_RE = _re.compile(
    r"^(?:([A-Za-z][A-Za-z0-9+.\-]*):)?"
    r"(//[^/?#]*)?([^?#]*)(\?[^#]*)?(#.*)?$"
)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 — the full algorithm, '..' included (resolution
    REQUIRES it; contrast canonicalize_url, which deliberately leaves
    '..' alone on already-absolute URLs)."""
    inp, out = path, []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            i = inp.find("/", 1)
            if i < 0:
                out.append(inp)
                inp = ""
            else:
                out.append(inp[:i])
                inp = inp[i:]
    return "".join(out)


def resolve_reference(base: str, ref: str) -> str:
    """RFC 3986 §5.2.2 strict transform-references: absolute refs pass
    through (dot-segments removed), network-path refs ('//host/x')
    take the base scheme, absolute paths replace, relative paths merge
    (§5.2.3) — fragment always from the reference."""
    bm = _COMPONENT_RE.match(base)
    rm = _COMPONENT_RE.match(ref)
    if bm is None or rm is None:  # the regex matches any string; keep
        return ref  # a guard for type misuse anyway
    b_scheme, b_auth, b_path, b_query, _ = bm.groups()
    r_scheme, r_auth, r_path, r_query, r_frag = rm.groups()
    if r_scheme is not None:
        t = (r_scheme, r_auth, remove_dot_segments(r_path), r_query)
    elif r_auth is not None:
        t = (b_scheme, r_auth, remove_dot_segments(r_path), r_query)
    elif r_path == "":
        t = (b_scheme, b_auth, b_path,
             r_query if r_query is not None else b_query)
    elif r_path.startswith("/"):
        t = (b_scheme, b_auth, remove_dot_segments(r_path), r_query)
    else:
        if b_auth is not None and b_path == "":
            merged = "/" + r_path
        else:
            merged = b_path[: b_path.rfind("/") + 1] + r_path
        t = (b_scheme, b_auth, remove_dot_segments(merged), r_query)
    scheme, auth, path, qry = t
    return (
        (scheme + ":" if scheme is not None else "")
        + (auth or "")
        + path
        + (qry or "")
        + (r_frag or "")
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s)-style URL — built-in
    expressions only (see module docstring for the rule set)."""
    u = F.regexp_replace(url, "#.*$", "")  # fragment never survives
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    authority = F.regexp_extract(rest, "^([^/?]*)", 1)
    pathq = F.regexp_replace(rest, "^[^/?]*", "")
    # userinfo (case-preserved) split from hostport
    userinfo = F.regexp_extract(authority, "^([^@]*@)", 1)
    hostport = F.regexp_replace(authority, "^[^@]*@", "")
    host = F.lower(F.regexp_replace(hostport, ":[0-9]+$", ""))
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    keep_port = ~(
        (port == "")
        | ((scheme == F.lit("http")) & (port == F.lit("80")))
        | ((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    port_part = F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(
        F.lit("")
    )
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    q = F.regexp_replace(pathq, "^[^?]*", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    for _ in range(2):  # fixed passes; identical semantics both engines
        path = F.regexp_replace(path, "/\\./", "/")
    path = F.regexp_replace(path, "/\\.$", "/")
    params = F.filter(
        F.split(F.regexp_replace(q, "^\\?", ""), "&"),
        lambda x: x != "",
    )
    q_part = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))
    return F.concat(
        scheme, F.lit("://"), userinfo, host, port_part, path, q_part
    )


# shared messy-URL construction — the SAME arithmetic runs in DuckDB,
# so the oracle compares canonicalization, not fixture drift
_MESSY_SQL = """
CASE WHEN doc_id % 3 = 0 THEN 'HTTP' ELSE 'http' END
|| CASE WHEN doc_id % 2 = 0 THEN CASE WHEN doc_id % 3 = 0 THEN 'S'
        ELSE 's' END ELSE '' END
|| '://'
|| CASE WHEN doc_id % 5 = 0 THEN 'User.Name@' ELSE '' END
|| CASE WHEN doc_id % 3 = 1 THEN 'WWW.Example' ELSE 'www.example' END
|| CAST(doc_id % 7 AS VARCHAR) || '.COM'
|| CASE WHEN doc_id % 4 = 0 THEN
        CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END
     WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END
|| CASE WHEN doc_id % 6 = 0 THEN ''
     WHEN doc_id % 6 = 1 THEN '/a/./b/././c'
     WHEN doc_id % 6 = 2 THEN '/articles/.'
     ELSE '/Articles/' || CAST(doc_id AS VARCHAR) END
|| CASE WHEN doc_id % 2 = 0
        THEN '?z=1&a=' || CAST(doc_id AS VARCHAR) || '&m=x'
     WHEN doc_id % 5 = 2 THEN '?'
     ELSE '' END
|| CASE WHEN doc_id % 2 = 1 THEN '#sec-' || CAST(doc_id AS VARCHAR)
     ELSE '' END
"""

# DuckDB replay of canonicalize_url, step for step
_CANON_DUCK = """
WITH m AS (
  SELECT doc_id, ({messy}) AS url FROM documents WHERE doc_id < 400
), s1 AS (
  SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM m
), s2 AS (
  SELECT doc_id,
         lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
           AS scheme,
         regexp_replace(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', '') AS rest
  FROM s1
), s3 AS (
  SELECT doc_id, scheme,
         regexp_extract(rest, '^([^/?]*)', 1) AS authority,
         regexp_replace(rest, '^([^/?]*)', '') AS pathq
  FROM s2
), s4 AS (
  SELECT doc_id, scheme, pathq,
         regexp_extract(authority, '^([^@]*@)', 1) AS userinfo,
         lower(regexp_replace(regexp_replace(authority, '^[^@]*@', ''),
                              ':[0-9]+$', '')) AS host,
         regexp_extract(regexp_replace(authority, '^[^@]*@', ''),
                        ':([0-9]+)$', 1) AS port
  FROM s3
), s5 AS (
  SELECT doc_id, scheme, userinfo, host,
         CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                   OR (scheme = 'https' AND port = '443')
              THEN '' ELSE ':' || port END AS port_part,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               CASE WHEN regexp_extract(pathq, '^([^?]*)', 1) = ''
                    THEN '/' ELSE regexp_extract(pathq, '^([^?]*)', 1)
               END, '/\\./', '/', 'g'),
             '/\\./', '/', 'g'),
           '/\\.$', '/') AS path,
         regexp_replace(pathq, '^[^?]*', '') AS q
  FROM s4
), s6 AS (
  SELECT doc_id, scheme, userinfo, host, port_part, path,
         list_filter(string_split(regexp_replace(q, '^\\?', ''), '&'),
                     x -> x <> '') AS params
  FROM s5
)
SELECT doc_id,
       scheme || '://' || userinfo || host || port_part || path ||
       CASE WHEN len(params) > 0
            THEN '?' || array_to_string(list_sort(params), '&')
            ELSE '' END AS canonical_url
FROM s6
"""


@query(
    "q_text_url_canonicalize",
    oracle=_CANON_DUCK.format(messy=_MESSY_SQL),
)
def q_text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization inside the hash gate: both engines build
    the SAME messy URL per document (mixed-case scheme/host, userinfo,
    default + explicit ports, dot segments, unsorted/empty query,
    fragment) and canonicalize with their OWN function sets — Spark's
    built-in expressions (whole-stage codegen, zero Python; plan
    pinned map-only) vs the DuckDB step-for-step replay.  One
    divergent rule flips the md5."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 400
    )
    messy = F.expr(_MESSY_SQL.replace("VARCHAR", "STRING"))
    return docs.select(
        "doc_id",
        canonicalize_url(messy.alias("url")).alias("canonical_url"),
    )


@query(
    "q_dedup_url_exact",
    oracle=f"""
WITH c AS ({_CANON_DUCK.format(messy=_MESSY_SQL)})
SELECT canonical_url,
       CAST(count(*) AS BIGINT) AS n_variants,
       CAST(min(doc_id) AS BIGINT) AS keeper_doc
FROM c GROUP BY canonical_url HAVING count(*) > 1
""",
)
def q_dedup_url_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact URL dedup ON the canonical form: variants of one resource
    (case/port/fragment/param-order noise) collapse to one group; the
    keeper is the lowest doc_id (the reference's first-wins upsert
    rule, harvest.py:292).  One canonical projection (codegen'd map)
    feeding one keyed aggregate — at 100 TB the canonicalization rides
    the dedup shuffle that was already happening."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 400
    )
    messy = F.expr(_MESSY_SQL.replace("VARCHAR", "STRING"))
    return (
        docs.select(
            "doc_id", canonicalize_url(messy).alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("keeper_doc"),
        )
        .filter(F.col("n_variants") > 1)
    )
