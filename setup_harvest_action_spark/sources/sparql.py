"""Live SPARQL source: paginated distributed fetch with 502 backoff.

Replicates the reference's remote read path (O1/O8/O10) Spark-first:

  * query construction (reference: harvest.py:54-87) — same SPARQL
    text: DISTINCT projection, skos:member filter, three OPTIONALs,
    ORDER BY ?concept, LIMIT/OFFSET;
  * member-count pre-query (harvest.py:90-113) sizes the page range;
  * retry with exponential backoff on HTTP 502 only (harvest.py:116-158,
    backoff at :150): delay = base_delay · 2^attempt, max_retries;
  * pagination (harvest.py:405-416): 1000-row pages — but fetched IN
    PARALLEL: ``spark.range(n_pages)`` distributes page offsets across
    executors and ``mapInPandas`` fetches + parses each page where it
    runs, so ingest scales with executors instead of a serial driver
    loop.

The HTTP transport is injectable (a picklable callable
``query_text -> SPARQL-JSON dict``): production wires urllib against
the endpoint; tests and the catalog query wire a deterministic fake.
No network is touched unless a caller provides a real transport.
"""

from __future__ import annotations

import json
import time
import urllib.parse
import urllib.request
from collections.abc import Callable, Iterator
from urllib.error import HTTPError

from pyspark.sql import DataFrame, SparkSession

from setup_harvest_action_spark.harvest.validate import validate_collection_uri
from setup_harvest_action_spark.schemas import SPARQL_BINDINGS

Transport = Callable[[str], dict]

SPARQL_ENDPOINT = "http://vocab.nerc.ac.uk/sparql/"  # reference: harvest.py:14
DEFAULT_PAGE_SIZE = 1000  # reference: harvest.py:405


class UrllibTransport:
    """Production HTTP transport (the reference's wire protocol,
    harvest.py:102-106, 144-147): POST the query text form-encoded and
    ask for ``application/sparql-results+json``.  A plain class so it
    is picklable with stock pickle — instances ship to executors inside
    the ``sparql_source`` mapInPandas fetch.  HTTP errors propagate as
    ``urllib.error.HTTPError`` so ``fetch_with_backoff`` sees the 502
    status exactly as the reference does (harvest.py:149).

    Never constructed by default anywhere — tests and the catalog use
    ``FakeSparqlEndpoint``; the network is opt-in via the CLI's
    ``--endpoint`` flag."""

    def __init__(self, endpoint_url: str = SPARQL_ENDPOINT, timeout: float = 60.0):
        self.endpoint_url = endpoint_url
        self.timeout = timeout

    def __call__(self, query_text: str) -> dict:
        data = urllib.parse.urlencode({"query": query_text}).encode("utf-8")
        req = urllib.request.Request(
            self.endpoint_url,
            data=data,
            headers={
                "Accept": "application/sparql-results+json",
                "Content-Type": "application/x-www-form-urlencoded",
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))


def create_sparql_query(
    collection_uri: str,
    limit: int | None = None,
    offset: int | None = None,
    concept_uri: str | None = None,
) -> str:
    """The reference's harvest SELECT, verbatim semantics
    (harvest.py:54-87).  The URI is validated before interpolation —
    same guard, same injection posture.  ``concept_uri`` adds a
    server-side ``FILTER(?concept = <uri>)`` — the pushdown hook the
    Python DataSource uses to ship an equality predicate to the
    endpoint instead of scanning every page."""
    validate_collection_uri(collection_uri)
    concept_filter = ""
    if concept_uri is not None:
        validate_collection_uri(concept_uri)
        concept_filter = f"\n        FILTER(?concept = <{concept_uri}>)"
    query = f"""
    PREFIX skos: <http://www.w3.org/2004/02/skos/core#>

    SELECT DISTINCT ?concept ?prefLabel ?altLabel ?definition
    WHERE {{
        <{collection_uri}> skos:member ?concept .{concept_filter}
        OPTIONAL {{ ?concept skos:prefLabel ?prefLabel }}
        OPTIONAL {{ ?concept skos:altLabel ?altLabel }}
        OPTIONAL {{ ?concept skos:definition ?definition }}
    }}
    ORDER BY ?concept
    """
    if limit is not None:
        query += f"\nLIMIT {limit}"
    if offset is not None:
        query += f"\nOFFSET {offset}"
    return query


def create_count_query(collection_uri: str) -> str:
    """COUNT(DISTINCT ?concept) pre-query (harvest.py:90-101)."""
    validate_collection_uri(collection_uri)
    return f"""
    PREFIX skos: <http://www.w3.org/2004/02/skos/core#>
    SELECT (COUNT(DISTINCT ?concept) AS ?count)
    WHERE {{
        <{collection_uri}> skos:member ?concept .
    }}
    """


def fetch_with_backoff(
    transport: Transport,
    query_text: str,
    max_retries: int = 3,
    base_delay: float = 1.0,
    sleep: Callable[[float], None] = time.sleep,
) -> dict:
    """Execute one query with the reference's retry contract
    (harvest.py:144-158): retry ONLY on HTTP 502, at most
    ``max_retries`` attempts, sleeping base_delay · 2^attempt between
    them; any other error (and the final 502) raises."""
    for attempt in range(max_retries):
        try:
            return transport(query_text)
        except HTTPError as exc:
            if exc.code == 502 and attempt < max_retries - 1:
                sleep(base_delay * (2**attempt))
                continue
            raise RuntimeError(f"SPARQL query failed: {exc}") from exc
    raise AssertionError("unreachable")


def get_member_count(transport: Transport, collection_uri: str) -> int:
    """Scalar count execution (harvest.py:102-113)."""
    results = fetch_with_backoff(transport, create_count_query(collection_uri))
    bindings = results.get("results", {}).get("bindings", [])
    if bindings and "count" in bindings[0]:
        return int(bindings[0]["count"]["value"])
    raise RuntimeError("Could not retrieve member count from SPARQL endpoint.")


def bindings_to_rows(results: dict) -> list[tuple]:
    """SPARQL JSON results → (concept, prefLabel, altLabel, definition)
    tuples.  OPTIONAL absence becomes None (the key-absence-is-null
    semantics of harvest.py:360)."""
    rows = []
    for b in results.get("results", {}).get("bindings", []):
        rows.append(
            tuple(
                b.get(var, {}).get("value")
                for var in ("concept", "prefLabel", "altLabel", "definition")
            )
        )
    return rows


def sparql_source(
    spark: SparkSession,
    collection_uri: str,
    transport: Transport,
    page_size: int = DEFAULT_PAGE_SIZE,
    max_retries: int = 3,
    base_delay: float = 1.0,
) -> DataFrame:
    """Distributed paginated read of a SKOS collection as a bindings
    DataFrame.

    The count pre-query sizes the page range on the driver; the pages
    themselves are fetched by executors — ``spark.range(n_pages)``
    hash-distributes offsets and each task runs fetch+parse for its
    pages with the same 502-backoff.  Task-level retries
    (spark.task.maxFailures) cover everything the app-level backoff
    doesn't.  One remote page fetch per task keeps memory bounded at
    page_size rows."""
    member_count = get_member_count(transport, collection_uri)
    n_pages = max((member_count + page_size - 1) // page_size, 0)
    if n_pages == 0:
        return spark.createDataFrame([], SPARQL_BINDINGS)

    pages = spark.range(0, n_pages)

    def fetch_pages(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for page_id in pdf["id"]:
                query_text = create_sparql_query(
                    collection_uri,
                    limit=page_size,
                    offset=int(page_id) * page_size,
                )
                results = fetch_with_backoff(
                    transport, query_text, max_retries, base_delay
                )
                out.extend(bindings_to_rows(results))
            yield pd.DataFrame(
                out, columns=["concept", "prefLabel", "altLabel", "definition"]
            )

    return pages.mapInPandas(
        fetch_pages, "concept string, prefLabel string, altLabel string, definition string"
    )


class FakeSparqlEndpoint:
    """Deterministic in-memory SPARQL endpoint for tests and the
    catalog query: serves a synthetic SKOS collection of ``n_concepts``
    with reference-shaped optionality (altLabel on every 2nd concept,
    a second altLabel cross-product row on every 5th, definition on
    every 3rd).  Picklable: safe to ship to executors.

    ``fail_502_first`` makes the first N calls raise HTTP 502 — the
    backoff path under test."""

    def __init__(self, n_concepts: int = 2500, fail_502_first: int = 0):
        self.n_concepts = n_concepts
        self.fail_502_first = fail_502_first
        self.calls = 0

    @staticmethod
    def _concept(i: int) -> dict:
        row = {
            "concept": {
                "type": "uri",
                "value": f"http://vocab.example/collection/c{i:05d}",
            },
            "prefLabel": {"type": "literal", "value": f"Term {i}"},
        }
        if i % 2 == 0:
            row["altLabel"] = {"type": "literal", "value": f"Alt {i}"}
        if i % 3 == 0:
            row["definition"] = {"type": "literal", "value": f"Definition of term {i}"}
        return row

    def rows(self) -> list[dict]:
        out = []
        for i in range(self.n_concepts):
            row = self._concept(i)
            out.append(row)
            if i % 5 == 0 and i % 2 == 0:
                extra = dict(row)
                extra["altLabel"] = {"type": "literal", "value": f"Alt {i} bis"}
                out.append(extra)
        return out

    def __call__(self, query_text: str) -> dict:
        self.calls += 1
        if self.calls <= self.fail_502_first:
            raise HTTPError("http://fake", 502, "Proxy Error", None, None)
        if "COUNT(DISTINCT ?concept)" in query_text:
            return {
                "results": {
                    "bindings": [
                        {"count": {"type": "literal", "value": str(self.n_concepts)}}
                    ]
                }
            }
        import re

        limit = re.search(r"LIMIT (\d+)", query_text)
        offset = re.search(r"OFFSET (\d+)", query_text)
        concept = re.search(r"FILTER\(\?concept = <([^>]+)>\)", query_text)
        rows = self.rows()
        if concept:
            return {
                "results": {
                    "bindings": [
                        r
                        for r in rows
                        if r["concept"]["value"] == concept.group(1)
                    ]
                }
            }
        # LIMIT/OFFSET page over DISTINCT CONCEPTS, not rows — a
        # concept's cross-product rows travel together, like a real
        # endpoint ordering by ?concept.
        lo = int(offset.group(1)) if offset else 0
        hi = lo + int(limit.group(1)) if limit else len(rows)
        page = [
            r
            for r in rows
            if lo <= int(r["concept"]["value"][-5:]) < hi
        ]
        return {"results": {"bindings": page}}
