"""SQLite-compat export sink (O20): write HarvestState to the
reference's database layout.

The reference's only sink is a SQLite file at a fixed path
(reference: harvest.py:181, :392) with DDL-declared tables
(harvest.py:161-289).  The Spark engine's canonical sink is parquet
(HarvestState.write); this module provides bit-compat interchange for
downstream consumers of ``translations.db``.

Driver-side by design: rows stream through ``toLocalIterator()`` in
batches, so driver memory stays O(batch), but the write itself is a
single process — correct for the compat use-case (the reference's
consumers are single-node SQLite readers), wrong for a 100 TB sink,
and the docstring is the fence: at scale you export an aggregate or a
slice, not the corpus."""

from __future__ import annotations

import itertools
import sqlite3

from pyspark.sql import DataFrame

# Reference DDL, harvest.py:188-213 (types mapped per SURVEY.md §1.3;
# constraints kept so downstream consumers see the same guarantees).
_DDL = """
CREATE TABLE IF NOT EXISTS terms (
    id INTEGER PRIMARY KEY,
    uri TEXT NOT NULL UNIQUE,
    created_at DATETIME,
    updated_at DATETIME
);
CREATE TABLE IF NOT EXISTS term_fields (
    id INTEGER PRIMARY KEY,
    term_id INTEGER NOT NULL,
    field_uri TEXT NOT NULL,
    field_term TEXT NOT NULL,
    original_value TEXT NOT NULL,
    created_at DATETIME,
    updated_at DATETIME,
    FOREIGN KEY (term_id) REFERENCES terms(id) ON DELETE CASCADE,
    UNIQUE(term_id, field_uri, original_value)
);
CREATE INDEX IF NOT EXISTS idx_term_fields_term_id ON term_fields(term_id);
"""

_BATCH = 10_000


def _insert_stream(conn: sqlite3.Connection, table: str, df: DataFrame) -> int:
    cols = df.columns
    sql = f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({', '.join('?' * len(cols))})"
    total = 0
    it = (tuple(str(v) if hasattr(v, "isoformat") else v for v in row) for row in df.toLocalIterator())
    while True:
        batch = list(itertools.islice(it, _BATCH))
        if not batch:
            break
        conn.executemany(sql, batch)
        total += len(batch)
    return total


def export_sqlite(terms: DataFrame, term_fields: DataFrame, db_path: str) -> dict:
    """Write (terms, term_fields) into ``db_path`` with the reference
    DDL, replacing existing contents (the export is a snapshot, like
    the reference's idempotent full harvest).  Returns row counts."""
    conn = sqlite3.connect(db_path)
    try:
        conn.execute("PRAGMA foreign_keys = ON")  # harvest.py:185
        conn.executescript(_DDL)
        conn.execute("DELETE FROM term_fields")
        conn.execute("DELETE FROM terms")
        n_terms = _insert_stream(conn, "terms", terms)
        n_fields = _insert_stream(conn, "term_fields", term_fields)
        conn.commit()
        return {"terms": n_terms, "term_fields": n_fields}
    finally:
        conn.close()
