"""Constraint assertion pack: UNIQUE / FK / CHECK as validating plans.

Spark enforces none of SQLite's declarative constraints, so the
reference's schema guarantees (UNIQUE at harvest.py:192, 210, 230,
246; FK + ON DELETE CASCADE at :185, :204, :220, :240, :256; CHECK
domains at :221-223, :244) become load-time validating DataFrames
here (SURVEY.md §1.3):

  * UNIQUE      → ``duplicate_keys``: groupBy(keys).count > 1
  * FK          → ``fk_orphans``: child left_anti parent
  * CHECK IN    → ``domain_violations``: ~col.isin(allowed)
  * NOT NULL    → ``null_violations``: col.isNull()

Each check returns the VIOLATING rows (empty = constraint holds), so
callers can fail fast, quarantine, or report.  All are single-shuffle
aggregates/joins on the key columns only — at 100 TB each check costs
one pass over the keys, and the anti-joins broadcast whenever the
parent key set is small.

``cascade_delete`` implements ON DELETE CASCADE as a left_semi join
against surviving parents.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from setup_harvest_action_spark.schemas import (
    APPEAL_STATUSES,
    TRANSLATION_LANGUAGES,
    TRANSLATION_STATUSES,
)


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """UNIQUE violation check: key tuples appearing more than once,
    with their multiplicity."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """FK violation check: child rows whose key has no parent.  The
    probe carries only the key column; Catalyst plans a broadcast
    anti-join when the parent side is small."""
    parents = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return child.join(parents, child_key, "left_anti")


def domain_violations(df: DataFrame, column: str, allowed: Sequence[str]) -> DataFrame:
    """CHECK(col IN (...)) violation check."""
    return df.filter(~F.col(column).isin(list(allowed)) | F.col(column).isNull())


def null_violations(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """NOT NULL violation check over several columns at once."""
    cond = F.lit(False)
    for c in columns:
        cond = cond | F.col(c).isNull()
    return df.filter(cond)


def cascade_delete(child: DataFrame, parent: DataFrame, child_key: str, parent_key: str) -> DataFrame:
    """ON DELETE CASCADE (harvest.py:204): keep only child rows whose
    parent survives — a left_semi join on the key."""
    parents = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return child.join(parents, child_key, "left_semi")


def check_harvest_state(terms: DataFrame, term_fields: DataFrame) -> DataFrame:
    """All harvest-table constraints as one (constraint, violations)
    report — the reference's schema contract, checkable in one pass:

      * UNIQUE(terms.uri)                        (harvest.py:192)
      * UNIQUE(terms.id) — surrogate pk
      * UNIQUE(term_fields: term_id, field_uri, original_value)
                                                 (harvest.py:210)
      * FK term_fields.term_id → terms.id        (harvest.py:204)
      * NOT NULL on all declared non-nullables

    LAZY: the six checks are unioned into one plan (the
    q_constraint_report pattern) — constructing the report launches no
    Spark jobs, and a single action evaluates every check as parallel
    stages of one job instead of six serial driver-side counts."""

    def tally(name: str, violations: DataFrame) -> DataFrame:
        return violations.agg(F.count(F.lit(1)).alias("violations")).select(
            F.lit(name).alias("constraint"), "violations"
        )

    checks = [
        tally("unique_terms_uri", duplicate_keys(terms, ["uri"])),
        tally("unique_terms_id", duplicate_keys(terms, ["id"])),
        tally(
            "unique_term_fields_composite",
            duplicate_keys(term_fields, ["term_id", "field_uri", "original_value"]),
        ),
        tally(
            "fk_term_fields_term_id",
            fk_orphans(term_fields, terms, "term_id", "id"),
        ),
        tally("notnull_terms", null_violations(terms, ["id", "uri"])),
        tally(
            "notnull_term_fields",
            null_violations(
                term_fields, ["id", "term_id", "field_uri", "original_value"]
            ),
        ),
    ]
    report = checks[0]
    for c in checks[1:]:
        report = report.unionByName(c)
    return report


# Domains re-exported for load-time CHECK assertions on downstream
# tables (translations/appeals — reference: harvest.py:221-223, :244).
DOMAINS = {
    ("translations", "language"): TRANSLATION_LANGUAGES,
    ("translations", "status"): TRANSLATION_STATUSES,
    ("appeals", "status"): APPEAL_STATUSES,
}
