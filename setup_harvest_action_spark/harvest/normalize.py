"""Wide→long normalization (the reference's unpivot, O12).

The reference fans each SPARQL binding row out into up to one
``(term, field_uri, field_term, original_value)`` row per non-null
field (reference: harvest.py:359-372, mapping table at :17-25).  Here
that is a single declarative ``unpivot`` (Catalyst ``Expand`` node —
no shuffle, no Python) followed by a broadcast join against the
7-row field-mapping lookup.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from setup_harvest_action_spark.harvest.field_mappings import (
    EFFECTIVE_FIELDS,
    field_mappings_df,
)


def clean_bindings(bindings: DataFrame) -> DataFrame:
    """Drop rows with a missing/empty concept — the reference's skip
    path (harvest.py:321-323)."""
    return bindings.filter(
        F.col("concept").isNotNull() & (F.col("concept") != "")
    )


def unpivot_bindings(
    bindings: DataFrame, fields: tuple[str, ...] = EFFECTIVE_FIELDS
) -> DataFrame:
    """Melt wide bindings into long (concept, field_uri, field_term,
    original_value) rows.

    * null values are dropped — the ``if field_value:`` guard
      (harvest.py:361); empty strings are dropped for the same reason
      (Python falsiness of ``""``);
    * duplicates collapse via ``dropDuplicates`` — the composite
      UNIQUE(term, field, value) key (harvest.py:210);
    * the field lookup joins broadcast (7 rows).
    """
    spark = bindings.sparkSession
    present = [f for f in fields if f in bindings.columns]
    long = clean_bindings(bindings).unpivot(
        ids=["concept"],
        values=present,
        variableColumnName="field_name",
        valueColumnName="original_value",
    )
    long = long.filter(
        F.col("original_value").isNotNull() & (F.col("original_value") != "")
    )
    lookup = F.broadcast(field_mappings_df(spark, tuple(present)))
    return (
        long.join(lookup, "field_name")
        .select("concept", "field_uri", "field_term", "original_value")
        .dropDuplicates(["concept", "field_uri", "original_value"])
    )
