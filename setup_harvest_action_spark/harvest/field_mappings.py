"""SKOS field mapping lookup — the broadcast side of the unpivot.

The reference declares 7 SKOS properties (reference: harvest.py:17-25)
but its harvest query only selects 3 of them (reference: harvest.py:74),
so ``notation``/``broader``/``narrower``/``related`` are dead on the
default path (SURVEY.md §1.2 "dead-field drift").  We keep all 7
config-driven and default the pipeline to the effective 3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_SKOS = "http://www.w3.org/2004/02/skos/core#"

# field_name -> (field_uri, field_term)
FIELD_MAPPINGS: dict[str, tuple[str, str]] = {
    "prefLabel": (f"{_SKOS}prefLabel", "skos:prefLabel"),
    "altLabel": (f"{_SKOS}altLabel", "skos:altLabel"),
    "definition": (f"{_SKOS}definition", "skos:definition"),
    "notation": (f"{_SKOS}notation", "skos:notation"),
    "broader": (f"{_SKOS}broader", "skos:broader"),
    "narrower": (f"{_SKOS}narrower", "skos:narrower"),
    "related": (f"{_SKOS}related", "skos:related"),
}

# The fields the reference's SELECT actually binds (harvest.py:74).
EFFECTIVE_FIELDS: tuple[str, ...] = ("prefLabel", "altLabel", "definition")


def field_mappings_df(
    spark: SparkSession, fields: tuple[str, ...] = EFFECTIVE_FIELDS
) -> DataFrame:
    """The (field_name, field_uri, field_term) lookup as a tiny DataFrame —
    always the broadcast side of the unpivot join."""
    rows = [(name, *FIELD_MAPPINGS[name]) for name in fields]
    return spark.createDataFrame(rows, "field_name string, field_uri string, field_term string")
