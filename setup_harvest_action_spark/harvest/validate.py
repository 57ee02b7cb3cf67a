"""Input validation — URI precondition + column-level analogue.

Replicates the reference's validation semantics (reference:
harvest.py:28-51): scheme regex ``^https?://`` raises on failure
(:42-46), non-NERC hosts only warn (:48-49).
"""

from __future__ import annotations

import re
import warnings

import pyspark.sql.functions as F
from pyspark.sql import Column

_SCHEME_RE = re.compile(r"^https?://")
_EXPECTED_HOST = "vocab.nerc.ac.uk"

URI_PATTERN = r"^https?://"


def validate_collection_uri(uri: str) -> bool:
    """Driver-side precondition, same contract as the reference:
    raise ``ValueError`` on a non-http(s) URI, warn on unexpected host."""
    if not isinstance(uri, str) or not _SCHEME_RE.match(uri):
        raise ValueError(f"Invalid collection URI (expected http(s)): {uri!r}")
    if _EXPECTED_HOST not in uri:
        warnings.warn(
            f"URI host is not {_EXPECTED_HOST}; proceeding anyway", stacklevel=2
        )
    return True


def valid_uri_col(col: str = "uri") -> Column:
    """Column-level analogue for bulk validation inside a plan."""
    return F.col(col).rlike(URI_PATTERN)
