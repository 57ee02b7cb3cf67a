"""Multimodal column handling: opaque binary payloads + typed metadata,
with Pandas-UDF decode/feature-extract plumbing.

LLM-pipeline pillar (SURVEY.md §2.2).  The model for image/audio/video
at 100 TB: store the raw bytes as an opaque ``binary`` column with
typed metadata beside it; decode/resize/frame-sample run as
Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
Python row-by-row.

The container has no image/audio libraries, so the real decoder is
STUBBED: ``decode_image`` raises ``NotImplementedError`` unless a
decoder (PIL) is importable, and the pipeline runs a deterministic
byte-statistics extractor instead.  The Spark-side plumbing — schema,
Arrow batching, partitioning, UDF signature — is real and tested; only
the pixel math is fake.  Fixture payloads are the UTF-8 bytes of
``documents.text`` (deterministic, size-varied).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.io.loaders import load_table

FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, byte_mean double, byte_min int, byte_max int, "
    "format string"
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque payload + typed metadata columns — the storage
    shape for any modality: (payload binary, media_type, n_bytes)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
    )


def decode_image(payload: bytes):
    """Real decoder — requires an image library, absent in this
    container.  The plumbing around it is exercised with the
    deterministic fake below."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires PIL; container ships none — "
            "use extract_byte_features for the plumbing path"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))


def extract_byte_features(batches: Iterator, *, fmt: str = "bytes"):
    """mapInPandas feature extractor (deterministic fake decode): per
    payload, byte-level statistics standing in for pixel statistics.
    Receives Arrow record batches as pandas DataFrames — the bytes
    arrive zero-copy batched, never row-at-a-time pickled."""
    import pandas as pd

    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(p) for p in payloads],
                "byte_mean": [
                    (sum(p) / len(p)) if len(p) else 0.0 for p in payloads
                ],
                "byte_min": [min(p) if len(p) else 0 for p in payloads],
                "byte_max": [max(p) if len(p) else 0 for p in payloads],
                "format": fmt,
            }
        )


@query(
    "q_multimodal_metadata",
    oracle="""
SELECT doc_id,
       'text/plain' AS media_type,
       CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
       md5(text) AS content_hash,
       CAST(octet_length(CAST(text AS BLOB)) BETWEEN 64 AND 4096 AS BOOLEAN)
           AS size_gate
FROM documents
""",
)
def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads: size, content hash,
    admission gate — computed JVM-side without ever decoding."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.octet_length(payload).alias("n_bytes"),
        F.md5(payload).alias("content_hash"),
        F.octet_length(payload).between(64, 4096).alias("size_gate"),
    )


@query("q_multimodal_features")
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``:
    Arrow-batched bytes → per-payload statistics (the deterministic
    stand-in for image decode + pixel stats — see module docstring).

    Partition shape: the input repartitions by doc_id range so batch
    sizes stay bounded (spark.sql.execution.arrow.maxRecordsPerBatch
    caps rows per Arrow batch); output schema is declared, stable, and
    column-pruned upstream (only doc_id + payload are read).  No
    oracle: mapInPandas is outside DuckDB — determinism + exact values
    on a sample are asserted in tests/test_llm_functions.py."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = with_binary_payload(docs).select("doc_id", "payload")
    return payloads.mapInPandas(extract_byte_features, FEATURE_SCHEMA)


@query(
    "q_multimodal_modality_mix",
    oracle="""
SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       CAST(count(*) AS BIGINT) AS n_assets,
       CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
       CAST(round(avg(octet_length(CAST(text AS BLOB))), 4) AS DOUBLE) AS avg_bytes
FROM documents
GROUP BY 1
""",
)
def q_multimodal_modality_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage accounting by modality (synthetic modality assignment —
    the fixture has one real modality): the partition-pruning shape a
    mixed-modality lakehouse reports on.  At scale the modality column
    is the partition key, making per-modality scans prune to their
    files."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return (
        docs.select(modality.alias("modality"), F.octet_length(payload).alias("nb"))
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("nb").cast("long").alias("total_bytes"),
            F.round(F.avg("nb"), 4).alias("avg_bytes"),
        )
    )
