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


FRAME_BYTES = 256  # bytes per synthetic "frame"
FRAME_STRIDE = 4  # keep every 4th frame
THUMB_BYTES = 64  # fake-resize output size


def fake_resize(payload: bytes, out_len: int = THUMB_BYTES) -> bytes:
    """Deterministic stand-in for image resize: stride-sample the bytes
    down to ``out_len`` (nearest-neighbor over the byte axis).  The real
    ``decode_image`` + PIL ``Image.resize`` slots in here unchanged when
    a decoder is present."""
    if len(payload) <= out_len:
        return bytes(payload)
    stride = len(payload) / out_len
    return bytes(payload[int(i * stride)] for i in range(out_len))


def sample_frames(batches: Iterator, *, frame_bytes: int = FRAME_BYTES,
                  stride: int = FRAME_STRIDE):
    """mapInPandas frame sampler — the 1→N fan-out shape of video
    processing: each payload ("video") splits into fixed-size byte
    frames, every ``stride``-th frame is kept, and per-frame statistics
    are emitted.  Arrow carries the bytes batched both ways; one input
    row yields many output rows without any driver involvement."""
    import hashlib

    import pandas as pd

    for pdf in batches:
        out_doc, out_idx, out_n, out_md5, out_mean = [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            p = bytes(payload)
            n_frames = (len(p) + frame_bytes - 1) // frame_bytes
            for idx in range(0, n_frames, stride):
                frame = p[idx * frame_bytes : (idx + 1) * frame_bytes]
                out_doc.append(doc_id)
                out_idx.append(idx)
                out_n.append(len(frame))
                out_md5.append(hashlib.md5(frame).hexdigest())
                out_mean.append(sum(frame) / len(frame))
        yield pd.DataFrame(
            {
                "doc_id": out_doc,
                "frame_idx": out_idx,
                "n_frame_bytes": out_n,
                "frame_md5": out_md5,
                "frame_mean": out_mean,
            }
        )


@query("q_multimodal_frame_sample")
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads (the video path of the
    multimodal pillar): mapInPandas splits each payload into 256-byte
    frames, keeps every 4th, and emits per-frame size/hash/statistics —
    a 1→N Arrow-batched fan-out with a declared schema.

    At 100 TB the input is partitioned by asset id so frames of one
    asset stay in one task, and the decoder (here the deterministic
    byte-splitter; in production an ffmpeg/PIL call inside the same
    iterator) runs where the bytes live.  No oracle (byte slicing is
    outside DuckDB); exact per-frame values on a sample are asserted in
    tests/test_llm_functions.py."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = with_binary_payload(docs).select("doc_id", "payload")
    return payloads.mapInPandas(
        sample_frames,
        "doc_id long, frame_idx int, n_frame_bytes int, frame_md5 string, "
        "frame_mean double",
    )


@query("q_multimodal_thumbnail")
def q_multimodal_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize path of the multimodal pillar: per-payload fake resize
    (stride byte-sampling standing in for PIL ``Image.resize`` — see
    ``fake_resize``) emitting the thumbnail bytes + integrity hash.
    1→1 mapInPandas: bytes in, smaller bytes out, schema declared.
    No oracle; determinism + output-size bound asserted in tests."""
    import hashlib

    import pandas as pd

    def thumbs(batches: Iterator):
        for pdf in batches:
            tb = [fake_resize(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": tb,
                    "thumb_bytes": [len(t) for t in tb],
                    "thumb_md5": [hashlib.md5(t).hexdigest() for t in tb],
                }
            )

    docs = load_table(spark, sf_dir, "documents")
    payloads = with_binary_payload(docs).select("doc_id", "payload")
    return payloads.mapInPandas(
        thumbs, "doc_id long, thumb binary, thumb_bytes int, thumb_md5 string"
    )
