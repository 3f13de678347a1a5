"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched pandas functions over
``mapInPandas``.

The decode/feature-extraction inner step is STUBBED (image/audio
libraries are not in this container): ``decode_stub`` produces
deterministic fake features from the payload bytes, clearly marked.
Everything around it — schema, binary packing, batch iteration,
partition-size control — is the real Spark plumbing a production
decode would drop into.

Scale posture: payloads never pass through the driver;
``mapInPandas`` streams Arrow batches executor-side, and
``spark.sql.files.maxPartitionBytes`` (not row count) governs batch
memory, which is what matters when each row carries a multi-MB blob.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("feat_dim", LongType()),
    ]
)


def pack_documents_as_media(docs: DataFrame) -> DataFrame:
    """Treat each document's text bytes as an opaque media payload
    with typed metadata — the ingest shape for image/audio tables."""
    return docs.select(
        F.col("doc_id"),
        F.lit("text/fake-image").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").cast("binary").alias("payload"),
        F.col("n_chars").alias("width"),
        F.lit(1).alias("height"),
    )


def decode_stub(payload: bytes) -> dict:
    """STUB decode: a real implementation would call PIL/ffmpeg here.

    Deterministic fake features derived from the bytes so tests can
    assert exact values end-to-end.
    """
    if payload is None:
        raise NotImplementedError(
            "real media decode not available in this environment"
        )
    n = len(payload)
    checksum = sum(payload) % (1 << 31)
    mean = (sum(payload) / n) if n else 0.0
    return {"n_bytes": n, "checksum": checksum, "mean_byte": mean, "feat_dim": 8}


def extract_features(media: DataFrame, *, batch_hint: int = 64) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
