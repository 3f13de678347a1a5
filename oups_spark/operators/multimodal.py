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


def _pil_image_bytes(payload: bytes):
    """Decoded pixel bytes via PIL when (a) PIL is importable and
    (b) the payload actually parses as an image — None otherwise.
    Runs executor-side inside the Arrow batch, so the import cost is
    per Python worker, not per row."""
    try:
        from PIL import Image
    except ImportError:
        return None
    import io

    try:
        img = Image.open(io.BytesIO(payload))
        img.load()
    except Exception:
        return None
    return img.tobytes()


def decode_stub(payload: bytes, *, decoder: str = "auto") -> dict:
    """Media decode with an optional real backend: ``'pil'`` computes
    the features over DECODED pixel bytes (raises when PIL is absent
    or the payload is not an image), ``'stub'`` over the raw payload
    bytes (deterministic — tests assert exact values end-to-end), and
    ``'auto'`` upgrades to PIL when it is importable AND the payload
    parses, falling back to the stub otherwise. Either way the
    feature formula is the same function of the chosen byte stream,
    so the operator upgrades automatically outside this sandbox
    (which ships no PIL/ffmpeg) without changing shape or schema.
    """
    if decoder not in ("auto", "pil", "stub"):
        # reject typos ('PIL', 'ffmpeg') up front: silently taking the
        # stub path would hand a caller expecting real decode fake
        # features without error
        raise ValueError(
            f"decoder must be 'auto', 'pil' or 'stub', got {decoder!r}"
        )
    if payload is None:
        raise NotImplementedError(
            "real media decode not available in this environment"
        )
    stream = None
    if decoder in ("auto", "pil"):
        stream = _pil_image_bytes(payload)
        if stream is None and decoder == "pil":
            raise NotImplementedError(
                "decoder='pil' requires PIL and a decodable image payload"
            )
    if stream is None:
        stream = payload
    n = len(payload)
    checksum = sum(stream) % (1 << 31)
    mean = (sum(stream) / len(stream)) if stream else 0.0
    return {"n_bytes": n, "checksum": checksum, "mean_byte": mean, "feat_dim": 8}


def extract_features(
    media: DataFrame, *, batch_hint: int = 64, decoder: str = "auto"
) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``.

    ``decoder``: ``'auto'`` (PIL when available, stub fallback),
    ``'pil'`` (require real decode), ``'stub'`` (force deterministic
    fake features — what the oracle-checked queries pin)."""
    if decoder not in ("auto", "pil", "stub"):
        # fail driver-side at plan time, not per-row in executors
        raise ValueError(
            f"decoder must be 'auto', 'pil' or 'stub', got {decoder!r}"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p, decoder=decoder) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", LongType()),
    ]
)


def sample_frames(
    media: DataFrame,
    *,
    frame_bytes: int = 32,
    every_n: int = 2,
    max_frames: int = 4,
) -> DataFrame:
    """Video-style frame sampling: each payload is treated as a
    sequence of ``frame_bytes``-sized frames; every ``every_n``-th
    frame (up to ``max_frames``) becomes ONE OUTPUT ROW with per-frame
    features — the row-EXPANDING ``mapInPandas`` shape real video
    decode drops into (a production version would seek keyframes with
    ffmpeg instead of slicing bytes; the Arrow batch iteration,
    1-to-many row fan-out, and schema contract are identical)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, sizes, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = -(-len(payload) // frame_bytes) if payload else 0
                for fi in range(0, n_frames, every_n)[:max_frames]:
                    fb = payload[fi * frame_bytes : (fi + 1) * frame_bytes]
                    ids.append(doc_id)
                    fidx.append(fi)
                    sizes.append(len(fb))
                    sums.append(sum(fb) % (1 << 31))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int64"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_payloads(media: DataFrame, *, target_bytes: int) -> DataFrame:
    """Resize plumbing: binary in → binary out through an Arrow batch
    (truncate-or-zero-pad STUB in place of a real resampling kernel).
    Output schema matches the input media schema with updated
    payload/width metadata, so resized tables feed every downstream
    media operator unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                (p or b"")[:target_bytes].ljust(target_bytes, b"\x00")
                for p in pdf["payload"]
            ]
            out["width"] = target_bytes
            out["height"] = 1
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)
