"""Multimodal columns [X]: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side plumbing is real and tested end-to-end: schema contract,
partitioning before the (potentially 10-100×-cost) per-asset decode,
batch-shaped pandas UDF signature. The actual media decode is stubbed —
image/audio libraries aren't in this container — behind
:func:`decode_image_stub`, which either raises ``NotImplementedError``
(real-decode mode) or produces deterministic fake features (test mode),
exactly as a PIL/librosa implementation would slot in.

Sources at scale: ``spark.read.format("binaryFile")`` for media files on
the lake, or a binary column in parquet (used here).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from smfg_datawarehouse_spark.queries import register, t

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video|text
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("declared_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("feature_ok", T.BooleanType(), True),
    ]
)


def decode_image_stub(payload: bytes, fake: bool = True) -> dict:
    """Placeholder for a real media decode (PIL.Image.open / librosa.load).

    ``fake=True`` → deterministic metadata-only features (no media lib
    needed). ``fake=False`` → the real implementation slot: raises until a
    decode library is available in the runtime.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires an image/audio library not present in "
            "this runtime; wire PIL/librosa here on a real cluster"
        )
    import hashlib

    return {
        "n_bytes": len(payload) if payload is not None else None,
        "content_hash": hashlib.md5(payload).hexdigest() if payload is not None else None,
        "feature_ok": payload is not None and len(payload) > 0,
    }


def extract_features(assets: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Repartitions before the expensive per-asset work so decode parallelism
    tracks cluster cores, not upstream file count — the key scale knob for
    media pipelines where decode dominates I/O.
    """
    n_parts = batch_hint or assets.sparkSession.sparkContext.defaultParallelism

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_image_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "content_hash": [f["content_hash"] for f in feats],
                    "feature_ok": [f["feature_ok"] for f in feats],
                }
            )

    return assets.repartition(n_parts).mapInPandas(batches, FEATURE_SCHEMA)


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Build a binary-asset table from the documents fixture (utf-8 payload)
    — stands in for an image/audio table with identical plumbing."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.col("n_chars").cast("long").alias("declared_bytes"),
        ).alias("meta"),
    )


@register(
    "x30_multimodal_features",
    """
    SELECT doc_id AS asset_id,
           'text' AS kind,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_hash,
           strlen(text) > 0 AS feature_ok
    FROM documents
    """,
)
def x30_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Binary-column feature extraction via mapInPandas (Arrow batches).
    Payloads are utf-8 document bytes here; md5/byte-length features are
    deterministic, so the whole binary pipeline is oracle-checkable."""
    d = t(spark, sf_dir, "documents")
    return extract_features(documents_as_assets(d))
