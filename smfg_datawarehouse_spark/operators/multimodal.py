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
    """Media decode slot (PIL.Image.open; librosa.load for audio).

    ``fake=True`` → deterministic metadata-only features (no media lib
    needed — the driver-certified path in this runtime). ``fake=False`` →
    the REAL decode: attempts PIL and verifies the payload actually
    decodes; raises ``NotImplementedError`` only when no decode library
    exists, so the real path lights up automatically on a cluster with
    the image stack installed (see tests/test_integration_gates.py).
    """
    import hashlib

    if not fake:
        try:
            from PIL import Image
        except ImportError as exc:
            raise NotImplementedError(
                "media decode requires an image library (PIL) not present "
                "in this runtime; install pillow to enable the real path"
            ) from exc
        import io

        ok = payload is not None and len(payload) > 0
        if ok:
            try:
                img = Image.open(io.BytesIO(payload))
                img.load()
            except Exception:
                ok = False
        return {
            "n_bytes": len(payload) if payload is not None else None,
            "content_hash": (
                hashlib.md5(payload).hexdigest() if payload is not None else None
            ),
            "feature_ok": ok,
        }

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


RESIZE_TARGET = 32
FRAME_STRIDE = 4

TRANSFORM_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("orig_w", T.LongType(), True),
        T.StructField("orig_h", T.LongType(), True),
        T.StructField("scale_x", T.DoubleType(), True),
        T.StructField("scale_y", T.DoubleType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("n_sampled", T.LongType(), True),
    ]
)


def decode_dims_stub(payload: bytes, fake: bool = True) -> tuple[int, int, int]:
    """Header-parse slot (PIL.Image.open(...).size / av container probe).
    Fake mode derives deterministic dimensions and a frame count from the
    content hash, so the full resize / frame-sample plumbing is exercised
    — and oracle-checkable — without a media lib. ``fake=False`` attempts
    the real PIL header parse (``n_frames`` for multi-frame containers)
    and raises ``NotImplementedError`` only when PIL is absent. A NULL /
    corrupt / unparseable payload degrades to ``(0, 0, 0)`` — one bad
    row must flag, not fail, the whole resize/frame-sample job (same
    policy as ``decode_image_stub``'s feature_ok=False)."""
    if not fake:
        try:
            from PIL import Image
        except ImportError as exc:
            raise NotImplementedError(
                "media header parse requires an image library (PIL) not "
                "present in this runtime; install pillow to enable it"
            ) from exc
        import io

        if not payload:
            return 0, 0, 0
        try:
            img = Image.open(io.BytesIO(payload))
            w, ht = img.size
            return w, ht, int(getattr(img, "n_frames", 1))
        except Exception:
            return 0, 0, 0
    import hashlib

    h = hashlib.md5(payload).hexdigest()
    w = 16 + int(h[0:2], 16) % 64
    ht = 16 + int(h[2:4], 16) % 64
    n_frames = 8 + int(h[4:6], 16) % 56
    return w, ht, n_frames


def resize_and_sample(assets: DataFrame, target: int = RESIZE_TARGET,
                      stride: int = FRAME_STRIDE) -> DataFrame:
    """Image-resize + video-frame-sample metadata pass over binary payloads
    (Arrow-batched ``mapInPandas``; repartitioned so decode parallelism
    tracks cores, not file count). In a real deployment the same batch
    shape carries the resized pixel buffers / sampled frames as binary
    columns; here the decode is the deterministic stub above."""
    n_parts = assets.sparkSession.sparkContext.defaultParallelism

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [decode_dims_stub(p) for p in pdf["payload"]]
            w = pd.Series([d[0] for d in dims], dtype="int64")
            h = pd.Series([d[1] for d in dims], dtype="int64")
            nf = pd.Series([d[2] for d in dims], dtype="int64")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "orig_w": w,
                    "orig_h": h,
                    "scale_x": float(target) / w,
                    "scale_y": float(target) / h,
                    "n_frames": nf,
                    "n_sampled": (nf + stride - 1) // stride,
                }
            )

    return assets.repartition(n_parts).mapInPandas(batches, TRANSFORM_SCHEMA)


_HEX = "strpos('0123456789abcdef', substring({h}, {i}, 1)) - 1"


def _hex2(h: str, i: int) -> str:
    """Two hex digits of md5 column expression ``h`` at 1-based pos i."""
    return f"(({_HEX.format(h=h, i=i)}) * 16 + ({_HEX.format(h=h, i=i + 1)}))"


_RESIZE_ORACLE = f"""
    WITH hashed AS (SELECT doc_id, md5(text) AS h FROM documents),
    dims AS (
      SELECT doc_id,
             16 + {_hex2('h', 1)} % 64 AS orig_w,
             16 + {_hex2('h', 3)} % 64 AS orig_h,
             8 + {_hex2('h', 5)} % 56 AS n_frames
      FROM hashed
    )
    SELECT doc_id AS asset_id, 'text' AS kind,
           CAST(orig_w AS BIGINT) AS orig_w,
           CAST(orig_h AS BIGINT) AS orig_h,
           CAST({RESIZE_TARGET} AS DOUBLE) / orig_w AS scale_x,
           CAST({RESIZE_TARGET} AS DOUBLE) / orig_h AS scale_y,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST((n_frames + {FRAME_STRIDE} - 1) // {FRAME_STRIDE} AS BIGINT) AS n_sampled
    FROM dims
"""


@register("x31_multimodal_resize_sample", _RESIZE_ORACLE)
def x31_multimodal_resize_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[X] Resize / frame-sample plumbing over binary assets: dimensions and
    frame counts come from the (stubbed, hash-deterministic) decode; scale
    factors and sampled-frame counts are computed in the Arrow batch —
    the exact pipeline shape a PIL/pyav decode slots into."""
    d = t(spark, sf_dir, "documents")
    return resize_and_sample(documents_as_assets(d))
