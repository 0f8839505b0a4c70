"""Sandbox-limited slots, gated so they light up automatically when the
environment provides the missing piece — skipped-not-silent here.

- S1 JDBC round-trip: needs a reachable database. Export
  ``SPARK_GRAFT_JDBC_URL`` (a full jdbc: URL with credentials or paired
  with SPARK_GRAFT_JDBC_USER/PASSWORD) and ``SPARK_GRAFT_JDBC_TABLE`` on
  a real cluster and this test exercises the partitioned read end-to-end.
- Real media decode: needs PIL. ``pip install pillow`` anywhere and the
  fake=False slots run a real decode instead of raising.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

HAS_PIL = importlib.util.find_spec("PIL") is not None
JDBC_URL = os.environ.get("SPARK_GRAFT_JDBC_URL")
JDBC_TABLE = os.environ.get("SPARK_GRAFT_JDBC_TABLE")


@pytest.mark.skipif(
    not (JDBC_URL and JDBC_TABLE),
    reason="no reachable JDBC database (set SPARK_GRAFT_JDBC_URL + "
    "SPARK_GRAFT_JDBC_TABLE to enable the S1 round-trip)",
)
def test_jdbc_round_trip(spark):
    from smfg_datawarehouse_spark.sources.jdbc import (
        jdbc_reader_options,
        read_jdbc,
    )

    opts = jdbc_reader_options(
        JDBC_URL,
        JDBC_TABLE,
        is_query=False,
        user=os.environ.get("SPARK_GRAFT_JDBC_USER"),
        password=os.environ.get("SPARK_GRAFT_JDBC_PASSWORD"),
    )
    df = read_jdbc(spark, opts)
    assert df.count() >= 0
    assert len(df.columns) > 0


@pytest.mark.skipif(not HAS_PIL, reason="PIL not installed (pip install pillow)")
def test_real_image_decode_features():
    import io

    from PIL import Image

    from smfg_datawarehouse_spark.operators.multimodal import (
        decode_dims_stub,
        decode_image_stub,
    )

    buf = io.BytesIO()
    Image.new("RGB", (40, 24)).save(buf, format="PNG")
    png = buf.getvalue()

    feats = decode_image_stub(png, fake=False)
    assert feats["feature_ok"] is True
    assert feats["n_bytes"] == len(png)

    w, h, n_frames = decode_dims_stub(png, fake=False)
    assert (w, h, n_frames) == (40, 24, 1)

    # corrupt payload: decodes to feature_ok=False, never crashes the batch
    assert decode_image_stub(b"not an image", fake=False)["feature_ok"] is False


def test_fake_false_raises_not_implemented_without_pil():
    """In this sandbox (no PIL) the real-decode slot must raise a clear
    NotImplementedError — never a silent fake fallback."""
    if HAS_PIL:
        pytest.skip("PIL present; the raise path is untestable here")
    from smfg_datawarehouse_spark.operators.multimodal import (
        decode_dims_stub,
        decode_image_stub,
    )

    with pytest.raises(NotImplementedError, match="image library"):
        decode_image_stub(b"\x00", fake=False)
    with pytest.raises(NotImplementedError, match="image library"):
        decode_dims_stub(b"\x00", fake=False)
