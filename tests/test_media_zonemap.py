"""WAV codec robustness (operators/multimodal.py) and zone-map pruned
reads (sources/lake.py): malformed payloads must degrade loudly to the
bad-row shape, and pruning must skip files yet stay value-identical to a
full scan — the conservative-skip contract."""

from __future__ import annotations

import datetime
import struct

import pytest

from pyspark.sql import functions as F

from smfg_datawarehouse_spark.operators.multimodal import (
    decode_wav_pcm16,
    encode_wav_pcm16,
)
from smfg_datawarehouse_spark.sources.lake import (
    read_zonemap_pruned,
    write_sorted_with_zonemap,
)


def test_wav_roundtrip_exact():
    n, rate = 199, 16000  # full sawtooth period: peak must be 99
    out = decode_wav_pcm16(encode_wav_pcm16(n, rate))
    assert out["pcm_ok"] and out["n_samples"] == n
    assert out["sample_rate"] == rate and out["bit_depth"] == 16
    assert out["peak"] == 99
    assert out["abs_sum"] == sum(abs(((i * 37) % 199) - 99) for i in range(n))
    assert out["duration_us"] == n * 1_000_000 // rate


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b"JUNK" + b[4:],  # wrong magic
        lambda b: b[:4] + struct.pack("<I", len(b)) + b[8:],  # bad RIFF size
        lambda b: b[:30],  # truncated mid-fmt
        lambda b: b.replace(b"fmt ", b"fmX "),  # fmt chunk missing
    ],
)
def test_wav_malformed_payloads_degrade_to_bad_row(mutate):
    out = decode_wav_pcm16(mutate(encode_wav_pcm16(64, 8000)))
    assert out["pcm_ok"] is False and out["n_samples"] is None


def test_wav_chunk_walk_skips_foreign_chunks():
    # a LIST chunk inserted before fmt must be walked over, not tripped on
    b = encode_wav_pcm16(64, 8000)
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    body = b[12:]
    payload = b"RIFF" + struct.pack("<I", 4 + len(extra) + len(body)) + b"WAVE" + extra + body
    out = decode_wav_pcm16(payload)
    assert out["pcm_ok"] and out["n_samples"] == 64


def test_zonemap_prunes_and_matches_full_scan(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id") * 86400 + 1_000_000_000).alias("ts"),
    )
    zm = write_sorted_with_zonemap(df, str(tmp_path / "t"), "ts", 10)
    assert len(zm) == 10
    lo = datetime.datetime(2001, 9, 9) + datetime.timedelta(days=100)
    hi = lo + datetime.timedelta(days=99)
    pruned, n_read, n_total = read_zonemap_pruned(spark, zm, lo, hi)
    assert n_read < n_total  # actually skipped files
    got = (
        pruned.where((F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)))
        .agg(F.count("*").alias("n"), F.sum("k").alias("s"))
        .collect()[0]
    )
    want = (
        spark.read.parquet(str(tmp_path / "t"))
        .where((F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)))
        .agg(F.count("*").alias("n"), F.sum("k").alias("s"))
        .collect()[0]
    )
    assert tuple(got) == tuple(want) and got["n"] > 0


def test_zonemap_empty_intersection_raises(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    zm = write_sorted_with_zonemap(df, str(tmp_path / "t2"), "v", 4)
    with pytest.raises(ValueError):
        read_zonemap_pruned(spark, zm, 1e6, 2e6)
