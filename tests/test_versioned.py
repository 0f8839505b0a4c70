"""Snapshot-versioned table: atomic visibility, time travel, MERGE, vacuum,
and the streaming foreachBatch-MERGE path on top of it."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from smfg_datawarehouse_spark.sources.versioned import VersionedTable


def _rows(df):
    return sorted(tuple(r) for r in df.select("k", "v").collect())


def test_versioned_write_merge_time_travel_vacuum(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "tbl"))
    assert vt.versions() == [] and vt.current_version() is None

    v0 = vt.write(spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING"))
    assert v0 == 0 and vt.versions() == [0]

    # MERGE: key 2 updated, key 3 inserted, key 1 survives untouched
    v1 = vt.merge(
        spark.createDataFrame([(2, "B"), (3, "c")], "k INT, v STRING"), ["k"]
    )
    assert v1 == 1
    assert _rows(vt.read()) == [(1, "a"), (2, "B"), (3, "c")]
    # time travel: the old snapshot is intact
    assert _rows(vt.read(version=0)) == [(1, "a"), (2, "b")]

    v2 = vt.merge(spark.createDataFrame([(1, "A")], "k INT, v STRING"), ["k"])
    assert vt.versions() == [0, 1, 2]
    removed = vt.vacuum(keep_last=2)
    assert removed == [0] and vt.versions() == [1, 2]
    assert _rows(vt.read()) == [(1, "A"), (2, "B"), (3, "c")]
    assert v2 == 2


def test_versioned_uncommitted_snapshot_invisible(spark, tmp_path):
    """A version directory without _SUCCESS (crashed write) is never
    visible and is cleaned by vacuum."""
    vt = VersionedTable(spark, str(tmp_path / "tbl"))
    vt.write(spark.createDataFrame([(1, "a")], "k INT, v STRING"))
    # simulate a crash: v=1 exists but has no _SUCCESS marker
    dead = tmp_path / "tbl" / "v=1"
    dead.mkdir()
    (dead / "part-junk.parquet").write_bytes(b"not parquet")
    assert vt.versions() == [0]
    assert _rows(vt.read()) == [(1, "a")]
    vt.vacuum(keep_last=1)
    assert not os.path.exists(str(dead))


def test_versioned_streaming_merge(spark, tmp_path):
    """foreachBatch MERGE into a VersionedTable: after N micro-batches the
    table equals the batch latest-wins state, with one snapshot per batch
    and full history retained until vacuum."""
    from smfg_datawarehouse_spark.operators.dedup import latest_wins_dedup
    from smfg_datawarehouse_spark.queries import load_events

    SF_DIR = "/root/testdata/sf0.001"
    src = load_events(spark, SF_DIR)
    src_dir = str(tmp_path / "src")
    src.repartition(3).write.parquet(src_dir)

    vt = VersionedTable(spark, str(tmp_path / "curated"))

    def latest(df):
        return latest_wins_dedup(
            df.withColumn("_ord", F.struct("ts", "event_id")), ["user_id"], "_ord"
        ).drop("_ord")

    def sink(batch_df, _bid):
        # ts-aware upsert: union the previous snapshot with the batch and
        # keep the latest row per user — plain updates-win MERGE would
        # regress a user if a later batch carried an older event. Reading
        # the old snapshot while writing the new one is safe: the write
        # lands in a fresh v=N+1 directory.
        merged = batch_df
        if vt.current_version() is not None:
            merged = vt.read().unionByName(batch_df)
        vt.write(latest(merged))

    q = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    def rowset(df):
        return sorted(tuple(str(v) for v in r) for r in df.collect())

    assert len(vt.versions()) == 3  # one snapshot per micro-batch
    assert rowset(vt.read()) == rowset(latest(src))


def test_merge_precedence_newer_wins(spark, tmp_path):
    """Conditional merge: a STALE update (lower precedence tuple) must not
    clobber the newer row already in the table; a newer one must; updates
    win exact-tuple ties. Order of merges can't change the outcome."""
    vt = VersionedTable(spark, str(tmp_path / "tbl"))
    schema = "k INT, seq INT, v STRING"
    vt.write(spark.createDataFrame([(1, 5, "t5"), (2, 1, "t1")], schema))

    # stale for k=1 (seq 3 < 5), fresh for k=2 (seq 4 > 1), insert k=3
    vt.merge(
        spark.createDataFrame([(1, 3, "u3"), (2, 4, "u4"), (3, 1, "n1")], schema),
        ["k"],
        precedence=["seq"],
    )
    got = sorted(tuple(r) for r in vt.read().collect())
    assert got == [(1, 5, "t5"), (2, 4, "u4"), (3, 1, "n1")]

    # exact tie on the precedence tuple -> the update wins
    vt.merge(
        spark.createDataFrame([(1, 5, "tie")], schema), ["k"], precedence=["seq"]
    )
    got = sorted(tuple(r) for r in vt.read().collect())
    assert (1, 5, "tie") in got

    # reversed arrival order of the same two updates -> same final row
    vt2 = VersionedTable(spark, str(tmp_path / "tbl2"))
    vt2.write(spark.createDataFrame([(9, 2, "a")], schema))
    vt2.merge(spark.createDataFrame([(9, 7, "new")], schema), ["k"], ["seq"])
    vt2.merge(spark.createDataFrame([(9, 4, "old")], schema), ["k"], ["seq"])
    assert [tuple(r) for r in vt2.read().collect()] == [(9, 7, "new")]


def test_snapshot_diff_classification(spark, tmp_path):
    """diff(v0, v1) classifies insert/delete/update/unchanged with
    null-safe comparison (NULL->NULL is unchanged, NULL->value is update)."""
    vt = VersionedTable(spark, str(tmp_path / "tbl"))
    schema = "k INT, a STRING, b INT"
    vt.write(
        spark.createDataFrame(
            [(1, "keep", 10), (2, "upd", 20), (3, "del", 30), (4, None, None)],
            schema,
        )
    )
    vt.write(
        spark.createDataFrame(
            [(1, "keep", 10), (2, "UPD", 20), (4, None, 40), (5, "ins", 50)],
            schema,
        )
    )
    d = {r["k"]: r for r in vt.diff(0, 1, ["k"]).collect()}
    assert d[1]["change_type"] == "unchanged"
    assert d[2]["change_type"] == "update"
    assert d[2]["old_a"] == "upd" and d[2]["new_a"] == "UPD"
    assert d[3]["change_type"] == "delete" and d[3]["new_a"] is None
    assert d[4]["change_type"] == "update"  # NULL -> 40 is a change
    assert d[5]["change_type"] == "insert" and d[5]["old_a"] is None
    assert len(d) == 5


def test_snapshot_diff_null_key(spark, tmp_path):
    """A row whose merge key is NULL must match itself across versions
    (null-safe key join), not be misread as a delete+insert pair."""
    vt = VersionedTable(spark, str(tmp_path / "tbl"))
    schema = "k INT, v STRING"
    vt.write(spark.createDataFrame([(None, "same"), (1, "a")], schema))
    vt.write(spark.createDataFrame([(None, "SAME"), (1, "a")], schema))
    d = vt.diff(0, 1, ["k"]).collect()
    by_key = {r["k"]: r for r in d}
    assert len(d) == 2  # NULL key produced ONE row, not delete+insert
    assert by_key[None]["change_type"] == "update"
    assert by_key[None]["old_v"] == "same" and by_key[None]["new_v"] == "SAME"
    assert by_key[1]["change_type"] == "unchanged"


def test_precedence_merge_replay_idempotent(spark, tmp_path):
    """At-least-once safety: re-applying the SAME batch (a foreachBatch
    replay after a crash between merge and checkpoint commit) must leave
    the table content unchanged — the precedence tuple makes the merge
    idempotent, so the CDC path tolerates redelivery without markers."""
    vt = VersionedTable(spark, str(tmp_path / "tbl"))
    schema = "k INT, seq INT, v STRING"
    vt.write(spark.createDataFrame([(1, 1, "a"), (2, 9, "z")], schema))
    batch = spark.createDataFrame([(1, 5, "b"), (3, 2, "c")], schema)
    vt.merge(batch, ["k"], precedence=["seq"])
    first = sorted(tuple(r) for r in vt.read().collect())
    vt.merge(batch, ["k"], precedence=["seq"])  # replay
    assert sorted(tuple(r) for r in vt.read().collect()) == first


def test_apply_changeset_roundtrip(spark, tmp_path):
    """apply_changeset(v0, diff(v0, v1)) == v1, whether or not the
    changeset still carries its 'unchanged' rows."""
    from smfg_datawarehouse_spark.transform import apply_changeset

    vt = VersionedTable(spark, str(tmp_path / "tbl"))
    schema = "k INT, a STRING, b INT"
    vt.write(
        spark.createDataFrame(
            [(1, "keep", 10), (2, "upd", 20), (3, "del", 30)], schema
        )
    )
    vt.write(
        spark.createDataFrame(
            [(1, "keep", 10), (2, "UPD", 21), (5, "ins", 50)], schema
        )
    )
    want = sorted(tuple(r) for r in vt.read(1).collect())
    full = vt.diff(0, 1, ["k"])
    for changes in (full, full.where("change_type <> 'unchanged'")):
        got = apply_changeset(vt.read(0), changes, ["k"])
        assert sorted(tuple(r) for r in got.collect()) == want
