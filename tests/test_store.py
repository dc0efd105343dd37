"""Snapshot table semantics: immutable commits, time travel, append
manifests, atomic CURRENT, expiry compaction."""

import os

import pytest

from risjbot_spark.store import SnapshotTable


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x int")


def test_commit_read_time_travel(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "t")
    s1 = t.commit(_df(spark, [1, 2]), lineage={"round": 0})
    s2 = t.commit(_df(spark, [3]), lineage={"round": 1})
    assert (s1, s2) == (1, 2)
    assert t.current_snapshot_id() == 2
    assert {r["x"] for r in t.read().collect()} == {3}          # replace mode
    assert {r["x"] for r in t.read(snapshot_id=1).collect()} == {1, 2}  # travel
    assert t.manifest()["parent"] == 1
    assert t.lineage_history()[0]["lineage"]["round"] == 0


def test_append_mode_accumulates(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "a")
    t.commit(_df(spark, [1]), mode="append")
    t.commit(_df(spark, [2]), mode="append")
    assert {r["x"] for r in t.read().collect()} == {1, 2}
    # older snapshot still readable with only its own files
    assert {r["x"] for r in t.read(snapshot_id=1).collect()} == {1}


def test_empty_table_read(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "e")
    df = t.read(schema="x int")
    assert df.count() == 0


def test_expire_snapshots(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "x")
    for i in range(5):
        t.commit(_df(spark, [i]))
    expired = t.expire_snapshots(keep_last=2)
    assert expired == [1, 2, 3]
    assert [m["id"] for m in t.snapshots()] == [4, 5]
    assert {r["x"] for r in t.read().collect()} == {4}
    with pytest.raises(FileNotFoundError):
        t.read(snapshot_id=1)


def test_expire_append_table_keeps_live_files(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "ap")
    for i in range(4):
        t.commit(_df(spark, [i]), mode="append")
    t.expire_snapshots(keep_last=1)
    # newest append manifest references ALL data dirs → nothing deleted
    assert {r["x"] for r in t.read().collect()} == {0, 1, 2, 3}
