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
    with pytest.raises(ValueError, match="no snapshot 1"):
        t.read(snapshot_id=1)


def test_expire_append_table_keeps_live_files(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "ap")
    for i in range(4):
        t.commit(_df(spark, [i]), mode="append")
    t.expire_snapshots(keep_last=1)
    # newest append manifest references ALL data dirs → nothing deleted
    assert {r["x"] for r in t.read().collect()} == {0, 1, 2, 3}


def test_commit_after_rollback_never_reuses_snapshot_id(spark, tmp_path):
    """A commit after rollback must allocate a FRESH id — parent+1 would
    overwrite an existing snapshot's manifest and orphan its data."""
    t = SnapshotTable(spark, str(tmp_path), "t")
    t.commit(_df(spark, [1]))
    t.commit(_df(spark, [2]))
    t.commit(_df(spark, [3]))
    t.rollback(1)
    sid = t.commit(_df(spark, [9]))
    assert sid == 4                                     # not 2
    # every older snapshot still reads exactly as written
    assert {r["x"] for r in t.read(snapshot_id=2).collect()} == {2}
    assert {r["x"] for r in t.read(snapshot_id=3).collect()} == {3}
    assert {r["x"] for r in t.read().collect()} == {9}
    assert t.manifest()["parent"] == 1                  # true lineage


def test_expire_never_removes_current_after_rollback(spark, tmp_path):
    """expire_snapshots must keep whatever CURRENT points to, however
    old — deleting the live snapshot destroys the table's state."""
    t = SnapshotTable(spark, str(tmp_path), "t")
    for i in range(1, 6):
        t.commit(_df(spark, [i]))
    t.rollback(1)
    expired = t.expire_snapshots(keep_last=2)
    assert 1 not in expired
    assert {r["x"] for r in t.read().collect()} == {1}  # still readable


def test_rollback_unknown_snapshot_raises_valueerror(spark, tmp_path):
    """REGRESSION: rollback to an unknown/expired id raised a raw
    FileNotFoundError instead of the documented ValueError."""
    import pytest

    from risjbot_spark.store import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path), "t")
    t.commit(spark.range(3), mode="replace")
    with pytest.raises(ValueError, match="no snapshot 99"):
        t.rollback(99)


def test_empty_partitioned_commit_readable(spark, tmp_path):
    """REGRESSION GUARD: an empty partitioned commit (a compaction that
    trims everything) must stay readable — a partitioned write of zero
    rows leaves no parquet footers to infer a schema from, so the store
    falls back to a flat zero-row file."""
    from pyspark.sql import functions as F

    from risjbot_spark.store import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path), "seen")
    empty = spark.createDataFrame(
        [], "url_hash long, url string, last_fetch timestamp"
    ).withColumn("lf_day", F.to_date("last_fetch"))
    t.commit(empty, mode="replace", partition_by=["lf_day"])
    got = t.read()
    assert got.count() == 0
    assert "url_hash" in got.columns
    # and a later delta appends fine on top of the empty base
    t.commit(spark.createDataFrame(
        [(1, "https://h/x", None, None)],
        "url_hash long, url string, last_fetch timestamp, lf_day date"),
        mode="append")
    assert t.read().count() == 1


def test_time_travel_read_of_expired_snapshot_raises_valueerror(spark, tmp_path):
    """manifest()/read() of an unknown or expired explicit id reports
    ValueError like rollback(), not a raw FileNotFoundError."""
    import pytest

    from risjbot_spark.store import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path), "t")
    t.commit(spark.range(2), mode="replace")
    with pytest.raises(ValueError, match="no snapshot 42"):
        t.read(snapshot_id=42)
