"""Training-shard writer: deterministic assignment and within-shard
order, exactly one file per non-empty shard, lossless round-trip,
reproducibility across input partitionings, and the footer-based
manifest costing zero extra Spark jobs."""

import os

import pytest
from pyspark.sql import functions as F

from risjbot_spark import shards


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"))


def _read_shards(spark, manifest):
    out = {}
    for sid, parts in manifest["files"].items():
        rows = []
        for p in parts:
            rows.extend(spark.read.parquet(p).collect())
        out[sid] = [(r["doc_id"], r["text"]) for r in rows]
    return out


def test_write_training_shards_roundtrip(spark, corpus, tmp_path):
    path = str(tmp_path / "shards")
    man = shards.write_training_shards(corpus, path, n_shards=8,
                                       id_col="doc_id")
    assert man["n_shards"] == 8 and man["format"] == "parquet"
    # one file per non-empty shard; 200 docs over 8 shards → all present
    assert sorted(man["files"]) == list(range(8))
    assert all(len(parts) == 1 for parts in man["files"].values())
    assert sum(man["rows"].values()) == 200
    assert all(n > 0 for n in man["rows"].values())
    # lossless: union of shards == input (shard column not persisted in
    # the row data — it's the directory key)
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert set(back.columns) == {"doc_id", "text", "shard"}
    assert (back.select("doc_id").distinct().count() == 200)


def test_shards_deterministic_across_partitionings(spark, corpus,
                                                   tmp_path):
    m1 = shards.write_training_shards(
        corpus, str(tmp_path / "a"), n_shards=4, id_col="doc_id")
    m2 = shards.write_training_shards(
        corpus.repartition(13), str(tmp_path / "b"), n_shards=4,
        id_col="doc_id")
    a, b = _read_shards(spark, m1), _read_shards(spark, m2)
    # same rows in the same shard in the same ORDER, byte-for-byte
    assert a == b
    # and the order within a shard is not insertion order (shuffled)
    ids0 = [d for d, _ in a[0]]
    assert ids0 != sorted(ids0)


def test_shards_json_format_and_guards(spark, corpus, tmp_path):
    man = shards.write_training_shards(
        corpus, str(tmp_path / "j"), n_shards=2, id_col="doc_id",
        fmt="json")
    assert sorted(man["files"]) == [0, 1] and "rows" not in man
    back = spark.read.json(str(tmp_path / "j"))
    assert back.count() == 200
    with pytest.raises(ValueError, match="n_shards"):
        shards.write_training_shards(corpus, str(tmp_path / "x"),
                                     n_shards=0, id_col="doc_id")
    with pytest.raises(ValueError, match="fmt"):
        shards.write_training_shards(corpus, str(tmp_path / "x"),
                                     n_shards=1, id_col="doc_id",
                                     fmt="csvish")
    clash = corpus.withColumnRenamed("text", "shard")
    with pytest.raises(ValueError, match="collides"):
        shards.write_training_shards(clash, str(tmp_path / "x"),
                                     n_shards=1, id_col="doc_id")


def test_shards_manifest_costs_zero_extra_jobs(spark, corpus, tmp_path):
    """The manifest (files + per-shard rows) comes from parquet footers
    driver-side: job count with manifest == the write job(s) alone."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs_of(group, fn):
        sc.setJobGroup(group, group)
        try:
            fn()
        finally:
            sc.setJobGroup(None, None)
        return len(tracker.getJobIdsForGroup(group))

    n_write = jobs_of("shards-a", lambda: shards.write_training_shards(
        corpus, str(tmp_path / "za"), n_shards=4, id_col="doc_id"))
    assert n_write >= 1
    # second write to a fresh path, identical plan — manifest included
    # in both, so equality shows the manifest itself adds no job; the
    # real assertion is structural (no Spark action after .save in the
    # source), this guards it
    n_again = jobs_of("shards-b", lambda: shards.write_training_shards(
        corpus, str(tmp_path / "zb"), n_shards=4, id_col="doc_id"))
    assert n_again == n_write


def test_manifest_via_hadoop_fs_uri(spark, corpus, tmp_path):
    """The manifest listing/footers go through Hadoop's FileSystem, so
    scheme-qualified URIs (the review's hdfs://-silently-empty finding)
    list correctly — a file: URI is the in-container proxy for that;
    driver-side glob.glob would return [] for it."""
    path = "file://" + str(tmp_path / "uri_shards")
    man = shards.write_training_shards(corpus, path, n_shards=4,
                                       id_col="doc_id")
    assert sorted(man["files"]) == list(range(4))
    assert sum(man["rows"].values()) == 200
    assert all(p.startswith("file:") for parts in man["files"].values()
               for p in parts)
