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


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------

def _plan(df, **kw):
    rows = shards.pack_sequences(df, "pk", **kw).collect()
    return {r["pk"]: r for r in rows}


def test_pack_layout_contiguous_per_shard(spark):
    df = spark.createDataFrame(
        [("a", 5, 0), ("b", 7, 0), ("c", 4, 0), ("d", 3, 1)],
        "pk string, ntok int, sh int")
    got = _plan(df, seq_len=8, token_count_col="ntok", shard_col="sh")
    # shard 0 stream: a[0,5) b[5,12) c[12,16); shard 1: d[0,3)
    assert (got["a"]["start_tok"], got["a"]["end_tok"]) == (0, 5)
    assert (got["b"]["start_tok"], got["b"]["end_tok"]) == (5, 12)
    assert (got["c"]["start_tok"], got["c"]["end_tok"]) == (12, 16)
    assert (got["d"]["start_tok"], got["d"]["end_tok"]) == (0, 3)
    # seq ids: seq_len=8 -> a in seq 0, b straddles 0-1, c in 1
    assert (got["a"]["seq_first"], got["a"]["seq_last"]) == (0, 0)
    assert (got["b"]["seq_first"], got["b"]["seq_last"]) == (0, 1)
    assert (got["c"]["seq_first"], got["c"]["seq_last"]) == (1, 1)
    assert (got["d"]["seq_first"], got["d"]["seq_last"]) == (0, 0)


def test_pack_zero_token_docs_get_null_seqs(spark):
    df = spark.createDataFrame(
        [("a", 4, 0), ("empty", 0, 0), ("b", 4, 0)],
        "pk string, ntok int, sh int")
    got = _plan(df, seq_len=4, token_count_col="ntok", shard_col="sh")
    assert got["empty"]["seq_first"] is None
    assert got["empty"]["seq_last"] is None
    # and it occupies no stream space: b starts right after a... after
    # 'empty' contributes 0 tokens at its (id-ordered) slot
    assert got["b"]["start_tok"] == 4


def test_pack_text_col_token_counting(spark):
    df = spark.createDataFrame(
        [("a", "one two  three", 0), ("b", "  ", 0)],
        "pk string, body string, sh int")
    got = _plan(df, seq_len=2, text_col="body", shard_col="sh")
    assert got["a"]["n_tok"] == 3
    assert got["b"]["n_tok"] == 0


def test_pack_deterministic_across_partitionings(spark):
    rows = [(f"p{i:03d}", (i * 7) % 23 + 1) for i in range(100)]
    df1 = spark.createDataFrame(rows, "pk string, ntok int").coalesce(1)
    df2 = spark.createDataFrame(rows, "pk string, ntok int").repartition(13)
    a = _plan(df1, seq_len=16, token_count_col="ntok", n_shards=4)
    b = _plan(df2, seq_len=16, token_count_col="ntok", n_shards=4)
    assert {k: tuple(v) for k, v in a.items()} == \
           {k: tuple(v) for k, v in b.items()}
    # stream coverage: within a shard, offsets tile [0, total) exactly
    by_shard = {}
    for v in a.values():
        by_shard.setdefault(v["shard"], []).append(v)
    for docs in by_shard.values():
        docs.sort(key=lambda v: v["start_tok"])
        pos = 0
        for v in docs:
            assert v["start_tok"] == pos
            pos = v["end_tok"]


def test_pack_validation(spark):
    df = spark.createDataFrame([("a", 1)], "pk string, ntok int")
    with pytest.raises(ValueError):
        shards.pack_sequences(df, "pk", seq_len=0, token_count_col="ntok")
    with pytest.raises(ValueError):
        shards.pack_sequences(df, "pk", seq_len=4)
    with pytest.raises(ValueError):
        shards.pack_sequences(df, "pk", seq_len=4,
                              token_count_col="ntok", text_col="pk")
