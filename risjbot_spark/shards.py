"""Training-shard writer — the last step of the curation pipeline
(dedup → quality gate → decontaminate → mix_sample → SHARD): write a
curated corpus as a fixed set of deterministically-shuffled shards a
training loader can stream.

Design for 100 TB:

  * ONE exchange total: rows are repartitioned by their shard id (a
    hash of the document id — NOT an RNG, so the same corpus always
    shards identically; re-running a failed job reproduces byte-equal
    shards) and sorted within partitions, so the writer streams each
    shard's rows in deterministic order without a global sort. A
    global ORDER BY would range-exchange the whole corpus AND serialize
    tail skew into the last writer; hash sharding is what training
    loaders actually need (any fixed pseudo-random order).
  * Exactly one file per non-empty shard: each output partition holds
    whole shards (`repartition(n_shards, shard)`), and
    `partitionBy("shard")` splits a task's rows into one file per shard
    directory.
  * The manifest comes from parquet FOOTERS, read driver-side — zero
    extra Spark jobs after the write (the engine's zero-job lineage
    device, `store/snapshots.py`).

Reference parity: RISJbot's only sink is per-crawl JSONLines
(`/root/reference/RISJbot/pipelines.py` JsonLinesExportPipeline
analogue in `sinks.py`); sharded training output is part of the
LLM-pipeline surface the brief adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["write_training_shards", "pack_sequences"]

_SHARD = "shard"


def _glob_status(spark, pattern: str) -> "list":
    """List paths matching `pattern` through Hadoop's FileSystem — the
    same layer Spark wrote through, so it works for ANY scheme the
    cluster can reach (hdfs://, s3a://, file:), unlike driver-side
    glob.glob, which silently returns [] for every non-local URI."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(pattern)
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jpath.getFileSystem(conf)
    statuses = fs.globStatus(jpath)
    if statuses is None:
        return []
    return [st.getPath().toString() for st in statuses]


def _parquet_rows(spark, file_path: str) -> int:
    """Row count from the parquet FOOTER via the JVM's parquet-hadoop
    reader (already on Spark's classpath): zero Spark jobs, any
    filesystem scheme."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(file_path)
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jpath, conf)
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        return int(reader.getRecordCount())
    finally:
        reader.close()


def write_training_shards(df: DataFrame, path: str, *,
                          n_shards: int,
                          id_col: str,
                          fmt: str = "parquet",
                          mode: str = "error") -> dict:
    """Write `df` as `n_shards` deterministic shards under `path`
    (directories `shard=0/ ... shard=N-1/`, one file each; a shard left
    empty by hashing writes no directory — only possible when the
    corpus is not much larger than n_shards).

    Shard assignment is pmod(xxhash64(id_col), n_shards) and rows
    within a shard are ordered by (xxhash64(id), id) — both pure
    functions of the data, so the output is reproducible across runs,
    cluster sizes, and input partitionings, and any single shard is a
    fixed pseudo-random sample of the corpus (loaders can train on a
    prefix of shards).

    fmt is "parquet" (default) or "json" (JSON-lines, one object per
    line). Returns a manifest dict: n_shards, format, per-shard row
    counts (parquet only — read from file footers driver-side, no
    Spark job) and file paths."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if fmt not in ("parquet", "json"):
        raise ValueError(f"unknown fmt {fmt!r}; expected 'parquet' or "
                         "'json'")
    if _SHARD in df.columns:
        raise ValueError(f"input column {_SHARD!r} collides with the "
                         "shard partition column")
    h = F.xxhash64(F.col(id_col))
    sharded = (
        df.withColumn(_SHARD, F.pmod(h, F.lit(n_shards)).cast("int"))
        .repartition(n_shards, F.col(_SHARD))
        .sortWithinPartitions(F.col(_SHARD), F.pmod(h, F.lit(1 << 32)),
                              F.col(id_col)))
    (sharded.write.mode(mode).partitionBy(_SHARD).format(fmt)
     .save(path))
    spark = df.sparkSession
    files: "dict[int, list[str]]" = {}
    pattern = "*.parquet" if fmt == "parquet" else "part-*"
    for d in sorted(_glob_status(spark, f"{path}/{_SHARD}=*")):
        sid = int(d.rsplit("=", 1)[1])
        parts = [p for p in sorted(_glob_status(spark, f"{d}/{pattern}"))
                 if not p.endswith(".crc")]
        files[sid] = parts
    manifest = {"n_shards": n_shards, "format": fmt,
                "path": path, "files": files}
    if fmt == "parquet":
        manifest["rows"] = {
            sid: sum(_parquet_rows(spark, p) for p in parts)
            for sid, parts in files.items()}
    return manifest


def pack_sequences(df: DataFrame, id_col: str, *,
                   seq_len: int,
                   token_count_col: str | None = None,
                   text_col: str | None = None,
                   shard_col: str | None = None,
                   n_shards: int = 32) -> DataFrame:
    """Concat-and-chunk sequence-packing PLAN (GPT-style): within each
    shard, documents are laid out in deterministic (id) order, token
    streams concatenated, and training sequences are the consecutive
    seq_len-token windows of that stream — documents straddle sequence
    boundaries instead of wasting pad tokens. Returns one row per
    document: shard, n_tok, start_tok/end_tok (offsets into the shard's
    token stream) and seq_first/seq_last (the sequence ids the document
    lands in; NULL for zero-token documents, which occupy no window).
    A loader materializes sequence s of shard h from the rows with
    seq_first <= s <= seq_last — an equi-lookup on (shard, seq range).

    Token counts come from token_count_col if given, else are computed
    from text_col with Python str.split() semantics (the engine's
    token surface, schema.PY_WS_RE).

    Scale shape: ONE exchange (repartition-by-shard implied by the
    window); the running offset is a per-shard window cumsum — no
    global ORDER BY ever touches the corpus, and shard count is the
    parallelism knob (10^5 shards at 100 TB keeps each window's sort
    task-sized). Shard assignment defaults to pmod(xxhash64(id)) —
    a pure function of the data, so the same corpus always packs
    identically (re-runs, cluster sizes, and input partitionings all
    reproduce byte-equal plans); pass shard_col to pack along an
    existing layout (e.g. write_training_shards output).  id_col values
    must be unique within a shard — the layout orders by id, so
    duplicate ids would make a document's offsets ambiguous."""
    from pyspark.sql import Window

    from .dedup import raw_tokens_expr

    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if (token_count_col is None) == (text_col is None):
        raise ValueError("pass exactly one of token_count_col / text_col")
    if token_count_col is not None:
        n_tok = F.col(token_count_col).cast("long")
    else:
        # the engine's single token surface — counts stay consistent
        # with the dedup/packing/quality ops by construction
        n_tok = F.size(raw_tokens_expr(F.col(text_col))).cast("long")
    if shard_col is not None:
        shard = F.col(shard_col).cast("long")
    else:
        shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    t = df.select(F.col(id_col), shard.alias("shard"),
                  n_tok.alias("n_tok"))
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("long"))
    t = t.withColumn("start_tok", start)
    t = t.withColumn("end_tok", F.col("start_tok") + F.col("n_tok"))
    has = F.col("n_tok") > 0
    return (t
            .withColumn("seq_first",
                        F.when(has, F.floor(F.col("start_tok") / seq_len)))
            .withColumn("seq_last",
                        F.when(has, F.floor((F.col("end_tok") - 1)
                                            / seq_len))))
