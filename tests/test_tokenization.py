"""Tokenizer-seam token counting (risjbot_spark.tokenization): the
no-library path must be a pure JVM expression whose values equal the
Python stand-in formula, and the counts must plug into sequence
packing."""

import pytest
from pyspark.sql import functions as F

from risjbot_spark import tokenization as tz


def test_token_counts_expression_path(spark):
    df = spark.createDataFrame(
        [(1, "abcdefgh xy"), (2, None), (3, ""), (4, "  spaced   out ")],
        "pk long, body string")
    out = {r["pk"]: r["n_tokens"]
           for r in tz.token_counts(df, "body").collect()}
    assert out[1] == 3 == tz.count_tokens_standin("abcdefgh xy")
    assert out[2] is None                  # NULL text → NULL
    assert out[3] == 0
    assert out[4] == tz.count_tokens_standin("  spaced   out ")
    # pure projection: no Exchange, no Python (BatchEvalPython/ArrowEval)
    plan = (tz.token_counts(df, "body")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Python" not in plan
    with pytest.raises(ValueError, match="n_tokens"):
        tz.token_counts(df.withColumn("n_tokens", F.lit(1)), "body")


def test_token_counts_feed_pack_sequences(spark):
    from risjbot_spark.shards import pack_sequences
    docs = spark.createDataFrame(
        [(i, " ".join(f"word{j}" for j in range(10))) for i in range(20)],
        "pk long, body string")
    counted = tz.token_counts(docs, "body", out_col="_nt")
    packed = pack_sequences(counted, "pk", seq_len=64,
                            token_count_col="_nt", n_shards=2)
    rows = packed.collect()
    assert rows
    total_tokens = 20 * tz.count_tokens_standin(
        " ".join(f"word{j}" for j in range(10)))
    # concat-and-chunk: windows cover every token exactly once
    assert sum(r["n_tok"] for r in rows) == total_tokens


def test_token_counts_ignores_tokenizer_file_without_library(spark):
    # tokenizer_file given but no library importable: the documented
    # fallback is the expression estimate, not an error (the pin is
    # what makes absence loud on heterogeneous clusters)
    assert not tz.HAS_TOKENIZERS
    df = spark.createDataFrame([(1, "four char word")],
                               "pk long, body string")
    out = tz.token_counts(df, "body", tokenizer_file="/nonexistent.json")
    assert out.collect()[0]["n_tokens"] == \
        tz.count_tokens_standin("four char word")
