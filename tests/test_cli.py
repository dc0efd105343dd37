"""CLI (`python -m risjbot_spark`) — the `scrapy crawl` analogue."""

from risjbot_spark.__main__ import main
from risjbot_spark.corpus import pages_df


def test_cli_crawl_and_jsonl(spark, tmp_path):
    pages_path = str(tmp_path / "pages")
    pages_df(spark, 60, partitions=2).write.parquet(pages_path)
    seeds_path = tmp_path / "seeds.txt"
    urls = [r["url"] for r in spark.read.parquet(pages_path)
            .select("url").collect()]
    seeds_path.write_text("\n".join(urls[:40]) + "\n")
    wh = str(tmp_path / "wh")
    jsonl = str(tmp_path / "out_jsonl")
    rc = main([
        "crawl", "--pages", pages_path, "--seeds", str(seeds_path),
        "--warehouse", wh, "--rounds", "1", "--jsonl", jsonl,
        "--partitions", "4",
    ], spark=spark)
    assert rc == 0
    arts = spark.read.parquet(
        *__import__("json").load(open(f"{wh}/articles/snap-1.manifest.json"))["files"])
    assert 0 < arts.count() <= 40
    lines = spark.read.text(jsonl)
    assert lines.count() == arts.count()


def test_cli_extract(spark, tmp_path):
    pages_path = str(tmp_path / "pages")
    pages_df(spark, 30, partitions=2).write.parquet(pages_path)
    out = str(tmp_path / "articles")
    rc = main(["extract", "--pages", pages_path, "--out", out], spark=spark)
    assert rc == 0
    df = spark.read.parquet(out)
    assert df.count() == 30
    assert "headline" in df.columns and "bodytext" in df.columns
