"""Local pre-flight twin of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    import decimal

    if isinstance(v, (float, decimal.Decimal)):
        f = float(v)
        if math.isnan(f):
            return "nan"
        return f"{f + 0.0:.6f}"      # +0.0 folds -0.0 into 0.0
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main(sf_dir: str, only: list[str]):
    # the driver calls __spark_entry__.queries()/oracle_sql(), which adds
    # the crawl-engine end-to-end queries on top of risjbot_spark.queries
    # — check exactly that surface; --extended widens to the full 65-query
    # surface including the entries retired from the driver's 50-row window
    import __spark_entry__ as entry

    extended = "--extended" in only
    only = [n for n in only if n != "--extended"]
    QUERIES = entry.queries_extended() if extended else entry.queries()
    ORACLE_SQL = entry.oracle_sql()

    # validate the subset BEFORE paying SparkSession startup: a typo'd
    # query name fails in milliseconds, with no session left behind
    unknown = [n for n in (only or []) if n not in QUERIES]
    if unknown:
        print(f"FAIL  unknown query name(s): {unknown}")
        return 1

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        sql = ORACLE_SQL.get(name)
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if sql is None:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        sc, sv = canon_rows(scols, [tuple(r) for r in srows])
        dc, dv = canon_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL  {name}: columns differ spark={sc} duck={dc}")
            failures += 1
        elif len(sv) != len(dv):
            print(f"FAIL  {name}: rowcount spark={len(sv)} duck={len(dv)}")
            failures += 1
        elif sv != dv:
            diff = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
            print(f"FAIL  {name}: values differ, first diffs: {diff}")
            failures += 1
        else:
            print(f"OK    {name}: {len(sv)} rows")
    spark.stop()
    print(f"\n{failures} failures / {len(only or QUERIES)} checked")
    return 1 if failures else 0


if __name__ == "__main__":
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    sys.exit(main(sf, sys.argv[1:]))
