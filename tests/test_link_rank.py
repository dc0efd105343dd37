"""Link-graph frontier prioritization (frontier/rank.py).

Fixed-point PageRank: hand-computed values on canonical graphs, exact
partitioning-invariance (the reason the arithmetic is integral), the
reliable-checkpoint variant, edge building from extracted articles,
and the priority merge the politeness scheduler consumes."""

import pytest
from pyspark.sql import functions as F

from risjbot_spark.frontier.rank import (link_graph_ranks, outlink_edges,
                                         prioritize_frontier)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _ranks_dict(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_star_graph_one_iteration(spark):
    # 4 leaves → center. After 1 iter: leaf = base (no inbound) =
    # ((20-17)*1e6) div 20 = 150000; center = 150000 + (17 * 4e6) div 20
    e = _edges(spark, [(f"l{i}", "c") for i in range(4)])
    got = _ranks_dict(link_graph_ranks(e, iterations=1))
    assert got["c"] == 150_000 + (17 * 4_000_000) // 20 == 3_550_000
    assert all(got[f"l{i}"] == 150_000 for i in range(4))


def test_cycle_conserves_mass_exactly(spark):
    # a→b→c→a: every node keeps exactly rank0 forever —
    # 150000 + (17*1e6) div 20 = 1e6. Exact arithmetic means EXACT
    # fixed point, not convergence-to-within-epsilon.
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    for iters in (1, 4):
        got = _ranks_dict(link_graph_ranks(e, iterations=iters))
        assert got == {"a": 1_000_000, "b": 1_000_000, "c": 1_000_000}


def test_out_degree_splits_mass(spark):
    # a → {b, c}: each gets half of a's mass. After 1 iter:
    # b = c = 150000 + (17 * (1e6 div 2)) div 20 = 575000
    e = _edges(spark, [("a", "b"), ("a", "c")])
    got = _ranks_dict(link_graph_ranks(e, iterations=1))
    assert got["b"] == got["c"] == 150_000 + (17 * 500_000) // 20
    assert got["a"] == 150_000  # dangling inbound-less source


def test_partitioning_invariance_bit_exact(spark):
    # the fixed-point claim: same ranks, bit-identical, at any layout.
    # dst depends on id (not just the src residue), so out-degrees vary
    # (1..~30) and ranks genuinely differ across nodes — a pure
    # permutation graph would trivially pass with every rank equal.
    ev = spark.range(0, 3000).select(
        (F.col("id") % 97).cast("string").alias("src"),
        ((F.col("id") * F.col("id") * 31 + 7) % 97).cast("string")
        .alias("dst"),
    ).filter(F.col("src") != F.col("dst")).distinct()
    a = _ranks_dict(link_graph_ranks(ev, iterations=3, num_partitions=2))
    b = _ranks_dict(link_graph_ranks(ev, iterations=3, num_partitions=13))
    assert a == b and len(a) == 97
    assert len(set(a.values())) > 10  # non-degenerate rank spread


def test_reliable_checkpoint_variant(spark, tmp_path):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")])
    local = _ranks_dict(link_graph_ranks(e, iterations=3))
    reli = _ranks_dict(link_graph_ranks(
        e, iterations=3, checkpoint_dir=str(tmp_path / "ckpt")))
    assert local == reli
    assert any((tmp_path / "ckpt").iterdir())  # actually wrote files


def test_outlink_edges_canonicalizes_and_dedups(spark):
    # query stripping is PER-HOST (dailymail registry), matching the
    # reference's split('?')[0] — example.com keeps its query string
    arts = spark.createDataFrame(
        [
            ("https://www.dailymail.co.uk/a",
             ["https://www.dailymail.co.uk/b?ito=feed",
              "https://www.dailymail.co.uk/b",  # dup after canon
              "https://www.dailymail.co.uk/a",  # self-loop
              "https://www.example.com/c#frag"]),
            ("https://www.dailymail.co.uk/b", []),
        ],
        "url_canon string, links array<string>",
    )
    rows = {(r["src"], r["dst"]) for r in outlink_edges(arts).collect()}
    assert rows == {
        ("https://www.dailymail.co.uk/a", "https://www.dailymail.co.uk/b"),
        # fragment stripped for every host
        ("https://www.dailymail.co.uk/a", "https://www.example.com/c"),
    }


def test_prioritize_frontier_merges_ranks(spark):
    e = _edges(spark, [(f"l{i}", "hub") for i in range(4)])
    ranks = link_graph_ranks(e, iterations=1)  # hub=3550000, leaves=150000
    frontier = spark.createDataFrame(
        [("hub", 0), ("l0", 100), ("unranked", 7)],
        "url_canon string, priority int",
    )
    got = {r["url_canon"]: r["priority"]
           for r in prioritize_frontier(frontier, ranks).collect()}
    assert got["hub"] == 355          # 3550000 div 10000 — authority wins
    assert got["l0"] == 100           # explicit spider pin survives
    assert got["unranked"] == 7       # not in graph → untouched


def test_null_priority_treated_as_zero(spark):
    e = _edges(spark, [("a", "b")])
    ranks = link_graph_ranks(e, iterations=1)
    frontier = spark.createDataFrame(
        [("b", None)], "url_canon string, priority int")
    got = prioritize_frontier(frontier, ranks).collect()[0]
    assert got["priority"] == (150_000 + (17 * 1_000_000) // 20) // 10_000


def test_empty_edges_returns_empty(spark):
    e = spark.createDataFrame([], "src string, dst string")
    assert link_graph_ranks(e, iterations=2).count() == 0
