"""PageRank: driver/distributed path equivalence + rank invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamroom_bigdata_spark.operators import graph


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return df.unionByName(
        df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def test_driver_and_distributed_paths_agree(spark):
    """Same graph through the numpy fast path and the iterative Spark loop:
    ranks equal to well below the query's round-5 output precision."""
    pairs = [(i, (i * 7 + 3) % 40 + 100) for i in range(60)] + [
        (i, (i + 1) % 20) for i in range(20)
    ]
    edges = _sym(spark, pairs)
    fast = {r.id: r.rank for r in graph.pagerank(edges).collect()}
    dist = {
        r.id: r.rank
        for r in graph.pagerank(edges, small_graph_threshold=0).collect()
    }
    assert set(fast) == set(dist)
    assert all(abs(fast[k] - dist[k]) < 1e-9 for k in fast)


def test_rank_mass_is_conserved(spark):
    """Symmetrized graph has no dangling nodes → total rank stays 1."""
    edges = _sym(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)])
    ranks = graph.pagerank(edges).collect()
    assert abs(sum(r.rank for r in ranks) - 1.0) < 1e-9


def test_hub_outranks_leaves(spark):
    """Star graph: the hub collects damped mass from every leaf."""
    edges = _sym(spark, [(0, i) for i in range(1, 11)])
    ranks = {r.id: r.rank for r in graph.pagerank(edges).collect()}
    assert all(ranks[0] > ranks[i] for i in range(1, 11))


def test_transactions_query_shape(spark, sf_dir):
    rows = graph.pagerank_transactions(spark, sf_dir).collect()
    assert abs(sum(r.pagerank for r in rows) - 1.0) < 1e-3  # round-5 output
    assert {r.node_type for r in rows} == {"customer", "supplier"}
    assert all(r.pagerank > 0 for r in rows)
