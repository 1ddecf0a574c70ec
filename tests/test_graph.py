"""PageRank (operators/graph.py) unit behaviors."""

from pyspark.sql import functions as F

from docs_indexer_spark.operators.graph import pagerank


def test_pagerank_mass_conserved_and_hub_wins(spark):
    # star: every leaf points at the hub (0); hub points at leaf 1
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)] + [(0, 1)], "src long, dst long"
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, n_iter=20).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9  # probability mass
    assert ranks[0] == max(ranks.values())        # hub dominates
    assert ranks[1] > ranks[2]                    # hub's target beats leaves
    assert abs(ranks[2] - ranks[5]) < 1e-12       # symmetric leaves tie


def test_pagerank_dangling_mass_redistributed(spark):
    # node 2 has no out-edges: its mass must recirculate, total stays 1
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node long")
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(edges, n_iter=15, nodes=nodes).collect()
    }
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert ranks[2] == max(ranks.values())  # chain sink collects most


def test_pagerank_isolated_node_keeps_base_rank(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    nodes = spark.createDataFrame([(0,), (1,), (9,)], "node long")
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(edges, n_iter=10, nodes=nodes).collect()
    }
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert ranks[9] > 0  # isolated vertex still holds base + dangling share
