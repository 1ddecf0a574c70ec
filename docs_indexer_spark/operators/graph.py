"""Link-graph analytics for web corpora.

PageRank (Brin & Page 1998) over a (src, dst) edge relation — the
canonical web-scale iterative operator, used here the way crawl
pipelines use it: rank hosts/pages to prioritize crawl budget and as a
document-quality prior.

Spark shape: pure DataFrame power iteration.  Each round is ONE shuffle
keyed by ``dst`` (contributions aggregate with map-side combine) plus
one scalar aggregate for the dangling mass; lineage is cut with
``localCheckpoint`` every few rounds exactly like the
connected-components loop in operators/dedup.py, so a 50-iteration run
does not accumulate a 50-stage plan.  At 10^12 edges the per-round cost
is the one edge-sized shuffle — the optimal distributed shape short of
Pregel-style vertex caching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    nodes: DataFrame | None = None,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Power-iteration PageRank.

    ``edges``: (src long, dst long), duplicates = parallel edges (each
    contributes).  ``nodes``: optional (node long) relation pinning the
    vertex set (isolated vertices get rank mass too); defaults to the
    distinct endpoints of ``edges``.  Fixed ``n_iter`` rounds — the
    deterministic contract an external oracle can replay exactly.

    Dangling nodes (no out-edges) redistribute their mass uniformly —
    the standard formulation:

        r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/outdeg(u) + D/N)

    where ``D`` is the total dangling mass of the previous round.
    """
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
    nodes = nodes.select("node").persist()
    n = nodes.count()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outd")).persist()
    ranks = nodes.withColumn("r", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for i in range(n_iter):
        dangling = (
            ranks.join(deg, ranks.node == deg.src, "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            edges.join(deg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("r") / F.col("outd")).alias("contrib"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(base)
                + damping
                * (F.coalesce(F.col("contrib"), F.lit(0.0))
                   + F.lit(float(dangling) / n))
            ).alias("r"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint()
    # materialize the final ranks, then release the cached inputs — the
    # same no-session-lifetime-leak contract pack_sequences follows
    out = ranks.select("node", F.col("r").alias("rank")).localCheckpoint()
    nodes.unpersist()
    deg.unpersist()
    return out
