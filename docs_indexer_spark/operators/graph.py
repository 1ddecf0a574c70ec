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
    broadcast_ranks_limit: int = 10_000_000,
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

    ``checkpoint_every`` is retained for API compatibility but inert:
    every round now checkpoints eagerly (each round is exactly one job
    and the previous round's blocks are freed immediately, which r6
    measured strictly faster than batching checkpoints with driver-side
    dangling collects between them).
    """
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
    nodes = nodes.select("node").persist()
    n = nodes.count()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outd"))
    # two loop-invariant relations, built once:
    # - ew: edges pre-joined with out-degrees (the old plan re-joined
    #   edges ⨝ deg every round);
    # - nflag: every node with a has_out marker, so the per-round
    #   dangling mass is a FILTERED SUM over the rank relation itself
    #   instead of an anti-join against deg.
    ew = edges.join(deg, "src").select("src", "dst", "outd").persist()
    nflag = nodes.join(
        ew.select(F.col("src").alias("node")).distinct()
        .withColumn("_has_out", F.lit(True)),
        "node",
        "left",
    ).select(
        "node", F.coalesce("_has_out", F.lit(False)).alias("_has_out")
    ).persist()
    ranks = nflag.withColumn("r", F.lit(1.0 / n)).localCheckpoint()
    base = (1.0 - damping) / n
    for i in range(n_iter):
        # dangling mass stays a 1-row RELATION cross-joined into the
        # round's plan instead of a driver collect: the old shape ran two
        # jobs per round (a collect that re-executed the previous rounds'
        # lineage, then the contribs round itself).  One eager
        # localCheckpoint per round materializes everything exactly once
        # and keeps each round's plan one join + one aggregate deep.
        dangling = (
            ranks.filter(~F.col("_has_out"))
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("_D"))
        )
        # below the gate the rank relation (n rows of 16 B) broadcasts, so
        # the round's only exchange is the dst-keyed aggregate; above it
        # (web-scale graphs) the shuffle join is the right plan and AQE
        # picks the strategy from real sizes.
        rank_side = ranks.select(F.col("node").alias("src"), "r")
        if n <= broadcast_ranks_limit:
            rank_side = F.broadcast(rank_side)
        contribs = (
            ew.join(rank_side, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("r") / F.col("outd")).alias("contrib"))
        )
        new_ranks = nflag.join(contribs, "node", "left").crossJoin(
            F.broadcast(dangling)
        ).select(
            "node",
            "_has_out",
            (
                F.lit(base)
                + damping
                * (F.coalesce(F.col("contrib"), F.lit(0.0))
                   + F.col("_D") / F.lit(float(n)))
            ).alias("r"),
        )
        prev = ranks
        ranks = new_ranks.localCheckpoint()
        prev.unpersist()
    # release the cached inputs — the same no-session-lifetime-leak
    # contract pack_sequences follows
    out = ranks.select("node", F.col("r").alias("rank"))
    nodes.unpersist()
    ew.unpersist()
    nflag.unpersist()
    return out
