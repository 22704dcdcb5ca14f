"""Distributed PageRank (power iteration) over an edge list.

Companion to dedup.connected_components: the second iterative graph
primitive a corpus pipeline wants (authority/centrality scoring of a
similarity or citation graph, e.g. to pick the canonical document of a
near-dup cluster by importance instead of min-id).

Each iteration is one shuffle join (ranks × edges on src) + one
aggregation (contributions by dst) — the textbook formulation kept
deliberately: no driver-side state beyond the scalar dangling mass and
the convergence delta, lineage truncated per round with localCheckpoint
so plans stay O(1) deep. Dangling nodes (no out-edges) redistribute
their mass uniformly, so ranks sum to 1 at every step (checked in
tests against a dense numpy power iteration)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """(id, rank) for every node in `edges`; ranks sum to 1."""
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).persist()
    nodes = e.select(F.col("u").alias("id")).union(e.select("v")).distinct().persist()
    n = nodes.count()
    outdeg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).persist()
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank")).localCheckpoint(eager=True)
    base = (1.0 - damping) / n
    # one scalar job before the loop; afterwards each round's single
    # collect returns BOTH the convergence delta and the next round's
    # dangling mass, so an iteration costs exactly one action
    dangling = (
        ranks.join(outdeg, ranks.id == outdeg.u, "left_anti")
        .agg(F.sum("rank"))
        .collect()[0][0]
        or 0.0
    )
    for _ in range(max_iter):
        contribs = (
            ranks.join(outdeg, ranks.id == outdeg.u)
            .join(e, "u")
            .select(F.col("v").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("in_mass"))
        )
        new_ranks = (
            nodes.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("in_mass"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        stats = (
            new_ranks.join(ranks.withColumnRenamed("rank", "old"), "id")
            .join(outdeg, new_ranks.id == outdeg.u, "left")
            .agg(
                F.sum(F.abs(F.col("rank") - F.col("old"))).alias("delta"),
                F.sum(F.when(F.col("deg").isNull(), F.col("rank"))).alias("dangling"),
            )
            .collect()[0]
        )
        ranks = new_ranks
        dangling = stats["dangling"] or 0.0
        if stats["delta"] is not None and stats["delta"] < tol:
            break
    e.unpersist()
    nodes.unpersist()
    outdeg.unpersist()
    return ranks
