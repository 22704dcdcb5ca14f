"""Distributed PageRank (power iteration) over an edge list.

Companion to dedup.connected_components: the second iterative graph
primitive a corpus pipeline wants (authority/centrality scoring of a
similarity or citation graph, e.g. to pick the canonical document of a
near-dup cluster by importance instead of min-id).

The edge list is pre-aggregated ONCE into chunked adjacency arrays
(one row per src, hot sources split into ≤CHUNK-neighbor rows), so each
iteration shuffles |V|-ish adjacency rows instead of |E| edge rows: one
join (ranks × adjacency on src) + one aggregation (exploded
contributions by dst, map-side combined). No driver-side state beyond
the scalar dangling mass and the convergence delta; lineage is
truncated per round with localCheckpoint and the PREVIOUS round's
checkpoint blocks are explicitly released (localCheckpoint data is not
governed by DataFrame.unpersist, so block ids are tracked through the
SparkContext storage registry — same single-threaded-session assumption
as streaming.run_to_table). Dangling nodes (no out-edges) redistribute
their mass uniformly, so ranks sum to 1 at every step (checked in tests
against a dense numpy power iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Max neighbors per adjacency row: bounds the size of any single row at
# 100 TB scale (a celebrity node with 1e8 out-edges becomes ~1e8/65536
# rows instead of one unsplittable giant array).
_ADJ_CHUNK = 1 << 16


def _cached_rdd_ids(spark: SparkSession) -> set[int]:
    sc = spark.sparkContext
    return {info.id() for info in sc._jsc.sc().getRDDStorageInfo()}


def _release_rdds(spark: SparkSession, ids: set[int]) -> None:
    """Unpersist cached RDDs by id — the only handle PySpark exposes to
    localCheckpoint blocks (DataFrame.unpersist only covers CacheManager
    entries)."""
    if not ids:
        return
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        entry = it.next()
        if entry._1() in ids:
            entry._2().unpersist(False)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """(id, rank) for every node in `edges`; ranks sum to 1."""
    spark = edges.sparkSession
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    nodes = e.select(F.col("u").alias("id")).union(e.select("v")).distinct().persist()
    outdeg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).persist()
    # chunked adjacency: co-partitioned join on u (both sides shuffle on
    # u once, here, never again), then ≤_ADJ_CHUNK neighbors per row
    adj = (
        e.join(outdeg, "u")
        .withColumn(
            "chunk",
            F.pmod(
                F.xxhash64("v"),
                F.greatest(F.lit(1), F.ceil(F.col("deg") / _ADJ_CHUNK)),
            ),
        )
        .groupBy("u", "chunk")
        .agg(F.collect_list("v").alias("vs"), F.first("deg").alias("deg"))
        .drop("chunk")
        .persist()
    )
    ranks = None
    ckpt_ids: set[int] = set()
    try:
        n = nodes.count()
        adj.count()  # materialize before the loop so e is scanned once more at most
        before = _cached_rdd_ids(spark)
        # eager=False: the dangling collect below is the first job over
        # `ranks`, so it materializes the checkpoint in the SAME action —
        # one job instead of two (the id diff is taken after that job,
        # when the blocks exist)
        ranks = nodes.select("id", F.lit(1.0 / n).alias("rank")).localCheckpoint(
            eager=False
        )
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
        ckpt_ids = _cached_rdd_ids(spark) - before
        for _ in range(max_iter):
            contribs = (
                ranks.join(adj, ranks.id == adj.u)
                .select(
                    F.explode("vs").alias("id"),
                    (F.col("rank") / F.col("deg")).alias("c"),
                )
                .groupBy("id")
                .agg(F.sum("c").alias("in_mass"))
            )
            before = _cached_rdd_ids(spark)
            # eager=False: the stats collect is the round's ONE action —
            # it materializes the new checkpoint and returns delta +
            # dangling together (was two jobs per round with eager=True,
            # measured ~20% of q96 at sf0.1 in scheduler overhead)
            new_ranks = (
                nodes.join(contribs, "id", "left")
                .select(
                    "id",
                    (
                        F.lit(base)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("in_mass"), F.lit(0.0))
                            + F.lit(dangling / n)
                        )
                    ).alias("rank"),
                )
                .localCheckpoint(eager=False)
            )
            stats = (
                new_ranks.join(ranks.withColumnRenamed("rank", "old"), "id")
                .join(outdeg, new_ranks.id == outdeg.u, "left")
                .agg(
                    F.sum(F.abs(F.col("rank") - F.col("old"))).alias("delta"),
                    F.sum(F.when(F.col("deg").isNull(), F.col("rank"))).alias(
                        "dangling"
                    ),
                )
                .collect()[0]
            )
            new_ckpt_ids = _cached_rdd_ids(spark) - before
            ranks = new_ranks
            _release_rdds(spark, ckpt_ids)  # prev round's blocks, no longer referenced
            ckpt_ids = new_ckpt_ids
            dangling = stats["dangling"] or 0.0
            if stats["delta"] is not None and stats["delta"] < tol:
                break
    except BaseException:
        # the in-flight checkpoints are not returned to the caller: free them
        _release_rdds(spark, ckpt_ids)
        raise
    finally:
        nodes.unpersist()
        outdeg.unpersist()
        adj.unpersist()
    # NOTE: the final `ranks` checkpoint stays cached — it IS the result
    # (its lineage was truncated, so releasing it would lose the data).
    return ranks


def pagerank_canonicals(
    pairs: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    damping: float = 0.85,
    max_iter: int = 12,
) -> DataFrame:
    """Importance-based canonical selection over an undirected pair list
    (near-dup pairs): PageRank the symmetrized graph, connected-component
    it, and return per component the top-ranked member.

    Output columns: component, canonical_id, canonical_rank, n_members,
    plus the graph-global n_nodes and total_mass (for invariant checks:
    total_mass ≈ 1 and every rank ≥ (1-damping)/n_nodes). Ties on rank
    break by id ascending so selection is deterministic.
    """
    from pyspark.sql import Window

    from .dedup import connected_components

    sym = pairs.select(F.col(id1).alias("src"), F.col(id2).alias("dst")).union(
        pairs.select(F.col(id2).alias("src"), F.col(id1).alias("dst"))
    )
    ranks = pagerank(sym, damping=damping, max_iter=max_iter)
    comp = connected_components(pairs, id1, id2)
    joined = comp.join(ranks, "id")
    # The two graph-global invariants come from a partial/final aggregate
    # broadcast back as a 1-row cross join — an unpartitioned window here
    # would funnel every node row through a single partition.
    glob = joined.agg(
        F.count(F.lit(1)).alias("n_nodes"), F.sum("rank").alias("total_mass")
    )
    w = Window.partitionBy("component").orderBy(F.desc("rank"), "id")
    return (
        joined.crossJoin(F.broadcast(glob))
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(Window.partitionBy("component")))
        .filter(F.col("rk") == 1)
        .select(
            "component",
            F.col("id").alias("canonical_id"),
            F.col("rank").alias("canonical_rank"),
            "n_members",
            "n_nodes",
            "total_mass",
        )
    )
