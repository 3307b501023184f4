"""Distributed graph centrality on DataFrames.

PageRank to a fixed iteration count — the corpus-curation use is
ranking documents/sources by centrality in a similarity or citation
graph (e.g. rank near-dup cluster members, weight sources by how much
the rest of the corpus points at them). Connected components live in
operators/dedup.py (min-label propagation + small-star/large-star);
this module adds the weighted-influence complement.

Scale shape (the same discipline as dedup_clusters):
* Ranks and edges are (id, id/double) frames — the payload never
  enters the loop.
* Each iteration is ONE join ranks⋈edges on src (both sides hash on
  src; after the first iteration AQE reuses the exchange on the edge
  side because the edge frame is persisted pre-partitioned) and ONE
  map-side-combined groupBy dst.
* ``localCheckpoint`` per iteration caps the lineage (an unchecked
  5-deep join lineage re-executes everything on a retry; at 10^12
  edges that is the difference between a task retry and a job retry).
* No collect: the (1-d)/N teleport term folds in via a broadcast
  one-row count frame, never a driver-side count().

Reference analog: none (the reference is a record-at-a-time validator,
/root/reference/src/validate.py); published algorithm per Page et al.
1999, expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list with columns
    (src, dst). Returns (node, rank). Nodes are every id appearing as
    src or dst; dangling nodes (no out-edges) leak their mass to the
    teleport term only — callers wanting strict mass conservation
    should symmetrize the edge list first (the bipartite corpus graphs
    this ships for are symmetrized by construction).

    Deterministic up to float summation order; callers comparing
    across engines should round (the driver query rounds at 6, the
    same contract as every ln/division in the corpus tier).
    """
    if not isinstance(iterations, int) or isinstance(iterations, bool) or iterations < 1:
        raise ValueError(f"iterations must be a positive int, got {iterations!r}")
    e = edges.select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("outdeg"))
    # edge frame with per-edge share weight, persisted once — every
    # iteration re-reads this exact partitioning instead of recomputing
    # the distinct + degree aggregation
    shares = (
        e.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .repartition("src")
        .persist()
    )
    n1 = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank"), "__n"
    ).localCheckpoint(eager=True)
    try:
        for _ in range(iterations):
            contrib = (
                ranks.join(shares, ranks["node"] == shares["src"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("rank") * F.col("w")).alias("__in"))
            )
            ranks = (
                ranks.select("node", "__n")
                .join(contrib, "node", "left")
                .select(
                    "node",
                    (
                        (1.0 - damping) / F.col("__n")
                        + damping * F.coalesce(F.col("__in"), F.lit(0.0))
                    ).alias("rank"),
                    "__n",
                )
                .localCheckpoint(eager=True)
            )
    finally:
        shares.unpersist()
    return ranks.select("node", "rank")
