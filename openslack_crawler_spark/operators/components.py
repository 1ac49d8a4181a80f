"""Distributed connected components — dedup-cluster assignment over a
near-duplicate pair graph (the canonical "which docs are the same
document" step after MinHash/SimHash candidate generation).

Algorithm: iterative min-label propagation (the DataFrame form of
large-star/small-star): every vertex holds the smallest doc_id it has
seen; each round propagates labels across edges until a fixed point.
Converges in O(diameter) rounds; each round is one shuffle on the edge
list. Near-dup graphs are overwhelmingly tiny cliques (diameter ≤ 2-3),
so 3-6 rounds close real workloads; checkpointing every round keeps
lineage flat for long chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """edges(src, dst) undirected → (node, component) where component =
    min node id reachable. Pure DataFrame ops; one shuffle per round."""
    sym = edges.selectExpr(f"{src} as a", f"{dst} as b").union(
        edges.selectExpr(f"{dst} as a", f"{src} as b")
    )
    sym = sym.distinct().localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # candidate labels arriving over edges
        incoming = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), "component")
        )
        new_labels = (
            labels.select("node", "component")
            .unionByName(incoming)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
