"""Iterative graph operators on DataFrames (SURVEY §2.9: "connected
components via iterative DataFrame joins" — the dedup-cluster step after
near-dup pair generation).

hash-to-min connected components: every node repeatedly adopts the
minimum label in its closed neighborhood; converges in O(diameter)
rounds.  Each round is one join + one groupBy — at 100 TB both shuffle
on node id (uniform), and the label frame shrinks to |V| rows
regardless of |E|.  The driver loop is control flow only (a convergence
counter), never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label each node with the min node id of its connected component.

    ``nodes``: one column ``node_col`` (singletons allowed); ``edges``:
    undirected pairs (src, dst).  Returns (node_col, component).
    Deterministic: the component id is the component's minimum node id.
    """
    both = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    labels = nodes.select(
        F.col(node_col).alias("a"), F.col(node_col).alias("comp")
    ).cache()
    labels.count()

    for _ in range(max_iter):
        # candidate labels: my own + each neighbor's current label
        neighbor = both.join(
            labels.withColumnRenamed("a", "b2"), both.b == F.col("b2")
        ).select("a", "comp")
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("a")
            .agg(F.min("comp").alias("comp"))
            .cache()
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("comp", "old"), "a"
            )
            .filter(F.col("comp") != F.col("old"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("a").alias(node_col), "comp")
