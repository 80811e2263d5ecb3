"""Connected components via iterative DataFrame label propagation.

Canonicalization stage: link-edges from LSH blocking partition surfaces into
equivalence classes; each class takes min(node_id) as its canonical id.

Algorithm: symmetric min-label propagation —
``label(v) ← min(label(v), min over neighbors(label(u)))`` iterated to
fixpoint. Each iteration is one hash-join + one aggregation (two shuffles,
both on the same key → Spark reuses the exchange). Convergence is checked
with a cheap count of changed labels; lineage is truncated every iteration
via localCheckpoint so the plan doesn't grow unboundedly. For the graph
sizes this stage sees (mention-surface dedup: components are tiny, diameter
rarely >3) propagation converges in a handful of rounds; at 10^12-file scale
the same loop runs with checkpointing to durable storage instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Returns (id, component) where component = min id in the class."""
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)
    labels = vertices.select(F.col(id_col).alias("id"), F.col(id_col).alias("component"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
