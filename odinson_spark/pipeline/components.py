"""Connected components via iterative DataFrame algorithms.

Canonicalization stage: link-edges from LSH blocking partition surfaces into
equivalence classes; each class takes min(node_id) as its canonical id.

Two implementations:

* :func:`connected_components` — symmetric min-label propagation
  (``label(v) ← min(label(v), min over neighbors(label(u)))`` to fixpoint).
  One hash-join + one aggregation per round, O(diameter) rounds. Right for
  the shapes this stage actually sees (mention-surface dedup: components are
  tiny, diameter rarely >3). Exiting at ``max_iterations`` with labels still
  changing now RAISES by default (silent non-convergence would split one
  entity class into several canonical ids).
* :func:`connected_components_star` — alternating large-star/small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14):
  converges in O(log n) rounds regardless of diameter, so a path-shaped
  component of length 10^6 still finishes. The scale path for adversarial
  graph shapes; each round is two self-aggregating shuffles on node id.

Both truncate lineage per round via localCheckpoint so the plan doesn't grow
unboundedly; at 10^12-file scale the same loops run with checkpointing to
durable storage instead.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 20,
    on_nonconvergence: str = "raise",
) -> DataFrame:
    """Returns (id, component) where component = min id in the class.

    ``on_nonconvergence``: behavior when labels are still changing after
    ``max_iterations`` — ``"raise"`` (default; wrong labels must not silently
    flow into canonicalization), ``"warn"``, or ``"ignore"``. Propagation
    needs O(diameter) rounds; for high-diameter graphs use
    :func:`connected_components_star` instead.
    """
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)
    labels = vertices.select(F.col(id_col).alias("id"), F.col(id_col).alias("component"))
    labels = labels.localCheckpoint(eager=True)
    changed = 0
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_comp = F.least(
            F.col("component"), F.coalesce("nbr_component", F.col("component"))
        )
        new_labels = labels.join(
            neighbor_min, labels["id"] == neighbor_min["src"], "left"
        ).select(
            "id",
            new_comp.alias("component"),
            # convergence flag computed inside the same row pass: the count
            # below both materializes the (lazy) checkpoint and answers
            # "did anything change" — ONE Spark job per round, not a
            # checkpoint job plus a join-the-old-labels job
            (new_comp != F.col("component")).alias("_changed"),
        )
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    if changed != 0:
        msg = (
            f"connected_components did not converge in {max_iterations} "
            f"iterations (component diameter exceeds the budget); labels are "
            f"INCOMPLETE — raise max_iterations or use connected_components_star"
        )
        if on_nonconvergence == "raise":
            raise RuntimeError(msg)
        if on_nonconvergence == "warn":
            warnings.warn(msg, RuntimeWarning)
    return labels


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(Γ(u) ∪ {u})."""
    nbrs = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = nbrs.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        nbrs.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient every edge high→low; for each node u connect all of its smaller
    neighbors (and u itself) to min(Γ≤(u) ∪ {u})."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    pairs = oriented.join(mins, "u")
    child_edges = pairs.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edges = mins.select(F.col("u"), F.col("m").alias("v"))
    return child_edges.union(self_edges).distinct()


def connected_components_star(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Large-star/small-star connected components: O(log n) rounds regardless
    of component diameter. Returns (id, component), component = min id.

    Convergence = the oriented edge set is stable across a round (every
    component is then a star centered at its min node). ``max_iterations``
    is a safety net far above log2 of any real graph; hitting it raises.
    """
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iterations):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        diff = (
            e2.exceptAll(e).limit(1).count() + e.exceptAll(e2).limit(1).count()
        )
        e = e2
        if diff == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iterations} rounds"
        )
    # stars point child → center(min); isolated vertices label themselves
    labels = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    ids = vertices.select(F.col(id_col).alias("id"))
    return (
        ids.join(labels, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )
