"""Duplicate clustering: iterative min-label connected components.

The reference's end product is a cluster assignment per key (the paper's
"clustering-preserving" guarantee — keys grouped by value similarity,
``Sketching/LSSFingerprintAtomic.java:474-498``).  Ours is the duplicate
cluster label per doc, computed with DataFrame-only iterative min-label
propagation (union-find analogue; SURVEY §4.2 item 2):

  label(v) ← min(label(v), min over neighbors u of label(u))

repeated to fixpoint.  Deterministic and order-independent (min is
commutative/associative), so labels are identical at any parallelism level —
the engine's analogue of "same config ⇒ same clusters".  Canonical member =
min(doc_id).  ``localCheckpoint`` each round truncates the lineage that
iterative joins otherwise accumulate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """vertices(id), edges(id1, id2) → (doc_id, cluster_id).

    cluster_id = min doc_id reachable in the undirected graph.  Isolated
    vertices label themselves.  Converges in O(diameter) rounds — duplicate
    clusters are near-cliques from LSH banding, so 2-4 rounds in practice.
    """
    labels = vertices.select(F.col(id_col).cast("long").alias("id")).distinct()
    labels = labels.withColumn("label", F.col("id"))

    sym = (
        edges.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
        .unionByName(edges.select(F.col("id2").alias("src"), F.col("id1").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    for it in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.src == labels.id)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.dst, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                F.col("label").alias("old_label"),
            )
        ).localCheckpoint(eager=True)
        labels = new_labels.select("id", "label")
        # duplicate clusters are near-cliques: ≥2 rounds are always needed,
        # so the convergence-count job (one extra Spark job per round) only
        # starts at round 3
        if it >= 2:
            changed = new_labels.filter(F.col("label") != F.col("old_label")).count()
            if changed == 0:
                break

    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def cluster_stats(assignments: DataFrame, documents: DataFrame | None = None,
                  id_col: str = "doc_id") -> DataFrame:
    """Per-cluster size + canonical doc (avg-estimator analogue,
    ``Sketching/LSSEntryFinger.java:70-80`` — the shared-cell summary that
    answers queries for every member)."""
    return assignments.groupBy("cluster_id").agg(
        F.count("*").alias("size"),
        F.min(id_col).alias("canonical_doc_id"),
    )
