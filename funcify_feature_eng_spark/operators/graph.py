"""Distributed connected components — dup-cluster assembly for dedup.

Near-dup detection (MinHash/SimHash) emits PAIRS; retention policies need
CLUSTERS (keep one representative per connected component of the dup graph).
Components are computed by iterative minimum-label propagation: each node
adopts the smallest label among itself and its neighbors until fixpoint —
the alternating small-star/large-star trick (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14) bounds the iteration count to
O(log n) on real graphs; plain propagation used here converges in
O(diameter) rounds, which for dup clusters (dense, tiny diameter) is ~2-3.
Each round is one shuffle on node id; convergence is a driver-side count of
changed labels (O(1) result per round, not a collect of the data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the
    component id is the MINIMUM node id in the component (canonical,
    deterministic)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    # localCheckpoint (eager) per round truncates the lazy lineage — without
    # it an N-round loop hands downstream consumers an N-times-unrolled plan
    # (thousands of phantom exchanges in EXPLAIN, ballooning analysis time)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        # neighbor minimum: node <- min(comp over neighbors ∪ self)
        nbr = (
            sym.join(labels.withColumnRenamed("node", "b"), on="b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr, on="node", how="left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels


def keep_best_per_cluster(
    docs: DataFrame,
    components: DataFrame,
    id_col: str,
    quality_col: str,
) -> DataFrame:
    """Retention policy: within each dup cluster keep the highest-quality
    document (ties break on the smaller id); singletons (docs with no dup
    pair) are kept as-is. Returns the surviving rows of ``docs``."""
    joined = docs.join(
        components.withColumnRenamed("node", id_col), on=id_col, how="left"
    )
    grp = F.coalesce(F.col("comp"), F.col(id_col))
    best = (
        joined.withColumn("__grp", grp)
        .groupBy("__grp")
        .agg(
            F.max_by(
                F.col(id_col),
                F.struct(F.col(quality_col).alias("q"), (-F.col(id_col)).alias("nid")),
            ).alias("__keep")
        )
    )
    return (
        joined.withColumn("__grp", grp)
        .join(best, on="__grp")
        .filter(F.col(id_col) == F.col("__keep"))
        .drop("__grp", "__keep", "comp")
    )
