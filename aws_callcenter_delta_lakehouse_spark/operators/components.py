"""Connected components over a pair graph — near-dup CLUSTERING.

Pairwise near-dup detection (dedup.py) yields edges; curation needs
clusters ("these 5 docs are all the same article") and one canonical
representative per cluster. Component id := min doc id reachable.

Algorithm: iterative min-label propagation in pure DataFrame ops —
each round, every vertex takes the min of its own label and its
neighbors' labels; stop when no label changed. Rounds = graph diameter
(near-dup clusters are shallow — a handful of rounds); each round is
one join + one aggregate, all shuffles on the vertex key. The driver
loop checks only a scalar convergence count per round — no data is
collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_iterations: int = 25,
) -> DataFrame:
    """(vertex, component) for every vertex appearing in ``edges``;
    component = min vertex id in the connected component."""
    # Materialize the edge list ONCE — without this every iteration
    # re-executes the (possibly expensive) upstream plan that produced
    # the edges, e.g. a full MinHash-LSH pipeline.
    sym = (
        edges.select(F.col(src).alias("v"), F.col(dst).alias("u"))
        .union(edges.select(F.col(dst).alias("v"), F.col(src).alias("u")))
        .distinct()
    ).localCheckpoint()
    labels = (
        sym.select("v").distinct().withColumn("component", F.col("v"))
    ).localCheckpoint()

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels.withColumnsRenamed({"v": "u", "component": "u_comp"}), on="u")
            .groupBy("v")
            .agg(F.min("u_comp").alias("n_comp"))
        )
        updated = (
            labels.join(neighbor_min, on="v", how="left")
            .select(
                "v",
                F.least(
                    F.col("component"), F.coalesce("n_comp", F.col("component"))
                ).alias("component"),
                (F.coalesce("n_comp", F.col("component")) < F.col("component")).alias(
                    "__changed"
                ),
            )
        ).localCheckpoint()  # truncate the lineage each round
        changed = updated.filter(F.col("__changed")).count()
        labels = updated.drop("__changed")
        if changed == 0:
            break
    return labels.select(F.col("v"), "component")


def cluster_summary(components: DataFrame) -> DataFrame:
    """Per-cluster rollup: size + canonical representative (the min id,
    which IS the component id)."""
    return components.groupBy("component").agg(
        F.count("*").alias("n_members"),
        F.min("v").alias("representative"),
    )
