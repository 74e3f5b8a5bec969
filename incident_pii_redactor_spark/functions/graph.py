"""Connected components over candidate-pair edges — exact cluster
assignment for dedup (a near-dup CHAIN A-B-C is one cluster with one
keeper, where the one-step min-wins policy in jobs/dedup.py keeps A and
drops B,C without ever confirming A-C).

Algorithm: iterative minimum-label propagation — every node repeatedly
takes the min of its own label and its neighbors' labels until a fixed
point; converges in O(graph diameter) rounds. Each round is one
key-partitioned join + aggregate (no driver-side graph state), and the
per-round ``localCheckpoint`` truncates the lineage — without it the
plan doubles every iteration and the optimizer chokes long before the
data does. At extreme scale with long chains, the
large-star/small-star formulation (Kiveris et al. 2014, "Connected
Components in MapReduce and Beyond") drops the round count to
O(log n); web near-dup graphs have tiny diameters (mirror clusters are
near-cliques), so plain propagation is the right default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id of the component. Raises if the
    fixed point is not reached within ``max_iter`` rounds (graph
    diameter exceeds the budget) rather than returning a silently
    under-merged labeling."""
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(
        sym.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node")).distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = (
            sym.join(
                labels.select(F.col("node").alias("v"),
                              F.col("comp").alias("vcomp")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vcomp").alias("nbr_min"))
        )
        new = (
            labels.join(nbr.withColumnRenamed("u", "node"), "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"),
                    F.coalesce("nbr_min", F.col("comp")),
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)  # truncate iterative lineage
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        prev, labels = labels, new
        # drop the superseded generation's last reference NOW: its
        # localCheckpoint blocks are freed by refcount-driven JVM
        # cleanup, so at most two generations (plus sym) are ever live —
        # not max_iter of them
        del prev
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components: no fixed point within {max_iter} rounds "
        "(graph diameter exceeds the budget) — raise max_iter or use a "
        "large-star/small-star implementation for long-chain graphs"
    )


def cluster_keepers(edges: DataFrame, src: str = "id_a",
                    dst: str = "id_b", max_iter: int = 20) -> DataFrame:
    """(node, keeper) for every node in ``edges`` — ``keeper`` is the
    component minimum; rows with node != keeper are the exact drop set
    for cluster-level dedup."""
    cc = connected_components(edges, src, dst, max_iter)
    return cc.select("node", F.col("comp").alias("keeper"))
