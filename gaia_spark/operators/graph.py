"""J5 — connected components as a bounded hash-min label-propagation loop.

Needed by NIL clustering (T4b), event coref (T10), and — if ever built —
visual coref (V5); SURVEY.md §2.6.  No GraphFrames dependency: labels
are propagated with plain joins + min() aggregations, converging in
O(log n) rounds on the short-chain graphs alias clusters form.

Determinism: the component label is the lexicographic min node id — an
order-free aggregate, so the result is identical under any partitioning,
task order, or retry (SURVEY.md §4.3.5).

Scale: each round is one shuffle join + one shuffle agg over the label
frontier; ``localCheckpoint`` truncates lineage so plans stay flat at
any round count (SURVEY.md §4.3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """edges(src, dst) [+ nodes(node)] → (node, component).

    ``component`` is the min node id (string order) reachable from
    ``node``.  Isolated nodes appear only if given via ``nodes``.
    """
    sym = (
        edges.select(F.col("src"), F.col("dst"))
        .unionByName(edges.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))
        .distinct()
    )
    node_df = sym.select(F.col("src").alias("node")).distinct()
    if nodes is not None:
        node_df = node_df.unionByName(
            nodes.select(F.col("node"))).distinct()
    labels = node_df.withColumn("component", F.col("node")).localCheckpoint()

    for _ in range(max_iter):
        prop = (
            sym.join(labels, sym.dst == labels.node)
            .select(sym.src.alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(prop)
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
