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


DRIVER_CC_MAX_EDGES = 1_000_000


def _driver_components(pairs: list, spark, nodes: DataFrame | None):
    """Union-find on the driver for small edge sets (≤ bounded count).

    Still deterministic (component = min member id) and still safe for
    huge NODE sets: only edge-touched nodes are collected; isolated
    nodes get their label via a left join + coalesce, never leaving
    the executors.
    """
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {x for ab in pairs for x in ab}
    members: dict[str, str] = {}
    for n in touched:
        r = find(n)
        members[r] = min(members.get(r, n), n)
    comps = spark.createDataFrame(
        [(n, members[find(n)]) for n in sorted(touched)],
        "node string, component string",
    )
    if nodes is None:
        return comps
    # labels cover edge-nodes ∪ nodes: isolated extras label themselves
    extra = (
        nodes.select("node")
        .join(F.broadcast(comps.select("node")), "node", "left_anti")
        .withColumn("component", F.col("node"))
    )
    return comps.unionByName(extra)


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """edges(src, dst) [+ nodes(node)] → (node, component).

    ``component`` is the min node id (string order) reachable from
    ``node``.  Isolated nodes appear only if given via ``nodes``.

    Hybrid execution: below DRIVER_CC_MAX_EDGES edges the component
    computation runs as driver-side union-find (the edge table is the
    *similarity graph over distinct surfaces*, orders of magnitude
    smaller than the corpus — at small scale the distributed loop
    would be pure scheduling overhead); above it, the bounded hash-min
    label-propagation loop below handles arbitrarily large graphs.
    """
    # materialize the symmetric edge table ONCE — without this the
    # whole upstream edge pipeline (blocking + similarity UDFs) would
    # re-execute inside every propagation round
    sym = (
        edges.select(F.col("src"), F.col("dst"))
        .unionByName(edges.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    n_edges = sym.count()
    if n_edges <= DRIVER_CC_MAX_EDGES:
        pairs = [(r.src, r.dst) for r in sym.collect()]
        return _driver_components(pairs, edges.sparkSession, nodes)

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
