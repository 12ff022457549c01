"""J5 — connected components as a hash-min + pointer-doubling loop.

Needed by NIL clustering (T4b), event coref (T10), and — if ever built —
visual coref (V5); SURVEY.md §2.6.  No GraphFrames dependency: labels
are propagated with plain joins + min() aggregations.  Each round does
(a) a one-hop edge propagation AND (b) a pointer-doubling step
(component ← component-of-component), so convergence is O(log diameter)
— a 10k-node chain closes in ~14 rounds, not 10k.  Hitting ``max_iter``
with changes still pending raises instead of silently returning split
components.

Determinism: the component label is the lexicographic min node id — an
order-free aggregate, so the result is identical under any partitioning,
task order, or retry (SURVEY.md §4.3.5).

Scale: each round is one shuffle join + one shuffle agg over the label
frontier; ``localCheckpoint`` truncates lineage so plans stay flat at
any round count (SURVEY.md §4.3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


DRIVER_CC_MAX_EDGES = 1_000_000


def _driver_components(pairs: list, spark, nodes: DataFrame | None,
                       node_type=None):
    """Union-find on the driver for small edge sets (≤ bounded count).

    Still deterministic (component = min member id) and still safe for
    huge NODE sets: only edge-touched nodes are collected; isolated
    nodes get their label via a left join + coalesce, never leaving
    the executors.  ``node_type`` is the Spark DataType of the node
    ids (defaults to string); Python min/max agrees with both Spark's
    and DuckDB's min for strings AND integers, so the label is
    engine-independent either way.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    parent: dict = {}

    def find(x):
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
    members: dict = {}
    for n in touched:
        r = find(n)
        members[r] = min(members.get(r, n), n)
    node_type = node_type or StringType()
    comps = spark.createDataFrame(
        [(n, members[find(n)]) for n in sorted(touched)],
        StructType([StructField("node", node_type, False),
                    StructField("component", node_type, False)]),
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
    would be pure scheduling overhead); above it, the distributed
    hash-min + pointer-doubling loop below handles arbitrarily large
    graphs in O(log diameter) rounds.

    Raises ``RuntimeError`` if the distributed loop has not converged
    after ``max_iter`` rounds — a partial labeling is a wrong answer,
    never a degraded one (a component silently split in two corrupts
    every downstream keeper election / cluster merge).  With pointer
    doubling the default 25 rounds covers diameters up to ~2^25.
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
        return _driver_components(pairs, edges.sparkSession, nodes,
                                  node_type=sym.schema["src"].dataType)

    node_df = sym.select(F.col("src").alias("node")).distinct()
    if nodes is not None:
        node_df = node_df.unionByName(
            nodes.select(F.col("node"))).distinct()
    labels = node_df.withColumn("component", F.col("node")).localCheckpoint()

    converged = False
    for _ in range(max_iter):
        # (a) one-hop hash-min: pull each neighbor's current label
        prop = (
            sym.join(labels, sym.dst == labels.node)
            .select(sym.src.alias("node"), "component")
        )
        hopped = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # (b) pointer doubling: component ← component's own component.
        # Every label IS a node id (labels start as node, min() keeps
        # them in the node set), so the self-join always hits; the
        # left+coalesce is belt-and-braces.  This halves the distance
        # to the component root each round → O(log diameter) total.
        ptr = hopped.select(F.col("node").alias("p_node"),
                            F.col("component").alias("p_comp"))
        new_labels = (
            hopped.join(ptr, hopped.component == ptr.p_node, "left")
            .select(hopped.node,
                    F.coalesce("p_comp", "component").alias("component"))
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
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components: not converged after {max_iter} "
            f"rounds over {n_edges} edges — refusing to return a "
            "partial (split-component) labeling; raise max_iter")
    return labels


def khop_reachability(
    edges: DataFrame,
    seeds: DataFrame,
    k: int = 3,
) -> DataFrame:
    """Undirected k-hop BFS from a seed set — → (node, hop) where
    ``hop`` is the MINIMUM number of edges from any seed (≤ k).

    The third iterative kernel next to connected components and
    PageRank: KG neighborhood expansion (entity context windows,
    blast-radius of a bad linker merge, crawl frontier analysis).

    First-visit BFS gives min-hop by construction, so no per-node
    min() re-aggregation is needed: each round expands only the
    CURRENT frontier (nodes first reached last round) through the
    symmetric edge table and anti-joins everything already visited.
    Scale shape: per round one shuffle join keyed on node + one
    left-anti against visited — frontier-sized, not graph-sized;
    lineage truncated per round.  Deterministic: reachability and
    hop counts are set-algebraic (no tie-breaks at all).

    DuckDB twin: recursive CTE over (node, hop ≤ k) pairs + min(hop)
    — see ``sql_khop_reachability``.
    """
    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()  # k consumers — never re-run the edge plan
    )
    visited = seeds.select(F.col("node")).distinct().withColumn(
        "hop", F.lit(0)).localCheckpoint()
    frontier = visited
    for i in range(1, k + 1):
        nxt = (
            sym.join(frontier.select(F.col("node")),
                     sym.src == F.col("node"))
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(i))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited


def sql_khop_reachability(edges_sql: str, seeds_sql: str,
                          k: int = 3) -> str:
    """DuckDB twin: recursive CTE (UNION-deduped (node, hop) pairs,
    bounded by hop < k) + per-node min hop."""
    return f"""
WITH RECURSIVE sym AS (
  SELECT src, dst FROM ({edges_sql})
  UNION
  SELECT dst AS src, src AS dst FROM ({edges_sql})
), reach(node, hop) AS (
  SELECT node, 0 FROM ({seeds_sql})
  UNION
  SELECT e.dst, r.hop + 1
  FROM reach r JOIN sym e ON e.src = r.node
  WHERE r.hop < {k}
)
SELECT node, min(hop)::INT AS hop FROM reach GROUP BY node
"""


# ---------------------------------------------------------------------------
# PageRank — fixed-point integer arithmetic, cross-engine exact
# ---------------------------------------------------------------------------

#: rank unit: 1.0 == 1_000_000 ppm (parts-per-million)
PPM = 1_000_000
DAMPING_X100 = 85


def pagerank(edges: DataFrame, iters: int = 3) -> DataFrame:
    """PageRank over ``edges(src, dst)``, K fixed iterations.

    All arithmetic is BIGINT fixed-point (ppm units) so every engine
    and every partitioning produces the SAME bits: contribution =
    rank DIV out_degree (integer floor division), damping = (85 × sum)
    DIV 100, base = 150_000 ppm.  Floating-point PageRank sums in
    non-deterministic order and can flip a rounded digit between runs;
    integer sums are associative-exact, which is what makes a DuckDB
    oracle (unrolled recursive CTE) hash-identical.

    Dangling nodes keep receiving the base term and leak their own
    mass (no redistribution) — the common "PageRank-without-dangling"
    variant, pinned identically in the SQL twin.

    Scale shape: one shuffle per iteration (contribs groupBy dst) plus
    the rank join keyed on node — the Pregel pattern.  Each iteration
    joins against the SAME edge partitioning, so on a real cluster the
    edge table should be bucketed by src; lineage is truncated per
    iteration so the plan stays flat at any K.
    """
    sym = edges.select("src", "dst").distinct().localCheckpoint()
    nodes = (
        sym.select(F.col("src").alias("node"))
        .unionByName(sym.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    rank = nodes.withColumn(
        "rank_ppm", F.lit(PPM).cast("bigint")).localCheckpoint()
    base = PPM - PPM * DAMPING_X100 // 100
    for _ in range(iters):
        contribs = (
            sym.join(rank, sym.src == rank.node)
            .join(outdeg, "src")
            .select(F.col("dst").alias("node"),
                    F.expr("rank_ppm div outdeg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        rank = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(base).cast("bigint")
                 + F.expr(f"({DAMPING_X100} * coalesce(contrib, 0))"
                          " div 100")).alias("rank_ppm"),
            )
            .localCheckpoint()
        )
    return rank


def sql_pagerank(edges_sql: str, iters: int = 3) -> str:
    """DuckDB twin: the same K iterations unrolled as CTEs."""
    base = PPM - PPM * DAMPING_X100 // 100
    ctes = [
        f"edges AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM edges "
        "UNION SELECT dst FROM edges)",
        "outdeg AS (SELECT src, count(*) AS outdeg FROM edges "
        "GROUP BY src)",
        f"r0 AS (SELECT node, {PPM}::BIGINT AS rank_ppm FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node, "
            f"sum(r.rank_ppm // o.outdeg)::BIGINT AS contrib "
            f"FROM edges e JOIN r{i-1} r ON e.src = r.node "
            f"JOIN outdeg o ON e.src = o.src GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i} AS (SELECT n.node, ({base} + {DAMPING_X100} * "
            f"coalesce(c.contrib, 0) // 100)::BIGINT AS rank_ppm "
            f"FROM nodes n LEFT JOIN c{i} c USING (node))"
        )
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, rank_ppm FROM r{iters}")


# ---------------------------------------------------------------------------
# Graph health metrics over a constructed KG / link graph
# ---------------------------------------------------------------------------


def _undirected(edges: DataFrame) -> DataFrame:
    """Canonical undirected simple edges ``(a < b)``: direction,
    multiplicity, and self-loops removed.  One distinct (= one keyed
    shuffle with map-side combine) over 2-string rows."""
    return (
        edges.select(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """(degree, n_nodes) distribution of the undirected simple graph.

    The first sanity check on any constructed KG (a broken linker
    shows up as a degree spike; web graphs should be Zipf).  Shape:
    two map-side-combined shuffles — node-keyed count, then the
    degree-keyed histogram whose key cardinality is tiny — and only
    (node, degree) pairs ever travel.
    """
    und = _undirected(edges)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


def sql_degree_histogram(edges_sql: str) -> str:
    """DuckDB twin over an ``edges(src, dst)`` relation."""
    return f"""
WITH und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ({edges_sql}) WHERE src <> dst
), deg AS (
  SELECT node, count(*)::BIGINT AS degree FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY node
)
SELECT degree, count(*)::BIGINT AS n_nodes FROM deg GROUP BY degree
"""


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle / wedge census of the undirected simple graph.

    → one row (n_nodes, n_edges, n_wedges, n_triangles); with them
    the global clustering coefficient is 3·tri/wedges.

    Scale shape — degree-ordered orientation: every edge is directed
    from its lower-(degree, id) endpoint to the higher one, so every
    out-neighborhood has size O(√m) regardless of hub degree (a Zipf
    host with 10^6 neighbors contributes NO wedges from its hub side).
    Each triangle {x,y,z} with rank x<y<z is counted exactly once as
    the wedge (x→y, x→z) closed by the oriented edge y→z.  The plan is
    two self-equi-joins keyed on node strings — no driver iteration,
    no cartesian anywhere; AQE handles the skew of the wedge join's
    build side.  The DuckDB twin counts the same triangles with the
    (a<b) value-ordered triple join — orientation changes the cost,
    never the count.
    """
    und = _undirected(edges).localCheckpoint()  # probe + 3 consumers
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ranked = (
        und.join(deg.select(F.col("node").alias("a"),
                            F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"),
                         F.col("deg").alias("db")), "b")
    )
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    oriented = ranked.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower_first, F.struct(F.col("db").alias("d"),
                                     F.col("b").alias("n")))
        .otherwise(F.struct(F.col("da").alias("d"),
                            F.col("a").alias("n"))).alias("rv"),
    ).localCheckpoint()
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    # oriented wedges (apex = lowest-rank vertex) — the join frontier;
    # the REPORTED n_wedges is the standard unordered census
    # Σ d·(d−1)/2, an exact integer aggregate over the degree table
    wedges = e1.join(
        e2, (F.col("e1.u") == F.col("e2.u"))
        & (F.col("e1.rv") < F.col("e2.rv"))).select(
            F.col("e1.v").alias("u"), F.col("e2.v").alias("v"))
    tri = wedges.join(oriented.select("u", "v"), ["u", "v"], "left_semi")
    n_nodes = deg.count()
    n_edges = und.count()
    n_wedges = deg.agg(
        F.sum(F.expr("deg * (deg - 1) div 2"))).collect()[0][0]
    n_tri = tri.count()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(n_nodes, n_edges, n_wedges, n_tri)],
        "n_nodes bigint, n_edges bigint, n_wedges bigint, "
        "n_triangles bigint")


def kcore(edges: DataFrame, k: int = 2, rounds: int = 12) -> DataFrame:
    """k-core of the undirected simple graph — → (node, core_degree)
    for every node of the maximal subgraph where ALL degrees ≥ k.

    KG-health use: the k-core strips the sparse periphery a broken
    linker inflates (singleton chains, orphan attributes) and keeps
    the densely-corroborated nucleus; core size over rounds is the
    standard "is this graph real or noise" diagnostic next to the
    degree histogram and triangle census.

    Iterative peel: each round recomputes degrees over the surviving
    edge set and drops EVERY node currently below k (the parallel
    / "batch" peel — identical fixpoint to the sequential definition
    because removing a sub-k node never raises another's degree).
    Scale shape per round: one node-keyed map-side-combined count
    plus two anti-joins of the edge table against the (typically
    tiny, AQE-broadcast) drop set; lineage is truncated per round so
    the plan stays flat at any depth.

    Cross-engine contract: runs EXACTLY ``rounds`` peels (a converged
    peel is a no-op, so extra rounds never change the answer) and
    RAISES if the peel is still changing at the last round — a
    partial peel is a wrong answer, same policy as
    ``connected_components``.  The DuckDB twin (``sql_kcore``)
    unrolls the same ``rounds`` MATERIALIZED CTEs (without
    materialization DuckDB inlines each round's 3 references to the
    previous one — exponential expansion), so both engines compute
    the same fixpoint bit-for-bit.
    """
    cur = _undirected(edges).localCheckpoint()
    for i in range(rounds):
        deg = (
            cur.select(F.col("a").alias("node"))
            .unionByName(cur.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("core_degree"))
        )
        low = deg.filter(F.col("core_degree") < k).select("node")
        if low.isEmpty():
            return deg
        if i == rounds - 1:
            raise RuntimeError(
                f"kcore: still peeling after {rounds} rounds; raise "
                "`rounds` (returning a partial peel would overstate "
                "the core)")
        cur = (
            cur.join(low.withColumnRenamed("node", "a"), "a", "left_anti")
            .join(low.withColumnRenamed("node", "b"), "b", "left_anti")
            .localCheckpoint()
        )
    # unreachable: the loop either returns (converged) or raises
    raise AssertionError("kcore: rounds must be >= 1")


def sql_kcore(edges_sql: str, k: int = 2, rounds: int = 12) -> str:
    """DuckDB twin: the same ``rounds`` peels unrolled as CTEs (each
    keeps only edges whose BOTH endpoints have degree ≥ k in the
    previous survivor set)."""
    ctes = [
        f"""e0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ({edges_sql}) WHERE src <> dst
)"""
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"d{i} AS MATERIALIZED (SELECT node, count(*)::BIGINT"
            f" AS deg FROM (SELECT a AS node FROM e{i-1} "
            f"UNION ALL SELECT b FROM e{i-1}) GROUP BY node)")
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT e.a, e.b FROM e{i-1} e "
            f"JOIN d{i} da ON da.node = e.a AND da.deg >= {k} "
            f"JOIN d{i} db ON db.node = e.b AND db.deg >= {k})")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT node, count(*)::BIGINT AS core_degree FROM (
  SELECT a AS node FROM e{rounds} UNION ALL SELECT b FROM e{rounds}
) GROUP BY node HAVING count(*) >= {k}""")


def sql_triangle_count(edges_sql: str) -> str:
    """DuckDB twin: (a<b) triple join + closed-form wedge count."""
    return f"""
WITH und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ({edges_sql}) WHERE src <> dst
), deg AS (
  SELECT node, count(*)::BIGINT AS degree FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY node
), tri AS (
  SELECT count(*)::BIGINT AS n FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT (SELECT count(*) FROM deg)::BIGINT AS n_nodes,
       (SELECT count(*) FROM und)::BIGINT AS n_edges,
       (SELECT sum(degree * (degree - 1) // 2) FROM deg)::BIGINT
           AS n_wedges,
       (SELECT n FROM tri)::BIGINT AS n_triangles
"""


def transitive_closure(edges: DataFrame,
                       max_doublings: int = 8,
                       max_rows: int | None = None) -> DataFrame:
    """Transitive closure of a DAG — → every (src, dst) pair with a
    directed path, self-pairs excluded.

    KG-construction use: ancestor closure of the type / subclass_of
    hierarchy (fine-grained typing T3 infers every supertype of a
    linked entity's leaf type; SPARQL ``rdfs:subClassOf*``), and
    blast-radius analysis of a bad merge along part_of chains.

    Semi-naive path doubling ("smart" TC, Valduriez/Boral shape):
    round r extends only the DELTA — the pairs first discovered last
    round — against the full closure, in both directions
    (``new ← (Δ ⋈ R) ∪ (R ⋈ Δ) − R``).  Any pair at min-distance
    d ∈ (2^r, 2^{r+1}] splits at its midpoint into two halves ≤ 2^r
    of which at least one exceeds 2^{r-1} (else d ≤ 2^r), i.e. one
    half is in Δ — so coverage still DOUBLES per round (⌈log2 D⌉
    rounds for depth D; default 8 ⇒ 256) while the join never
    re-derives an old pair once per decomposition the way the naive
    ``R ⋈ R`` does (that generates Θ(d) copies of every
    distance-d pair EVERY round — measured 3.4× slower on the sf0.1
    hierarchy).  Scale shape per round: two Δ-sized keyed joins + one
    distinct + one anti-join against R, all map-side-combined;
    lineage truncated per round.  RAISES if still growing after the
    last round — a partial closure silently under-reports ancestors
    (same policy as connected_components / kcore).  Cycles would
    close into self-pairs and are filtered defensively, but the
    contract input is a DAG.

    The DuckDB twin (``sql_transitive_closure``) is a recursive CTE
    with UNION-dedup semantics — one hop per step, same fixpoint.
    """
    cur = (edges.select("src", "dst")
           .filter(F.col("src") != F.col("dst"))
           .distinct().localCheckpoint())
    # keep R's partition count flat across rounds: unionByName
    # CONCATENATES partitions, so without this the accumulated
    # closure gains Δ's partitions every round and task-scheduling
    # overhead (not data) dominates the tiny (src, dst) pairs
    n_parts = int(cur.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"))
    delta = cur
    for _ in range(max_doublings):
        fwd = delta.alias("a").join(
            cur.alias("b"), F.col("a.dst") == F.col("b.src")
        ).select(F.col("a.src").alias("src"),
                 F.col("b.dst").alias("dst"))
        bwd = cur.alias("a").join(
            delta.alias("b"), F.col("a.dst") == F.col("b.src")
        ).select(F.col("a.src").alias("src"),
                 F.col("b.dst").alias("dst"))
        delta = (fwd.unionByName(bwd)
                 .filter(F.col("src") != F.col("dst"))
                 .distinct()
                 .join(cur, ["src", "dst"], "left_anti")
                 .localCheckpoint())
        if delta.isEmpty():
            return cur
        cur = (cur.unionByName(delta)
               .coalesce(n_parts).localCheckpoint())
        if max_rows is not None and cur.count() > max_rows:
            raise RuntimeError(
                f"transitive_closure: closure exceeded max_rows="
                f"{max_rows} — reachability pairs grow quadratically "
                "on sparse giants; this kernel is for vocabulary-scale "
                "DAGs (callers needing SCCs on corpus-scale graphs use "
                "scc_labels_fb, which never materializes the closure)")
    raise RuntimeError(
        f"transitive_closure: still growing after {max_doublings} "
        "doublings (covers depth 2^r); raise `max_doublings` — a "
        "partial closure under-reports ancestors")


def sql_transitive_closure(edges_sql: str) -> str:
    """DuckDB twin: recursive CTE (UNION dedup), self-pairs excluded."""
    return f"""
WITH RECURSIVE e AS (
  SELECT DISTINCT src, dst FROM ({edges_sql}) WHERE src <> dst
), r AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, e.dst FROM r JOIN e ON e.src = r.dst
  WHERE r.src <> e.dst
)
SELECT src, dst FROM r WHERE src <> dst
"""


def label_propagation(edges: DataFrame, rounds: int = 4) -> DataFrame:
    """Synchronous label-propagation communities → (node, label)
    after EXACTLY ``rounds`` parallel updates.

    KG use: community structure over the entity co-occurrence graph
    groups the pages/entities a curation pass should treat as one
    topical unit (the coarse step above connected components, which
    merges everything touching).  Unlike CC/k-core, synchronous LPA
    has no guaranteed fixpoint (bipartite structures 2-cycle), so the
    CONTRACT is the fixed round count itself — standard practice for
    parallel LPA — and both engines run the identical schedule; no
    convergence raise applies.

    Deterministic by construction: every node starts as its own
    label; each round every node adopts the most frequent label among
    its neighbors, ties broken by MIN label (total order on strings).
    Synchronous update + total-order tie-break → one bit-exact answer
    on any engine and any partitioning (the classic async/random-order
    LPA is irreproducible — useless for a cross-engine oracle).

    Scale shape per round: one join of the directed edge table to the
    (node, label) table keyed by node, one (node, label) map-side-
    combined count, and a per-node window whose partition size is the
    node's NEIGHBOR LABEL DIVERSITY (≤ degree, shrinking as labels
    merge) — never corpus-sized.  ``localCheckpoint`` truncates
    lineage per round so the plan stays flat at any depth; the edge
    table materializes once and re-reads from block cache each round.
    """
    und = _undirected(edges)
    sym = (
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    w = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("label").asc())
    for _ in range(rounds):
        labels = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
    return labels


def sql_label_propagation(edges_sql: str, rounds: int = 4) -> str:
    """DuckDB twin: the same synchronous schedule unrolled as
    ``rounds`` MATERIALIZED CTEs (materialized for the same reason as
    sql_kcore — each round is referenced once per successor but
    DuckDB would inline the whole chain)."""
    ctes = [f"""e AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM ({edges_sql}) WHERE src <> dst)
  UNION ALL
  SELECT b, a FROM (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM ({edges_sql}) WHERE src <> dst)
)""", """l0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, src AS label FROM e
)"""]
    for i in range(1, rounds + 1):
        ctes.append(f"""l{i} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT e.src AS node, l.label, count(*) AS cnt,
           row_number() OVER (PARTITION BY e.src
                              ORDER BY count(*) DESC, l.label ASC)
             AS rn
    FROM e JOIN l{i - 1} l ON e.dst = l.node
    GROUP BY e.src, l.label)
  WHERE rn = 1
)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, label FROM l{rounds}")


def scc_labels(edges: DataFrame, max_doublings: int = 10,
               max_closure_rows: int = 20_000_000) -> DataFrame:
    """Strongly connected components of a DIRECTED graph →
    (node, component), component = min node id mutually reachable
    with the node (itself included — singletons label as themselves).

    KG use: directed cycles in a constructed graph (subclass_of /
    part_of loops, circular sameAs chains) are modeling errors that
    undirected CC cannot see — it merges everything touching; SCC
    isolates exactly the cyclic cores to quarantine.

    Composition over the path-doubling ``transitive_closure``: a pair
    is mutual iff (u, v) AND (v, u) are in the closure — one
    self-join of the closure keyed by the (src, dst) pair — and the
    label is one node-keyed min.  Scope: exact for the
    vocabulary-scale graphs the closure kernel targets (ontologies,
    host graphs, 10^3-10^6 nodes); closure row count is bounded by
    reachability pairs, which grow quadratically on sparse giants —
    ``max_closure_rows`` ENFORCES that contract (raises mid-closure
    instead of silently materializing 10^10 pairs) and the raise
    names the corpus-scale alternative: ``scc_labels_fb``, the
    forward-backward coloring kernel that never builds the closure
    and computes the identical answer (equivalence-tested).  Cycles
    are fine for the doubling loop (the closure of a cyclic graph is
    finite); ``max_doublings`` bounds the DEPTH covered (2^r), not
    cycle membership.
    """
    tc = transitive_closure(
        edges, max_doublings=max_doublings,
        max_rows=max_closure_rows).localCheckpoint()
    rev = tc.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = tc.join(rev, ["src", "dst"])
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    return (
        nodes.join(
            mutual.select(F.col("src").alias("node"),
                          F.col("dst").alias("partner")),
            "node", "left")
        .groupBy("node")
        .agg(F.least(F.col("node"),
                     F.coalesce(F.min("partner"), F.col("node")))
             .alias("component"))
    )


def sql_scc_labels(edges_sql: str) -> str:
    """DuckDB twin of scc_labels (recursive-CTE closure + the same
    mutual self-join and node-keyed min)."""
    return f"""
WITH RECURSIVE raw AS (
  SELECT DISTINCT src, dst FROM ({edges_sql})
), e AS (
  SELECT src, dst FROM raw WHERE src <> dst
), r AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, e.dst FROM r JOIN e ON e.src = r.dst
  WHERE r.src <> e.dst
), mutual AS (
  SELECT a.src AS node, a.dst AS partner
  FROM r a JOIN r b ON a.src = b.dst AND a.dst = b.src
), nodes AS (
  -- node set from the RAW edges: a node whose only edge is a
  -- self-loop is still a (trivial) SCC; the Spark twin keeps it too
  SELECT src AS node FROM raw UNION SELECT dst FROM raw
)
SELECT n.node,
       least(n.node, coalesce(min(m.partner), n.node)) AS component
FROM nodes n LEFT JOIN mutual m USING (node)
GROUP BY n.node
"""


def scc_labels_fb(edges: DataFrame, outer_rounds: int = 12,
                  prop_rounds: int = 50,
                  trim_rounds: int = 20) -> DataFrame:
    """Strongly connected components WITHOUT the transitive closure —
    the corpus-scale SCC path.  → (node, component), identical answer
    to ``scc_labels`` (equivalence-tested on random digraphs).

    Forward-backward coloring (the FW-BW / Orzan coloring family used
    by parallel SCC systems; see Slota et al., "BFS and
    Coloring-based Parallel Algorithms for Strongly Connected
    Components", IPDPS'14 — public literature).  Per outer round:

    1. **TRIM** — a node with no in-edge or no out-edge in the
       remaining graph cannot sit on a directed cycle → it is its own
       SCC; peel iteratively (``trim_rounds`` passes).  On web-shaped
       graphs this removes the giant IN/OUT tendrils immediately.
    2. **COLOR** — propagate color(v) = min{u : u →* v} to fixpoint
       (one edge-keyed min-join per pass; colors only decrease, so
       the fixpoint check is a left-anti on changed rows).
    3. **BACKWARD** — for each color root r (color(r) = r), the SCC
       of r is exactly the nodes of r's color class that reach r
       through same-color edges: grow the reached set from the roots
       along reversed edges, inner-joined against the color table so
       the frontier never leaves the class.
    4. Peel the found SCCs, restrict edges to survivors, repeat.

    Work per pass is one or two hash joins keyed on node ids — linear
    in remaining edges, never reachability-pair-sized: the structure
    that explodes the closure kernel (many sources × many sinks
    through a small core = |src|·|snk| closure rows) trims away in
    ONE pass here.  Every loop is bounded and RAISES on
    non-convergence rather than returning a partial answer (the CC /
    k-core policy): ``prop_rounds`` bounds color/backward diameter,
    ``outer_rounds`` bounds peeling depth.  Pathological
    high-diameter graphs (one 10^6-cycle) exceed the bounds and raise
    — the honest contract for a label-propagation SCC; raise the
    budgets explicitly for such graphs.
    """
    e = (edges.select("src", "dst")
         .filter(F.col("src") != F.col("dst"))
         .distinct().localCheckpoint())
    all_nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct().localCheckpoint()
    )
    nodes = all_nodes
    found: DataFrame | None = None

    def _add(df: DataFrame) -> None:
        nonlocal found
        found = df if found is None else (
            found.unionByName(df).localCheckpoint())

    def _drop_nodes(dead: DataFrame) -> None:
        """Remove labeled nodes from the remaining node/edge sets."""
        nonlocal nodes, e
        nodes = nodes.join(dead, "node", "left_anti").localCheckpoint()
        e = (e.join(dead.withColumnRenamed("node", "src"),
                    "src", "left_anti")
             .join(dead.withColumnRenamed("node", "dst"),
                   "dst", "left_anti")
             .localCheckpoint())

    for _ in range(outer_rounds):
        # 1. trim: no-in or no-out nodes are singleton SCCs
        for _ in range(trim_rounds):
            if e.isEmpty():
                break
            interior = (
                e.select(F.col("src").alias("node")).distinct()
                .join(e.select(F.col("dst").alias("node")).distinct(),
                      "node")
            )
            dead = nodes.join(interior, "node", "left_anti")
            if dead.isEmpty():
                break
            _add(dead.withColumn("component", F.col("node")))
            _drop_nodes(dead.select("node"))
        if e.isEmpty():
            break
        # 2. color to fixpoint: color(v) = min over predecessors
        colors = nodes.withColumn(
            "color", F.col("node")).localCheckpoint()
        for i in range(prop_rounds):
            c_in = (
                e.join(colors.select(F.col("node").alias("src"),
                                     F.col("color").alias("c_src")),
                       "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("c_src").alias("c_in"))
            )
            nxt = (
                colors.join(c_in, "node", "left")
                .select("node",
                        F.least(F.col("color"),
                                F.coalesce(F.col("c_in"),
                                           F.col("color")))
                        .alias("color"))
                .localCheckpoint()
            )
            changed = nxt.join(colors, ["node", "color"], "left_anti")
            colors = nxt
            if changed.isEmpty():
                break
        else:
            raise RuntimeError(
                f"scc_labels_fb: color propagation still changing "
                f"after prop_rounds={prop_rounds} (graph diameter "
                "exceeds the budget); raise prop_rounds")
        # 3. backward reachability from the color roots, within class
        reach = (colors.filter(F.col("node") == F.col("color"))
                 .localCheckpoint())
        for i in range(prop_rounds):
            frontier = (
                e.join(reach.select(F.col("node").alias("dst"),
                                    "color"), "dst")
                .select(F.col("src").alias("node"), "color")
                .join(colors, ["node", "color"])       # stay in class
                .join(reach, ["node", "color"], "left_anti")
                .distinct().localCheckpoint()
            )
            if frontier.isEmpty():
                break
            reach = reach.unionByName(frontier).localCheckpoint()
        else:
            raise RuntimeError(
                f"scc_labels_fb: backward sweep still growing after "
                f"prop_rounds={prop_rounds}; raise prop_rounds")
        # 4. peel: reached nodes form the root's SCC
        _add(reach.select("node", F.col("color").alias("component")))
        _drop_nodes(reach.select("node"))
    else:
        if not e.isEmpty():
            raise RuntimeError(
                f"scc_labels_fb: edges remain after outer_rounds="
                f"{outer_rounds} peeling rounds; raise outer_rounds")
    # nodes left with no edges (incl. self-loop-only nodes) are
    # singleton SCCs
    leftovers = nodes.withColumn("component", F.col("node"))
    return leftovers if found is None else found.unionByName(leftovers)


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient of the undirected simple
    graph → (node, degree, triangles, coef_x10k), coef_x10k =
    ⌊10^4 · 2·tri / (deg·(deg−1))⌋, 0 for degree < 2.

    The per-node refinement of ``triangle_count``'s global census:
    local coefficients separate clique-like neighborhoods (templated
    site clusters, linker-inflated merge balls → coef ≈ 1) from
    hub-and-spoke ones (genuine portals → coef ≈ 0) where the degree
    histogram alone cannot.

    Scale shape: the same degree-ordered orientation as
    ``triangle_count`` (out-neighborhoods O(√m), hub-safe) builds
    each triangle once as a closed wedge; the triple then explodes to
    its 3 members — 3 rows per TRIANGLE, never per wedge — into one
    node-keyed map-side-combined count, re-attached to the degree
    table by a node-keyed join.  Exact x10k integer output, no
    floats anywhere.
    """
    und = _undirected(edges).localCheckpoint()  # 3 consumers
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    ranked = (
        und.join(deg.select(F.col("node").alias("a"),
                            F.col("degree").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"),
                         F.col("degree").alias("db")), "b")
    )
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    oriented = ranked.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    ).localCheckpoint()
    w1 = oriented.select(F.col("u"), F.col("v").alias("v1"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("v2"))
    wedges = w1.join(w2, "u").filter(F.col("v1") < F.col("v2"))
    closed = wedges.join(
        und,
        (F.least("v1", "v2") == F.col("a"))
        & (F.greatest("v1", "v2") == F.col("b")))
    tri = (
        closed.select(F.explode(F.array("u", "v1", "v2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.join(tri, "node", "left")
        .select(
            "node", "degree",
            F.coalesce("triangles", F.lit(0)).cast("bigint")
            .alias("triangles"),
            F.when(F.col("degree") >= 2,
                   F.expr("CAST(20000 AS BIGINT) * "
                          "coalesce(triangles, 0) DIV "
                          "(degree * (degree - 1))"))
            .otherwise(F.lit(0)).cast("bigint").alias("coef_x10k"))
    )


def sql_clustering_coefficients(edges_sql: str) -> str:
    """DuckDB twin: value-ordered triple join builds each triangle
    once; same x10k integer floor."""
    return f"""
WITH und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ({edges_sql}) WHERE src <> dst
), deg AS (
  SELECT node, count(*)::BIGINT AS degree FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY node
), tri3 AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
), tri AS (
  SELECT node, count(*)::BIGINT AS triangles
  FROM (SELECT unnest([x, y, z]) AS node FROM tri3)
  GROUP BY node
)
SELECT d.node, d.degree,
       coalesce(t.triangles, 0)::BIGINT AS triangles,
       CASE WHEN d.degree >= 2 THEN
         20000::BIGINT * coalesce(t.triangles, 0)
           // (d.degree * (d.degree - 1))
       ELSE 0 END::BIGINT AS coef_x10k
FROM deg d LEFT JOIN tri t ON d.node = t.node
"""


def personalized_pagerank(edges: DataFrame, seeds: list[str],
                          iters: int = 3) -> DataFrame:
    """Personalized PageRank: the restart mass returns ONLY to the
    ``seeds`` → (node, rank_ppm) after K fixed iterations.

    The graph-relevance primitive plain PageRank lacks: rank measures
    proximity to the seed set (entity-centric neighborhood scoring,
    seed-anchored candidate expansion for linking) instead of global
    importance.  Same BIGINT fixed-point contract as ``pagerank``
    (ppm units, floor division, dangling mass leaks) so the unrolled
    DuckDB twin is hash-identical; seeds start at PPM, everything
    else at 0, and the (1−d) base term pays out only on seeds.

    Scale shape: identical to pagerank — one contribs shuffle + one
    node-keyed join per iteration, lineage truncated per round.  The
    seed test is a broadcast-size literal IN (seed sets are small by
    definition; a large personalization vector would ride a seed
    DataFrame join instead).
    """
    assert seeds, "personalized_pagerank requires a non-empty seed set"
    sym = edges.select("src", "dst").distinct().localCheckpoint()
    nodes = (
        sym.select(F.col("src").alias("node"))
        .unionByName(sym.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    is_seed = F.col("node").isin(list(seeds))
    base = PPM - PPM * DAMPING_X100 // 100
    rank = nodes.withColumn(
        "rank_ppm",
        F.when(is_seed, F.lit(PPM)).otherwise(F.lit(0)).cast("bigint")
    ).localCheckpoint()
    for _ in range(iters):
        contribs = (
            sym.join(rank, sym.src == rank.node)
            .join(outdeg, "src")
            .select(F.col("dst").alias("node"),
                    F.expr("rank_ppm div outdeg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        rank = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.when(is_seed, F.lit(base)).otherwise(F.lit(0))
                 .cast("bigint")
                 + F.expr(f"({DAMPING_X100} * coalesce(contrib, 0))"
                          " div 100")).alias("rank_ppm"),
            )
            .localCheckpoint()
        )
    return rank


def sql_personalized_pagerank(edges_sql: str, seeds: list[str],
                              iters: int = 3) -> str:
    """DuckDB twin: same seeded restart, K iterations unrolled."""
    base = PPM - PPM * DAMPING_X100 // 100
    seed_in = ", ".join(f"'{s}'" for s in sorted(seeds))
    ctes = [
        f"edges AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM edges "
        "UNION SELECT dst FROM edges)",
        "outdeg AS (SELECT src, count(*) AS outdeg FROM edges "
        "GROUP BY src)",
        f"r0 AS (SELECT node, CASE WHEN node IN ({seed_in}) "
        f"THEN {PPM} ELSE 0 END::BIGINT AS rank_ppm FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node, "
            f"sum(r.rank_ppm // o.outdeg)::BIGINT AS contrib "
            f"FROM edges e JOIN r{i-1} r ON e.src = r.node "
            f"JOIN outdeg o ON e.src = o.src GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i} AS (SELECT n.node, "
            f"(CASE WHEN n.node IN ({seed_in}) THEN {base} ELSE 0 END"
            f" + {DAMPING_X100} * coalesce(c.contrib, 0) // 100)"
            f"::BIGINT AS rank_ppm "
            f"FROM nodes n LEFT JOIN c{i} c USING (node))"
        )
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, rank_ppm FROM r{iters}")


def hyperball(edges: DataFrame, radius: int = 3) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013): per-node ball-size estimates
    |B(v, radius)| via mergeable HLL registers → (node, ball_est).

    The corpus-scale answer to "how big is each node's r-hop
    neighborhood" (reach of an entity in the KG, blast radius of a
    bad merge, spam-farm density): exact per-node balls need the full
    (seed, member) materialization — Σ|ball| rows, quadratic on dense
    graphs — while HyperBall carries ≤ min(|ball|, 256) register rows
    per node and converges them with max().  This is the algorithm
    that measured the average distance of the Facebook graph.

    Register recipe and exact-integer estimator are shared with
    functions/sketch.py:hll_distinct (md5-hex registers, shiftleft
    harmonic sum, literal linear-counting table), so the estimates are
    hash-identical across engines and partitionings.  Balls are over
    the UNDIRECTED simple graph and include the node itself.

    Scale shape: per round ONE edges⋈registers join + ONE
    (node, reg) max-combine — cost O(E·m̄) rows with m̄ ≤ 256
    regardless of ball sizes (the whole point vs BFS); register rows
    are map-side max-combined before the exchange; lineage truncated
    per round.  On a real cluster, bucket edges by dst so every round
    reuses the same partitioning.
    """
    from gaia_spark.functions.sketch import hll_estimate, hll_ranked

    und = _undirected(edges)
    both = (
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint()
    )
    nodes = both.select(F.col("src").alias("node")).distinct()
    regs = hll_ranked(nodes, "node", ["node"]).localCheckpoint()
    for _ in range(radius):
        nb = (
            both.alias("e")
            .join(regs.alias("r"), F.col("e.dst") == F.col("r.node"))
            .select(F.col("e.src").alias("node"),
                    F.col("r.reg").alias("reg"), F.col("r.m").alias("m"))
        )
        regs = (
            regs.unionByName(nb)
            .groupBy("node", "reg").agg(F.max("m").alias("m"))
            .localCheckpoint()
        )
    return hll_estimate(regs, ["node"], out_col="ball_est")


def sql_hyperball(edges_sql: str, radius: int = 3) -> str:
    """DuckDB twin: the same ``radius`` register-merge rounds unrolled
    as CTEs over the shared sketch.py SQL kernels."""
    from gaia_spark.functions.sketch import (sql_hll_estimate,
                                             sql_hll_ranked)

    ctes = [
        f"und AS (SELECT DISTINCT least(src, dst) AS a, "
        f"greatest(src, dst) AS b FROM ({edges_sql}) WHERE src <> dst)",
        "booth AS (SELECT a AS src, b AS dst FROM und "
        "UNION ALL SELECT b, a FROM und)",
        "vertices AS (SELECT DISTINCT src AS node FROM booth)",
        f"h0 AS ({sql_hll_ranked('vertices', 'node', 'node, ')})",
    ]
    for i in range(1, radius + 1):
        ctes.append(
            f"h{i} AS (SELECT node, reg, max(m) AS m FROM ("
            f"SELECT node, reg, m FROM h{i-1} "
            f"UNION ALL "
            f"SELECT b.src AS node, r.reg, r.m FROM booth b "
            f"JOIN h{i-1} r ON r.node = b.dst"
            f") GROUP BY node, reg)"
        )
    return ("WITH " + ",\n".join(ctes)
            + sql_hll_estimate(f"h{radius}", "node, ",
                               out_col="ball_est"))


def wl_labels(edges: DataFrame, rounds: int = 2) -> DataFrame:
    """Weisfeiler-Lehman structural node signatures → (node, wl_label).

    Round 0 labels each node with md5 of its degree; each round
    relabels l(v) = md5(l(v) + '#' + the '|'-joined SORTED multiset
    of neighbor labels) — after k rounds two nodes share a label iff
    1-WL cannot distinguish their k-hop neighborhood structure.  The
    KG/web use: structural-role clustering (hub vs leaf vs bridge),
    templated-site detection (mirrored link structures collapse to
    one label), and cheap graph-isomorphism screening of extracted
    subgraphs — content-free, so it survives renamed entities.

    Everything is md5-over-ASCII-hex: sort_array on 32-char hex
    strings is plain codepoint order in every engine, making the
    labels hash-identical to the DuckDB twin (list_sort +
    array_to_string).  Over the UNDIRECTED simple graph.

    Scale shape: per round ONE edges⋈labels join + ONE node-keyed
    collect_list — a degree-d node carries O(d) fixed 33-byte label
    entries per round (the multiset is the WL contract; hubs are the
    documented worst case, AQE skew split applies).  Lineage
    truncated per round.
    """
    und = _undirected(edges)
    both = (
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint()
    )
    lab = (
        both.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .select("node",
                F.md5(F.concat(F.lit("d"), F.col("deg").cast("string")))
                 .alias("wl_label"))
        .localCheckpoint()
    )
    for _ in range(rounds):
        nb = (
            both.alias("e")
            .join(lab.alias("l"), F.col("e.dst") == F.col("l.node"))
            .select(F.col("e.src").alias("node"),
                    F.col("l.wl_label").alias("nb_label"))
            .groupBy("node")
            .agg(F.concat_ws(
                "|", F.sort_array(F.collect_list("nb_label")))
                .alias("nbs"))
        )
        lab = (
            lab.join(nb, "node")
            .select("node",
                    F.md5(F.concat_ws("#", "wl_label", "nbs"))
                     .alias("wl_label"))
            .localCheckpoint()
        )
    return lab


def sql_wl_labels(edges_sql: str, rounds: int = 2) -> str:
    """DuckDB twin: the same ``rounds`` relabelings unrolled
    (list_sort over md5-hex ≡ Spark sort_array; '#'/'|' joins)."""
    ctes = [
        f"und AS (SELECT DISTINCT least(src, dst) AS a, "
        f"greatest(src, dst) AS b FROM ({edges_sql}) WHERE src <> dst)",
        "booth AS (SELECT a AS src, b AS dst FROM und "
        "UNION ALL SELECT b, a FROM und)",
        "w0 AS (SELECT src AS node, "
        "md5('d' || count(*)::VARCHAR) AS wl_label "
        "FROM booth GROUP BY src)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"n{i} AS (SELECT e.src AS node, "
            f"array_to_string(list_sort(list(l.wl_label)), '|') AS nbs "
            f"FROM booth e JOIN w{i-1} l ON e.dst = l.node "
            f"GROUP BY e.src)"
        )
        ctes.append(
            f"w{i} AS (SELECT w.node, "
            f"md5(w.wl_label || '#' || n.nbs) AS wl_label "
            f"FROM w{i-1} w JOIN n{i} n USING (node))"
        )
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, wl_label FROM w{rounds}")


# ---------------------------------------------------------------------------
# HITS hubs & authorities (Kleinberg) — the classic companion to PageRank
# for web link graphs (reference KG context: domain-authority signal the
# curation side inputs consume, same consumer as functions/web.py
# host_link_graph; SURVEY §2.4 iterative-graph row)
# ---------------------------------------------------------------------------


def hits(edges: DataFrame, iters: int = 2) -> DataFrame:
    """HITS over directed ``edges(src, dst)``, K fixed iterations.

    Same exactness contract as :func:`pagerank`: all arithmetic is
    BIGINT fixed-point so every engine and partitioning yields the
    same bits.  Each half-round max-normalizes (``v * PPM div
    max(v)``) instead of the textbook L2 norm — sqrt is float and
    engine-divergent; max-normalization keeps the ranking and the
    [0, PPM] range with pure integer ops, and is what makes the
    unrolled DuckDB CTE twin hash-identical.

    Overflow seam (documented, same class as pagerank's): a node's
    raw score is ≤ indeg_max × PPM ≤ 2^63/PPM ⇒ safe for
    indeg_max < ~9×10^6.  Host-level web graphs sit well under that;
    page-level inlink mega-hubs need a pre-divide (not implemented —
    raise at the call site by capping, as cocitation/link_prediction
    do).

    Scale shape: per half-round one edge⋈score join + one node-keyed
    map-side-combined sum + a ONE-ROW max aggregate broadcast back —
    the Pregel pattern, lineage truncated per round.  On a cluster
    the edge table should be bucketed by the join key; both
    orientations reuse the same distinct edge checkpoint.
    """
    e = edges.select("src", "dst").distinct().localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    hub = nodes.withColumn("hub_ppm", F.lit(PPM).cast("bigint"))
    auth = None
    for _ in range(iters):
        araw = (
            e.join(hub, e.src == hub.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub_ppm").alias("raw"))
        )
        amax = araw.agg(F.greatest(F.max("raw"), F.lit(1))
                        .cast("bigint").alias("mx"))
        auth = (
            nodes.join(araw, "node", "left")
            .crossJoin(F.broadcast(amax))
            .select("node",
                    F.expr(f"(coalesce(raw, 0) * {PPM}) div mx")
                    .alias("auth_ppm"))
            .localCheckpoint()
        )
        hraw = (
            e.join(auth, e.dst == auth.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth_ppm").alias("raw"))
        )
        hmax = hraw.agg(F.greatest(F.max("raw"), F.lit(1))
                        .cast("bigint").alias("mx"))
        hub = (
            nodes.join(hraw, "node", "left")
            .crossJoin(F.broadcast(hmax))
            .select("node",
                    F.expr(f"(coalesce(raw, 0) * {PPM}) div mx")
                    .alias("hub_ppm"))
            .localCheckpoint()
        )
    return hub.join(auth, "node").select("node", "hub_ppm", "auth_ppm")


def sql_hits(edges_sql: str, iters: int = 2) -> str:
    """DuckDB twin: the same K iterations unrolled, max-normalized
    with scalar subqueries (integer ``//`` ≡ Spark ``div`` on the
    non-negative domain)."""
    ctes = [
        f"edges AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM edges "
        "UNION SELECT dst FROM edges)",
        f"h0 AS (SELECT node, {PPM}::BIGINT AS hub_ppm FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"ar{i} AS (SELECT e.dst AS node, "
            f"sum(h.hub_ppm)::BIGINT AS raw "
            f"FROM edges e JOIN h{i-1} h ON e.src = h.node "
            f"GROUP BY e.dst)"
        )
        ctes.append(
            f"a{i} AS (SELECT n.node, (coalesce(r.raw, 0) * {PPM} // "
            f"greatest((SELECT max(raw) FROM ar{i}), 1))::BIGINT "
            f"AS auth_ppm FROM nodes n LEFT JOIN ar{i} r USING (node))"
        )
        ctes.append(
            f"hr{i} AS (SELECT e.src AS node, "
            f"sum(a.auth_ppm)::BIGINT AS raw "
            f"FROM edges e JOIN a{i} a ON e.dst = a.node "
            f"GROUP BY e.src)"
        )
        ctes.append(
            f"h{i} AS (SELECT n.node, (coalesce(r.raw, 0) * {PPM} // "
            f"greatest((SELECT max(raw) FROM hr{i}), 1))::BIGINT "
            f"AS hub_ppm FROM nodes n LEFT JOIN hr{i} r USING (node))"
        )
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT h.node, h.hub_ppm, a.auth_ppm "
            f"FROM h{iters} h JOIN a{iters} a USING (node)")


# ---------------------------------------------------------------------------
# Link prediction: common-neighbors + resource-allocation index — KG
# completion candidates (which missing edges does the constructed graph
# most strongly imply?), the standard follow-on to entity linking
# ---------------------------------------------------------------------------


def link_prediction(edges: DataFrame, max_degree: int = 64,
                    min_cn: int = 2) -> DataFrame:
    """Non-adjacent pair scores over the undirected simple graph:
    ``cn`` = common-neighbor count, ``ra_ppm`` = resource-allocation
    index Σ_z 1/deg(z) in exact PPM fixed point (``PPM div deg`` per
    wedge center — integer, so the DuckDB twin is hash-identical;
    Adamic–Adar's 1/log deg is float-divergent and deliberately not
    offered).

    Hub guard (the scale contract): only wedge CENTERS with
    deg ≤ max_degree generate candidate pairs, so per-center work is
    ≤ max_degree² and total wedge volume is O(n·max_degree²) — never
    quadratic in a hub's degree.  This is also the semantics you
    want: a mega-hub (stopword entity, boilerplate page) predicts
    nothing — RA already discounts it to ~0, the cap just refuses to
    MATERIALIZE the ~0 rows.  Existing edges are removed by a
    broadcast-eligible left-anti join on the pair key.

    Scale shape: degree agg (map-side combine) → wedge self-join of
    the capped adjacency keyed by center → pair-keyed agg → anti
    join.  Every shuffle is keyed; the html/text never appears.
    """
    und = _undirected(edges).localCheckpoint()
    booth = (
        und.select(F.col("a").alias("z"), F.col("b").alias("n"))
        .unionByName(und.select(F.col("b").alias("z"),
                                F.col("a").alias("n")))
    )
    deg = booth.groupBy("z").agg(F.count(F.lit(1)).alias("deg"))
    adj = (booth.join(deg, "z")
           .filter(F.col("deg") <= max_degree))
    left = adj.select("z", F.col("n").alias("x"), "deg")
    right = adj.select("z", F.col("n").alias("y"))
    pairs = (
        left.join(right, "z")
        .filter(F.col("x") < F.col("y"))
        .groupBy(F.col("x").alias("a"), F.col("y").alias("b"))
        .agg(F.count(F.lit(1)).alias("cn"),
             F.sum(F.expr(f"{PPM} div deg")).alias("ra_ppm"))
        .filter(F.col("cn") >= min_cn)
    )
    return pairs.join(und, ["a", "b"], "left_anti")


def sql_link_prediction(edges_sql: str, max_degree: int = 64,
                        min_cn: int = 2) -> str:
    """DuckDB twin of :func:`link_prediction`."""
    return f"""
WITH und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ({edges_sql}) WHERE src <> dst
), booth AS (
  SELECT a AS z, b AS n FROM und UNION ALL SELECT b, a FROM und
), deg AS (
  SELECT z, count(*)::BIGINT AS deg FROM booth GROUP BY z
), adj AS (
  SELECT b.z, b.n, d.deg FROM booth b JOIN deg d USING (z)
  WHERE d.deg <= {max_degree}
), pairs AS (
  SELECT l.n AS a, r.n AS b, count(*)::BIGINT AS cn,
         sum({PPM} // l.deg)::BIGINT AS ra_ppm
  FROM adj l JOIN adj r ON l.z = r.z AND l.n < r.n
  GROUP BY l.n, r.n
)
SELECT p.a, p.b, p.cn, p.ra_ppm FROM pairs p
LEFT JOIN und u ON p.a = u.a AND p.b = u.b
WHERE u.a IS NULL AND p.cn >= {min_cn}
"""


# ---------------------------------------------------------------------------
# Co-citation over a directed citation/link stream — "pages endorsed by
# the same citers" (the web-graph similarity HITS implicitly factors;
# also the dual of the co-purchase projection used by the graph_* suite)
# ---------------------------------------------------------------------------


def cocitation(edges: DataFrame, max_out: int = 64,
               min_count: int = 2) -> DataFrame:
    """Pairs of targets cited by ≥ min_count distinct sources, over
    directed ``edges(src, dst)``.

    Hub guard: sources with out-degree > max_out are dropped BEFORE
    the pair join (a link-farm page citing 10^5 targets would emit
    ~10^10/2 pairs; its endorsements carry no signal — the standard
    co-citation discount taken to its cap).  Per-source work is then
    ≤ max_out², total O(n_src·max_out²).

    Scale shape: distinct edge set → out-degree agg (map-side
    combine) → per-source pair self-join → (d1, d2)-keyed count.
    Keys only; one row per surviving pair.
    """
    e = edges.select("src", "dst").distinct().localCheckpoint()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    kept = e.join(outdeg.filter(F.col("outdeg") <= max_out), "src")
    l = kept.select("src", F.col("dst").alias("d1"))
    r = kept.select("src", F.col("dst").alias("d2"))
    return (
        l.join(r, "src")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("n_citers"))
        .filter(F.col("n_citers") >= min_count)
    )


def sql_cocitation(edges_sql: str, max_out: int = 64,
                   min_count: int = 2) -> str:
    """DuckDB twin of :func:`cocitation`."""
    return f"""
WITH e AS (
  SELECT DISTINCT src, dst FROM ({edges_sql})
), kept AS (
  SELECT e.src, e.dst FROM e JOIN (
    SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY src
  ) o ON e.src = o.src AND o.outdeg <= {max_out}
)
SELECT l.dst AS d1, r.dst AS d2, count(*)::BIGINT AS n_citers
FROM kept l JOIN kept r ON l.src = r.src AND l.dst < r.dst
GROUP BY l.dst, r.dst
HAVING count(*) >= {min_count}
"""


def harmonic_centrality(edges: DataFrame, radius: int = 3) -> DataFrame:
    """HyperBall harmonic centrality (Boldi & Vigna 2013 — the metric
    HyperBall was built to compute at web scale): per node,
    ``H(v) ≈ Σ_{r=1..R} (|B(v,r)| − |B(v,r−1)|) / r`` over the
    undirected simple graph, all arithmetic exact BIGINT PPM
    fixed-point over the shared HLL register kernel
    (functions/sketch.py) so the result is hash-identical across
    engines and partitionings.

    Per-radius deltas are clamped at 0 before the ``× PPM div r``
    weighting: register merges are monotone, but the estimator's
    linear-counting↔raw branch flip can wobble an estimate down by a
    few counts, and negative integer division is the one place Spark
    ``div`` (truncate) and DuckDB ``//`` (floor) disagree — the clamp
    removes both the wobble and the divergence surface.

    Scale shape: identical to :func:`hyperball` (per round ONE
    edges⋈registers join + ONE (node, reg) max-combine, O(E·m̄) with
    m̄ ≤ 256), plus R+1 vocabulary-thin (node, est) frames joined on
    node at the end — each a map-side-combined agg output, broadcast-
    eligible relative to the register table.
    """
    from gaia_spark.functions.sketch import hll_estimate, hll_ranked

    und = _undirected(edges)
    both = (
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint()
    )
    nodes = both.select(F.col("src").alias("node")).distinct()
    regs = hll_ranked(nodes, "node", ["node"]).localCheckpoint()
    ests = [hll_estimate(regs, ["node"], out_col="b0")]
    for r in range(1, radius + 1):
        nb = (
            both.alias("e")
            .join(regs.alias("r"), F.col("e.dst") == F.col("r.node"))
            .select(F.col("e.src").alias("node"),
                    F.col("r.reg").alias("reg"), F.col("r.m").alias("m"))
        )
        regs = (
            regs.unionByName(nb)
            .groupBy("node", "reg").agg(F.max("m").alias("m"))
            .localCheckpoint()
        )
        ests.append(hll_estimate(regs, ["node"], out_col=f"b{r}"))
    joined = ests[0]
    for est in ests[1:]:
        joined = joined.join(est, "node")
    terms = [f"(greatest(b{r} - b{r-1}, 0) * {PPM}) div {r}"
             for r in range(1, radius + 1)]
    return joined.select(
        "node", F.expr(" + ".join(terms)).cast("bigint")
        .alias("harmonic_ppm"))


def sql_harmonic_centrality(edges_sql: str, radius: int = 3) -> str:
    """DuckDB twin of :func:`harmonic_centrality`: hyperball's
    register rounds plus one estimate CTE per radius, joined on node
    with the identical clamped integer weighting."""
    from gaia_spark.functions.sketch import (sql_hll_estimate,
                                             sql_hll_ranked)

    ctes = [
        f"und AS (SELECT DISTINCT least(src, dst) AS a, "
        f"greatest(src, dst) AS b FROM ({edges_sql}) WHERE src <> dst)",
        "booth AS (SELECT a AS src, b AS dst FROM und "
        "UNION ALL SELECT b, a FROM und)",
        "vertices AS (SELECT DISTINCT src AS node FROM booth)",
        f"h0 AS ({sql_hll_ranked('vertices', 'node', 'node, ')})",
        f"e0 AS ({sql_hll_estimate('h0', 'node, ', out_col='b0')})",
    ]
    for i in range(1, radius + 1):
        ctes.append(
            f"h{i} AS (SELECT node, reg, max(m) AS m FROM ("
            f"SELECT node, reg, m FROM h{i-1} "
            f"UNION ALL "
            f"SELECT b.src AS node, r.reg, r.m FROM booth b "
            f"JOIN h{i-1} r ON r.node = b.dst"
            f") GROUP BY node, reg)"
        )
        ctes.append(
            f"e{i} AS ({sql_hll_estimate(f'h{i}', 'node, ', out_col=f'b{i}')})")
    terms = " + ".join(
        f"(greatest(e{r}.b{r} - e{r-1}.b{r-1}, 0) * {PPM}) // {r}"
        for r in range(1, radius + 1))
    joins = " ".join(f"JOIN e{r} USING (node)"
                     for r in range(1, radius + 1))
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, ({terms})::BIGINT AS harmonic_ppm "
            f"FROM e0 {joins}")


def reciprocity(edges: DataFrame) -> DataFrame:
    """Directed-graph reciprocity: ONE row
    ``(n_edges, n_reciprocated, reciprocity_x10k)`` over the distinct
    self-loop-free edge set.

    The classic web-spam / link-exchange signal: organic host graphs
    reciprocate a small fraction of links; link farms reciprocate
    most of them.  Exact integers throughout (x10k ratio via integer
    div), so the twin hash-matches.

    Scale shape: one distinct (keyed, map-side-combined), one
    self-equi-join of the edge set against its own reversal on the
    full (src, dst) key (left-semi — nothing wider than the two key
    strings travels), one COUNT fold to a single row.
    """
    e = (edges.select("src", "dst")
         .filter(F.col("src") != F.col("dst"))
         .distinct().localCheckpoint())
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    rec = e.join(rev, ["src", "dst"], "left_semi")
    return (
        e.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(rec.agg(F.count(F.lit(1)).alias("n_reciprocated")))
        .select(
            "n_edges", "n_reciprocated",
            F.expr("(n_reciprocated * 10000) div n_edges")
            .alias("reciprocity_x10k"))
    )


def sql_reciprocity(edges_sql: str) -> str:
    """DuckDB twin of :func:`reciprocity`."""
    return f"""
WITH e AS (
  SELECT DISTINCT src, dst FROM ({edges_sql}) WHERE src <> dst
), rec AS (
  SELECT count(*)::BIGINT AS n_reciprocated
  FROM e WHERE EXISTS (SELECT 1 FROM e r
                       WHERE r.src = e.dst AND r.dst = e.src)
)
SELECT (SELECT count(*)::BIGINT FROM e) AS n_edges,
       n_reciprocated,
       ((n_reciprocated * 10000) //
        (SELECT count(*) FROM e))::BIGINT AS reciprocity_x10k
FROM rec
"""


def pagerank_weighted(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Weighted PageRank over ``(src, dst, weight)`` multigraph
    rollups → (node, rank_ppm): each node's rank flows to its
    out-neighbors PROPORTIONALLY to edge weight (floor division),
    the natural rank for host-level link graphs where an edge
    carries "this host linked that host W times".

    Same BIGINT fixed-point contract as ``pagerank`` (ppm units,
    floor division everywhere, dangling mass leaks), so the unrolled
    DuckDB twin is hash-identical.  Parallel edges must be
    pre-aggregated (``host_link_graph`` output is); duplicate
    (src, dst) keys would double-count mass, so the kernel
    re-aggregates defensively.

    Scale shape: identical to ``pagerank`` — per iteration one
    contribs shuffle keyed by dst and one node-keyed left join, with
    ``localCheckpoint`` lineage truncation.  The weight column adds
    ONE extra vocabulary-scale aggregate up front (per-src total
    weight) that joins src-keyed alongside the rank row.
    """
    e = (edges.groupBy("src", "dst")
         .agg(F.sum("weight").cast("bigint").alias("weight"))
         .localCheckpoint())
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outw = e.groupBy("src").agg(F.sum("weight").alias("outw"))
    base = PPM - PPM * DAMPING_X100 // 100
    rank = nodes.withColumn(
        "rank_ppm", F.lit(PPM).cast("bigint")).localCheckpoint()
    for _ in range(iters):
        contribs = (
            e.join(rank, e.src == rank.node)
            .join(outw, "src")
            .select(F.col("dst").alias("node"),
                    F.expr("(rank_ppm * weight) div outw").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        rank = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(base).cast("bigint")
                 + F.expr(f"({DAMPING_X100} * coalesce(contrib, 0))"
                          " div 100")).alias("rank_ppm"),
            )
            .localCheckpoint()
        )
    return rank


def sql_pagerank_weighted(edges_sql: str, iters: int = 3) -> str:
    """DuckDB twin: same weight-proportional flow, K iterations
    unrolled, same floor-division order."""
    base = PPM - PPM * DAMPING_X100 // 100
    ctes = [
        f"edges AS (SELECT src, dst, sum(weight)::BIGINT AS weight "
        f"FROM ({edges_sql}) GROUP BY src, dst)",
        "nodes AS (SELECT src AS node FROM edges "
        "UNION SELECT dst FROM edges)",
        "outw AS (SELECT src, sum(weight)::BIGINT AS outw FROM edges "
        "GROUP BY src)",
        f"r0 AS (SELECT node, {PPM}::BIGINT AS rank_ppm FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node, "
            f"sum((r.rank_ppm * e.weight) // o.outw)::BIGINT AS contrib "
            f"FROM edges e JOIN r{i-1} r ON e.src = r.node "
            f"JOIN outw o ON e.src = o.src GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i} AS (SELECT n.node, "
            f"({base} + {DAMPING_X100} * coalesce(c.contrib, 0) // 100)"
            f"::BIGINT AS rank_ppm "
            f"FROM nodes n LEFT JOIN c{i} c USING (node))"
        )
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, rank_ppm FROM r{iters}")


def _mis_prio(node) -> F.Column:
    """Deterministic MIS priority: ``lpad(hex32(md5(node)), 10, '0')
    || '#' || node`` — a single STRING both engines order
    identically (the zero-padded 32-bit hash makes lexicographic =
    numeric; the node suffix breaks hash ties totally)."""
    col = F.col(node) if isinstance(node, str) else node
    h = F.conv(F.substring(F.md5(col), 1, 8), 16, 10)
    return F.concat(F.lpad(h, 10, "0"), F.lit("#"), col)


def _sql_mis_prio(node: str) -> str:
    return (f"lpad(('0x' || substr(md5({node}), 1, 8))::BIGINT::VARCHAR,"
            f" 10, '0') || '#' || {node}")


def luby_mis(edges: DataFrame, rounds: int = 16,
             probe_every: int = 2) -> DataFrame:
    """Deterministic Luby-style maximal independent set →
    ``(node, mis_round)`` for every MIS member.

    The parallel symmetry-breaking primitive behind distributed
    greedy matching / clustering-anchor selection: pick a canonical
    set of mutually non-adjacent "anchor" nodes (e.g. one
    representative per crowded KG neighborhood) with NO sequential
    scan.  Priorities are static md5 hashes (``_mis_prio``), so the
    result is the unique greedy MIS in priority order — a pure
    function of the edge set, identical under any partitioning,
    retry, or engine.

    Per round, every ACTIVE node that is a strict local minimum
    (its priority sorts before every active neighbor's) joins the
    MIS; winners and their neighbors deactivate.  With random-ish
    hash priorities the longest priority-decreasing path is
    O(log n) in expectation, so 16 rounds covers graphs far past
    this sandbox's scale; the kernel RAISES if nodes remain active
    after the last round (a partial MIS is a wrong answer — same
    policy as ``connected_components`` / ``kcore``).

    Scale shape per round: one semi-join of the symmetric edge set
    against the active set (AQE-broadcast once the frontier
    shrinks), one map-side-combined min() per src, and two anti-
    joins to deactivate — only (node, priority) strings travel,
    lineage truncated per round.  The DuckDB twin unrolls the same
    schedule.

    Driver-action discipline (r4 verdict, "What's wrong" #3): the
    whole round state — picked rows (mis_round ≥ 0) plus the still-
    active frontier (mis_round = -1) — lives in ONE DataFrame, and a
    round launches exactly TWO jobs (winners checkpoint — reused by
    the state union, the neighbor kill and the survivor anti-join
    without recomputing the priority aggregate — then the state
    checkpoint); the convergence probe runs only every
    ``probe_every`` rounds (a scan of the tiny checkpointed state),
    and each probe round also RE-MATERIALIZES the edge set
    restricted to still-active endpoints — edges touching dead
    nodes can never matter again, so later rounds scan a shrinking
    graph instead of the full |E| every time.  A non-empty active
    set always yields ≥ 1 winner (the global priority minimum), so
    skipped probes never mask progress — post-convergence rounds
    before the next probe are no-op jobs over an empty frontier.
    """
    und = _undirected(edges)
    sym = (und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
           .unionByName(
               und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
           .localCheckpoint())
    state = (sym.select(F.col("src").alias("node")).distinct()
             .withColumn("mis_round", F.lit(-1).cast("int"))
             .localCheckpoint())
    converged = False
    for i in range(rounds):
        act = state.filter(F.col("mis_round") == -1).select("node")
        act_e = (
            sym.join(act.withColumnRenamed("node", "src"), "src",
                     "left_semi")
            .join(act.withColumnRenamed("node", "dst"), "dst",
                  "left_semi")
        )
        nbr_min = act_e.groupBy("src").agg(
            F.min(_mis_prio("dst")).alias("nbr_min"))
        winners = (
            act.join(nbr_min, act.node == nbr_min.src, "left")
            .filter(F.col("nbr_min").isNull()
                    | (_mis_prio("node") < F.col("nbr_min")))
            .select("node")
            .localCheckpoint()
        )
        dead_nbr = (
            act_e.join(winners.withColumnRenamed("node", "src"),
                       "src", "left_semi")
            .select(F.col("dst").alias("node")).distinct()
        )
        survivors = (act.join(winners, "node", "left_anti")
                     .join(dead_nbr, "node", "left_anti"))
        state = (
            state.filter(F.col("mis_round") >= 0)
            .unionByName(winners.withColumn(
                "mis_round", F.lit(i).cast("int")))
            .unionByName(survivors.withColumn(
                "mis_round", F.lit(-1).cast("int")))
            .localCheckpoint()
        )
        if (i + 1) % probe_every == 0 or i + 1 == rounds:
            if state.filter(F.col("mis_round") == -1).isEmpty():
                converged = True
                break
            # shrink the working graph to still-active endpoints
            nxt = state.filter(F.col("mis_round") == -1) \
                       .select("node")
            sym = (
                sym.join(nxt.withColumnRenamed("node", "src"),
                         "src", "left_semi")
                .join(nxt.withColumnRenamed("node", "dst"),
                      "dst", "left_semi")
                .localCheckpoint()
            )
    if not converged and \
            not state.filter(F.col("mis_round") == -1).isEmpty():
        raise RuntimeError(
            f"luby_mis: nodes still active after {rounds} rounds; "
            "raise `rounds` (returning a partial MIS would violate "
            "maximality)")
    return state.filter(F.col("mis_round") >= 0) \
                .select("node", "mis_round")


def sql_luby_mis(edges_sql: str, rounds: int = 16) -> str:
    """DuckDB twin: the same greedy-by-priority schedule unrolled
    (MATERIALIZED per round — each round references the previous
    active set three times)."""
    p = _sql_mis_prio
    ctes = [
        f"""sym AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM ({edges_sql}) WHERE src <> dst)
  UNION ALL
  SELECT b, a FROM (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM ({edges_sql}) WHERE src <> dst)
)""",
        "a0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym)",
    ]
    wins = []
    for i in range(rounds):
        ctes.append(
            f"""e{i} AS MATERIALIZED (
  SELECT s.src, s.dst FROM sym s
  JOIN a{i} x ON x.node = s.src
  JOIN a{i} y ON y.node = s.dst)""")
        ctes.append(
            f"""w{i} AS MATERIALIZED (
  SELECT a.node FROM a{i} a
  LEFT JOIN (SELECT src, min({p('dst')}) AS nbr_min
             FROM e{i} GROUP BY src) m ON m.src = a.node
  WHERE m.nbr_min IS NULL OR {p('a.node')} < m.nbr_min)""")
        ctes.append(
            f"""a{i + 1} AS MATERIALIZED (
  SELECT node FROM a{i}
  WHERE node NOT IN (SELECT node FROM w{i})
    AND node NOT IN (SELECT e.dst FROM e{i} e
                     JOIN w{i} w ON w.node = e.src))""")
        wins.append(f"SELECT node, {i} AS mis_round FROM w{i}")
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(wins))


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman modularity of a given node partition → per-community
    rows (label, n_nodes, intra_edges, degree_sum, q_x1e9) whose
    ``sum(q_x1e9)`` is the partition's Q in exact nano units.

    The quality score that closes the community-detection loop:
    label_propagation proposes a partition, modularity grades it
    (Q = Σ_c e_c/m − (d_c/2m)² over the undirected simple graph).
    Fixed-point recipe, pinned identically in the twin: the
    expected-edges term squares AFTER a first x1e6 floor division —
    ``t = (1e6·d_c) div (2m); term2 = t² div 1e3`` — so no
    intermediate exceeds ~1e12 and BIGINT never overflows even at
    m ≈ 1e9 (a direct 1e9·d_c² blows past 2^63 at m ≳ 1e5).  The
    double floor loses < 1e-6 of Q per community — far below any
    decision threshold — and both engines lose the SAME bits.

    Scale shape: degrees and intra-edge counts are two label-keyed
    map-side-combined aggregates; labels attach to edge endpoints by
    two node-keyed joins (broadcast when the labeling is vocabulary-
    scale, shuffle otherwise); m rides a single-row cross join.
    """
    und = _undirected(edges).localCheckpoint()
    la = labels.select(F.col("node").alias("a"),
                       F.col("label").alias("la"))
    lb = labels.select(F.col("node").alias("b"),
                       F.col("label").alias("lb"))
    lab = und.join(la, "a").join(lb, "b")
    intra = (lab.filter(F.col("la") == F.col("lb"))
             .groupBy(F.col("la").alias("label"))
             .agg(F.count(F.lit(1)).alias("intra_edges")))
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
        .join(labels, "node")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_nodes"),
             F.sum("degree").alias("degree_sum"))
    )
    m = und.agg(F.count(F.lit(1)).alias("m"))
    return (
        deg.join(intra, "label", "left")
        .crossJoin(m)
        .select(
            "label", "n_nodes",
            F.coalesce("intra_edges", F.lit(0)).cast("bigint")
            .alias("intra_edges"),
            "degree_sum", "m")
        .select(
            "label", "n_nodes", "intra_edges", "degree_sum",
            (F.expr("(1000000000 * intra_edges) div m")
             - F.expr("((1000000 * degree_sum) div (2 * m))"
                      " * ((1000000 * degree_sum) div (2 * m))"
                      " div 1000")).alias("q_x1e9"),
        )
    )


def sql_modularity(edges_sql: str, labels_sql: str) -> str:
    """DuckDB twin: same undirected rollup, same double-floor
    fixed-point recipe."""
    return f"""
WITH und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ({edges_sql}) WHERE src <> dst
), lab AS ({labels_sql}),
intra AS (
  SELECT la.label, count(*)::BIGINT AS intra_edges
  FROM und
  JOIN lab la ON la.node = und.a
  JOIN lab lb ON lb.node = und.b
  WHERE la.label = lb.label
  GROUP BY la.label
), deg AS (
  SELECT l.label, count(*)::BIGINT AS n_nodes,
         sum(d.degree)::BIGINT AS degree_sum
  FROM (
    SELECT node, count(*)::BIGINT AS degree FROM (
      SELECT a AS node FROM und UNION ALL SELECT b FROM und
    ) GROUP BY node
  ) d JOIN lab l ON l.node = d.node
  GROUP BY l.label
), mm AS (SELECT count(*)::BIGINT AS m FROM und)
SELECT deg.label, deg.n_nodes,
       coalesce(intra.intra_edges, 0)::BIGINT AS intra_edges,
       deg.degree_sum,
       ((1000000000 * coalesce(intra.intra_edges, 0)) // m
        - ((1000000 * deg.degree_sum) // (2 * m))
          * ((1000000 * deg.degree_sum) // (2 * m)) // 1000
       )::BIGINT AS q_x1e9
FROM deg LEFT JOIN intra USING (label) CROSS JOIN mm
"""


def neighbor_jaccard(edges: DataFrame, max_degree: int = 64,
                     min_cn: int = 2) -> DataFrame:
    """Structural node similarity → (a, b, common, deg_a, deg_b,
    j_x10k): neighbor-set Jaccard for every node pair sharing
    ``>= min_cn`` common neighbors, exact x10k integers.

    The entity-resolution signal next to link_prediction's RA
    index: two KG nodes whose neighborhoods overlap heavily are
    merge candidates (sameAs suspects) even with no direct edge.
    Same hub discipline as link_prediction — wedge CENTERS above
    ``max_degree`` contribute no pairs (a mega-hub would mint
    degree² candidates; the LSH hot-bucket lesson applied at design
    time), while deg_a/deg_b in the Jaccard stay the FULL degrees.
    The cap is a documented approximation: ``common`` counts only
    common neighbors whose own degree is ≤ ``max_degree``, so
    j_x10k UNDERSTATES true Jaccard for pairs that additionally
    share a hub neighbor (it never overstates — the DuckDB twin
    applies the identical cap, keeping the engines bit-equal).

    Scale shape: one degree aggregate, one capped wedge self-join
    (per-center fan-out ≤ max_degree²), one (a, b) map-side-combined
    count, two degree re-attach joins on node keys.
    """
    und = _undirected(edges).localCheckpoint()
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    )
    sym = (und.select(F.col("a").alias("c"), F.col("b").alias("n"))
           .unionByName(
               und.select(F.col("b").alias("c"), F.col("a").alias("n"))))
    centers = deg.filter(F.col("degree") <= max_degree) \
                 .select(F.col("node").alias("c"))
    capped = sym.join(centers, "c", "left_semi")
    x = capped.select("c", F.col("n").alias("a"))
    y = capped.select("c", F.col("n").alias("b"))
    pairs = (
        x.join(y, "c")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= min_cn)
    )
    da = deg.select(F.col("node").alias("a"),
                    F.col("degree").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"),
                    F.col("degree").alias("deg_b"))
    return (
        pairs.join(da, "a").join(db, "b")
        .select(
            "a", "b", "common", "deg_a", "deg_b",
            F.expr("(10000 * common) div (deg_a + deg_b - common)")
            .alias("j_x10k"))
    )


def sql_neighbor_jaccard(edges_sql: str, max_degree: int = 64,
                         min_cn: int = 2) -> str:
    """DuckDB twin of :func:`neighbor_jaccard`."""
    return f"""
WITH und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ({edges_sql}) WHERE src <> dst
), deg AS (
  SELECT node, count(*)::BIGINT AS degree FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY node
), sym AS (
  SELECT a AS c, b AS n FROM und UNION ALL SELECT b, a FROM und
), capped AS (
  SELECT s.c, s.n FROM sym s
  JOIN deg d ON d.node = s.c AND d.degree <= {max_degree}
), pairs AS (
  SELECT x.n AS a, y.n AS b, count(*)::BIGINT AS common
  FROM capped x JOIN capped y ON x.c = y.c AND x.n < y.n
  GROUP BY x.n, y.n
  HAVING count(*) >= {min_cn}
)
SELECT p.a, p.b, p.common, da.degree AS deg_a, db.degree AS deg_b,
       ((10000 * p.common) // (da.degree + db.degree - p.common))
         ::BIGINT AS j_x10k
FROM pairs p
JOIN deg da ON da.node = p.a
JOIN deg db ON db.node = p.b
"""


def bipartite_check(edges: DataFrame) -> DataFrame:
    """Bipartiteness per connected component → (component, n_nodes,
    is_bipartite), via the DOUBLE-COVER reduction: split every node
    v into v#0 / v#1, map each undirected edge (a, b) to the cover
    edges (a#0, b#1) and (a#1, b#0) — the component of the cover is
    connected across the two copies of v iff v lies on an odd cycle,
    so a component is bipartite iff NO node's two copies share a
    cover component.

    KG use: relation-specific subgraphs that SHOULD be bipartite
    (entity–attribute, page–entity, author–paper) grow odd cycles
    exactly when the linker merges two roles into one node — this is
    the global detector for that class of merge error.

    The reduction inherits pointer-doubling O(log diameter)
    convergence and the raise-on-partial contract from
    ``connected_components`` — a direct BFS 2-coloring would be
    O(diameter) rounds.  Scale shape: the cover doubles edges and
    nodes (constant factor); everything else is two CC runs plus a
    node-keyed self-join of the cover labels and one component-keyed
    map-side-combined aggregate.
    """
    und = _undirected(edges).localCheckpoint()
    base = und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    cover = (
        und.select(F.concat("a", F.lit("#0")).alias("src"),
                   F.concat("b", F.lit("#1")).alias("dst"))
        .unionByName(
            und.select(F.concat("a", F.lit("#1")).alias("src"),
                       F.concat("b", F.lit("#0")).alias("dst")))
    )
    cov = connected_components(cover)
    node = F.expr("substring(node, 1, length(node) - 2)")
    c0 = (cov.filter(F.col("node").endswith("#0"))
          .select(node.alias("node"), F.col("component").alias("c0")))
    c1 = (cov.filter(F.col("node").endswith("#1"))
          .select(node.alias("node"), F.col("component").alias("c1")))
    odd = (c0.join(c1, "node")
           .select("node",
                   (F.col("c0") == F.col("c1")).cast("int")
                   .alias("on_odd")))
    comp = connected_components(base)
    return (
        comp.join(odd, "node")
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_nodes"),
             (F.max("on_odd") == 0).alias("is_bipartite"))
    )


def sql_bipartite_check(edges_sql: str) -> str:
    """DuckDB twin: recursive min-label CC on the cover and the base
    graph (the driver-oracle pattern of rel_connected_components),
    same per-component odd-copy aggregate."""
    return f"""
WITH RECURSIVE und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ({edges_sql}) WHERE src <> dst
), cover AS (
  SELECT a || '#0' AS src, b || '#1' AS dst FROM und
  UNION ALL SELECT a || '#1', b || '#0' FROM und
), csym AS (
  SELECT src, dst FROM cover UNION SELECT dst, src FROM cover
), creach(node, comp) AS (
  SELECT src, src FROM csym
  UNION
  SELECT e.src, r.comp FROM csym e JOIN creach r ON e.dst = r.node
), clab AS (
  SELECT node, min(comp) AS component FROM creach GROUP BY node
), bsym AS (
  SELECT a AS src, b AS dst FROM und UNION SELECT b, a FROM und
), breach(node, comp) AS (
  SELECT src, src FROM bsym
  UNION
  SELECT e.src, r.comp FROM bsym e JOIN breach r ON e.dst = r.node
), blab AS (
  SELECT node, min(comp) AS component FROM breach GROUP BY node
), odd AS (
  SELECT substr(c0.node, 1, length(c0.node) - 2) AS node,
         CASE WHEN c0.component = c1.component THEN 1 ELSE 0 END
           AS on_odd
  FROM clab c0 JOIN clab c1
    ON substr(c0.node, 1, length(c0.node) - 2)
       = substr(c1.node, 1, length(c1.node) - 2)
   AND c0.node LIKE '%#0' AND c1.node LIKE '%#1'
)
SELECT b.component, count(*)::BIGINT AS n_nodes,
       (max(o.on_odd) = 0) AS is_bipartite
FROM blab b JOIN odd o ON o.node = b.node
GROUP BY b.component
"""


def _boruvka_key(a, b) -> F.Column:
    """Total edge order for the spanning forest: md5-derived 32-bit
    weight, zero-padded decimal, then the edge endpoints — a single
    STRING both engines compare identically."""
    ca, cb = F.col(a), F.col(b)
    w = F.conv(F.substring(
        F.md5(F.concat(ca, F.lit("#"), cb)), 1, 8), 16, 10)
    return F.concat(F.lpad(w, 10, "0"), F.lit("#"), ca,
                    F.lit("#"), cb)


def _sql_boruvka_key(a: str, b: str) -> str:
    return (f"lpad(('0x' || substr(md5({a} || '#' || {b}), 1, 8))"
            f"::BIGINT::VARCHAR, 10, '0') || '#' || {a} || '#' || {b}")


def boruvka_forest(edges: DataFrame, rounds: int = 8) -> DataFrame:
    """Borůvka minimum spanning forest → (a, b, key): the MSF of the
    undirected simple graph under the deterministic total edge order
    ``(hex32(md5(a#b)), a, b)`` — with an injective order Borůvka
    yields THE unique minimum forest, so the result is a pure
    function of the edge set.

    The classic O(log n)-round distributed MST: per round every
    component claims its minimum outgoing edge, claimed edges merge
    components, repeat.  KG/web use: a spanning forest is the
    cheapest connectivity certificate (audit why two entities
    merged: the forest path between them IS the merge evidence
    chain), and Borůvka is the textbook "per-group argmin + contract"
    pattern the engine should own.

    Scale shape per round: one edge⋈labels join pair (node-keyed),
    one (component)-keyed map-side-combined min over the doubled
    candidate stream, a forest-sized distinct, and a CC relabel over
    the FOREST edges only (pointer doubling — O(log d) inner
    rounds).  Components at least halve per round, so ``rounds`` = 8
    covers components to 256 nodes and the kernel RAISES rather than
    returning a partial forest (the CC/kcore/MIS policy).
    """
    und = _undirected(edges).localCheckpoint()
    e = und.select("a", "b", _boruvka_key("a", "b").alias("key")) \
           .localCheckpoint()
    nodes = (e.select(F.col("a").alias("node"))
             .unionByName(e.select(F.col("b").alias("node")))
             .distinct().localCheckpoint())
    labels = nodes.select("node", F.col("node").alias("comp"))
    forest: DataFrame | None = None
    for i in range(rounds + 1):
        la = labels.select(F.col("node").alias("a"),
                           F.col("comp").alias("ca"))
        lb = labels.select(F.col("node").alias("b"),
                           F.col("comp").alias("cb"))
        cross = (e.join(la, "a").join(lb, "b")
                 .filter(F.col("ca") != F.col("cb"))
                 .localCheckpoint())
        if cross.isEmpty():
            break
        if i == rounds:
            raise RuntimeError(
                f"boruvka_forest: cross-component edges remain after "
                f"{rounds} rounds; raise `rounds` (a partial forest "
                "understates connectivity)")
        cand = (cross.select(F.col("ca").alias("comp"), "key")
                .unionByName(
                    cross.select(F.col("cb").alias("comp"), "key")))
        picked_keys = (cand.groupBy("comp")
                       .agg(F.min("key").alias("key"))
                       .select("key").distinct())
        picked = e.join(picked_keys, "key", "left_semi")
        forest = (picked if forest is None
                  else forest.unionByName(picked).distinct())
        forest = forest.localCheckpoint()
        cc = connected_components(
            forest.select(F.col("a").alias("src"),
                          F.col("b").alias("dst")))
        labels = (nodes.join(cc, "node", "left")
                  .select("node",
                          F.coalesce("component", F.col("node"))
                          .alias("comp"))
                  .localCheckpoint())
    if forest is None:
        return e.filter(F.lit(False)).select("a", "b", "key")
    return forest.select("a", "b", "key")


def sql_boruvka_forest(edges_sql: str, rounds: int = 8) -> str:
    """DuckDB twin: the same claim-and-contract schedule unrolled,
    with a recursive min-label CC over the accumulated forest per
    round."""
    key = _sql_boruvka_key("a", "b")
    ctes = [
        f"""e AS MATERIALIZED (
  SELECT a, b, {key} AS key FROM (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM ({edges_sql}) WHERE src <> dst)
)""",
        "nodes AS MATERIALIZED "
        "(SELECT a AS node FROM e UNION SELECT b FROM e)",
        "l0 AS MATERIALIZED (SELECT node, node AS comp FROM nodes)",
        "f0 AS MATERIALIZED (SELECT a, b, key FROM e WHERE 1 = 0)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(f"""x{i} AS MATERIALIZED (
  SELECT e.a, e.b, e.key, la.comp AS ca, lb.comp AS cb
  FROM e JOIN l{p} la ON la.node = e.a
         JOIN l{p} lb ON lb.node = e.b
  WHERE la.comp <> lb.comp)""")
        ctes.append(f"""p{i} AS MATERIALIZED (
  SELECT DISTINCT e.a, e.b, e.key
  FROM e JOIN (
    SELECT min(key) AS key FROM (
      SELECT ca AS comp, key FROM x{i}
      UNION ALL SELECT cb, key FROM x{i}
    ) GROUP BY comp
  ) mk ON mk.key = e.key)""")
        ctes.append(f"""f{i} AS MATERIALIZED (
  SELECT a, b, key FROM f{p}
  UNION SELECT a, b, key FROM p{i})""")
        ctes.append(f"""sym{i} AS MATERIALIZED (
  SELECT a AS s, b AS d FROM f{i} UNION SELECT b, a FROM f{i})""")
        ctes.append(f"""reach{i}(node, comp) AS (
  SELECT s, s FROM sym{i}
  UNION
  SELECT e.s, r.comp FROM sym{i} e JOIN reach{i} r ON e.d = r.node)""")
        ctes.append(f"""l{i} AS MATERIALIZED (
  SELECT n.node, coalesce(c.component, n.node) AS comp
  FROM nodes n LEFT JOIN (
    SELECT node, min(comp) AS component FROM reach{i} GROUP BY node
  ) c USING (node))""")
    return ("WITH RECURSIVE " + ",\n".join(ctes)
            + f"\nSELECT a, b, key FROM f{rounds}")


def core_decompose(edges: DataFrame, k_max: int = 4,
                   rounds: int = 12) -> DataFrame:
    """Core decomposition → (node, coreness) for every node of the
    undirected simple graph, capped at ``k_max`` (a node in the
    (k_max+1)-core reports k_max — the cap is part of the contract,
    like the subclass-ontology size cap).

    The full version of the single-k ``kcore`` diagnostic: coreness
    strata are the standard corpus-graph density ladder (periphery =
    1, well-corroborated nucleus = high k), and the decomposition is
    just successive peels — the k-core of the (k−1)-core.  Each peel
    runs EXACTLY like ``kcore`` (batch parallel peel, raise on
    non-convergence at ``rounds``), so the result is the same
    fixpoint any engine computes.

    Scale shape: k_max × the kcore cost, each level on a shrinking
    edge set (the k-core is a subgraph of the (k−1)-core); per round
    one node-keyed count + two anti-joins, lineage truncated.
    """
    cur = _undirected(edges).localCheckpoint()
    levels = (
        cur.select(F.col("a").alias("node"))
        .unionByName(cur.select(F.col("b").alias("node")))
        .distinct()
        .select("node", F.lit(1).cast("int").alias("k"))
    )
    for k in range(2, k_max + 1):
        for i in range(rounds):
            deg = (
                cur.select(F.col("a").alias("node"))
                .unionByName(cur.select(F.col("b").alias("node")))
                .groupBy("node")
                .agg(F.count(F.lit(1)).alias("deg"))
            )
            low = deg.filter(F.col("deg") < k).select("node")
            if low.isEmpty():
                break
            if i == rounds - 1:
                raise RuntimeError(
                    f"core_decompose: {k}-core peel still changing "
                    f"after {rounds} rounds; raise `rounds`")
            cur = (
                cur.join(low.withColumnRenamed("node", "a"), "a",
                         "left_anti")
                .join(low.withColumnRenamed("node", "b"), "b",
                      "left_anti")
                .localCheckpoint()
            )
        survivors = (
            cur.select(F.col("a").alias("node"))
            .unionByName(cur.select(F.col("b").alias("node")))
            .distinct()
            .select("node", F.lit(k).cast("int").alias("k"))
        )
        levels = levels.unionByName(survivors)
    return levels.groupBy("node").agg(F.max("k").alias("coreness"))


def sql_core_decompose(edges_sql: str, k_max: int = 4,
                       rounds: int = 12) -> str:
    """DuckDB twin: successive unrolled peels, each level starting
    from the previous level's surviving edge set."""
    ctes = [
        f"""e1_{rounds} AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ({edges_sql}) WHERE src <> dst
)"""
    ]
    lvl_sel = [f"SELECT a AS node, 1 AS k FROM e1_{rounds} "
               f"UNION SELECT b, 1 FROM e1_{rounds}"]
    for k in range(2, k_max + 1):
        ctes.append(f"e{k}_0 AS MATERIALIZED "
                    f"(SELECT a, b FROM e{k - 1}_{rounds})")
        for i in range(1, rounds + 1):
            ctes.append(
                f"d{k}_{i} AS MATERIALIZED (SELECT node, "
                f"count(*)::BIGINT AS deg FROM ("
                f"SELECT a AS node FROM e{k}_{i-1} "
                f"UNION ALL SELECT b FROM e{k}_{i-1}) GROUP BY node)")
            ctes.append(
                f"e{k}_{i} AS MATERIALIZED (SELECT e.a, e.b "
                f"FROM e{k}_{i-1} e "
                f"JOIN d{k}_{i} da ON da.node = e.a AND da.deg >= {k} "
                f"JOIN d{k}_{i} db ON db.node = e.b AND db.deg >= {k})")
        lvl_sel.append(
            f"SELECT a AS node, {k} AS k FROM e{k}_{rounds} "
            f"UNION SELECT b, {k} FROM e{k}_{rounds}")
    levels = " UNION ALL ".join(f"({q})" for q in lvl_sel)
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT node, max(k)::INT AS coreness FROM ({levels}) GROUP BY node""")
