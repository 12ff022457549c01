"""Deterministic hash random-walks — DeepWalk/node2vec-style corpus
generation for KG / web-graph embedding training, reproducible
bit-for-bit.

Embedding pipelines (DeepWalk, Perozzi et al. 2014; node2vec, Grover &
Leskovec 2016) sample fixed-length walks from every node and feed the
node sequences to a skip-gram trainer.  RNG-based sampling is
irreproducible across runs/partitionings and has no cross-engine
oracle, so this kernel replaces the RNG with a HASH TOURNAMENT: at
step t, walk w moves from node u to the out-neighbor v minimizing
``md5(walk_id:t:v)`` (ties — hash collisions — break on v itself).
Every neighbor choice is a pure function of (walk_id, step, neighbor),
so the walk set is a deterministic property of the graph: identical
under any partitioning, task order, retry, or engine.  Per (walk, step)
the argmin over neighbors is uniform-ish over the out-neighborhood —
the same role the RNG plays, with the rendezvous-hash argument
(functions/web.py rendezvous_shard) for uniformity.

Scale shape (the 10^11-edge path): step t is ONE equi-join of the
frontier (|walks| rows, 2 narrow columns) against the edge table on
``src``, reduced by a map-side-combinable ``min(struct(hkey, cand))``
per walk — candidate fan-out (frontier × out-degree) collapses inside
the partial aggregate, never materializing at the reducer.  The
frontier is localCheckpoint-ed per step so the plan stays flat at any
walk length; on a real cluster the edge table should be bucketed by
``src`` so every step reuses one co-located partitioning (the
pagerank note, graph.py:250).  Dead ends simply terminate the walk.

DuckDB twin: ``sql_hash_walks`` unrolls steps as CTEs with a
``row_number() OVER (PARTITION BY walk ORDER BY md5, cand) = 1``
pick — md5 hex strings and their ASCII ordering are identical in
Spark and DuckDB, so the twin hash-matches.

Reference parity: GAIA consumes pretrained entity embeddings
(SURVEY.md §2.3/§2.6); fitting them at corpus scale needs this walk
sampler — beyond-reference scope like the BPE trainer (bpe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_walks(edges: DataFrame, walk_len: int = 4,
               walks_per_node: int = 2) -> DataFrame:
    """→ (walk_id, step, node): ``walks_per_node`` deterministic
    walks of ≤ ``walk_len`` steps from every node with out-degree > 0.

    ``walk_id`` = ``start_node#i``; step 0 is the start node; a walk
    ends early at a node with no out-edges.
    """
    e = edges.select("src", "dst").distinct().localCheckpoint()
    starts = e.select(F.col("src").alias("node")).distinct()
    frontier = (
        starts.select(
            "node",
            F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1)))
            .alias("i"),
        )
        .select(
            F.concat(F.col("node"), F.lit("#"),
                     F.col("i").cast("string")).alias("walk_id"),
            F.col("node").alias("cur"),
        )
        .localCheckpoint()
    )

    out = frontier.select(
        "walk_id", F.lit(0).alias("step"), F.col("cur").alias("node"))
    for t in range(1, walk_len + 1):
        hkey = F.md5(F.concat_ws(
            ":", F.col("walk_id"), F.lit(str(t)), F.col("dst")))
        nxt = (
            frontier.join(e, frontier.cur == e.src)
            .select("walk_id", F.struct(hkey.alias("h"),
                                        F.col("dst").alias("cand"))
                    .alias("hc"))
            .groupBy("walk_id")
            .agg(F.min("hc").alias("win"))
            .select("walk_id", F.col("win.cand").alias("cur"))
            .localCheckpoint()
        )
        out = out.unionByName(nxt.select(
            "walk_id", F.lit(t).alias("step"),
            F.col("cur").alias("node")))
        frontier = nxt
    return out


def sql_hash_walks(edges_rel: str, walk_len: int = 4,
                   walks_per_node: int = 2) -> str:
    """DuckDB twin of :func:`hash_walks` — steps unrolled as CTEs."""
    parts = [f"""
e AS (SELECT DISTINCT src, dst FROM ({edges_rel})),
s_0 AS (
  SELECT n.node || '#' || i::VARCHAR AS walk_id, n.node AS cur
  FROM (SELECT DISTINCT src AS node FROM e) n,
       (SELECT unnest(range(0, {walks_per_node})) AS i)
)"""]
    for t in range(1, walk_len + 1):
        parts.append(f"""
s_{t} AS (
  SELECT walk_id, cand AS cur FROM (
    SELECT s.walk_id, e.dst AS cand,
           row_number() OVER (
             PARTITION BY s.walk_id
             ORDER BY md5(s.walk_id || ':{t}:' || e.dst), e.dst
           ) AS rn
    FROM s_{t - 1} s JOIN e ON s.cur = e.src)
  WHERE rn = 1
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT walk_id, {t} AS step, cur AS node FROM s_{t}"
        for t in range(0, walk_len + 1))
    return ("WITH " + ",".join(parts)
            + f"\nSELECT walk_id, step::INT AS step, node FROM ({union})")
