"""Exact fixed-point k-means over embedding columns (SemDeDup-style
semantic clustering for corpus curation).

Training-data pipelines cluster document embeddings to balance domain
mixtures and to restrict near-dup search to within-cluster pairs
(SemDeDup, Abbas et al. 2023).  The float Lloyd's in
``similarity.ivf_fit_centroids`` is the ANN coarse quantizer and is
float-sum-order dependent; THIS kernel is the curation-facing variant
with **bit-exact, engine-independent results**, so cluster assignments
are reproducible across runs, partitionings, and engines (the DuckDB
twin hash-matches):

- vectors are integerized ``floor(1e6 * (x + OFFSET))`` per component
  (BIGINT).  The +OFFSET shift keeps every component positive, so the
  centroid update's integer division floors identically in Python
  (``//``), Spark, and DuckDB (``//``) — squared distances are
  shift-invariant, so the geometry (and thus the clustering) is
  unchanged;
- init = the k vectors with smallest ``(md5(id), id)`` — seeded,
  order-free, and computable in ANSI SQL (no engine-specific RNG);
- assignment = argmin of exact int64 squared L2, ties to the lowest
  cluster index; update = per-dimension ``sum // count`` (empty
  clusters keep their previous centroid).

Scale shape (the 100 TB path): centroids are a tiny k×dim BIGINT
matrix that lives on the driver between rounds and ships to executors
as a SparkContext broadcast read inside an Arrow-batched pandas UDF —
the physical plan is O(1) in k and dim.  Each iteration costs ONE
map-side-combined shuffle of at most tasks×k×dim (cluster, dim)
partial sums; document vectors never shuffle.  The integerized corpus
is localCheckpoint-ed once so iterations never re-execute the
upstream scan/transform lineage.

DuckDB twin: ``sql_kmeans_exact`` unrolls the same iterations as CTEs
(the PageRank-oracle pattern, operators/graph.py:232) — exact integer
arithmetic makes the unrolled SQL hash-identical, which floating-point
means (non-associative sums) cannot guarantee.

Reference parity: GAIA clusters mention/document representations for
cross-document coreference (SURVEY.md §2.6); this kernel is the
deterministic clustering primitive re-expressed Spark-first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from gaia_spark.checkpoint import big_local_checkpoint

#: fixed-point scale: 1.0 == 1_000_000 (µ-units)
KM_SCALE = 1_000_000

#: component shift applied BEFORE scaling — keeps integerized values
#: positive (requires inputs > -OFFSET; embeddings here are unit-ish,
#: |x| < 2), so `sum // count` floors identically everywhere.
KM_OFFSET = 2


def _int_vec(vec_col):
    """array<float> → array<bigint>: floor(1e6 * (x + OFFSET)).

    float→double promotion is IEEE-exact and identical in Spark and
    DuckDB, so both engines integerize to the same bits.
    """
    return F.transform(
        vec_col,
        lambda x: F.floor(
            F.lit(KM_SCALE) * (x.cast("double") + F.lit(KM_OFFSET))
        ).cast("bigint"),
    )


def _assign_exact_udf(df: DataFrame, centroids: list[list[int]]):
    """Vectorized pandas UDF → (cluster int, dist bigint) struct.

    Exact int64 arithmetic via the ||x||² − 2x·c + ||c||² expansion
    (numpy int64 matmul — exact, overflow-free: components < 3e6,
    dim ≤ 4096 → d² < 4e16 « 2^63).  Ties break to the lowest cluster
    index (np.argmin first occurrence), matching the SQL twin's
    ``ORDER BY dist, cluster``.  Centroids ride a SparkContext
    broadcast read inside the Arrow batch loop — O(1) plan size.
    """
    bc = df.sparkSession.sparkContext.broadcast(
        np.asarray(centroids, dtype=np.int64))

    @pandas_udf("struct<cluster:int, dist:bigint>")
    def assign(v: pd.Series) -> pd.DataFrame:
        if len(v) == 0:
            return pd.DataFrame({"cluster": pd.Series([], dtype="int32"),
                                 "dist": pd.Series([], dtype="int64")})
        C = bc.value
        X = np.stack([np.asarray(x, dtype=np.int64) for x in v])
        d2 = ((X * X).sum(axis=1)[:, None]
              - 2 * (X @ C.T)
              + (C * C).sum(axis=1)[None, :])
        best = np.argmin(d2, axis=1)
        return pd.DataFrame({
            "cluster": best.astype(np.int32),
            "dist": d2[np.arange(len(best)), best].astype(np.int64),
        })

    return assign


def kmeans_train(base: DataFrame, k: int, iters: int) -> list[list[int]]:
    """The exact-int64 Lloyd loop over an integerized
    ``(vec_id, v: array<bigint>)`` frame → final centroids.

    Shared by :func:`kmeans_exact` and the PQ codebook trainer
    (functions/pq.py).  Init is the total order (md5(vec_id),
    vec_id); every update is an order-free integer sum + floor
    division, so centroids are bit-identical under any partitioning
    and to the unrolled DuckDB twin.  Per round the shuffle carries
    ≤ tasks×k×dim partial sums (map-side combined); only k×dim
    centroid values touch the driver.
    """
    seeds = (
        base.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id").limit(k).select("v").collect()
    )
    centroids = [list(r.v) for r in seeds]

    for _ in range(iters):
        assign = _assign_exact_udf(base, centroids)
        assigned = base.select(
            "v", assign(F.col("v")).getField("cluster").alias("cluster"))
        dim_sums = (
            assigned.select("cluster",
                            F.posexplode(F.col("v")).alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )  # ≤ k×dim rows — tiny by construction
        by_cluster: dict[int, dict[int, int]] = {}
        for r in dim_sums:
            by_cluster.setdefault(int(r.cluster), {})[int(r.dim)] = (
                int(r.s) // int(r.n))  # positive → floor == DuckDB //
        for ci, dims in by_cluster.items():
            centroids[ci] = [dims[d] for d in sorted(dims)]
        # clusters absent from by_cluster (emptied) keep old centroid
    return centroids


def kmeans_exact(
    corpus: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (vec_id, cluster, dist): final assignment after ``iters``
    Lloyd rounds from the md5-seeded init, plus the exact int64
    squared distance to the winning centroid (in µ-unit² space).

    Deterministic under any partitioning / task order / retry: every
    aggregate is an order-free integer sum, the init is a total order
    on (md5(id), id), and ties break on cluster index.
    """
    base = big_local_checkpoint(corpus.select(
        F.col(id_col).alias("vec_id"),
        _int_vec(F.col(vec_col)).alias("v"),
    ))  # corpus-sized, re-scanned every Lloyd round → serialized blocks

    centroids = kmeans_train(base, k, iters)
    assign = _assign_exact_udf(base, centroids)
    out = assign(F.col("v")).alias("a")
    return base.select(
        "vec_id",
        out.getField("cluster").alias("cluster"),
        out.getField("dist").alias("dist"),
    )


def semdedup(
    corpus: DataFrame,
    k: int = 4,
    iters: int = 2,
    tau_x10k: int = 4000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-dup pruning with
    k-means blocking — → (vec_id, cluster, keep).

    A document is dropped (keep = false) iff some SAME-CLUSTER
    document with a smaller id has cosine ≥ tau_x10k/1e4 — the
    deterministic keeper election (lowest id survives each near-dup
    neighborhood).  Clustering is the exact fixed-point kernel above,
    so the blocking — and therefore the output — is bit-reproducible.

    Scale shape: the quadratic is confined WITHIN clusters (the whole
    point of SemDeDup) — cost O(Σ s_c²) for cluster sizes s_c, so k
    is chosen to keep s_c ~ 10³–10⁴ at corpus scale; the pair join
    shuffles on the cluster key and AQE's skew-join splits oversized
    clusters.  Cosine arithmetic is the same double left-to-right
    contract as similarity.cosine_col, already proven hash-identical
    to the DuckDB twin by the emb_dup_pairs oracle.
    """
    from gaia_spark.functions.similarity import cosine_col

    km = kmeans_exact(corpus, k=k, iters=iters,
                      id_col=id_col, vec_col=vec_col)
    base = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col),
                    lambda x: x.cast("double")).alias("v"),
    )
    j = base.join(km.select("vec_id", "cluster"), "vec_id")
    a = j.select(F.col("vec_id").alias("a_id"), F.col("cluster"),
                 F.col("v").alias("av"))
    b = j.select(F.col("vec_id").alias("b_id"), F.col("cluster"),
                 F.col("v").alias("bv"))
    dups = (
        a.join(b, ["cluster"])
        .filter(F.col("a_id") > F.col("b_id"))
        .filter(F.floor(F.lit(10_000)
                        * cosine_col(F.col("av"), F.col("bv")))
                >= F.lit(tau_x10k))
        .select(F.col("a_id").alias("vec_id"))
        .distinct()
    )
    return (
        j.join(dups.withColumn("dup", F.lit(True)), "vec_id", "left")
        .select("vec_id", "cluster",
                F.coalesce(~F.col("dup"), F.lit(True)).alias("keep"))
    )


def sql_semdedup(
    rel: str,
    k: int = 4,
    iters: int = 2,
    tau_x10k: int = 4000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin: the kmeans twin as a subquery + the same
    within-cluster pair filter (cosine shapes from the emb_dup_pairs
    oracle)."""
    km = sql_kmeans_exact(rel, k=k, iters=iters,
                          id_col=id_col, vec_col=vec_col)
    return f"""
WITH km AS ({km}),
e2 AS (
  SELECT {id_col} AS vec_id,
         list_transform({vec_col}, x -> x::DOUBLE) AS v
  FROM {rel}
), j AS (
  SELECT km.vec_id, km.cluster, e2.v
  FROM km JOIN e2 USING (vec_id)
), dups AS (
  SELECT DISTINCT a.vec_id
  FROM j a JOIN j b ON a.cluster = b.cluster AND a.vec_id > b.vec_id
  WHERE floor(10000 *
          list_sum(list_transform(list_zip(a.v, b.v),
                   z -> z[1] * z[2]))
          / ( sqrt(list_sum(list_transform(a.v, x -> x * x)))
            * sqrt(list_sum(list_transform(b.v, x -> x * x))) ))
        >= {tau_x10k}
)
SELECT vec_id, cluster,
       vec_id NOT IN (SELECT vec_id FROM dups) AS keep
FROM j
"""


def sql_kmeans_ctes(
    rel: str,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_expr: str = "embedding",
    prefix: str = "",
) -> tuple[list[str], str, str]:
    """The unrolled kmeans CTE chain, name-prefixed so several chains
    (one per PQ subspace) can share one WITH.  Returns (ctes,
    final_assignment_cte, final_centroids_cte) — the assignment has
    (vec_id, cluster, dist), the centroids (cluster, c)."""
    p = prefix
    seed_order = "md5(vec_id::VARCHAR), vec_id"
    ctes = [
        f"""{p}e AS (
  SELECT {id_col} AS vec_id,
         list_transform({vec_expr},
           x -> floor({KM_SCALE} * (x::DOUBLE + {KM_OFFSET}))::BIGINT)
           AS v
  FROM {rel})""",
        f"""{p}c0 AS (
  SELECT (row_number() OVER (ORDER BY {seed_order}))::INT - 1
           AS cluster, v AS c
  FROM {p}e
  QUALIFY row_number() OVER (ORDER BY {seed_order}) <= {k})""",
    ]
    for t in range(1, iters + 2):  # iters updates + 1 final assignment
        ctes.append(f"""{p}d{t} AS (
  SELECT e.vec_id, c.cluster,
         list_sum(list_transform(list_zip(e.v, c.c),
                  z -> (z[1] - z[2]) * (z[1] - z[2]))) AS dist
  FROM {p}e e CROSS JOIN {p}c{t - 1} c)""")
        ctes.append(f"""{p}a{t} AS (
  SELECT vec_id, cluster, dist FROM {p}d{t}
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY dist, cluster) = 1)""")
        if t == iters + 1:
            break
        ctes.append(f"""{p}m{t} AS (
  SELECT cluster, dim, sum(x) // count(*) AS comp
  FROM (SELECT a.cluster, generate_subscripts(e.v, 1) AS dim,
               unnest(e.v) AS x
        FROM {p}e e JOIN {p}a{t} a USING (vec_id))
  GROUP BY cluster, dim)""")
        ctes.append(f"""{p}c{t} AS (
  SELECT p.cluster, coalesce(n.c, p.c) AS c
  FROM {p}c{t - 1} p LEFT JOIN
    (SELECT cluster, list(comp ORDER BY dim) AS c
     FROM {p}m{t} GROUP BY cluster) n USING (cluster))""")
    return ctes, f"{p}a{iters + 1}", f"{p}c{iters}"


def sql_kmeans_exact(
    rel: str,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin: the same init + iterations unrolled as CTEs."""
    ctes, final_a, _ = sql_kmeans_ctes(rel, k, iters, id_col, vec_col)
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT vec_id, cluster::INT AS cluster, "
          f"dist::BIGINT AS dist FROM {final_a}"
    )
