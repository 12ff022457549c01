"""Similarity search over embedding columns (`array<float>`).

Two paths, same contract (query_id, neighbor_id, rank, sim_x10k):

- **brute-force cosine top-k** — the correctness baseline: broadcast
  the (small) query set against the corpus, dot products via
  `F.aggregate(F.zip_with(...))` (JVM-side higher-order functions, no
  Python), per-query top-k via a window.  At 100 TB the corpus side
  stays partition-parallel and only k rows per (query, partition)
  survive the partial top-k (AQE handles the final skinny shuffle).
- **random-hyperplane LSH ANN** — the scale path: H seeded
  hyperplanes → sign-bit bucket key; candidates = same-bucket rows
  (multi-probe over P band groups), then exact cosine re-rank.
  Hyperplane components are derived from xxhash64(dim, plane) so the
  planes are deterministic, identical on every executor, and need no
  driver-side randomness or broadcast of float matrices.

All arithmetic is double; cosine is integerized floor(1e4·sim) for
cross-engine hashing (ties at identical vectors break by neighbor_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from gaia_spark.functions.text_analysis import SCALE

ANN_SEED = 0xA11CE

#: number of independent uniform hash draws summed per hyperplane
#: component (Irwin-Hall ≈ Gaussian); see _plane_component.
PLANE_DRAWS = 4


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays (left-to-right summation)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(df: DataFrame, vec_col: str) -> Column:
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query row.

    → (query_id, neighbor_id, rank, sim_x10k); self-matches excluded;
    rank by (sim desc, neighbor_id asc) — total order, deterministic.

    Shape: the |corpus|×|queries| sim rows are reduced to ≤ k rows per
    (query, scan partition) BEFORE the global window — a bounded
    Arrow-batched per-partition reducer (mapInPandas, cross-batch
    top-k accumulation), so the final shuffle carries at most
    k·partitions rows per query instead of funneling the whole cross
    product into ≤ |queries| window partitions.  Local top-k under the
    (sim desc, neighbor_id asc) total order is prefix-closed, so the
    global result is still exact; `sim` passes through the Arrow
    round-trip bit-identically (float64), keeping the DuckDB oracle
    hash-stable.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(queries, vec_col).alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(corpus, vec_col).alias("cv"),
    )
    sims = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine_col(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "sim")
    )

    def local_topk(batches):
        state = None
        for pdf in batches:
            both = pdf if state is None else pd.concat(
                [state, pdf], ignore_index=True)
            both = both.sort_values(
                ["query_id", "sim", "neighbor_id"],
                ascending=[True, False, True], kind="mergesort")
            state = both.groupby("query_id", sort=False).head(k)
        if state is not None:
            yield state

    pruned = sims.mapInPandas(local_topk, schema=sims.schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank",
            F.floor(F.lit(SCALE) * F.col("sim")).alias("sim_x10k"),
        )
    )


def sql_cosine_topk(rel: str, k: int, query_where: str,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> str:
    """DuckDB oracle for cosine_topk.

    Dot/norm via an ordinal unnest join summed in index order inside
    list_aggregate-free SQL: uses generate_subscripts to keep the
    arithmetic explicit and double-typed.
    """
    return f"""
WITH q AS (
  SELECT {id_col} AS query_id, {vec_col} AS qv FROM {rel}
  WHERE {query_where}
), c AS (
  SELECT {id_col} AS neighbor_id, {vec_col} AS cv FROM {rel}
), sims AS (
  SELECT query_id, neighbor_id,
    list_sum(list_transform(list_zip(qv, cv),
             z -> z[1]::DOUBLE * z[2]::DOUBLE))
    / ( sqrt(list_sum(list_transform(qv, x -> x::DOUBLE * x::DOUBLE)))
      * sqrt(list_sum(list_transform(cv, x -> x::DOUBLE * x::DOUBLE))) )
      AS sim
  FROM c CROSS JOIN q
  WHERE neighbor_id <> query_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, rank::INT AS rank,
       floor({SCALE} * sim)::BIGINT AS sim_x10k
FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# LSH / bucketed ANN (scale path)
# ---------------------------------------------------------------------------

def _plane_component(dim_idx: Column, plane: int) -> Column:
    """Deterministic approximately-Gaussian hyperplane component:
    sum of PLANE_DRAWS independent uniform[-1,1) draws, each from
    xxhash64(dim, seed) — Irwin-Hall, variance PLANE_DRAWS/3.  Identical
    on every executor, no driver randomness or float-matrix broadcast.

    Signed-random-projection collision probability 1-θ/π holds exactly
    only for spherically-symmetric (true Gaussian) planes; the sum of 4
    uniforms is close enough that banded-recall figures quoted from
    that formula are good approximations, not exact guarantees.
    """
    acc = F.lit(0.0)
    for d in range(PLANE_DRAWS):
        h = F.xxhash64(dim_idx, F.lit(ANN_SEED + plane * PLANE_DRAWS + d))
        acc = acc + (h.cast("double") / F.lit(float(2**63)))
    return acc


def lsh_bucket_col(vec: Column, num_planes: int = 16) -> Column:
    """Sign-bit bucket key from num_planes deterministic hyperplanes."""
    acc = F.lit(0).cast("bigint")
    for p in range(num_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x.cast("double") * _plane_component(i, p),
            ),
            F.lit(0.0).cast("double"),
            lambda a, v: a + v,
        )
        acc = acc + F.when(proj > 0,
                           F.shiftleft(F.lit(1).cast("bigint"), p)
                           ).otherwise(F.lit(0))
    return acc


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    num_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates share the LSH bucket, exact
    cosine re-rank within bucket.  Recall measured in tests against
    cosine_topk; at scale the bucket key is the shuffle/partition key
    so each executor re-ranks only its bucket's rows.

    ``multiprobe``: each query also probes the num_planes buckets at
    Hamming distance 1 (flip one plane bit) — the standard recall
    lever that costs query-side fanout, never a bigger corpus shuffle.
    """
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(corpus, vec_col).alias("cv"),
        lsh_bucket_col(F.col(vec_col), num_planes).alias("bucket"),
    )
    qbase = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(queries, vec_col).alias("qv"),
        lsh_bucket_col(F.col(vec_col), num_planes).alias("bucket0"),
    )
    if multiprobe:
        probe_buckets = F.array(
            F.col("bucket0"),
            *[
                F.col("bucket0").bitwiseXOR(
                    F.shiftleft(F.lit(1).cast("bigint"), p))
                for p in range(num_planes)
            ],
        )
    else:
        probe_buckets = F.array(F.col("bucket0"))
    qb = qbase.select(
        "query_id", "qv",
        F.explode(probe_buckets).alias("bucket"),
    )
    sims = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("sim", cosine_col(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank",
            F.floor(F.lit(SCALE) * F.col("sim")).alias("sim_x10k"),
        )
    )


def _sqdist_matrix(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """n×k squared-L2 distance matrix via the expansion
    ||x||² − 2x·c + ||c||² (vectorized BLAS; tiny negatives from
    cancellation are harmless for argmin/argsort)."""
    return (
        (X * X).sum(axis=1)[:, None]
        - 2.0 * (X @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )


def _stack(v: pd.Series) -> np.ndarray:
    return np.stack([np.asarray(x, dtype=np.float64) for x in v])


def _assign_cluster_udf(df: DataFrame, centroids: list[list[float]]):
    """Vectorized pandas UDF: nearest-centroid index per vector.

    The k×dim centroid matrix travels as a SparkContext broadcast
    variable read inside the Arrow batch loop — the physical plan stays
    O(1) in k and dim (vs embedding k×dim float literals in the plan,
    which explodes Catalyst/codegen at real IVF geometry k=4096,
    dim=768).  Ties break to the lowest cluster index (np.argmin first
    occurrence), matching the old array_position(array_min) semantics.
    """
    bc = df.sparkSession.sparkContext.broadcast(
        np.asarray(centroids, dtype=np.float64))

    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        d2 = _sqdist_matrix(_stack(v), bc.value)
        return pd.Series(np.argmin(d2, axis=1).astype(np.int32))

    return assign


def _probe_clusters_udf(df: DataFrame, centroids: list[list[float]],
                        n_probe: int):
    """Vectorized pandas UDF: the n_probe nearest cluster indices per
    query vector, nearest first (stable argsort — distance ties break
    by cluster index, matching the old array_sort-of-structs order)."""
    bc = df.sparkSession.sparkContext.broadcast(
        np.asarray(centroids, dtype=np.float64))

    @pandas_udf("array<int>")
    def probes(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        d2 = _sqdist_matrix(_stack(v), bc.value)
        order = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype(np.int32) for row in order])

    return probes


def ivf_fit_centroids(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic-init Lloyd k-means for the IVF coarse quantizer.

    Init = the k corpus vectors with smallest xxhash64(id) (seeded,
    order-free); each iteration is one assign (vectorized pandas UDF
    over a broadcast k×dim numpy matrix — O(1) plan size) + one
    per-dimension mean (posexplode → groupBy — map-side combined, so
    the shuffle is ≤ tasks×k×dim partials regardless of corpus size).
    Centroids are tiny (k×dim) and live on the driver between rounds.
    Mean aggregation is float-sum-order dependent at ~1e-16 — harmless
    for retrieval (re-rank is exact) but documented for reproducibility.
    """
    base = corpus.select(
        F.col(id_col).alias("id"),
        _as_double(corpus, vec_col).alias("v"),
    )
    seeds = (
        base.withColumn("h", F.xxhash64(F.col("id"), F.lit(ANN_SEED)))
        .orderBy("h").limit(k).select("v").collect()
    )
    centroids = [list(r.v) for r in seeds]
    for _ in range(iters):
        assign = _assign_cluster_udf(base, centroids)
        assigned = base.withColumn("cluster", assign(F.col("v")))
        dim_means = (
            assigned.select(
                "cluster",
                F.posexplode(F.col("v")).alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new_c = [list(c) for c in centroids]  # keep empty clusters
        by_cluster: dict[int, dict[int, float]] = {}
        for r in dim_means:
            by_cluster.setdefault(int(r.cluster), {})[int(r.dim)] = r.m
        for ci, dims in by_cluster.items():
            new_c[ci] = [dims[d] for d in sorted(dims)]
        centroids = new_c
    return centroids


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: list[list[float]] | None = None,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: k-means coarse quantizer partitions the corpus into
    inverted lists; each query probes its n_probe nearest lists and
    exact-cosine re-ranks only those candidates.

    At scale the cluster id is the partition/bucket key (write the
    corpus bucketed by it), so a query touches n_probe/n_clusters of
    the data.  Centroids ride in a SparkContext broadcast read by
    vectorized pandas UDFs — the plan is O(1) in (k, dim), so real IVF
    geometry (k=4096, dim=768) costs 25 MB of broadcast, not a 3M-node
    expression tree.  → (query_id, neighbor_id, rank, sim_x10k)
    """
    if centroids is None:
        centroids = ivf_fit_centroids(corpus, k=n_clusters,
                                      id_col=id_col, vec_col=vec_col)
    assign = _assign_cluster_udf(corpus, centroids)
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(corpus, vec_col).alias("cv"),
    ).withColumn("cluster", assign(F.col("cv")))
    probes = _probe_clusters_udf(queries, centroids, n_probe)
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(queries, vec_col).alias("qv"),
    ).select(
        "query_id", "qv",
        F.explode(probes(F.col("qv"))).alias("cluster"),
    )
    sims = (
        cb.join(F.broadcast(qb), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine_col(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank",
            F.floor(F.lit(SCALE) * F.col("sim")).alias("sim_x10k"),
        )
    )


#: band buckets above this emit star candidates (bucket-min ↔ member)
#: instead of all pairs — same guard as dedup.MAX_BAND_BUCKET.  Higher
#: default than minhash's: hyperplane bands carry only num_planes/bands
#: bits, so legitimate buckets are coarser than 128-perm minhash bands.
MAX_EMB_BAND_BUCKET = 4096


def embedding_dup_pairs(
    df: DataFrame,
    min_x10k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    bands: int = 4,
    max_bucket: int | None = MAX_EMB_BAND_BUCKET,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a<b, floor(1e4·cos)≥min).

    Banded random-hyperplane blocking (OR over ``bands`` bands of
    num_planes/bands sign bits each) + exact cosine verification of
    candidates — the minhash-LSH shape applied to embeddings, so a pair
    only needs to agree on ONE band to be checked.  Recall at cosine c
    with 4 bands of 4 planes: 1-(1-(1-θ/π)^4)^4, e.g. ≈0.93 at c=0.92 —
    approximate, since the planes are sums of uniform draws, not exact
    Gaussians (see _plane_component).  → (a_id, b_id, sim_x10k)

    Scale shape: the band self-join carries IDS ONLY — embeddings are
    re-attached per verified candidate pair AFTER `dropDuplicates`, so
    the d²-row band intermediate is 3 longs per row, never 2×dim
    doubles (at dim=768 that is ~400× less shuffle per candidate).
    Buckets above ``max_bucket`` emit star candidates (bucket-min ↔
    member, linear) instead of all pairs — a duplicate-heavy corpus
    concentrates near-identical vectors into one bucket per band;
    star pairs still go through exact-cosine verification, and
    downstream CC resolution closes the transitivity exactly as in
    `dedup.lsh_candidates`.  ``max_bucket=None`` disables the guard.
    """
    r = num_planes // bands
    hashed = df.select(
        F.col(id_col).alias("id"),
        _as_double(df, vec_col).alias("v"),
        lsh_bucket_col(F.col(vec_col), num_planes).alias("bucket"),
    )
    vecs = hashed.select("id", "v")
    base = hashed.select(
        "id",
        F.posexplode(
            F.array(*[
                F.shiftright(F.col("bucket"), k * r)
                .bitwiseAND(F.lit((1 << r) - 1))
                for k in range(bands)
            ])
        ).alias("band_id", "band_val"),
    )
    if max_bucket is None:
        small, star = base, None
    else:
        w = Window.partitionBy("band_id", "band_val")
        sized = base.withColumn(
            "n", F.count(F.lit(1)).over(w)
        ).withColumn("bucket_min", F.min("id").over(w))
        small = sized.filter(F.col("n") <= max_bucket).drop(
            "n", "bucket_min")
        star = (
            sized.filter((F.col("n") > max_bucket)
                         & (F.col("id") != F.col("bucket_min")))
            .select(F.col("bucket_min").alias("a_id"),
                    F.col("id").alias("b_id"))
        )
    a, b = small.alias("a"), small.alias("b")
    cand = (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
    )
    if star is not None:
        cand = cand.unionByName(star)
    return (
        cand.dropDuplicates(["a_id", "b_id"])
        .join(vecs.select(F.col("id").alias("a_id"),
                          F.col("v").alias("av")), "a_id")
        .join(vecs.select(F.col("id").alias("b_id"),
                          F.col("v").alias("bv")), "b_id")
        .withColumn("sim", cosine_col(F.col("av"), F.col("bv")))
        .withColumn("sim_x10k", F.floor(F.lit(SCALE) * F.col("sim")))
        .filter(F.col("sim_x10k") >= min_x10k)
        .select("a_id", "b_id", "sim_x10k")
    )
