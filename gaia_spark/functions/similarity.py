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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gaia_spark.functions.text_analysis import SCALE

ANN_SEED = 0xA11CE


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
    """Deterministic pseudo-gaussian-ish hyperplane component in [-1,1]:
    xxhash64(dim, plane-seed) scaled.  Identical on every executor."""
    h = F.xxhash64(dim_idx, F.lit(ANN_SEED + plane))
    return (h.cast("double") / F.lit(float(2**63)))


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


def _centroid_distances(vec: Column, centroids: list[list[float]]) -> Column:
    """Array of squared L2 distances from vec to each centroid (pure
    column expressions; centroids are plan literals, no broadcast var)."""
    dists = []
    for c in centroids:
        carr = F.array(*[F.lit(float(x)) for x in c])
        dists.append(
            F.aggregate(
                F.zip_with(vec, carr, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0).cast("double"),
                lambda acc, v: acc + v,
            )
        )
    return F.array(*dists)


def ivf_fit_centroids(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic-init Lloyd k-means for the IVF coarse quantizer.

    Init = the k corpus vectors with smallest xxhash64(id) (seeded,
    order-free); each iteration is one assign (column exprs) + one
    per-dimension mean (posexplode → groupBy — map-side combined).
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
        assigned = base.withColumn(
            "dists", _centroid_distances(F.col("v"), centroids)
        ).withColumn(
            "cluster",
            F.array_position(F.col("dists"),
                             F.array_min(F.col("dists"))) - 1,
        )
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
    the data.  → (query_id, neighbor_id, rank, sim_x10k)
    """
    if centroids is None:
        centroids = ivf_fit_centroids(corpus, k=n_clusters,
                                      id_col=id_col, vec_col=vec_col)
    cb = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            _as_double(corpus, vec_col).alias("cv"),
        )
        .withColumn("_d", _centroid_distances(F.col("cv"), centroids))
        .withColumn(
            "cluster",
            F.array_position(F.col("_d"), F.array_min(F.col("_d"))) - 1)
        .drop("_d")
    )
    qd = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(queries, vec_col).alias("qv"),
    ).withColumn("dists", _centroid_distances(F.col("qv"), centroids))
    # n_probe nearest clusters per query: sort (dist, idx) pairs
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    pairs = F.array_sort(
        F.zip_with(F.col("dists"), idx,
                   lambda d, i: F.struct(d.alias("d"), i.alias("i"))))
    qb = qd.select(
        "query_id", "qv",
        F.explode(F.slice(pairs, 1, n_probe)).alias("p"),
    ).select("query_id", "qv", F.col("p.i").alias("cluster"))
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


def embedding_dup_pairs(
    df: DataFrame,
    min_x10k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a<b, floor(1e4·cos)≥min).

    Banded random-hyperplane blocking (OR over ``bands`` bands of
    num_planes/bands sign bits each) + exact cosine verification of
    candidates — the minhash-LSH shape applied to embeddings, so a pair
    only needs to agree on ONE band to be checked.  Recall at cosine c
    with 4 bands of 4 planes: 1-(1-(1-θ/π)^4)^4, e.g. ≈0.93 at c=0.92.
    → (a_id, b_id, sim_x10k)
    """
    r = num_planes // bands
    hashed = df.select(
        F.col(id_col).alias("id"),
        _as_double(df, vec_col).alias("v"),
        lsh_bucket_col(F.col(vec_col), num_planes).alias("bucket"),
    )
    base = hashed.select(
        "id", "v",
        F.posexplode(
            F.array(*[
                F.shiftright(F.col("bucket"), k * r)
                .bitwiseAND(F.lit((1 << r) - 1))
                for k in range(bands)
            ])
        ).alias("band_id", "band_val"),
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a_id"),
                F.col("b.id").alias("b_id"),
                F.col("a.v").alias("av"), F.col("b.v").alias("bv"))
        .dropDuplicates(["a_id", "b_id"])
        .withColumn("sim", cosine_col(F.col("av"), F.col("bv")))
        .withColumn("sim_x10k", F.floor(F.lit(SCALE) * F.col("sim")))
        .filter(F.col("sim_x10k") >= min_x10k)
        .select("a_id", "b_id", "sim_x10k")
    )
