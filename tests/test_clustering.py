"""Exact fixed-point k-means (functions/clustering.py): DuckDB-twin
bit-equality, partitioning invariance, and a pure-python reference."""

import duckdb
import numpy as np
import pytest

from gaia_spark.functions.clustering import (
    KM_OFFSET,
    KM_SCALE,
    kmeans_exact,
    semdedup,
    sql_kmeans_exact,
    sql_semdedup,
)

RNG = np.random.default_rng(42)
N, DIM, K, ITERS = 160, 12, 4, 2
VECS = (RNG.normal(size=(N, DIM)) * 0.4).astype(np.float32)
# plant exact duplicates so argmin ties exercise the cluster tie-break
VECS[9] = VECS[2]
VECS[33] = VECS[2]


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.createDataFrame(
        [(i, [float(x) for x in VECS[i]]) for i in range(N)],
        "vec_id long, embedding array<float>")


def _python_kmeans():
    """Independent reference: same contract in plain python ints."""
    import hashlib

    X = np.floor(KM_SCALE * (VECS.astype(np.float64) + KM_OFFSET)
                 ).astype(np.int64)
    order = sorted(range(N), key=lambda i: (
        hashlib.md5(str(i).encode()).hexdigest(), i))
    C = [list(map(int, X[i])) for i in order[:K]]
    for _ in range(ITERS):
        d2 = ((X[:, None, :] - np.asarray(C)[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(axis=1)
        for c in range(K):
            members = X[a == c]
            if len(members):
                C[c] = [int(s) // len(members)
                        for s in members.sum(axis=0)]
    d2 = ((X[:, None, :] - np.asarray(C)[None, :, :]) ** 2).sum(-1)
    a = d2.argmin(axis=1)
    return {i: (int(a[i]), int(d2[i, a[i]])) for i in range(N)}


def test_matches_duckdb_twin_and_python(spark, emb_df):
    got = {r.vec_id: (r.cluster, r.dist)
           for r in kmeans_exact(emb_df, k=K, iters=ITERS).collect()}
    con = duckdb.connect()
    con.register("emb_tbl",
                 emb_df.toPandas())  # list col round-trips via Arrow
    want = {r[0]: (r[1], r[2]) for r in con.sql(
        sql_kmeans_exact("emb_tbl", k=K, iters=ITERS)).fetchall()}
    assert got == want
    assert got == _python_kmeans()
    # planted duplicates land in the same cluster, by construction
    assert got[2] == got[9] == got[33]
    assert len({c for c, _ in got.values()}) == K


def test_semdedup_matches_twin_and_drops_duplicates(spark, emb_df):
    got = {r.vec_id: (r.cluster, r.keep)
           for r in semdedup(emb_df, k=K, iters=ITERS,
                             tau_x10k=9990).collect()}
    con = duckdb.connect()
    con.register("emb_tbl", emb_df.toPandas())
    want = {r[0]: (r[1], r[2]) for r in con.sql(
        sql_semdedup("emb_tbl", k=K, iters=ITERS,
                     tau_x10k=9990)).fetchall()}
    assert got == want
    assert len(got) == N
    # the planted exact duplicates of row 2: lowest id (2) survives,
    # the copies (9, 33) are dropped; everything shares 2's cluster
    assert got[2][1] is True
    assert got[9][1] is False and got[33][1] is False
    assert got[2][0] == got[9][0] == got[33][0]
    # at cos >= 0.999 nothing else in this random corpus collides
    assert sum(1 for _, keep in got.values() if not keep) == 2


def test_partitioning_invariance(spark, emb_df):
    base = kmeans_exact(emb_df, k=K, iters=ITERS).collect()
    shuffled = kmeans_exact(
        emb_df.repartition(7, "vec_id"), k=K, iters=ITERS).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, shuffled))
