"""Product quantization (functions/pq.py): DuckDB-twin equality,
joint-vs-per-subspace training equivalence, code-shape contract,
retrieval sanity on separated clusters, partitioning invariance."""

import duckdb
import numpy as np
import pytest

from gaia_spark.checkpoint import big_local_checkpoint
from gaia_spark.functions import pq
from gaia_spark.functions.clustering import _int_vec, kmeans_train

DIM = 8
N_SUB = 2
N_CODES = 4


def _vectors():
    """24 vectors in 4 well-separated blobs (deterministic)."""
    rng = []
    for i in range(24):
        blob = i % 4
        base = [float(blob), -float(blob), float(blob) * 0.5,
                1.0 - blob * 0.25] * 2
        jitter = [((i * 31 + d * 17) % 7 - 3) / 100.0 for d in range(DIM)]
        rng.append((i, [b + j for b, j in zip(base, jitter)]))
    return rng


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        _vectors(), "vec_id long, embedding array<float>").cache()


def _sorted(df):
    cols = ["query_id", "neighbor_id", "rank", "adc_dist"]
    out = df[cols].sort_values(cols).reset_index(drop=True)
    return out


def test_pq_matches_duckdb_twin(spark, emb):
    got = pq.pq_topk(emb, emb.filter("vec_id < 3"), k=4,
                     n_sub=N_SUB, n_codes=N_CODES).toPandas()
    con = duckdb.connect()
    con.register("embeddings", emb.toPandas())
    want = con.execute(pq.sql_pq_topk(
        "embeddings", k=4, n_sub=N_SUB, n_codes=N_CODES, dim=DIM,
        query_where="vec_id < 3")).df()
    g, w = _sorted(got), _sorted(want)
    assert g.equals(w.astype(g.dtypes.to_dict()))


def test_joint_training_equals_per_subspace(spark, emb):
    """The one-pass-per-round joint trainer is bit-identical to
    running clustering.py:kmeans_train per subspace slice."""
    from pyspark.sql import functions as F
    _, cbs = pq.pq_train_encode(emb, n_sub=N_SUB, n_codes=N_CODES,
                                iters=2)
    base = big_local_checkpoint(emb.select(
        F.col("vec_id"), _int_vec(F.col("embedding")).alias("v")))
    sub_dim = DIM // N_SUB
    for s in range(N_SUB):
        sub = big_local_checkpoint(base.select(
            "vec_id", F.slice("v", s * sub_dim + 1, sub_dim).alias("v")))
        ref = kmeans_train(sub, N_CODES, 2)
        assert cbs[s] == ref, f"subspace {s}"


def test_pq_codes_shape(spark, emb):
    codes, cbs = pq.pq_train_encode(emb, n_sub=N_SUB, n_codes=N_CODES)
    rows = codes.collect()
    assert len(rows) == 24 * N_SUB
    assert all(0 <= r.code < N_CODES for r in rows)
    assert len(cbs) == N_SUB
    assert all(len(cb) == N_CODES and len(cb[0]) == DIM // N_SUB
               for cb in cbs)


def test_pq_retrieval_separated_blobs(spark, emb):
    """With 4 well-separated blobs and enough codewords (8 — at
    n_codes=4 the md5-seeded init merges blobs 0/1 into one cell,
    which is ordinary k-means behavior, not a PQ bug), every query's
    top neighbors come from its own blob."""
    out = pq.pq_topk(emb, emb.filter("vec_id < 4"), k=3,
                     n_sub=N_SUB, n_codes=8, iters=3).collect()
    for r in out:
        assert r.neighbor_id % 4 == r.query_id % 4, r


def test_pq_adc_is_exact_codeword_distance(spark, emb):
    """ADC distances recompute exactly from the returned codebooks
    and codes (numpy int64 reference)."""
    codes, cbs = pq.pq_train_encode(emb, n_sub=N_SUB, n_codes=N_CODES)
    code_map = {}
    for r in codes.collect():
        code_map.setdefault(r.vec_id, {})[r.sub] = r.code
    from gaia_spark.functions.clustering import KM_OFFSET, KM_SCALE
    sub_dim = DIM // N_SUB
    ints = {i: np.floor(KM_SCALE * (np.asarray(v, dtype=np.float32)
                                    .astype(np.float64) + KM_OFFSET)
                        ).astype(np.int64)
            for i, v in _vectors()}
    out = pq.pq_topk(emb, emb.filter("vec_id = 0"), k=5,
                     n_sub=N_SUB, n_codes=N_CODES).collect()
    q = ints[0]
    for r in out:
        want = 0
        for s in range(N_SUB):
            cw = np.asarray(cbs[s][code_map[r.neighbor_id][s]],
                            dtype=np.int64)
            d = q[s * sub_dim:(s + 1) * sub_dim] - cw
            want += int((d * d).sum())
        assert r.adc_dist == want


def test_pq_partitioning_invariance(spark, emb):
    a = sorted(map(tuple, pq.pq_topk(
        emb.coalesce(1), emb.filter("vec_id < 2"), k=3,
        n_sub=N_SUB, n_codes=N_CODES).collect()))
    b = sorted(map(tuple, pq.pq_topk(
        emb.repartition(7), emb.filter("vec_id < 2"), k=3,
        n_sub=N_SUB, n_codes=N_CODES).collect()))
    assert a == b


def test_pq_indivisible_dim_raises(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_train_encode(emb, n_sub=3, n_codes=N_CODES)


# ------------------------------------------------------------------
# IVF-PQ (r5): cell-routed ADC scan
# ------------------------------------------------------------------

def test_ivfpq_matches_duckdb_twin(spark, emb):
    got = pq.ivfpq_topk(emb, emb.filter("vec_id < 3"), k=4,
                        n_cells=4, n_probe=2,
                        n_sub=N_SUB, n_codes=N_CODES).toPandas()
    con = duckdb.connect()
    con.register("embeddings", emb.toPandas())
    want = con.execute(pq.sql_ivfpq_topk(
        "embeddings", k=4, n_cells=4, n_probe=2,
        n_sub=N_SUB, n_codes=N_CODES, dim=DIM,
        query_where="vec_id < 3")).df()
    g, w = _sorted(got), _sorted(want)
    assert g.equals(w.astype(g.dtypes.to_dict()))


def test_ivfpq_scan_restricted_to_probed_cells(spark, emb):
    """The O(cells) contract: every returned neighbor sits in one of
    its query's n_probe probed cells, and with n_probe < n_cells the
    candidate set is a strict subset of the corpus (the flat-PQ scan
    touches everything; IVF-PQ must not)."""
    from pyspark.sql import functions as F
    from gaia_spark.functions.clustering import (kmeans_train,
                                                 _assign_exact_udf)
    n_cells, n_probe = 4, 1
    base = big_local_checkpoint(emb.select(
        "vec_id", _int_vec(F.col("embedding")).alias("v")))
    cents = kmeans_train(base, n_cells, 2)
    assign = _assign_exact_udf(base, cents)
    cell_of = {r.vec_id: r.cell for r in base.select(
        "vec_id", assign(F.col("v")).getField("cluster").alias("cell")
    ).collect()}

    out = pq.ivfpq_topk(emb, emb.filter("vec_id < 3"), k=24,
                        n_cells=n_cells, n_probe=n_probe,
                        n_sub=N_SUB, n_codes=N_CODES).collect()
    # with n_probe=1 every query's neighbors share ONE cell
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, set()).add(cell_of[r.neighbor_id])
    assert by_q and all(len(cells) == 1 for cells in by_q.values())
    # and the scan pruned: no query saw the whole corpus even with
    # k = |corpus|
    n_corpus = 24
    from collections import Counter
    per_q = Counter(r.query_id for r in out)
    assert all(v < n_corpus - 1 for v in per_q.values())


def test_ivfpq_full_probe_equals_flat_pq(spark, emb):
    """Exactness anchor: probing ALL cells degrades IVF-PQ to the
    flat scan, so the result must be bit-identical to pq_topk (same
    codebooks, same ADC distances, same tie-breaks) — the routing
    only prunes, it never rescores."""
    q = emb.filter("vec_id < 3")
    flat = sorted(tuple(r) for r in pq.pq_topk(
        emb, q, k=4, n_sub=N_SUB, n_codes=N_CODES).collect())
    full = sorted(tuple(r) for r in pq.ivfpq_topk(
        emb, q, k=4, n_cells=4, n_probe=4,
        n_sub=N_SUB, n_codes=N_CODES).collect())
    assert flat == full


def test_pq_topk_partial_prune_plan(spark, emb):
    """r4-verdict #2a: the flat-PQ top-k must carry a mapInPandas
    partial top-k between the ADC aggregate and the global window
    (shuffle bounded at k*partitions rows per query)."""
    out = pq.pq_topk(emb, emb.filter("vec_id < 3"), k=4,
                     n_sub=N_SUB, n_codes=N_CODES)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "pythonUDF" in plan or "MapInPandas" in plan
