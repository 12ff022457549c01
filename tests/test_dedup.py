"""Dedup operator suite: exact / Jaccard / MinHash-LSH / SimHash.

The LSH path is verified against the exhaustive join (recall must be
perfect on the fixture at the configured threshold — see
gaia_spark/functions/dedup.py for the 1-(1-s^r)^b analysis), and
SimHash against an independent numpy re-implementation.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gaia_spark.functions import dedup as dd

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),          # ~dup of 0
    (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
    (3, "completely different tokens here about spark engines"),
    (4, "spark engines about completely different tokens here"),  # perm of 3
    (5, "one more unrelated document with its own words"),
    (6, "  The  Quick   Brown Fox jumps over the lazy dog  "),   # ws/case of 0
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_keeper(spark, docs_df):
    m = {r.doc_id: r.keeper
         for r in dd.exact_dedup_map(docs_df).collect()}
    assert m[2] == 0          # exact dup → keeper is min doc_id
    assert m[6] == 0          # whitespace/case-normalized dup
    assert m[0] == 0 and m[1] == 1 and m[3] == 3


def test_jaccard_pairs_exact(spark, docs_df):
    pairs = {(r.a_id, r.b_id): r.jac_x10k
             for r in dd.jaccard_pairs(dd.token_set(docs_df), 5000)
             .collect()}
    assert pairs[(0, 2)] == 10000         # identical token sets
    assert pairs[(3, 4)] == 10000         # permutation → same token set
    assert 7000 <= pairs[(0, 1)] < 10000  # one-token difference
    assert (0, 3) not in pairs


def test_minhash_lsh_equals_exhaustive(spark, docs_df):
    exact = {(r.a_id, r.b_id, r.jac_x10k)
             for r in dd.jaccard_pairs(dd.token_set(docs_df), 8000)
             .collect()}
    lsh = {(r.a_id, r.b_id, r.jac_x10k)
           for r in dd.minhash_dedup_pairs(docs_df, 8000).collect()}
    assert lsh == exact and len(exact) >= 2


def test_dedup_resolution_clusters_and_keepers(spark, docs_df):
    """Transitive closure + keeper election over the fixture graph:
    docs 0/1/2/6 chain into one cluster through pairwise near-dup
    edges (0~1 at J=0.778, 0~2 and 0~6 at J=1.0), 3~4 a second, 5 a
    singleton — threshold 7000 so the one-token-off edge is in."""
    res = {r.doc_id: (r.cluster, r.keep)
           for r in dd.dedup_resolution(docs_df, 7000).collect()}
    assert len(res) == len(DOCS)                 # one row per input doc
    assert res[0] == (0, True)
    assert res[1] == (0, False)                  # near-dup of 0
    assert res[2] == (0, False)                  # exact dup of 0
    assert res[6] == (0, False)                  # ws/case dup of 0
    assert res[3] == (3, True) and res[4] == (3, False)
    assert res[5] == (5, True)                   # singleton keeps itself
    # exactly one keeper per cluster, and it is the cluster label
    keepers = {c for d, (c, k) in res.items() if k}
    assert keepers == {c for c, _ in res.values()}


def test_dedup_resolution_matches_duckdb(spark, docs_df):
    """Engine-twin check of the full resolution (pairs → closure →
    keepers) against the DuckDB recursive-CTE oracle."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE docs AS SELECT * FROM (VALUES "
                + ",".join(f"({i}, '{t}')" for i, t in DOCS)
                + ") v(doc_id, text)")
    want = {(r[0], r[1], r[2]) for r in con.execute(
        dd.sql_dedup_resolution("docs", 7000)).fetchall()}
    got = {(r.doc_id, r.cluster, r.keep)
           for r in dd.dedup_resolution(docs_df, 7000).collect()}
    assert got == want


def test_minhash_signature_shape_and_determinism(spark, docs_df):
    sig1 = dd.minhash_signature(dd.token_set(docs_df)).collect()
    sig2 = dd.minhash_signature(
        dd.token_set(docs_df.repartition(5))).collect()
    assert all(len(r.sig) == dd.NUM_PERM for r in sig1)
    assert {(r.doc_id, tuple(r.sig)) for r in sig1} == \
           {(r.doc_id, tuple(r.sig)) for r in sig2}
    by_id = {r.doc_id: r.sig for r in sig1}
    assert by_id[0] == by_id[2]  # identical token sets → identical sig


def _numpy_simhash(tokens: set, spark, seed: int) -> int:
    """Independent simhash: uses Spark only to get xxhash64 values (the
    hash function is the shared primitive), aggregation in numpy."""
    df = spark.createDataFrame([(t,) for t in sorted(tokens)], "tok string")
    hs = [r.h for r in df.select(
        F.xxhash64(F.col("tok"), F.lit(seed)).alias("h")).collect()]
    bits = np.zeros(64, dtype=np.int64)
    for h in hs:
        for j in range(64):
            bits[j] += 1 if (h >> j) & 1 else -1
    out = 0
    for j in range(64):
        if bits[j] > 0:
            out |= (1 << j)
    # python ints are unbounded; fold to signed 64-bit like Spark BIGINT
    return out - (1 << 64) if out >= (1 << 63) else out


def test_simhash_matches_numpy(spark, docs_df):
    got = {r.doc_id: r.simhash
           for r in dd.simhash_col(dd.token_set(docs_df)).collect()}
    for doc_id, text in DOCS[:3]:
        toks = {t for t in text.lower().split() if t}
        assert got[doc_id] == _numpy_simhash(toks, spark, dd.MINHASH_SEED)


def test_simhash_near_pairs(spark, docs_df):
    pairs = {(r.a_id, r.b_id): r.hamming
             for r in dd.simhash_near_pairs(docs_df, max_hamming=3)
             .collect()}
    assert pairs[(0, 2)] == 0   # identical docs → distance 0
    assert pairs[(3, 4)] == 0   # permutation → same token set
    assert (0, 3) not in pairs  # unrelated docs far apart


def test_minhash_skew_100pct_token(spark):
    """A token posted by EVERY doc (worst-case df skew) must not make
    the verify path quadratic: per-pair verification only expands LSH
    candidate pairs, so the answer still equals the exhaustive oracle
    and the common token contributes |pairs| rows, not |docs|^2/2."""
    docs = []
    for i in range(200):
        base = " ".join(["the"] + [f"tok{i}{c}" for c in "abcdefghi"])
        docs.append((2 * i, base))
        docs.append((2 * i + 1, base + f" tok{i}j"))  # J = 10/11
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.a_id, r.b_id, r.jac_x10k)
           for r in dd.minhash_dedup_pairs(df, 9000).collect()}
    exhaustive = {(r.a_id, r.b_id, r.jac_x10k)
                  for r in dd.jaccard_pairs(
                      dd.token_set(df), 9000).collect()}
    assert got == exhaustive
    assert got == {(2 * i, 2 * i + 1, 9090) for i in range(200)}
