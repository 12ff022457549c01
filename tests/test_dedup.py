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


def test_lsh_star_edges_bound_hot_buckets(spark):
    """A band bucket above MAX_BAND_BUCKET emits STAR edges (linear),
    never the d²/2 clique: N identical signatures → exactly N-1
    candidate pairs, all anchored at the bucket-min doc id."""
    n = 2000
    sig = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array(*[F.lit(7).cast("bigint")] * dd.NUM_PERM).alias("sig"),
    )
    pairs = dd.lsh_candidates(sig).collect()
    assert len(pairs) == n - 1                      # linear, not n²/2
    assert {r.a_id for r in pairs} == {0}           # star anchor = min
    assert {r.b_id for r in pairs} == set(range(1, n))


def test_lsh_small_buckets_keep_all_pairs(spark):
    """Buckets at or under the cap still expand exhaustively."""
    sig = spark.range(3).select(
        F.col("id").alias("doc_id"),
        F.array(*[F.lit(9).cast("bigint")] * dd.NUM_PERM).alias("sig"),
    )
    pairs = {(r.a_id, r.b_id) for r in dd.lsh_candidates(sig).collect()}
    assert pairs == {(0, 1), (0, 2), (1, 2)}


def test_precollapse_band_join_never_sees_exact_dups(spark):
    """10k planted copies of one boilerplate page: the band join runs
    over DISTINCT fingerprints only, so candidate-pair volume is
    governed by distinct texts (here: a handful), while the resolution
    still clusters every copy.  This is the Common-Crawl mega-cluster
    scale guard: edges grow linearly with duplication, never
    quadratically."""
    n = 10_000
    boiler = [(i, "copyright boilerplate page about nothing at all")
              for i in range(n)]
    extras = [(n + i, t) for i, (_, t) in enumerate(DOCS)]
    df = spark.createDataFrame(boiler + extras, "doc_id long, text string")

    members, rep_pairs = dd._exact_collapsed(df, "text", "doc_id", 9000)
    # one rep per distinct normalized text; the 10k copies collapse to 1
    reps = {r.rep for r in members.select("rep").distinct().collect()}
    assert 0 in reps and len(reps) <= len(DOCS) + 1
    # rep-level near-dup pairs are over distinct texts only: no pair
    # may have both ends inside the boilerplate cluster
    rp = rep_pairs.collect()
    assert all(not (r.a_id < n and r.b_id < n) or (r.a_id, r.b_id) == (0, 0)
               for r in rp)
    assert len(rp) < 50                              # distinct-text scale

    res = dd.dedup_resolution(df, 9000).collect()
    by_id = {r.doc_id: r for r in res}
    assert all(by_id[i].cluster == 0 for i in range(n))
    assert by_id[0].keep and not by_id[1].keep
    # fixture docs 0/2/6 (exact+near dups) still co-cluster, offset by n
    assert by_id[n + 0].cluster == by_id[n + 2].cluster == by_id[n + 6].cluster


def test_precollapse_pairs_equal_legacy_path(spark, docs_df):
    """precollapse=True fan-out ≡ the direct banded path ≡ exhaustive."""
    fast = {(r.a_id, r.b_id, r.jac_x10k)
            for r in dd.minhash_dedup_pairs(docs_df, 8000).collect()}
    legacy = {(r.a_id, r.b_id, r.jac_x10k)
              for r in dd.minhash_dedup_pairs(
                  docs_df, 8000, precollapse=False).collect()}
    assert fast == legacy and len(fast) >= 4


def test_composed_funnel_keepset_invariant(spark, docs_df):
    """Curation-order invariance: running exact dedup FIRST (keep one
    doc per content fingerprint) and then near-dup resolution over the
    exact keepers elects the SAME final keep-set as the one-shot
    dedup_resolution — the guarantee that lets the 100 TB funnel
    precollapse exact duplicates before any band join."""
    one_shot = {r.doc_id
                for r in dd.dedup_resolution(docs_df, 8000)
                .filter("keep").collect()}
    exact = dd.exact_dedup_map(docs_df)
    keepers = docs_df.join(
        exact.filter("doc_id = keeper").select("doc_id"),
        "doc_id", "left_semi")
    composed = {r.doc_id
                for r in dd.dedup_resolution(keepers, 8000)
                .filter("keep").collect()}
    assert composed == one_shot and len(one_shot) >= 3


def test_simhash_star_bounds_hot_bucket(spark):
    """Identical docs agree in all four simhash bands; with a small
    cap the candidate volume is linear (star), every pair still
    exact-Hamming verified (distance 0 for identical docs)."""
    n = 600
    rows = [(i, "the same boilerplate page body repeated verbatim")
            for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dd.simhash_near_pairs(df, max_hamming=3,
                                  max_bucket=32).collect()
    assert len(pairs) == n - 1
    assert {r.a_id for r in pairs} == {0}
    assert all(r.hamming == 0 for r in pairs)
