"""Prefix-filtering exact set-similarity join (functions/dedup.py
jaccard_pairs_prefix): equivalence to the exhaustive join, the
stop-token candidate-volume guarantee, and the sf0.001 registry
composition."""

from __future__ import annotations

import duckdb

from gaia_spark.functions.dedup import (
    jaccard_pairs,
    jaccard_pairs_prefix,
    prefix_candidates,
    sql_jaccard_pairs,
    token_set,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return sorted((r["a_id"], r["b_id"], r["jac_x10k"])
                  for r in df.collect())


def test_equals_exhaustive_join(spark):
    # near-dup family (shared 9/10 tokens) + unrelated docs
    base = " ".join(f"w{j}" for j in range(10))
    rows = [(i, base + f" extra{i}" if i % 3 == 0 else base)
            for i in range(12)]
    rows += [(100 + i, " ".join(f"u{i}_{j}" for j in range(8)))
             for i in range(5)]
    d = _docs(spark, rows)
    exhaustive = _pairs(jaccard_pairs(token_set(d), 8000))
    prefix = _pairs(jaccard_pairs_prefix(d, 8000))
    assert prefix == exhaustive
    assert len(exhaustive) > 0


def test_equals_exhaustive_lower_threshold(spark):
    rows = [(i, " ".join(f"w{(i * 3 + j) % 17}" for j in range(9)))
            for i in range(25)]
    d = _docs(spark, rows)
    assert (_pairs(jaccard_pairs_prefix(d, 5000))
            == _pairs(jaccard_pairs(token_set(d), 5000)))


def test_stop_token_never_enters_prefix(spark):
    # 200 docs sharing ONE universal token but pairwise J = 1/3:
    # the exhaustive join builds 200*199/2 candidate rows through
    # 'common'; prefix filtering builds ZERO (df-max token sorts
    # last, p = 1 keeps only each doc's unique rarest token)
    rows = [(i, f"common w{i}") for i in range(200)]
    d = _docs(spark, rows)
    assert prefix_candidates(token_set(d), 9000).count() == 0
    assert jaccard_pairs_prefix(d, 9000).count() == 0


def test_true_dups_still_found_among_stop_tokens(spark):
    # same universal token, but docs 7 and 8 are exact dups of each
    # other — their rare tokens collide in the prefix
    rows = [(i, f"common w{i}") for i in range(50)]
    rows[8] = (8, "common w7")
    d = _docs(spark, rows)
    assert _pairs(jaccard_pairs_prefix(d, 9000)) == [(7, 8, 10000)]


def test_cross_engine_sf0001(spark):
    import __spark_entry__ as entry

    got = entry.queries()["dedup_jaccard_prefix"](spark, SF_DIR)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')")
    want = con.sql(entry.oracle_sql()["dedup_jaccard_prefix"])
    g = sorted(tuple(map(str, r)) for r in got.collect())
    w = sorted(tuple(map(str, r)) for r in want.fetchall())
    assert g == w
