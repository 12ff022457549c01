"""Asymmetric token-set containment (functions/dedup.py
containment_pairs): the quote-inclusion detector Jaccard misses.
Semantics, the df hub guard, exact DuckDB-twin equivalence, and the
sf0.001 registry composition."""

from __future__ import annotations

import duckdb

from gaia_spark.functions.dedup import (
    containment_pairs,
    sql_containment_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_quote_inclusion_is_directed(spark):
    # doc 2 is fully quoted inside doc 1; Jaccard would be 3/8
    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "beta gamma delta")]
    got = containment_pairs(_docs(spark, rows), min_x10k=9000,
                            max_df=64).collect()
    assert [(r["inner_id"], r["outer_id"], r["cont_x10k"])
            for r in got] == [(2, 1, 10000)]


def test_partial_containment_integer_floor(spark):
    # inner has 3 tokens, 2 shared -> (10000*2) div 3 = 6666
    rows = [(1, "alpha beta gamma delta"),
            (2, "beta gamma QUOTEDNOWHERE")]
    got = containment_pairs(_docs(spark, rows), min_x10k=6000,
                            max_df=64).collect()
    assert [(r["inner_id"], r["outer_id"], r["cont_x10k"])
            for r in got] == [(2, 1, 6666)]


def test_df_cap_drops_stop_tokens(spark):
    # "the" appears in every doc: with max_df=2 it leaves the index,
    # so the docs sharing ONLY "the" produce no pair
    rows = [(1, "the unique1"), (2, "the unique2"), (3, "the unique3")]
    assert containment_pairs(_docs(spark, rows), min_x10k=1,
                             max_df=2).count() == 0


def test_boilerplate_only_doc_drops_out(spark):
    # a doc whose every token is df-capped has an empty surviving
    # set — it emits no pairs rather than dividing by zero
    rows = [(i, "common tokens everywhere") for i in range(5)]
    rows += [(99, "common tokens everywhere distinct99")]
    got = containment_pairs(_docs(spark, rows), min_x10k=1,
                            max_df=3).collect()
    assert got == []


def test_twin_equivalence(spark):
    rows = [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(12)))
            for i in range(30)]
    got = sorted(tuple(map(str, r)) for r in containment_pairs(
        _docs(spark, rows), min_x10k=3000, max_df=16).collect())
    vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
    con = duckdb.connect()
    want = sorted(tuple(map(str, r)) for r in con.sql(
        sql_containment_pairs(
            f"(SELECT * FROM (VALUES {vals}) AS t(doc_id, text))",
            min_x10k=3000, max_df=16)).fetchall())
    assert got == want


def test_cross_engine_sf0001(spark):
    import __spark_entry__ as entry

    got = entry.queries()["dedup_containment"](spark, SF_DIR)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')")
    want = con.sql(entry.oracle_sql()["dedup_containment"])
    g = sorted(tuple(map(str, r)) for r in got.collect())
    w = sorted(tuple(map(str, r)) for r in want.fetchall())
    assert g == w
    assert len(g) > 0  # the planted truncations must be detected
