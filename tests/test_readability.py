"""Flesch readability (functions/text_analysis.py readability_stats):
hand-computed fixed-point values, edge cases, DuckDB-twin equivalence,
and the sf0.001 registry composition."""

from __future__ import annotations

import duckdb

from gaia_spark.functions.text_analysis import (
    readability_stats,
    sql_readability_stats,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, rows):
    return {r["doc_id"]: (r["n_words"], r["n_sents"], r["n_syll"],
                          r["flesch_x1000"])
            for r in readability_stats(_docs(spark, rows)).collect()}


def test_hand_computed_fixed_point(spark):
    # whitespace split keeps attached punctuation: "the cat sat. it
    # ran." -> W=5 ("sat." is one token), S=2, Sy=5 (1 vowel run each)
    # flesch_x1000 = 206835 - (1015*5)//2 - (84600*5)//5
    #             = 206835 - 2537 - 84600 = 119698
    got = _run(spark, [(1, "the cat sat. it ran.")])
    assert got[1] == (5, 2, 5, 119698)


def test_fragment_is_one_sentence(spark):
    # no terminal punctuation: min-1 sentence guard
    got = _run(spark, [(1, "reading ease")])
    # reading -> runs 'ea','i' = 2; ease -> 'ea','e' = 2; total 4
    assert got[1] == (2, 1, 4,
                      206835 - (1015 * 2) // 1 - (84600 * 4) // 2)


def test_vowelless_word_counts_one_syllable(spark):
    got = _run(spark, [(1, "123 xyz.")])
    # 'xyz' has the vowel y -> 1 run; '123' none -> floor 1
    assert got[1][:3] == (2, 1, 2)


def test_empty_doc_dropped(spark):
    assert _run(spark, [(1, "   "), (2, "ok.")]).keys() == {2}


def test_twin_equivalence(spark):
    rows = [(i, ("Some sentences vary! Short. "
                 f"Sophisticated vocabulary iteration {i}? "
                 + "a " * (i % 7))) for i in range(40)]
    rows.append((99, "no punctuation fragment here"))
    got = sorted(tuple(map(str, r)) for r in readability_stats(
        _docs(spark, rows)).collect())
    vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
    con = duckdb.connect()
    want = sorted(tuple(map(str, r)) for r in con.sql(
        sql_readability_stats(
            f"(SELECT * FROM (VALUES {vals}) AS t(doc_id, text))"))
        .fetchall())
    assert got == want


def test_cross_engine_sf0001(spark):
    import __spark_entry__ as entry

    got = entry.queries()["text_readability"](spark, SF_DIR)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')")
    want = con.sql(entry.oracle_sql()["text_readability"])
    g = sorted(tuple(map(str, r)) for r in got.collect())
    w = sorted(tuple(map(str, r)) for r in want.fetchall())
    assert g == w
    assert len(g) > 0
