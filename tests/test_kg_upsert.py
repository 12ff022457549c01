"""KG snapshot upsert (operators/merge.py) — round 3.

Hand-computed pins for all three status branches, then
Spark-vs-DuckDB equality via the driver's own oracle at sf0.001.
"""

from __future__ import annotations

import datetime as dt

import duckdb

from gaia_spark.operators.merge import merge_triples

SF_DIR = "/root/testdata/sf0.001"

D = dt.datetime


def test_new_confirmed_stale_pins(spark):
    cur = spark.createDataFrame(
        [("a", "p", "x", D(2020, 1, 1), D(2020, 6, 1), 3),
         ("b", "p", "y", D(2019, 1, 1), D(2019, 2, 1), 1)],
        "subj string, pred string, obj string, first_seen timestamp,"
        " last_seen timestamp, n_seen long")
    inc = spark.createDataFrame(
        # 'a p x' re-seen twice (one BEFORE its first_seen: min rolls
        # back); 'c p z' brand new, seen twice
        [("a", "p", "x", D(2019, 12, 1)),
         ("a", "p", "x", D(2021, 1, 1)),
         ("c", "p", "z", D(2021, 2, 1)),
         ("c", "p", "z", D(2021, 3, 1))],
        "subj string, pred string, obj string, seen_ts timestamp")
    got = {(r["subj"], r["pred"], r["obj"]):
           (r["first_seen"], r["last_seen"], r["n_seen"], r["status"])
           for r in merge_triples(cur, inc).collect()}
    assert got == {
        ("a", "p", "x"): (D(2019, 12, 1), D(2021, 1, 1), 5, "confirmed"),
        ("b", "p", "y"): (D(2019, 1, 1), D(2019, 2, 1), 1, "stale"),
        ("c", "p", "z"): (D(2021, 2, 1), D(2021, 3, 1), 2, "new"),
    }


def test_cross_engine_sf0001(spark):
    import __spark_entry__ as entry

    got = entry.queries()["kg_upsert"](spark, SF_DIR)
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    want = con.sql(entry.oracle_sql()["kg_upsert"])
    g = sorted(tuple(map(str, r)) for r in got.collect())
    w = sorted(tuple(map(str, r)) for r in want.fetchall())
    assert g == w
    # all three branches must occur in the real data
    statuses = {r[-1] for r in g}
    assert statuses == {"new", "confirmed", "stale"}
