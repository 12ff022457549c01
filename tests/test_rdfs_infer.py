"""RDFS domain/range type inference (rdfs2/rdfs3) — semantics plus
exact DuckDB-twin equivalence and the sf0.001 registry composition.
"""

from __future__ import annotations

import duckdb
import pytest

from gaia_spark.operators.cleankb import rdfs_infer, sql_rdfs_infer

SF_DIR = "/root/testdata/sf0.001"


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string")


def _schema(spark, rows):
    return spark.createDataFrame(
        rows, "pred string, domain_type string, range_type string")


def test_domain_and_range_rules(spark):
    got = {(r["node"], r["type"]): r["n_evidence"] for r in rdfs_infer(
        _triples(spark, [("o1", "ordered_by", "c1"),
                         ("o1", "priority", "HIGH")]),
        _schema(spark, [("ordered_by", "Order", "Customer"),
                        ("priority", "Order", None)])).collect()}
    # o1 typed Order by BOTH triples (evidence 2); c1 typed Customer
    # by the range rule; the literal 'HIGH' entails nothing
    assert got == {("o1", "Order"): 2, ("c1", "Customer"): 1}


def test_unconstrained_pred_entails_nothing(spark):
    assert rdfs_infer(
        _triples(spark, [("a", "related_to", "b")]),
        _schema(spark, [("related_to", None, None)])).count() == 0


def test_evidence_counts_duplicate_triples(spark):
    # bag semantics: the same assertion twice = evidence 2 (upstream
    # canonicalization dedups; this operator must not silently also)
    got = rdfs_infer(
        _triples(spark, [("o1", "contains", "p1"),
                         ("o1", "contains", "p1"),
                         ("o1", "contains", "p2")]),
        _schema(spark, [("contains", "Order", "Part")])).collect()
    as_map = {(r["node"], r["type"]): r["n_evidence"] for r in got}
    assert as_map == {("o1", "Order"): 3, ("p1", "Part"): 2,
                      ("p2", "Part"): 1}


def test_twin_equivalence(spark):
    rows = [(f"s{i % 7}", ["ordered_by", "priority", "contains",
                           "untyped"][i % 4], f"v{i % 5}")
            for i in range(60)]
    schema_rows = [("ordered_by", "Order", "Customer"),
                   ("priority", "Order", None),
                   ("contains", "Order", "Part"),
                   ("untyped", None, None)]
    got = sorted(tuple(map(str, r)) for r in rdfs_infer(
        _triples(spark, rows),
        _schema(spark, schema_rows)).collect())
    vals = ", ".join(f"('{a}', '{b}', '{c}')" for a, b, c in rows)
    con = duckdb.connect()
    want = sorted(tuple(map(str, r)) for r in con.sql(sql_rdfs_infer(
        f"SELECT * FROM (VALUES {vals}) AS t(subj, pred, obj)",
        schema_rows)).fetchall())
    assert got == want


def test_cross_engine_sf0001(spark):
    import __spark_entry__ as entry

    got = entry.queries()["kg_rdfs_infer"](spark, SF_DIR)
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    want = con.sql(entry.oracle_sql()["kg_rdfs_infer"])
    g = sorted(tuple(map(str, r)) for r in got.collect())
    w = sorted(tuple(map(str, r)) for r in want.fetchall())
    assert g == w
    assert len(g) > 0
