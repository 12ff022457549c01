"""HyperBall harmonic centrality + directed reciprocity: semantics,
exact DuckDB-twin equivalence, and the sf0.001 registry composition."""

from __future__ import annotations

import random

import duckdb
import pytest

from gaia_spark.operators.graph import (
    harmonic_centrality,
    reciprocity,
    sql_harmonic_centrality,
    sql_reciprocity,
)

SF_DIR = "/root/testdata/sf0.001"


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string")


def _values_sql(pairs):
    rows = ", ".join(f"('{a}', '{b}')" for a, b in pairs)
    return f"SELECT * FROM (VALUES {rows}) AS t(src, dst)"


class TestHarmonic:
    def test_hub_beats_leaf(self, spark):
        # 40-leaf star: the hub reaches everything at distance 1,
        # leaves reach the hub at 1 and each other at 2
        got = {r["node"]: r["harmonic_ppm"] for r in harmonic_centrality(
            _edges(spark, [("hub", f"l{i}") for i in range(40)]),
            radius=2).collect()}
        assert got["hub"] > got["l0"]
        # all leaves are symmetric
        assert len({got[f"l{i}"] for i in range(40)}) == 1

    def test_path_exact_small_counts(self, spark):
        # a-b-c: small balls take the near-exact linear-counting
        # branch — H(b) = (3-1)*PPM/1; H(a) = (2-1)*PPM + (3-2)*PPM/2
        got = {r["node"]: r["harmonic_ppm"] for r in harmonic_centrality(
            _edges(spark, [("a", "b"), ("b", "c")]), radius=2).collect()}
        assert got["b"] == 2_000_000
        assert got["a"] == got["c"] == 1_500_000

    def test_twin_equivalence(self, spark):
        rng = random.Random(13)
        pairs = [(f"n{rng.randrange(30)}", f"n{rng.randrange(30)}")
                 for _ in range(90)]
        got = sorted(tuple(map(str, r)) for r in harmonic_centrality(
            _edges(spark, pairs), radius=2).collect())
        con = duckdb.connect()
        want = sorted(tuple(map(str, r)) for r in con.sql(
            sql_harmonic_centrality(_values_sql(pairs),
                                    radius=2)).fetchall())
        assert got == want


class TestReciprocity:
    def test_counts(self, spark):
        got = reciprocity(_edges(
            spark, [("a", "b"), ("b", "a"), ("a", "c")])).collect()
        assert [(r["n_edges"], r["n_reciprocated"],
                 r["reciprocity_x10k"]) for r in got] == [(3, 2, 6666)]

    def test_self_loops_and_dups_ignored(self, spark):
        got = reciprocity(_edges(
            spark, [("a", "a"), ("a", "b"), ("a", "b"),
                    ("b", "a")])).collect()
        assert [(r["n_edges"], r["n_reciprocated"],
                 r["reciprocity_x10k"]) for r in got] == [(2, 2, 10000)]

    def test_twin_equivalence(self, spark):
        rng = random.Random(17)
        pairs = [(f"n{rng.randrange(12)}", f"n{rng.randrange(12)}")
                 for _ in range(80)]
        got = sorted(tuple(map(str, r)) for r in reciprocity(
            _edges(spark, pairs)).collect())
        con = duckdb.connect()
        want = sorted(tuple(map(str, r)) for r in con.sql(
            sql_reciprocity(_values_sql(pairs))).fetchall())
        assert got == want


@pytest.mark.parametrize(
    "name", ["graph_harmonic", "web_reciprocity"])
def test_cross_engine_sf0001(spark, name):
    import __spark_entry__ as entry

    got = entry.queries()[name](spark, SF_DIR)
    con = duckdb.connect()
    for t in ("lineitem", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    want = con.sql(entry.oracle_sql()[name])
    g = sorted(tuple(map(str, r)) for r in got.collect())
    w = sorted(tuple(map(str, r)) for r in want.fetchall())
    assert g == w
    assert len(g) > 0
