"""HITS hubs/authorities, resource-allocation link prediction, and
directed co-citation — semantics plus exact DuckDB-twin equivalence.

The shared contract with the rest of the graph suite: BIGINT
fixed-point (no float normalization), fixed iteration counts, and
hub guards that keep wedge joins linear in the input (the hot-bucket
lesson from the r3 LSH verdict applied at design time).
"""

from __future__ import annotations

import random

import duckdb
import pytest

from gaia_spark.operators.graph import (
    cocitation,
    hits,
    link_prediction,
    sql_cocitation,
    sql_hits,
    sql_link_prediction,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string")


def _values_sql(pairs):
    rows = ", ".join(f"('{a}', '{b}')" for a, b in pairs)
    return f"SELECT * FROM (VALUES {rows}) AS t(src, dst)"


def _cross_check(spark, fn, sql_fn, pairs, **kw):
    got = sorted(tuple(map(str, r))
                 for r in fn(_edges(spark, pairs), **kw).collect())
    con = duckdb.connect()
    want = sorted(tuple(map(str, r)) for r in con.sql(
        sql_fn(_values_sql(pairs), **kw)).fetchall())
    assert got == want
    return got


def _random_digraph(n=40, m=160, seed=7):
    rng = random.Random(seed)
    return [(f"n{rng.randrange(n)}", f"n{rng.randrange(n)}")
            for _ in range(m)]


class TestHits:
    def test_star_authority(self, spark):
        # h1..h3 all point at "hub"; hub points nowhere: hub is the
        # unique max authority (PPM), the citers are the max hubs
        rows = {r["node"]: (r["hub_ppm"], r["auth_ppm"])
                for r in hits(_edges(spark, [("h1", "t"), ("h2", "t"),
                                             ("h3", "t")])).collect()}
        assert rows["t"] == (0, 1_000_000)
        assert rows["h1"] == rows["h2"] == rows["h3"] == (1_000_000, 0)

    def test_better_hub_ranks_higher(self, spark):
        # g cites both strong targets, w cites one: hub(g) > hub(w)
        pairs = [("g", "t1"), ("g", "t2"), ("w", "t1"),
                 ("x", "t1"), ("y", "t2")]
        rows = {r["node"]: r["hub_ppm"]
                for r in hits(_edges(spark, pairs)).collect()}
        assert rows["g"] == 1_000_000
        assert rows["w"] < rows["g"]

    def test_twin_equivalence(self, spark):
        _cross_check(spark, hits, sql_hits, _random_digraph(), iters=2)

    def test_twin_equivalence_3_iters(self, spark):
        _cross_check(spark, hits, sql_hits, _random_digraph(seed=11),
                     iters=3)


class TestLinkPrediction:
    def test_wedge_scores(self, spark):
        # path a-z-b: (a,b) share the single center z (deg 2)
        got = link_prediction(_edges(spark, [("a", "z"), ("z", "b")]),
                              min_cn=1).collect()
        assert [(r["a"], r["b"], r["cn"], r["ra_ppm"])
                for r in got] == [("a", "b", 1, 500_000)]

    def test_existing_edges_excluded(self, spark):
        # triangle a-b, b-c, a-c: every 2-path closes an EXISTING
        # edge -> no candidates
        assert link_prediction(
            _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")]),
            min_cn=1).count() == 0

    def test_min_cn_gate(self, spark):
        # a and b share centers z1, z2; a and c share only z1
        pairs = [("a", "z1"), ("b", "z1"), ("a", "z2"), ("b", "z2"),
                 ("c", "z1")]
        got = {(r["a"], r["b"]): r["cn"] for r in link_prediction(
            _edges(spark, pairs), min_cn=2).collect()}
        # symmetric wedge: a,b also center z1-z2 twice
        assert got == {("a", "b"): 2, ("z1", "z2"): 2}

    def test_hub_guard_caps_pair_volume(self, spark):
        # planted mega-hub center adjacent to 300 leaves: with
        # max_degree=64 it generates ZERO wedges (not 300*299/2)
        hub = [(f"l{i}", "HUB") for i in range(300)]
        assert link_prediction(_edges(spark, hub), max_degree=64,
                               min_cn=1).count() == 0
        # the guard is per-CENTER: a small center still predicts
        got = link_prediction(
            _edges(spark, hub + [("l0", "z"), ("l1", "z")]),
            max_degree=64, min_cn=1).collect()
        # (l0,l1) via center z; (HUB,z) via centers l0 and l1 —
        # but NOTHING via the capped mega-hub itself
        assert {(r["a"], r["b"]) for r in got} == {("l0", "l1"),
                                                   ("HUB", "z")}

    def test_twin_equivalence(self, spark):
        _cross_check(spark, link_prediction, sql_link_prediction,
                     _random_digraph(n=25, m=120, seed=3), min_cn=1)


class TestCocitation:
    def test_basic_pairs(self, spark):
        pairs = [("s1", "a"), ("s1", "b"), ("s2", "a"), ("s2", "b"),
                 ("s3", "a")]
        got = cocitation(_edges(spark, pairs), min_count=2).collect()
        assert [(r["d1"], r["d2"], r["n_citers"])
                for r in got] == [("a", "b", 2)]

    def test_link_farm_guard(self, spark):
        # a source citing 200 targets is dropped before the pair join
        farm = [("FARM", f"t{i}") for i in range(200)]
        honest = [("s1", "t0"), ("s1", "t1"), ("s2", "t0"),
                  ("s2", "t1")]
        got = cocitation(_edges(spark, farm + honest), max_out=64,
                         min_count=2).collect()
        assert [(r["d1"], r["d2"], r["n_citers"])
                for r in got] == [("t0", "t1", 2)]

    def test_twin_equivalence(self, spark):
        _cross_check(spark, cocitation, sql_cocitation,
                     _random_digraph(n=20, m=200, seed=5), min_count=1)


SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "name", ["graph_hits", "graph_linkpred", "web_cocitation"])
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
