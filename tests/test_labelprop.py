"""Synchronous label propagation: deterministic communities.

The contract is the fixed round count + min-label tie-break — the
properties that make a cross-engine oracle possible where classic
async LPA is irreproducible.
"""

from __future__ import annotations

import duckdb

from gaia_spark.operators.graph import (
    label_propagation,
    sql_label_propagation,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string")


def _run(spark, pairs, rounds=4):
    return {r["node"]: r["label"]
            for r in label_propagation(_edges(spark, pairs),
                                       rounds=rounds).collect()}


def test_two_cliques_with_bridge(spark):
    # K4 on a0..a3, K4 on b0..b3, one bridge a3-b0: each clique
    # converges to its own min label; the bridge never outvotes
    # 3 intra-clique neighbors
    k4a = [(f"a{i}", f"a{j}") for i in range(4) for j in range(i + 1, 4)]
    k4b = [(f"b{i}", f"b{j}") for i in range(4) for j in range(i + 1, 4)]
    got = _run(spark, k4a + k4b + [("a3", "b0")])
    assert {got[f"a{i}"] for i in range(4)} == {"a0"}
    assert {got[f"b{i}"] for i in range(4)} == {"b0"}


def test_fixed_rounds_are_the_contract(spark):
    # path a-b-c: synchronous updates SWAP endpoint labels each round
    # (the classic 2-cycle) — the answer is round-parity-dependent by
    # design, and both round counts are individually deterministic
    pairs = [("a", "b"), ("b", "c")]
    r2, r2b = _run(spark, pairs, rounds=2), _run(spark, pairs, rounds=2)
    assert r2 == r2b
    r3 = _run(spark, pairs, rounds=3)
    assert r3 == _run(spark, pairs, rounds=3)
    # b 2-cycles with parity: odd rounds end on the {a,c}-tie -> "a",
    # even rounds end on both endpoints echoing "b" back
    assert r2["b"] == "b" and r3["b"] == "a"


def test_min_label_tie_break(spark):
    # star center x with leaves 1,2,3: center sees three distinct
    # labels -> tie -> min; leaves adopt the center's current label
    got = _run(spark, [("x", "1"), ("x", "2"), ("x", "3")], rounds=1)
    assert got["x"] == "1"
    assert got["1"] == got["2"] == got["3"] == "x"


def test_matches_duckdb_on_random_graph(spark):
    # pseudo-random (deterministic) sparse graph, both engines
    pairs = [(str((i * 7) % 23), str((i * 11 + 3) % 23))
             for i in range(60)]
    pairs = [p for p in pairs if p[0] != p[1]]
    got = _run(spark, pairs, rounds=4)
    con = duckdb.connect()
    vals = ", ".join(f"('{a}', '{b}')" for a, b in pairs)
    q = sql_label_propagation(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)", rounds=4)
    want = dict(con.sql(q).fetchall())
    assert got == want


def test_scc_cycles_vs_dag_links(spark):
    from gaia_spark.operators.graph import scc_labels
    # two 3-cycles joined by ONE-WAY links + a DAG tail: SCCs must
    # isolate the cycles; undirected CC would merge everything
    edges = spark.createDataFrame(
        [("a1", "a2"), ("a2", "a3"), ("a3", "a1"),     # cycle A
         ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),     # cycle B
         ("a1", "b1"),                                  # one-way A->B
         ("b2", "t1"), ("t1", "t2"),                    # DAG tail
         ("s1", "s1")],                                 # self-loop only
        "src string, dst string")
    got = {r["node"]: r["component"]
           for r in scc_labels(edges).collect()}
    assert got["a1"] == got["a2"] == got["a3"] == "a1"
    assert got["b1"] == got["b2"] == got["b3"] == "b1"
    assert got["t1"] == "t1" and got["t2"] == "t2"      # singletons
    assert got["s1"] == "s1"                            # self-loop node kept
    assert len(got) == 9


def test_scc_matches_duckdb(spark):
    import duckdb
    from gaia_spark.operators.graph import scc_labels, sql_scc_labels
    # affine permutation mod 101 (prime): pure cycles + cross links
    rows = ([(f"{v:03d}", f"{(v * 7 + 1) % 101:03d}") for v in range(101)]
            + [(f"{v:03d}", f"{(v + 1) % 101:03d}")
               for v in range(0, 101, 13)])
    df = spark.createDataFrame(rows, "src string, dst string")
    got = {r["node"]: r["component"] for r in scc_labels(df).collect()}
    con = duckdb.connect()
    vals = ", ".join(f"('{a}', '{b}')" for a, b in rows)
    want = dict(con.sql(sql_scc_labels(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)")).fetchall())
    assert got == want
    assert len(set(got.values())) > 1     # multiple nontrivial SCCs


def test_clustering_coefficients_exact(spark):
    from gaia_spark.operators.graph import clustering_coefficients
    # K4 (every node coef = 1) + a path pendant (t: deg 1 -> 0;
    # a4 gains a non-closing neighbor)
    k4 = [("a1", "a2"), ("a1", "a3"), ("a1", "a4"),
          ("a2", "a3"), ("a2", "a4"), ("a3", "a4")]
    edges = spark.createDataFrame(k4 + [("a4", "t")],
                                  "src string, dst string")
    got = {r["node"]: (r["degree"], r["triangles"], r["coef_x10k"])
           for r in clustering_coefficients(edges).collect()}
    for n in ["a1", "a2", "a3"]:
        assert got[n] == (3, 3, 10000)      # 2*3/(3*2) = 1
    assert got["a4"] == (4, 3, 5000)        # 2*3/(4*3) = 0.5
    assert got["t"] == (1, 0, 0)            # degree < 2


def test_clustering_matches_duckdb(spark):
    import duckdb
    from gaia_spark.operators.graph import (
        clustering_coefficients, sql_clustering_coefficients)
    pairs = sorted({(f"{(i * 5) % 29:02d}", f"{(i * 9 + 2) % 29:02d}")
                    for i in range(90)}
                   # K5 on 00..04 guarantees triangle-rich nodes
                   | {(f"{i:02d}", f"{j:02d}")
                      for i in range(5) for j in range(i + 1, 5)})
    pairs = [p for p in pairs if p[0] != p[1]]
    df = spark.createDataFrame(pairs, "src string, dst string")
    got = {r["node"]: tuple(r)[1:]
           for r in clustering_coefficients(df).collect()}
    con = duckdb.connect()
    vals = ", ".join(f"('{a}', '{b}')" for a, b in pairs)
    want = {r[0]: r[1:] for r in con.sql(sql_clustering_coefficients(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)")).fetchall()}
    assert got == want
    assert any(t for _, t, _ in got.values())   # triangles exist


def test_personalized_pagerank_locality(spark):
    from gaia_spark.operators.graph import (PPM, personalized_pagerank)
    # a -> b -> c -> d chain + far component x -> y: mass stays near a
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "src string, dst string")
    got = {r["node"]: r["rank_ppm"]
           for r in personalized_pagerank(edges, ["a"], iters=3).collect()}
    # seed keeps the restart base every round; non-seed far component
    # never receives anything
    assert got["a"] == PPM - PPM * 85 // 100
    assert got["x"] == 0 and got["y"] == 0
    # exact hand-computed transient (3 power steps push the initial
    # seed pulse to d; steady-state decay needs iters >> diameter):
    # b = 0.85·base, c = 0.85·b, d = 0.85²·(0.85·PPM)
    assert got["b"] == 127500
    assert got["c"] == 108375
    assert got["d"] == 614125
    # and differs from PLAIN pagerank, where x/y earn the base too
    from gaia_spark.operators.graph import pagerank
    plain = {r["node"]: r["rank_ppm"]
             for r in pagerank(edges, iters=3).collect()}
    assert plain["x"] > 0 and plain["y"] > 0


def test_personalized_pagerank_matches_duckdb(spark):
    import duckdb
    from gaia_spark.operators.graph import (
        personalized_pagerank, sql_personalized_pagerank)
    rows = [(f"{v:02d}", f"{(v * 3 + 1) % 37:02d}") for v in range(37)]
    df = spark.createDataFrame(rows, "src string, dst string")
    got = {r["node"]: r["rank_ppm"]
           for r in personalized_pagerank(df, ["00", "05"],
                                          iters=4).collect()}
    con = duckdb.connect()
    vals = ", ".join(f"('{a}', '{b}')" for a, b in rows)
    want = dict(con.sql(sql_personalized_pagerank(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)",
        ["00", "05"], iters=4)).fetchall())
    assert got == want
