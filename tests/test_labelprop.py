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
