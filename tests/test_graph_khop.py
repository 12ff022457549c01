"""k-hop BFS reachability (operators/graph.py:khop_reachability)."""

import duckdb
import pandas as pd

from gaia_spark.operators.graph import khop_reachability, sql_khop_reachability


def _run(spark, edges, seeds, k):
    edf = spark.createDataFrame(edges, "src string, dst string")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node string")
    got = {(r.node, r.hop)
           for r in khop_reachability(edf, sdf, k=k).collect()}
    con = duckdb.connect()
    con.register("edges_tbl", pd.DataFrame(edges, columns=["src", "dst"]))
    con.register("seeds_tbl", pd.DataFrame({"node": list(seeds)}))
    want = {tuple(r) for r in con.sql(sql_khop_reachability(
        "SELECT src, dst FROM edges_tbl",
        "SELECT node FROM seeds_tbl", k=k)).fetchall()}
    assert got == want
    return dict(got)


def test_path_graph_exact_hops(spark):
    # path a0-a1-...-a6: from a0 with k=3 exactly a0..a3 are reached
    edges = [(f"a{i}", f"a{i+1}") for i in range(6)]
    hops = _run(spark, edges, ["a0"], 3)
    assert hops == {"a0": 0, "a1": 1, "a2": 2, "a3": 3}


def test_multi_seed_min_hop_and_isolated_seed(spark):
    # two seeds; b reached from both sides -> min hop wins; the
    # edge-less seed z still appears at hop 0; undirected traversal
    edges = [("s1", "m"), ("m", "b"), ("b", "s2")]
    hops = _run(spark, edges, ["s1", "s2", "z"], 2)
    assert hops == {"s1": 0, "s2": 0, "z": 0, "m": 1, "b": 1}


def test_early_exit_on_exhausted_frontier(spark):
    # component smaller than k: loop breaks once the frontier drains
    edges = [("x", "y")]
    hops = _run(spark, edges, ["x"], 5)
    assert hops == {"x": 0, "y": 1}
