"""HyperBall (operators/graph.py:hyperball): DuckDB-twin equality,
pure-Python register reference, exact-ball accuracy, partitioning
invariance, and the shared-HLL-kernel contract."""

import hashlib
from collections import defaultdict

import duckdb
import pandas as pd

from gaia_spark.functions import sketch
from gaia_spark.operators.graph import hyperball, sql_hyperball


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _rank(h: str) -> int:
    bits = bin(int(h[2:10], 16))[2:].zfill(32)
    z = len(bits) - len(bits.lstrip("0"))
    return min(z + 1, sketch.HLL_RANK_CAP)


def _est(items) -> int:
    regs: dict[str, int] = {}
    for s in items:
        h = _md5(s)
        regs[h[:2]] = max(regs.get(h[:2], 0), _rank(h))
    cap = sketch.HLL_RANK_CAP
    s_tot = (sum(1 << (cap - m) for m in regs.values())
             + (sketch.HLL_M - len(regs)) * (1 << cap))
    v = sketch.HLL_M - len(regs)
    raw = (((sketch.HLL_M ** 2 * (1 << cap)) // s_tot)
           * sketch.HLL_ALPHA_NUM) // sketch.HLL_ALPHA_DEN
    if raw <= 5 * sketch.HLL_M // 2 and v > 0:
        return sketch.HLL_LIN[v - 1]
    return raw


def _py_hyperball(edges, radius):
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    out = {}
    for v in adj:
        ball = {v}
        frontier = {v}
        for _ in range(radius):
            frontier = {w for u in frontier for w in adj[u]}
            ball |= frontier
        out[v] = (_est(ball), len(ball))
    return out


EDGES = ([(str(v), str((v * 3 + 1) % 101)) for v in range(101)]
         + [(str(v), str((v + 7) % 101)) for v in range(0, 101, 5)])


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def test_hyperball_matches_duckdb_twin(spark):
    got = hyperball(_edges_df(spark), radius=2).toPandas()
    got = got.sort_values("node").reset_index(drop=True)
    con = duckdb.connect()
    con.register("e", pd.DataFrame(EDGES, columns=["src", "dst"]))
    want = con.execute(
        sql_hyperball("SELECT src, dst FROM e", radius=2)).df()
    want = want.sort_values("node").reset_index(drop=True)
    assert got.equals(want)


def test_hyperball_matches_python_registers(spark):
    """Per-node estimates equal a from-scratch register simulation
    over exact BFS balls — pins that the iterative register merge
    reaches exactly the r-ball membership, no more, no less."""
    got = {r.node: r.ball_est
           for r in hyperball(_edges_df(spark), radius=2).collect()}
    ref = _py_hyperball(EDGES, 2)
    assert got == {v: est for v, (est, _) in ref.items()}


def test_hyperball_accuracy_vs_exact_balls(spark):
    """Estimates track true ball sizes within the 256-register HLL
    band on this graph (small balls take the near-exact
    linear-counting branch)."""
    got = {r.node: r.ball_est
           for r in hyperball(_edges_df(spark), radius=3).collect()}
    ref = _py_hyperball(EDGES, 3)
    rel = [abs(got[v] - truth) / truth for v, (_, truth) in ref.items()]
    assert sum(rel) / len(rel) < 0.05
    assert max(rel) < 0.30


def test_hyperball_radius_zero_is_self(spark):
    """radius=0 balls contain only the node: every estimate is
    LIN[255] = 1 (single-item linear counting is exact)."""
    out = hyperball(_edges_df(spark), radius=0).collect()
    assert all(r.ball_est == 1 for r in out)


def test_hyperball_star_hub(spark):
    """A 300-leaf star: hub ball at radius 1 is 301 nodes — the
    estimate must land within 4σ (σ = 1.04/√256 ≈ 6.5%)."""
    edges = [("hub", f"leaf{i}") for i in range(300)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.ball_est for r in hyperball(df, radius=1).collect()}
    assert abs(got["hub"] - 301) / 301 < 0.26
    # every leaf's 1-ball is {leaf, hub} = 2
    ref = _py_hyperball(edges, 1)
    assert got == {v: est for v, (est, _) in ref.items()}


def test_hyperball_partitioning_invariance(spark):
    df = _edges_df(spark)
    a = sorted(map(tuple, hyperball(df.coalesce(1), 2).collect()))
    b = sorted(map(tuple, hyperball(df.repartition(13), 2).collect()))
    assert a == b
