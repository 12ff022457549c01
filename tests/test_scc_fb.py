"""scc_labels_fb — corpus-scale SCC without the transitive closure.

Equivalence-tested against the closure-based scc_labels on random
digraphs, and scale-tested on the shape that EXPLODES the closure
(many sources × many sinks through a small cyclic core) where the
enforced max_closure_rows contract raises and the fb kernel answers.
"""

import random

import pytest
from pyspark.sql import functions as F

from gaia_spark.operators.graph import scc_labels, scc_labels_fb


def _df(spark, edges):
    return spark.createDataFrame(
        [(f"{a:05d}", f"{b:05d}") for a, b in edges],
        "src string, dst string")


def _labels(df):
    return {r.node: r.component for r in df.collect()}


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_fb_equals_closure_on_random_digraphs(spark, seed):
    rng = random.Random(seed)
    n = 60
    edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(150)}
    df = _df(spark, edges)
    assert _labels(scc_labels_fb(df)) == _labels(scc_labels(df))


def test_fb_handcheck_cycles_and_tendrils(spark):
    # two cycles bridged one-way + a tendril + a self-loop + isolatedish
    edges = [(1, 2), (2, 3), (3, 1),          # cycle A
             (3, 4),                          # one-way bridge
             (4, 5), (5, 4),                  # cycle B
             (6, 1),                          # source tendril
             (5, 7),                          # sink tendril
             (8, 8)]                          # self-loop only
    got = _labels(scc_labels_fb(_df(spark, edges)))
    k = lambda i: f"{i:05d}"
    assert got[k(1)] == got[k(2)] == got[k(3)] == k(1)
    assert got[k(4)] == got[k(5)] == k(4)
    assert got[k(6)] == k(6) and got[k(7)] == k(7)
    assert got[k(8)] == k(8)


def test_broom_explodes_closure_but_fb_answers(spark):
    """The enforced scale contract: |src|·|snk| reachability pairs
    through a 5-node cyclic core.  scc_labels' max_closure_rows gate
    RAISES (instead of silently materializing millions of pairs);
    scc_labels_fb trims the tendrils in one pass and returns the
    exact answer."""
    n = 1500
    core = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)]
    sources = [(10_000 + i, 0) for i in range(n)]
    sinks = [(4, 20_000 + i) for i in range(n)]
    df = _df(spark, core + sources + sinks)

    with pytest.raises(RuntimeError, match="max_rows"):
        scc_labels(df, max_closure_rows=100_000).count()

    got = _labels(scc_labels_fb(df))
    k = lambda i: f"{i:05d}"
    assert all(got[k(c)] == k(0) for c in range(5))
    assert all(got[k(10_000 + i)] == k(10_000 + i) for i in range(0, n, 97))
    assert all(got[k(20_000 + i)] == k(20_000 + i) for i in range(0, n, 97))
    assert len(got) == 5 + 2 * n


def test_fb_raises_on_pathological_diameter(spark):
    """A single long cycle exceeds the propagation budget: the kernel
    must RAISE (partial answers are never returned), and a raised
    budget solves it."""
    cyc = [(i, (i + 1) % 120) for i in range(120)]
    df = _df(spark, cyc)
    with pytest.raises(RuntimeError, match="prop_rounds"):
        scc_labels_fb(df, prop_rounds=5).count()
    got = _labels(scc_labels_fb(df, prop_rounds=130))
    assert set(got.values()) == {f"{0:05d}"}
