"""boruvka_forest (operators/graph.py) and calibration_table
(functions/classifier.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from gaia_spark.functions.classifier import calibration_table
from gaia_spark.operators.graph import boruvka_forest


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _key(a, b):
    w = int(hashlib.md5(f"{a}#{b}".encode()).hexdigest()[:8], 16)
    return f"{w:010d}#{a}#{b}"


def _kruskal(pairs):
    """Reference MSF under the SAME injective key order."""
    und = sorted({tuple(sorted(p)) for p in pairs if p[0] != p[1]},
                 key=lambda e: _key(*e))
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for a, b in und:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b))
    return out


def test_boruvka_matches_kruskal_reference(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
             ("d", "e"), ("e", "c"), ("x", "y")]
    got = {(r.a, r.b)
           for r in boruvka_forest(_edges(spark, pairs)).collect()}
    assert got == _kruskal(pairs)


def test_boruvka_spanning_and_acyclic(spark):
    """On a 2-component graph: |forest| = n − #components, and the
    forest connects exactly what the graph connects."""
    pairs = [(f"n{i}", f"n{i+1}") for i in range(10)]      # chain of 11
    pairs += [(f"n{i}", f"n{i+2}") for i in range(0, 9, 2)]  # chords
    pairs += [("m1", "m2"), ("m2", "m3"), ("m3", "m1")]     # triangle
    forest = boruvka_forest(_edges(spark, pairs)).collect()
    assert len(forest) == (11 - 1) + (3 - 1)
    assert {(r.a, r.b) for r in forest} == _kruskal(pairs)


def test_boruvka_raises_on_round_exhaustion(spark):
    with pytest.raises(RuntimeError, match="cross-component"):
        boruvka_forest(
            _edges(spark, [(f"c{i}", f"c{i+1}") for i in range(40)]),
            rounds=2)


def test_calibration_table_hand_values(spark):
    scored = spark.createDataFrame(
        [(1, 100, 1, 1), (2, 300, 1, 0), (3, 600, 1, 1),
         (4, -700, 0, 0)],
        "doc_id long, margin long, pred long, label long")
    got = {r.bucket: r for r in
           calibration_table(scored, bucket=500).collect()}
    # margins 100, 300 → bucket 0; 600 → 1; -700 → -1 (both engines
    # TRUNCATE toward zero: Spark div ≡ DuckDB //, so -200 would land
    # in bucket 0, not -1 — pinned here at a value both agree on)
    assert got[0].n == 2 and got[0].n_pos == 1
    assert got[0].pos_rate_x10k == 5000 and got[0].n_tp == 1
    assert got[1].n == 1 and got[1].n_tp == 1
    assert got[-1].n == 1 and got[-1].n_pos == 0 and got[-1].n_tp == 0
