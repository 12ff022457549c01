"""Weisfeiler-Lehman signatures (operators/graph.py:wl_labels) and
basic-graph-pattern matching (operators/bgp.py): DuckDB twins, WL
isomorphism semantics, BGP bag semantics / join-order safety."""

import duckdb
import pandas as pd
import pytest

from gaia_spark.operators.bgp import bgp_match, sql_bgp_match
from gaia_spark.operators.graph import sql_wl_labels, wl_labels

# ------------------------------------------------------------------
# WL
# ------------------------------------------------------------------

WL_EDGES = [
    ("a", "b"), ("b", "c"), ("c", "a"),            # triangle 1
    ("x", "y"), ("y", "z"), ("z", "x"),            # triangle 2
    ("p1", "p2"), ("p2", "p3"), ("p3", "p4"),      # path P4
    ("h", "l1"), ("h", "l2"), ("h", "l3"),         # 3-star
]


def _wl_df(spark):
    return spark.createDataFrame(WL_EDGES, "src string, dst string")


def test_wl_matches_duckdb_twin(spark):
    got = wl_labels(_wl_df(spark), rounds=2).toPandas()
    got = got.sort_values("node").reset_index(drop=True)
    con = duckdb.connect()
    con.register("e", pd.DataFrame(WL_EDGES, columns=["src", "dst"]))
    want = con.execute(
        sql_wl_labels("SELECT src, dst FROM e", rounds=2)).df()
    want = want.sort_values("node").reset_index(drop=True)
    assert got.equals(want)


def test_wl_collapses_isomorphic_roles(spark):
    """Structurally indistinguishable nodes share a label; roles 1-WL
    can separate get separate labels."""
    d = {r.node: r.wl_label
         for r in wl_labels(_wl_df(spark), rounds=2).collect()}
    # the two triangles are isomorphic: all six nodes one label
    assert len({d[v] for v in "abcxyz"}) == 1
    # star leaves collapse; hub differs from leaves and triangles
    assert d["l1"] == d["l2"] == d["l3"]
    assert d["h"] not in (d["l1"], d["a"])
    # path has mirror symmetry: ends match, middles match, ends≠middles
    assert d["p1"] == d["p4"] and d["p2"] == d["p3"]
    assert d["p1"] != d["p2"]


def test_wl_round_zero_is_degree(spark):
    """rounds=0 labels are pure degree hashes."""
    d = {r.node: r.wl_label
         for r in wl_labels(_wl_df(spark), rounds=0).collect()}
    # degree-2 everywhere except hub (3) and path ends / leaves (1)
    assert d["a"] == d["p2"]          # both degree 2
    assert d["p1"] == d["l1"]         # both degree 1
    assert len({d["h"], d["a"], d["p1"]}) == 3


def test_wl_partitioning_invariance(spark):
    df = _wl_df(spark)
    a = sorted(map(tuple, wl_labels(df.coalesce(1), 2).collect()))
    b = sorted(map(tuple, wl_labels(df.repartition(9), 2).collect()))
    assert a == b


# ------------------------------------------------------------------
# BGP
# ------------------------------------------------------------------

TRIPLES = [
    ("o1", "ordered_by", "c1"), ("o1", "priority", "1-URGENT"),
    ("o1", "contains", "p1"), ("o1", "contains", "p2"),
    ("o2", "ordered_by", "c2"), ("o2", "priority", "3-LOW"),
    ("o2", "contains", "p1"),
    ("o3", "ordered_by", "c1"), ("o3", "priority", "1-URGENT"),
    ("o1", "ordered_by", "c1"),   # duplicate triple (bag semantics)
]

PAT = [("?o", "ordered_by", "?c"), ("?o", "priority", "1-URGENT"),
       ("?o", "contains", "?p")]


def _triples_df(spark):
    return spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string")


def test_bgp_matches_duckdb_twin(spark):
    got = bgp_match(_triples_df(spark), PAT).toPandas()
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", pd.DataFrame(TRIPLES,
                                   columns=["subj", "pred", "obj"]))
    want = con.execute(sql_bgp_match("SELECT * FROM t", PAT)).df()
    want = want.sort_values(list(want.columns)).reset_index(drop=True)
    assert got.equals(want)


def test_bgp_bag_semantics(spark):
    """The duplicated (o1, ordered_by, c1) triple doubles every o1
    binding — flat-join multiplicity, not set semantics."""
    rows = [tuple(r) for r in bgp_match(_triples_df(spark), PAT).collect()]
    assert rows.count(("o1", "c1", "p1")) == 2
    assert rows.count(("o1", "c1", "p2")) == 2
    # o3 is urgent but has no parts: no binding
    assert not any(r[0] == "o3" for r in rows)
    # o2 has parts but is not urgent: no binding
    assert not any(r[0] == "o2" for r in rows)


def test_bgp_output_column_order_is_first_appearance(spark):
    out = bgp_match(_triples_df(spark), PAT)
    assert out.columns == ["o", "c", "p"]


def test_bgp_disconnected_raises(spark):
    with pytest.raises(ValueError, match="disconnected"):
        bgp_match(_triples_df(spark),
                  [("?a", "ordered_by", "?b"), ("?x", "contains", "?y")])


def test_bgp_repeated_var_within_pattern(spark):
    df = spark.createDataFrame(
        [("s", "eq", "s"), ("s", "eq", "z"), ("w", "eq", "w")],
        "subj string, pred string, obj string")
    got = sorted(r.x for r in bgp_match(df, [("?x", "eq", "?x")]).collect())
    assert got == ["s", "w"]


def test_bgp_constant_only_pattern_raises_as_disconnected(spark):
    """A fully-constant pattern shares no variable with anything, so
    the connected-join-order guard rejects it (a pure EXISTS gate
    must be phrased through a shared variable) — contract pin."""
    pat = [("?o", "contains", "?p"), ("o1", "priority", "1-URGENT")]
    with pytest.raises(ValueError, match="disconnected"):
        bgp_match(_triples_df(spark), pat)


def test_bgp_two_hop_chain(spark):
    """Chain ?a -knows-> ?b -knows-> ?c joins through the middle var."""
    df = spark.createDataFrame(
        [("u1", "knows", "u2"), ("u2", "knows", "u3"),
         ("u2", "knows", "u4"), ("u5", "knows", "u1")],
        "subj string, pred string, obj string")
    pat = [("?a", "knows", "?b"), ("?b", "knows", "?c")]
    got = sorted(tuple(r) for r in bgp_match(df, pat).collect())
    assert got == [("u1", "u2", "u3"), ("u1", "u2", "u4"),
                   ("u5", "u1", "u2")]
