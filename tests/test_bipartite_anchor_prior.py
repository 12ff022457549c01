"""bipartite_check (operators/graph.py) and anchor_priors
(functions/web.py)."""

from pyspark.sql import functions as F

from gaia_spark.functions.web import anchor_priors
from gaia_spark.operators.graph import bipartite_check


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_bipartite_even_cycle_true_odd_cycle_false(spark):
    sq = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]  # C4
    tri = [("x", "y"), ("y", "z"), ("z", "x")]             # C3
    got = {r.component: (r.n_nodes, r.is_bipartite)
           for r in bipartite_check(_edges(spark, sq + tri)).collect()}
    assert got["a"] == (4, True)
    assert got["x"] == (3, False)


def test_bipartite_path_and_star_true(spark):
    e = [("p1", "p2"), ("p2", "p3"),
         ("hub", "l1"), ("hub", "l2"), ("hub", "l3")]
    got = {r.component: r.is_bipartite
           for r in bipartite_check(_edges(spark, e)).collect()}
    assert got == {"hub": True, "p1": True}


def test_bipartite_odd_cycle_attached_to_even_structure(spark):
    """One odd cycle anywhere in the component poisons the whole
    component — the detector is per-component, not per-node."""
    e = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),  # C4
         ("d", "e"), ("e", "f"), ("f", "d")]               # C3 tail
    got = bipartite_check(_edges(spark, e)).collect()
    assert len(got) == 1 and not got[0].is_bipartite
    assert got[0].n_nodes == 6


def _html(spark, rows):
    return spark.createDataFrame([(h,) for h in rows], "html string")


def test_anchor_priors_exact_ranks(spark):
    a = '<a href="https://one.com/x">Apple</a>'
    b = '<a href="https://two.com/y">apple </a>'
    c = '<a href="https://one.com/z">APPLE</a>'
    d = '<a href="https://one.com/q">rare</a>'
    got = {(r.anchor, r.dst_host): r
           for r in anchor_priors(
               _html(spark, [a + b, c, d]), min_total=2).collect()}
    # case/trim-folded: 3 'apple' anchors, 2 → one.com, 1 → two.com
    r1 = got[("apple", "one.com")]
    assert (r1.cnt, r1.n_total, r1.prior_x10k, r1.rank) == (
        2, 3, 6666, 1)
    r2 = got[("apple", "two.com")]
    assert (r2.cnt, r2.prior_x10k, r2.rank) == (1, 3333, 2)
    # min_total prunes the singleton anchor entirely
    assert not any(k[0] == "rare" for k in got)


def test_anchor_priors_tie_breaks_by_host(spark):
    h = ('<a href="https://bbb.com/1">t</a>'
         '<a href="https://aaa.com/2">t</a>')
    got = {r.dst_host: r.rank
           for r in anchor_priors(_html(spark, [h]),
                                  min_total=2).collect()}
    assert got == {"aaa.com": 1, "bbb.com": 2}
