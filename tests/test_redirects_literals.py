"""resolve_redirects (functions/web.py) and parse_literals
(operators/cleankb.py)."""

from pyspark.sql import functions as F

from gaia_spark.functions.web import resolve_redirects
from gaia_spark.operators.cleankb import parse_literals


def _redirects(spark, pairs):
    return spark.createDataFrame(
        pairs, "src_url string, dst_url string")


def test_redirects_chain_resolves_with_hops(spark):
    r = _redirects(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {x.src_url: (x.final_url, x.hops, x.is_loop)
           for x in resolve_redirects(r).collect()}
    assert got == {"a": ("d", 3, False), "b": ("d", 2, False),
                   "c": ("d", 1, False)}


def test_redirects_long_chain_within_doubling_budget(spark):
    """A 50-hop chain resolves fully at max_doublings=6 (2^6 = 64)."""
    chain = [(f"u{i}", f"u{i+1}") for i in range(50)]
    got = {x.src_url: (x.final_url, x.hops)
           for x in resolve_redirects(_redirects(spark, chain))
           .collect()}
    assert got["u0"] == ("u50", 50)
    assert got["u49"] == ("u50", 1)


def test_redirects_cycle_marked_not_raised(spark):
    r = _redirects(spark, [("x", "y"), ("y", "x"), ("a", "x")])
    got = {c.src_url: c for c in resolve_redirects(r).collect()}
    assert got["x"].is_loop and got["y"].is_loop and got["a"].is_loop
    # bounded walk: both engines stop after the same 64 steps, so
    # the landing point is deterministic (even cycle: back to start)
    assert got["x"].final_url == "x" and got["x"].hops == 64


def _lit_triples(spark, objs):
    return spark.createDataFrame(
        [("s", "p", o) for o in objs],
        "subj string, pred string, obj string")


def test_parse_literals_classes_and_values(spark):
    t = _lit_triples(spark, ["42", "-7", "3.14", "-0.5", "10.05",
                             "2020-01-31", "N/A", "1.234", ""])
    got = {r.obj: r for r in parse_literals(t).collect()}
    assert (got["42"].lit_type, got["42"].num_x100) == ("int", 4200)
    assert (got["-7"].lit_type, got["-7"].num_x100) == ("int", -700)
    assert (got["3.14"].lit_type, got["3.14"].num_x100) == (
        "decimal", 314)
    # one-digit fraction right-pads: -0.5 → -50
    assert got["-0.5"].num_x100 == -50
    assert got["10.05"].num_x100 == 1005
    assert (got["2020-01-31"].lit_type,
            str(got["2020-01-31"].date_val)) == ("date", "2020-01-31")
    # 3-digit fraction is NOT silently rounded — it's a string
    assert got["1.234"].lit_type == "string"
    assert got["N/A"].lit_type == "string"
    assert got["N/A"].num_x100 is None
    assert got[""].lit_type == "string"
