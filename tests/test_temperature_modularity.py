"""Temperature sampling (functions/sampling.py), modularity scoring
(operators/graph.py), URL template mining (functions/web.py).
"""

import math

from pyspark.sql import functions as F

from gaia_spark.functions.sampling import (isqrt_col,
                                           temperature_rates,
                                           temperature_sample)
from gaia_spark.operators.graph import modularity


def test_isqrt_exact_around_squares(spark):
    """Floor-sqrt must be exact at perfect squares and their
    neighbors (the ±1-ulp correction zone) and at large values."""
    vals = []
    for r in [0, 1, 2, 3, 10, 1000, 10**6, 10**9]:
        for v in (r * r - 1, r * r, r * r + 1):
            if v >= 0:
                vals.append(v)
    vals += [2, 5, 99, 10**12 + 7]
    df = spark.createDataFrame([(v,) for v in vals], "n bigint")
    got = {r.n: r.s for r in df.select(
        "n", isqrt_col(F.col("n")).alias("s")).collect()}
    for v in vals:
        assert got[v] == math.isqrt(v), v


def test_temperature_rates_flatten_the_head(spark):
    """10000 vs 100 docs (100:1) must sample at √-flattened 10:1
    quota ratio, and quotas follow budget·√n div Σ√n exactly."""
    rows = [(f"a{i}", "big") for i in range(10000)]
    rows += [(f"b{i}", "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    r = {x.source: x for x in temperature_rates(df, budget=110)
         .collect()}
    assert r["big"].weight == 100 and r["small"].weight == 10
    assert r["big"].quota == 110 * 100 // 110 == 100
    assert r["small"].quota == 10
    # realized rate: small keeps ~10% of 100 docs vs big's 1%
    assert r["big"].rate_x10k == 100
    assert r["small"].rate_x10k == 1000


def test_temperature_sample_is_partitioning_invariant(spark):
    rows = [(i, "s" + str(i % 3)) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = {r.doc_id for r in temperature_sample(df, 500).collect()}
    b = {r.doc_id
         for r in temperature_sample(df.repartition(13), 500).collect()}
    assert a == b and a


def test_modularity_two_cliques_hand_computed(spark):
    """Two triangles joined by one bridge, perfect partition:
    m = 7; per community e_c = 3, d_c = 7 →
    q = (1e9·3)//7 − ((1e6·7)//14)² // 1000
      = 428571428 − 250000000 = 178571428 each."""
    e = spark.createDataFrame(
        [("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
         ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
         ("a1", "b1")], "src string, dst string")
    labels = spark.createDataFrame(
        [(n, n[0]) for n in
         ["a1", "a2", "a3", "b1", "b2", "b3"]],
        "node string, label string")
    got = {r.label: r for r in modularity(e, labels).collect()}
    for lbl in "ab":
        assert got[lbl].n_nodes == 3
        assert got[lbl].intra_edges == 3
        assert got[lbl].degree_sum == 7
        assert got[lbl].q_x1e9 == 178571428
    # the all-in-one partition scores 0 + rounding (sanity: lower)
    one = spark.createDataFrame(
        [(n, "x") for n in ["a1", "a2", "a3", "b1", "b2", "b3"]],
        "node string, label string")
    q_one = sum(r.q_x1e9 for r in modularity(e, one).collect())
    assert q_one < sum(r.q_x1e9 for r in got.values())


def test_modularity_counts_communities_without_intra_edges(spark):
    """A singleton community has 0 intra edges but still a (negative)
    expected-edges term — the left join must not drop it."""
    e = spark.createDataFrame([("a", "b"), ("a", "c")],
                              "src string, dst string")
    labels = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "solo")],
        "node string, label string")
    got = {r.label: r for r in modularity(e, labels).collect()}
    assert got["solo"].intra_edges == 0
    assert got["solo"].degree_sum == 1
    assert got["solo"].q_x1e9 < 0


def test_url_templates_collapse_digit_runs(spark):
    from gaia_spark.functions.web import url_templates, with_url_parts

    urls = ["https://a.com/p/3/item-88", "https://b.com/p/7/item-123",
            "https://a.com/about", "https://a.com/p/9/item-1"]
    df = with_url_parts(spark.createDataFrame(
        [(u,) for u in urls], "url string"))
    got = {r.template: (r.n_urls, r.n_hosts, r.example_url)
           for r in url_templates(df).collect()}
    assert got["/p/{n}/item-{n}"] == (
        3, 2, "https://a.com/p/3/item-88")
    assert got["/about"] == (1, 1, "https://a.com/about")
