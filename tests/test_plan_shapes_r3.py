"""Plan-shape assertions for the round-3 web/graph operators.

Locks the 100 TB properties the docstrings claim: which joins
broadcast, how many hash-partitioned shuffles exist, and that nothing
degrades to a nested-loop/cartesian.  Where AQE rewrites the plan at
runtime, assertions run on the FINAL section of the executed plan
(the Initial section is sliced off — it double-counts exchanges and
still shows the pre-AQE join choice).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from gaia_spark.functions.web import (
    anchor_stats,
    blocklist_filter,
    strip_boilerplate,
    synth_boiler_page,
    synth_html,
)


def _static_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def _final_plan(df) -> str:
    df.collect()  # drive AQE to isFinalPlan=true
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("== Initial Plan ==")[0]


def _n_shuffles(plan: str) -> int:
    # ReusedExchange re-reads an existing shuffle's files — count only
    # exchanges that actually write one
    return sum(1 for ln in plan.splitlines()
               if "Exchange hashpartitioning" in ln
               and "ReusedExchange" not in ln)


def _docs(spark, n=64):
    return spark.createDataFrame(
        [(i, f"host-{i % 7}.example.com", f"text body {i} " * 8,
          f"src{i % 3}") for i in range(n)],
        "doc_id long, host string, text string, source string")


def test_blocklist_static_plan_is_broadcast_only(spark):
    """Both joins broadcast STATICALLY (the anti-back is hinted —
    without the hint the corpus-side sort-merge exchange materializes
    before AQE can see the tiny build side): the corpus never
    exchanges; the sole keyed shuffle carries blocked keys."""
    blocked = spark.createDataFrame(
        [("host-3.example.com",), ("example.net",)], "pattern string")
    out = blocklist_filter(_docs(spark), blocked)
    static = _static_plan(out)
    assert static.count("BroadcastHashJoin") == 2, static
    assert "LeftSemi" in static and "LeftAnti" in static
    assert "SortMergeJoin" not in static, static
    assert "NestedLoop" not in static and "Cartesian" not in static
    assert _n_shuffles(static) <= 1, static  # blocked-key distinct
    # and the filter actually bites under this data
    assert out.count() < 64


def test_boilerplate_is_exchange_free(spark):
    """Pure in-row split/filter/join: scan-bound, zero exchanges."""
    d = _docs(spark)
    out = d.select(
        "doc_id",
        strip_boilerplate(
            synth_boiler_page(F.col("doc_id"), F.col("text"))
        ).alias("s"))
    plan = _static_plan(out)
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_anchor_stats_two_keyed_shuffles(spark):
    """html never shuffles: only the (dst_host, anchor) count and the
    dst_host rollup exchange — 2 hash shuffles, both fed by partial
    (map-side) aggregates; no joins anywhere."""
    d = _docs(spark).select(
        synth_html(F.col("doc_id"), F.col("source"),
                   F.col("text")).alias("html"))
    final = _final_plan(anchor_stats(d))
    assert _n_shuffles(final) == 2, final
    assert "Join" not in final, final
    assert final.count("partial_") >= 2, final


def test_degree_histogram_three_shuffles_no_joins(spark):
    from gaia_spark.operators.graph import degree_histogram
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 3 + 1) % 20}") for i in range(40)],
        "src string, dst string")
    final = _final_plan(degree_histogram(edges))
    assert "Join" not in final, final
    assert "Cartesian" not in final and "NestedLoop" not in final
    # distinct(a,b), node degree, degree histogram — and nothing more
    assert _n_shuffles(final) == 3, final
