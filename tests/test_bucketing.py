"""Bucketed co-located joins — pay the shuffle at write time, never at
read time (catalog.write_bucketed).

The 100 TB case: any join repeated across runs (edges ⋈ ranks every
PageRank iteration, triples ⋈ node stats every analytics query) should
read two tables bucketed on the join key and produce a plan with ZERO
Exchange nodes — each task zips bucket i against bucket i.
"""

import pytest
from pyspark.sql import functions as F

from gaia_spark.catalog import Catalog


@pytest.fixture()
def cat(tmp_path):
    return Catalog(str(tmp_path / "cat"))


def test_bucketed_join_no_exchange(spark, cat):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v1"))
    right = spark.range(0, 10_000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("v2"))
    t_l = cat.write_bucketed(left, "join_l", "k", n_buckets=8)
    t_r = cat.write_bucketed(right, "join_r", "k", n_buckets=8)

    # force the sort-merge path (tiny test tables would broadcast);
    # the property under test is bucket co-location, i.e. a SMJ with
    # no shuffle exchange on either side
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t_l).join(spark.table(t_r), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 5_000

        # contrast: the same join over non-bucketed inputs shuffles
        plain = left.join(right, "k")
        plain_plan = plain._jdf.queryExecution()\
            .executedPlan().toString()
        assert "Exchange hashpartitioning" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_no_exchange(spark, cat):
    df = spark.range(0, 5_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    t = cat.write_bucketed(df, "agg_t", "k", n_buckets=8)
    agged = spark.table(t).groupBy("k").agg(F.sum("v").alias("s"))
    plan = agged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert agged.count() == 5_000
