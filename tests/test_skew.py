"""M4 skew hygiene: salting spreads a Zipf-hot key, counts stay exact."""

import pytest
from pyspark.sql import functions as F

from gaia_spark.functions.skew import salted_group_count, salted_repartition


@pytest.fixture(scope="module")
def skewed_df(spark):
    """One domain owns 50% of rows (harsher than the corpus's 30%)."""
    rows = [(f"u{i}", "hot.example" if i % 2 == 0
             else f"site{i % 37}.example") for i in range(4000)]
    return spark.createDataFrame(rows, "url string, parent_uid string")


def test_salted_repartition_spreads_hot_key(spark, skewed_df):
    parts = (
        salted_repartition(skewed_df, "parent_uid", 16, salt_buckets=8)
        .filter(F.col("parent_uid") == "hot.example")
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid").count().collect()
    )
    # the hot key must land on >1 partition, and no partition may hold
    # more than ~2x its fair share of the hot key's rows
    assert len(parts) > 1
    hot_total = sum(r["count"] for r in parts)
    assert max(r["count"] for r in parts) <= 2 * hot_total / len(parts)


def test_unsalted_repartition_concentrates(spark, skewed_df):
    """Control: hash-repartition by key alone puts the hot key on ONE
    partition — the straggler salting exists to prevent."""
    parts = (
        skewed_df.repartition(16, F.col("parent_uid"))
        .filter(F.col("parent_uid") == "hot.example")
        .select(F.spark_partition_id().alias("pid"))
        .distinct().collect()
    )
    assert len(parts) == 1


def test_salted_group_count_exact(spark, skewed_df):
    plain = {r.parent_uid: r["count"] for r in
             skewed_df.groupBy("parent_uid").count().collect()}
    salted = {r.parent_uid: r["count"] for r in
              salted_group_count(skewed_df, "parent_uid",
                                 salt_buckets=8).collect()}
    assert salted == plain
