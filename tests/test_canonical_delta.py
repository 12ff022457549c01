"""URL canonicalization + cross-snapshot delta dedup (round 3).

Hand-computed pins first (agreeing-but-wrong twin pairs can't pass),
then Spark-vs-DuckDB equality on the real sf0.001 corpus using the
same composition as the driver queries.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from gaia_spark.functions.dedup import snapshot_delta, sql_snapshot_delta
from gaia_spark.functions.web import (
    canonicalize_url,
    sql_canonicalize_cte,
    sql_synth_messy_url,
    synth_messy_url,
)

SF_DIR = "/root/testdata/sf0.001"


def _canon_one(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(canonicalize_url(F.col("url")).alias("c")) \
             .collect()[0]["c"]


class TestCanonicalizeUrl:
    def test_fragment_and_trailing_slash_stripped(self, spark):
        assert (_canon_one(spark, "https://a.com/x/#frag")
                == "https://a.com/x")

    def test_root_path_collapses(self, spark):
        assert _canon_one(spark, "https://a.com/") == "https://a.com"

    def test_tracking_params_dropped_survivors_sorted(self, spark):
        got = _canon_one(
            spark,
            "https://a.com/p?utm_source=x&id=9&b=2&gclid=1&ref=z")
        assert got == "https://a.com/p?b=2&id=9"

    def test_www_and_case_normalized(self, spark):
        assert (_canon_one(spark, "https://WWW.Ex.COM/P")
                == "https://ex.com/P")

    def test_param_order_never_splits_groups(self, spark):
        a = _canon_one(spark, "https://a.com/p?x=1&y=2")
        b = _canon_one(spark, "https://a.com/p?y=2&x=1")
        assert a == b == "https://a.com/p?x=1&y=2"

    def test_idempotent(self, spark):
        once = _canon_one(
            spark, "https://www.a.com/x/?utm_c=1&b=2&a=1#f")
        assert _canon_one(spark, once) == once


class TestSnapshotDelta:
    def test_only_content_new_rows_survive(self, spark):
        new = spark.createDataFrame(
            [(1, "shared text"), (2, "fresh text"), (3, "also fresh")],
            "doc_id long, text string")
        old = spark.createDataFrame(
            [(99, "shared text"), (98, "old only")],
            "doc_id long, text string")
        got = sorted(r["doc_id"]
                     for r in snapshot_delta(new, old).collect())
        assert got == [2, 3]

    def test_duplicate_text_within_new_both_kept(self, spark):
        # delta is vs the OLD snapshot only; within-new dedup is
        # dedup_exact's job, composed separately
        new = spark.createDataFrame(
            [(1, "twin"), (2, "twin")], "doc_id long, text string")
        old = spark.createDataFrame(
            [(9, "other")], "doc_id long, text string")
        assert snapshot_delta(new, old).count() == 2


@pytest.mark.parametrize("name", ["canonical", "delta"])
def test_cross_engine_sf0001(spark, name):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')")
    if name == "canonical":
        d = docs.withColumn(
            "url", synth_messy_url(F.col("doc_id"), F.col("source")))
        got = (d.select("doc_id",
                        canonicalize_url(F.col("url"))
                        .alias("canonical_url"))
               .groupBy("canonical_url")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.min("doc_id").alias("first_doc")))
        want = con.sql(
            "SELECT canonical_url, count(*)::BIGINT AS n_docs, "
            "min(doc_id)::BIGINT AS first_doc FROM ("
            + sql_canonicalize_cte(
                f"SELECT doc_id, {sql_synth_messy_url()} AS url"
                " FROM documents")
            + ") GROUP BY canonical_url")
        # canonicalization must actually merge distinct raw urls
        n_raw = d.select("url").distinct().count()
        assert got.count() < n_raw
    else:
        got = snapshot_delta(docs.filter(F.col("doc_id") % 3 == 0),
                             docs.filter(F.col("doc_id") % 2 == 0))
        want = con.sql(sql_snapshot_delta(
            "SELECT * FROM documents WHERE doc_id % 3 = 0",
            "SELECT * FROM documents WHERE doc_id % 2 = 0"))
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.fetchall())
    assert g == w
