"""Round-3 operators: BM25 retrieval, vocab coverage, duplicated
token spans, stratified sampling.

Semantics are pinned against hand-computed values (an agreeing-but-
wrong Spark/DuckDB twin pair cannot slip through), and each operator
also gets a direct cross-engine equality check on the sf0.001 corpus
— cheap here, and it catches twin drift before the driver does.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from gaia_spark.functions.dedup import dup_span_stats, sql_dup_span_stats
from gaia_spark.functions.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_topk,
    sql_bm25_topk,
)
from gaia_spark.functions.sampling import (
    stratified_sample,
    sql_stratified_sample,
)
from gaia_spark.functions.text_analysis import (
    vocab_coverage,
    sql_vocab_coverage,
)

SF_DIR = "/root/testdata/sf0.001"


def _by_id(df, key="doc_id"):
    return {r[key]: r.asDict() for r in df.collect()}


class TestBM25:
    def test_hand_scores(self, spark):
        df = spark.createDataFrame(
            [(1, "x x y"), (2, "y y"), (3, "x y")],
            "doc_id long, text string")
        got = {r["doc_id"]: r.asDict()
               for r in bm25_topk(df, ["x"], k=10).collect()}
        # doc 2 has no query term -> dropped
        assert set(got) == {1, 3}
        n, df_x, avgdl = 3, 2, 7 / 3

        def score(tf, dl):
            idf = math.log(1.0 + (n - df_x + 0.5) / (df_x + 0.5))
            return math.floor(10000 * idf * (tf * (BM25_K1 + 1.0))
                              / (tf + BM25_K1 * (1.0 - BM25_B
                                                 + BM25_B * dl / avgdl)))

        assert got[1]["score_x10k"] == score(2.0, 3.0)
        assert got[3]["score_x10k"] == score(1.0, 2.0)
        assert got[1]["rank"] == 1 and got[3]["rank"] == 2

    def test_tokenizer_splits_punct(self, spark):
        df = spark.createDataFrame(
            [(1, "Spark, spark; SPARK!")], "doc_id long, text string")
        got = bm25_topk(df, ["spark"], k=5).collect()
        assert len(got) == 1 and got[0]["dl"] == 3


class TestVocabCoverage:
    def test_hand_curve(self, spark):
        df = spark.createDataFrame(
            [(1, "a a b"), (2, "b c")], "doc_id long, text string")
        rows = vocab_coverage(df, top_v=10).orderBy("rank").collect()
        assert [(r["rank"], r["token"], r["n"], r["cum_cov_x10k"])
                for r in rows] == [
            (1, "a", 2, 4000), (2, "b", 2, 8000), (3, "c", 1, 10000)]

    def test_top_v_cut(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e")], "doc_id long, text string")
        assert vocab_coverage(df, top_v=2).count() == 2


class TestDupSpans:
    W = 3

    def test_cross_doc_span(self, spark):
        df = spark.createDataFrame(
            [(1, "p q r s"), (2, "z p q r"), (3, "a b")],
            "doc_id long, text string")
        got = _by_id(dup_span_stats(df, w=self.W))
        assert got[1] == {"doc_id": 1, "n_spans": 2, "n_dup_spans": 1,
                          "dup_span_frac_x10k": 5000}
        assert got[2]["n_dup_spans"] == 1
        assert got[3] == {"doc_id": 3, "n_spans": 0, "n_dup_spans": 0,
                          "dup_span_frac_x10k": 0}

    def test_within_doc_repeat_not_dup(self, spark):
        # "m n o" repeats inside ONE doc: repetition, not cross-doc dup
        df = spark.createDataFrame(
            [(1, "m n o m n o")], "doc_id long, text string")
        got = _by_id(dup_span_stats(df, w=self.W))[1]
        assert got["n_spans"] == 4 and got["n_dup_spans"] == 0

    def test_doc_exactly_w_tokens(self, spark):
        df = spark.createDataFrame(
            [(1, "p q r"), (2, "p q r")], "doc_id long, text string")
        got = _by_id(dup_span_stats(df, w=self.W))
        for d in (1, 2):
            assert got[d]["n_spans"] == 1
            assert got[d]["dup_span_frac_x10k"] == 10000


class TestStratifiedSample:
    def test_exact_quota_and_rank(self, spark):
        rows = [(i, f"s{i % 3}") for i in range(90)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        got = stratified_sample(df, quota=5).collect()
        per = {}
        for r in got:
            per.setdefault(r["stratum"], []).append(r)
        assert set(per) == {"s0", "s1", "s2"}
        for stratum, sample in per.items():
            assert sorted(r["rk"] for r in sample) == [1, 2, 3, 4, 5]
            # expected: the quota smallest md5("stratum:key") among
            # gate survivors; with 30 rows/stratum the 4x oversample
            # gate keeps rate = floor(5*4*1e4/30)+1 bps
            rate = min(10000, (5 * 4 * 10000) // 30 + 1)
            keys = [i for i in range(90) if f"s{i % 3}" == stratum]
            hs = {i: hashlib.md5(
                f"{stratum}:{i}".encode()).hexdigest() for i in keys}
            surv = [i for i in keys
                    if int(hs[i][:8], 16) % 10000 < rate]
            want = sorted(surv, key=lambda i: (hs[i], i))[:5]
            assert sorted(r["key"] for r in sample) == sorted(want)

    def test_small_stratum_returned_whole(self, spark):
        df = spark.createDataFrame(
            [(1, "tiny"), (2, "tiny")], "doc_id long, lang string")
        got = stratified_sample(df, quota=40).collect()
        assert sorted(r["key"] for r in got) == [1, 2]


@pytest.mark.parametrize("name", ["bm25", "vocab", "spans", "strat"])
def test_cross_engine_sf0001(spark, name):
    """Spark vs DuckDB twin equality on the real sf0.001 corpus."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')")
    terms = ["spark", "vector", "customer", "window"]
    if name == "bm25":
        got = bm25_topk(docs, terms, k=20)
        want = con.sql(sql_bm25_topk("documents", terms, k=20))
    elif name == "vocab":
        got = vocab_coverage(docs, top_v=50)
        want = con.sql(sql_vocab_coverage("documents", top_v=50))
    elif name == "spans":
        mirror = ("(SELECT doc_id, text FROM documents UNION ALL "
                  "SELECT doc_id + 10000000, substr(text, 1, 200) "
                  "FROM documents WHERE doc_id % 5 = 0)")
        d = docs.select("doc_id", "text")
        partial = (d.filter(F.col("doc_id") % 5 == 0)
                   .select((F.col("doc_id") + 10_000_000)
                           .alias("doc_id"),
                           F.substring("text", 1, 200).alias("text")))
        got = dup_span_stats(d.unionByName(partial))
        want = con.sql(sql_dup_span_stats(mirror))
    else:
        got = stratified_sample(docs, quota=40)
        want = con.sql(sql_stratified_sample("documents", quota=40))
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.fetchall())
    assert g == w
