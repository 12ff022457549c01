"""Hand-computed fixtures for the round-2 webtext operators:
repetition filters, chunk dedup, URL parsing, fixed-point PageRank.

The DuckDB cross-engine check is the driver's job (selfcheck /
CORRECTNESS); these tests pin the SEMANTICS against values computed
by hand, so an agreeing-but-wrong twin pair cannot slip through.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gaia_spark.functions.dedup import chunk_dedup_stats
from gaia_spark.functions.text_analysis import repetition_stats
from gaia_spark.functions.web import synth_url, with_url_parts
from gaia_spark.operators.graph import PPM, pagerank


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


class TestRepetition:
    def test_top_bigram(self, spark):
        # "a b a b a b": bigrams a·b ×3, b·a ×2 → top "a b" (3 hits,
        # 3 chars) over 11 chars → floor(1e4*9/11) = 8181
        df = spark.createDataFrame(
            [(1, "a b a b a b")], "doc_id long, text string")
        got = _rows(repetition_stats(df))[1]
        assert got["top_bigram"] == "a b"
        assert got["top_bigram_n"] == 3
        assert got["top_bigram_frac_x10k"] == 8181

    def test_dup_5gram_frac(self, spark):
        # 12 tokens "w x y z q" repeated twice + filler gives 8
        # 5-grams, of which the 2 occurrences of (w x y z q) repeat
        text = "w x y z q w x y z q r s"
        df = spark.createDataFrame([(1, text)],
                                   "doc_id long, text string")
        got = _rows(repetition_stats(df))[1]
        assert got["n_5grams"] == 8
        # duplicated 5-gram occurrences: "w x y z q" appears twice
        assert got["dup_5gram_frac_x10k"] == 10_000 * 2 // 8

    def test_short_doc_zeroes(self, spark):
        df = spark.createDataFrame(
            [(1, "solo"), (2, "")], "doc_id long, text string")
        got = _rows(repetition_stats(df))
        for d in (1, 2):
            assert got[d]["top_bigram"] == ""
            assert got[d]["top_bigram_frac_x10k"] == 0
            assert got[d]["dup_5gram_frac_x10k"] == 0

    def test_tiebreak_is_lexicographic_max(self, spark):
        # "x y x y q q q": bigrams x·y ×2, y·x ×1, y·q ×1, q·q ×2 —
        # tie between "x y" and "q q" → max(struct(n, g)) picks "x y"
        df = spark.createDataFrame(
            [(1, "x y x y q q q")], "doc_id long, text string")
        assert _rows(repetition_stats(df))[1]["top_bigram"] == "x y"


class TestChunkDedup:
    def test_shared_and_unique_chunks(self, spark):
        shared = "s" * 100
        df = spark.createDataFrame(
            [(1, shared + "a" * 100), (2, shared + "b" * 40)],
            "doc_id long, text string")
        got = _rows(chunk_dedup_stats(df))
        assert got[1]["n_chunks"] == 2 and got[1]["n_dup_chunks"] == 1
        assert got[1]["dup_chunk_frac_x10k"] == 5000
        assert got[2]["n_chunks"] == 2 and got[2]["n_dup_chunks"] == 1

    def test_plan_sparse_split_one_exchange(self, spark):
        """Unique chunks must never re-shuffle: the sparse branch's
        final plan carries ONE exchange (the doc_id partial-count agg)
        plus the broadcast dup-hash flag join — not a second
        corpus-wide hash-keyed join of the full chunk table."""
        df = spark.createDataFrame(
            [(i, f"doc {i} " * 30) for i in range(50)],
            "doc_id long, text string")
        plan = chunk_dedup_stats(df)._jdf.queryExecution()\
            .executedPlan().toString()
        n_exchange = plan.count("Exchange hashpartitioning")
        assert n_exchange <= 1, plan
        assert "BroadcastHashJoin" in plan, plan

    def test_within_doc_repeat_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "r" * 200)], "doc_id long, text string")
        got = _rows(chunk_dedup_stats(df))[1]
        # both chunks identical → both duplicated
        assert got["n_chunks"] == 2 and got["n_dup_chunks"] == 2
        assert got["dup_chunk_frac_x10k"] == 10_000

    def test_empty_doc_one_empty_chunk(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, "")], "doc_id long, text string")
        got = _rows(chunk_dedup_stats(df))
        assert got[1]["n_chunks"] == 1
        assert got[1]["n_dup_chunks"] == 1  # both docs hash md5('')


class TestUrlParts:
    def test_parse_fields(self, spark):
        df = spark.createDataFrame(
            [(1, "https://www.news.example.com/p/4/item-1")],
            "doc_id long, url string")
        r = with_url_parts(df).collect()[0]
        assert r["host"] == "www.news.example.com"
        assert r["registered_domain"] == "example.com"
        assert r["tld"] == "com"
        assert r["path"] == "/p/4/item-1"
        assert r["path_depth"] == 3

    def test_synth_url_deterministic(self, spark):
        df = spark.createDataFrame(
            [(14, "Web"), (15, "Web")], "doc_id long, source string")
        got = {r["doc_id"]: r["u"] for r in df.select(
            "doc_id", synth_url(F.col("doc_id"),
                                F.col("source")).alias("u")).collect()}
        assert got[14] == "https://www.web-14.example.net/p/3/item-14"
        assert got[15] == "https://web-15.example.com/p/4"


class TestPagerank:
    def test_two_node_chain_by_hand(self, spark):
        # a -> b, 1 iteration: r(a)=150000;
        # r(b)=150000 + 85*(1000000 div 1) div 100 = 1000000
        edges = spark.createDataFrame([("a", "b")], "src string, dst string")
        got = {r["node"]: r["rank_ppm"]
               for r in pagerank(edges, iters=1).collect()}
        assert got["a"] == 150_000
        assert got["b"] == 1_000_000

    def test_cycle_conserves_rank(self, spark):
        # 3-cycle: every node keeps exactly PPM at every iteration
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a")],
            "src string, dst string")
        got = {r["node"]: r["rank_ppm"]
               for r in pagerank(edges, iters=3).collect()}
        assert got == {"a": PPM, "b": PPM, "c": PPM}

    def test_split_outdegree(self, spark):
        # a -> b and a -> c: each gets 1000000 div 2 = 500000
        # r(b) = 150000 + 85*500000 div 100 = 575000
        edges = spark.createDataFrame(
            [("a", "b"), ("a", "c")], "src string, dst string")
        got = {r["node"]: r["rank_ppm"]
               for r in pagerank(edges, iters=1).collect()}
        assert got["b"] == got["c"] == 575_000

    def test_partition_invariance(self, spark):
        import random
        rng = random.Random(7)
        rows = [(f"n{rng.randrange(40)}", f"n{rng.randrange(40)}")
                for _ in range(120)]
        edges = spark.createDataFrame(rows, "src string, dst string")
        one = sorted(map(tuple, pagerank(edges.coalesce(1)).collect()))
        many = sorted(map(tuple, pagerank(
            edges.repartition(13)).collect()))
        assert one == many


class TestHashSampling:
    def test_partition_invariance_and_rate(self, spark):
        from gaia_spark.functions.sampling import mixture_sample
        rows = [(i, f"src{i % 3}") for i in range(3000)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        rates = {"src0": 5000, "src1": 0}
        one = sorted(r["doc_id"] for r in mixture_sample(
            df.coalesce(1), rates, 1000).collect())
        many = sorted(r["doc_id"] for r in mixture_sample(
            df.repartition(17), rates, 1000).collect())
        assert one == many                       # partitioning-proof
        by_src = {}
        for i in one:
            by_src.setdefault(i % 3, []).append(i)
        assert 1 not in by_src                   # rate 0 keeps nothing
        assert 400 <= len(by_src[0]) <= 600      # ~50% of 1000
        assert 60 <= len(by_src[2]) <= 140       # default 10% of 1000

    def test_gate_pushes_to_scan(self, spark, tmp_path):
        from gaia_spark.functions.sampling import hash_gate
        from pyspark.sql import functions as F
        p = str(tmp_path / "t.parquet")
        spark.range(100).selectExpr(
            "id AS doc_id", "'x' AS source").write.parquet(p)
        df = spark.read.parquet(p)
        plan = df.filter(hash_gate(
            F.col("doc_id").cast("string"), 5000))._jdf \
            .queryExecution().executedPlan().toString()
        # no Exchange anywhere: the sample is a pure scan-level filter
        assert "Exchange" not in plan


class TestDecontaminate:
    def _stats(self, spark, docs, ev, n=4):
        from gaia_spark.functions.decontaminate import contamination_stats
        ddf = spark.createDataFrame(docs, "doc_id bigint, text string")
        edf = spark.createDataFrame(ev, "doc_id bigint, text string")
        return _rows(contamination_stats(ddf, edf, n=n))

    def test_planted_overlap(self, spark):
        ev = [(100, "a b c d e f")]            # 4-grams: abcd bcde cdef
        docs = [
            (1, "x y a b c d z w"),            # contains "a b c d"
            (2, "p q r s t u v"),              # clean
            (3, "a b c"),                      # too short: 0 grams
        ]
        got = self._stats(spark, docs, ev)
        assert got[1]["contaminated"] and got[1]["n_hits"] == 1
        assert got[1]["n_grams"] == 5
        assert got[1]["hit_frac_x10k"] == 2000  # floor(1e4 * 1/5)
        assert not got[2]["contaminated"] and got[2]["n_hits"] == 0
        assert got[3]["n_grams"] == 0 and not got[3]["contaminated"]

    def test_distinct_gram_counting(self, spark):
        # repeated gram in one doc counts once (distinct semantics)
        ev = [(100, "a a a a")]
        docs = [(1, "a a a a a a")]            # 3 occurrences of "a a a a"
        got = self._stats(spark, docs, ev)
        assert got[1]["n_grams"] == 1 and got[1]["n_hits"] == 1
        assert got[1]["hit_frac_x10k"] == 10000

    def test_case_and_whitespace_normalized(self, spark):
        ev = [(100, "The  Quick\tBrown Fox")]
        docs = [(1, "the quick brown fox jumps")]
        got = self._stats(spark, docs, ev)
        assert got[1]["contaminated"]

    def test_no_corpus_wide_exchange(self, spark):
        from gaia_spark.functions.decontaminate import contamination_stats
        ddf = spark.range(50).selectExpr(
            "id AS doc_id",
            "concat('tok', id, ' a b c d e f g h i j') AS text")
        edf = ddf.limit(3)
        plan = contamination_stats(ddf, edf)._jdf \
            .queryExecution().executedPlan().toString()
        # eval side must reach the membership join as a broadcast
        assert "BroadcastHashJoin" in plan


class TestPacking:
    """Sequence packing: hand-computed offsets, span math, shard
    independence, engine twin."""

    def _hand_df(self, spark):
        return spark.createDataFrame(
            [(1, "one two three"),            # 3 tokens
             (2, "a b c d e f g"),            # 7 tokens
             (3, "x " * 12),                  # 12 tokens → spans packs
             (4, "   ")],                     # 0 tokens → dropped
            "doc_id long, text string")

    def test_offsets_by_hand_single_shard(self, spark):
        from gaia_spark.functions.packing import pack_assignments
        got = _rows(pack_assignments(self._hand_df(spark), 10,
                                     n_buckets=1))
        assert 4 not in got                        # empty doc dropped
        assert got[1]["start_tok"] == 0 and got[1]["n_tokens"] == 3
        assert got[2]["start_tok"] == 3 and got[2]["n_tokens"] == 7
        # doc 3 starts exactly at the pack boundary and fills 10..21
        assert got[3]["start_tok"] == 10
        assert (got[3]["first_pack"], got[3]["last_pack"]) == (1, 2)
        assert got[3]["n_packs"] == 2
        assert got[1]["n_packs"] == got[2]["n_packs"] == 1

    def test_partition_and_bucket_invariance(self, spark):
        from gaia_spark.functions.packing import pack_assignments
        df = spark.range(200).selectExpr(
            "id AS doc_id",
            "concat('w ', repeat('tok ', CAST(id % 17 AS INT))) AS text")
        a = sorted(map(tuple, pack_assignments(df, 64,
                                               n_buckets=4).collect()))
        b = sorted(map(tuple, pack_assignments(
            df.repartition(7), 64, n_buckets=4).collect()))
        assert a == b and len(a) == 200

    def test_matches_duckdb(self, spark):
        import duckdb
        from gaia_spark.functions.packing import (pack_assignments,
                                                  sql_pack_assignments)
        rows = [(i, f"doc {i} " + "alpha beta " * (i % 9))
                for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE docs AS SELECT * FROM (VALUES "
            + ",".join(f"({i}, '{t}')" for i, t in rows)
            + ") v(doc_id, text)")
        want = {tuple(r) for r in con.execute(
            sql_pack_assignments("docs", 32, n_buckets=4)).fetchall()}
        got = {tuple(r)
               for r in pack_assignments(df, 32, n_buckets=4).collect()}
        assert got == want
