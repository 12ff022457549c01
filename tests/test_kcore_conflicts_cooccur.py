"""Late-r3 operators: k-core peel, functional-predicate conflict
audit, token co-occurrence lift — hand-pinned small cases (twin pairs
that agree-but-wrong can't pass) plus Spark-vs-DuckDB equality on the
sf0.001 corpus via the driver's own oracle_sql entries.
"""

from __future__ import annotations

import duckdb
import pytest

from gaia_spark.functions.text_analysis import cooccur_lift
from gaia_spark.operators.cleankb import (
    functional_violations,
    predicate_profile,
)
from gaia_spark.operators.graph import kcore, transitive_closure

SF_DIR = "/root/testdata/sf0.001"


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


class TestKCore:
    def test_triangle_plus_pendant(self, spark):
        # a-b-c triangle with pendant d: 2-core = triangle, all deg 2
        got = {r["node"]: r["core_degree"] for r in kcore(
            _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"),
                           ("a", "d")]), k=2).collect()}
        assert got == {"a": 2, "b": 2, "c": 2}

    def test_chain_peels_to_empty(self, spark):
        assert kcore(_edges(spark, [("a", "b"), ("b", "c")]),
                     k=2).count() == 0

    def test_two_cores_joined_by_bridge(self, spark):
        # two triangles joined by a bridge edge: bridge endpoints stay
        # (they sit in a triangle) but the bridge itself contributes
        # to their core degree
        tri1 = [("a", "b"), ("b", "c"), ("c", "a")]
        tri2 = [("x", "y"), ("y", "z"), ("z", "x")]
        got = {r["node"]: r["core_degree"] for r in kcore(
            _edges(spark, tri1 + tri2 + [("a", "x")]), k=2).collect()}
        assert got == {"a": 3, "b": 2, "c": 2, "x": 3, "y": 2, "z": 2}

    def test_raises_instead_of_partial_peel(self, spark):
        # a 12-node path peels 2 endpoints per round — still changing
        # at round 3, and a partial peel is a wrong answer
        path = [(f"n{i}", f"n{i + 1}") for i in range(11)]
        with pytest.raises(RuntimeError, match="still peeling"):
            kcore(_edges(spark, path), k=2, rounds=3)


class TestFunctionalViolations:
    def test_conflicts_only_and_sorted_objs(self, spark):
        triples = spark.createDataFrame(
            [("s1", "born_in", "paris"), ("s1", "born_in", "lyon"),
             ("s1", "born_in", "paris"),          # dup assertion: 1 obj
             ("s2", "born_in", "rome"),            # clean subject
             ("s1", "likes", "x"), ("s1", "likes", "y"),  # non-functional
             ("s3", "capital_of", "fr"), ("s3", "capital_of", "de")],
            "subj string, pred string, obj string")
        got = {(r["subj"], r["pred"]): (r["n_objs"], r["objs"])
               for r in functional_violations(
                   triples, ["born_in", "capital_of"]).collect()}
        assert got == {("s1", "born_in"): (2, "lyon|paris"),
                       ("s3", "capital_of"): (2, "de|fr")}


class TestCooccurLift:
    def test_exact_integer_lift(self, spark):
        # d1,d2: {a,b}; d3: {a,c} — df a=3 b=2 c=1, n_docs=3
        docs = spark.createDataFrame(
            [("d1", "a b"), ("d2", "b a"), ("d3", "a c")],
            "doc_id string, text string")
        got = {(r["tok1"], r["tok2"]):
               (r["n_pair"], r["df1"], r["df2"], r["lift_x10k"])
               for r in cooccur_lift(docs, top_v=10,
                                     min_pairs=1).collect()}
        # lift(a,b) = 1e4*2*3/(3*2) = 10000; lift(a,c) = 1e4*1*3/(3*1)
        assert got == {("a", "b"): (2, 3, 2, 10000),
                       ("a", "c"): (1, 3, 1, 10000)}

    def test_min_pairs_gate(self, spark):
        docs = spark.createDataFrame(
            [("d1", "a b"), ("d2", "b a"), ("d3", "a c")],
            "doc_id string, text string")
        got = cooccur_lift(docs, top_v=10, min_pairs=2).collect()
        assert [(r["tok1"], r["tok2"]) for r in got] == [("a", "b")]


@pytest.mark.parametrize(
    "name", ["graph_kcore", "kg_conflicts", "text_cooccur"])
def test_cross_engine_sf0001(spark, name):
    import __spark_entry__ as entry

    got = entry.queries()[name](spark, SF_DIR)
    con = duckdb.connect()
    for t in ("lineitem", "orders", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    want = con.sql(entry.oracle_sql()[name])
    g = sorted(tuple(map(str, r)) for r in got.collect())
    w = sorted(tuple(map(str, r)) for r in want.fetchall())
    assert g == w
    assert len(g) > 0  # each audit must actually bite on the corpus


class TestTransitiveClosure:
    def test_chain_all_pairs(self, spark):
        # a→b→c→d: closure = all 6 ordered ancestor pairs
        got = {(r["src"], r["dst"]) for r in transitive_closure(
            _edges(spark, [("a", "b"), ("b", "c"),
                           ("c", "d")])).collect()}
        assert got == {("a", "b"), ("a", "c"), ("a", "d"),
                       ("b", "c"), ("b", "d"), ("c", "d")}

    def test_diamond_dedups_paths(self, spark):
        # a→b→d and a→c→d: (a,d) reachable twice, appears once
        got = sorted((r["src"], r["dst"]) for r in transitive_closure(
            _edges(spark, [("a", "b"), ("a", "c"), ("b", "d"),
                           ("c", "d")])).collect())
        assert got == [("a", "b"), ("a", "c"), ("a", "d"),
                       ("b", "d"), ("c", "d")]

    def test_doubling_depth(self, spark):
        # depth-8 chain closes within 3 doublings (2^3 = 8) …
        chain = [(f"n{i}", f"n{i + 1}") for i in range(8)]
        assert transitive_closure(
            _edges(spark, chain), max_doublings=4).count() == 9 * 8 // 2

    def test_raises_on_partial(self, spark):
        # … but NOT within 1 (depth 2 < 8): raise, never under-report
        chain = [(f"n{i}", f"n{i + 1}") for i in range(8)]
        with pytest.raises(RuntimeError, match="still growing"):
            transitive_closure(_edges(spark, chain), max_doublings=1)


class TestPredicateProfile:
    def test_functional_vs_multivalued(self, spark):
        triples = spark.createDataFrame(
            [("s1", "born_in", "paris"), ("s2", "born_in", "rome"),
             ("s3", "born_in", "rome"),
             ("s1", "likes", "x"), ("s1", "likes", "y"),
             ("s1", "likes", "x"),        # dup assertion, same obj
             ("s2", "likes", "x")],
            "subj string, pred string, obj string")
        got = {r["pred"]: r.asDict() for r in
               predicate_profile(triples).collect()}
        b = got["born_in"]
        assert (b["n_triples"], b["n_subjs"], b["n_objs"],
                b["max_objs_per_subj"], b["n_multi_subjs"],
                b["functional_frac_x10k"]) == (3, 3, 2, 1, 0, 10000)
        lk = got["likes"]
        assert (lk["n_triples"], lk["n_subjs"], lk["n_objs"],
                lk["max_objs_per_subj"], lk["n_multi_subjs"],
                lk["functional_frac_x10k"]) == (4, 2, 2, 2, 1, 5000)


@pytest.mark.parametrize("name", ["kg_type_closure", "kg_pred_profile"])
def test_cross_engine_sf0001_closure_profile(spark, name):
    import __spark_entry__ as entry

    got = entry.queries()[name](spark, SF_DIR)
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    want = con.sql(entry.oracle_sql()[name])
    g = sorted(tuple(map(str, r)) for r in got.collect())
    w = sorted(tuple(map(str, r)) for r in want.fetchall())
    assert g == w and len(g) > 0
