"""rrf_fuse (functions/retrieval.py) and sameas_rewrite
(operators/canonicalize.py)."""

from pyspark.sql import functions as F

from gaia_spark.functions.retrieval import RRF_K, RRF_SCALE, rrf_fuse
from gaia_spark.operators.canonicalize import sameas_rewrite


def _ranking(spark, ids):
    return spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(ids)],
        "doc_id long, rank int")


def test_rrf_hand_computed(spark):
    """Lists [1,2,3] and [3,2,4]: doc 3 gets 1/(60+3)+1/(60+1) —
    presence in both lists beats a single first place iff the math
    says so, in exact integer parts."""
    a = _ranking(spark, [1, 2, 3])
    b = _ranking(spark, [3, 2, 4])
    got = {r.doc_id: (r.rrf_x1e6, r.rank)
           for r in rrf_fuse([a, b], k=10).collect()}
    part = lambda r: RRF_SCALE // (RRF_K + r)  # noqa: E731
    assert got[3][0] == part(3) + part(1)
    assert got[2][0] == part(2) + part(2)
    assert got[1][0] == part(1)
    assert got[4][0] == part(3)
    # both-list docs outrank single-list docs here
    assert got[3][1] == 1 and got[2][1] == 2
    assert got[1][1] == 3 and got[4][1] == 4


def test_rrf_k_cuts(spark):
    a = _ranking(spark, list(range(30)))
    out = rrf_fuse([a], k=5).collect()
    assert len(out) == 5
    assert [r.doc_id for r in sorted(out, key=lambda r: r.rank)] == \
        [0, 1, 2, 3, 4]


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string")


def test_sameas_transitive_rewrite_and_dedup(spark):
    """a#b, b#c → everything lands on 'a'; the two distinct source
    triples collapse to one."""
    t = _triples(spark, [("b", "p", "x"), ("c", "p", "x"),
                         ("x", "q", "c")])
    pairs = _triples(spark, [("a", "sameAs", "b"),
                             ("b", "sameAs", "c")]) \
        .select("subj", "obj")
    got = {(r.subj, r.pred, r.obj)
           for r in sameas_rewrite(t, pairs).collect()}
    assert got == {("a", "p", "x"), ("x", "q", "a")}


def test_sameas_untouched_entities_pass_through(spark):
    t = _triples(spark, [("solo", "p", "alone")])
    pairs = _triples(spark, [("a", "s", "b")]).select("subj", "obj")
    got = sameas_rewrite(t, pairs).collect()
    assert [(r.subj, r.pred, r.obj) for r in got] == \
        [("solo", "p", "alone")]


def test_sameas_canonical_is_lexicographic_min(spark):
    t = _triples(spark, [("zz", "p", "v")])
    pairs = _triples(spark, [("zz", "s", "mm"), ("mm", "s", "aa")]) \
        .select("subj", "obj")
    got = sameas_rewrite(t, pairs).collect()
    assert got[0].subj == "aa"
