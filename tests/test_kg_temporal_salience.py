"""snapshot_asof (operators/merge.py), mention_salience
(operators/salience.py), distmult_scores (functions/kgembed.py):
hand-built fixtures pin the exact semantics the DuckDB twins lock
at corpus scale.
"""

import hashlib

from pyspark.sql import functions as F

from gaia_spark.functions.kgembed import (DIM, distmult_scores,
                                          embedding_vector)
from gaia_spark.operators.merge import snapshot_asof
from gaia_spark.operators.salience import mention_salience


def _versions(spark, rows):
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, valid_from string")
    return df.withColumn("valid_from",
                         F.col("valid_from").cast("timestamp"))


def test_snapshot_latest_version_wins(spark):
    v = _versions(spark, [
        ("e1", "p", "old", "2020-01-01 00:00:00"),
        ("e1", "p", "new", "2020-06-01 00:00:00"),
        ("e1", "p", "future", "2021-01-01 00:00:00"),
        ("e2", "p", "only", "2020-03-01 00:00:00"),
    ])
    got = {(r.subj, r.obj)
           for r in snapshot_asof(v, "2020-12-31 00:00:00").collect()}
    assert got == {("e1", "new"), ("e2", "only")}


def test_snapshot_key_absent_before_first_version(spark):
    v = _versions(spark, [("late", "p", "x", "2022-01-01 00:00:00")])
    assert snapshot_asof(v, "2021-12-31 00:00:00").count() == 0


def test_snapshot_boundary_inclusive_and_tiebreak(spark):
    """valid_from == ts is in effect; equal timestamps break by
    max(obj) — a pure function of the data."""
    v = _versions(spark, [
        ("e", "p", "alpha", "2020-05-05 00:00:00"),
        ("e", "p", "beta", "2020-05-05 00:00:00"),
    ])
    got = snapshot_asof(v, "2020-05-05 00:00:00").collect()
    assert len(got) == 1 and got[0].obj == "beta"


def test_salience_exact_schedule(spark):
    """doc 1: e1 at pos 1,2 and e2 at pos 3 → doc_len 3;
    e1: 10000*2//3 + 3000 = 9666; e2: 10000//3 + 2800 = 6133."""
    m = spark.createDataFrame(
        [(1, "e1", 1), (1, "e1", 2), (1, "e2", 3)],
        "doc_id bigint, entity string, pos int")
    got = {r.entity: (r.n_mentions, r.first_pos, r.doc_len,
                      r.salience_x10k)
           for r in mention_salience(m).collect()}
    assert got == {"e1": (2, 1, 3, 9666), "e2": (1, 3, 3, 6133)}


def test_salience_bonus_floors_at_zero(spark):
    """first_pos = 100 → 3000 − 100·99 < 0 must clamp to 0, not go
    negative."""
    m = spark.createDataFrame(
        [(1, "late", 100)] + [(1, "filler", p) for p in range(1, 100)],
        "doc_id bigint, entity string, pos int")
    got = {r.entity: r.salience_x10k
           for r in mention_salience(m).collect()}
    assert got["late"] == (10000 * 1) // 100 + 0


def _py_vec(name: str) -> list[int]:
    out = []
    for d in range(DIM):
        h = hashlib.md5(f"{name}:{d}".encode()).hexdigest()
        out.append(int(h[:8], 16) % 1001 - 500)
    return out


def test_embedding_vector_matches_pure_python(spark):
    got = (spark.range(1)
           .select(embedding_vector(F.lit("ent42")).alias("v"))
           .collect()[0].v)
    assert list(got) == _py_vec("ent42")


def test_distmult_score_matches_pure_python(spark):
    t = spark.createDataFrame(
        [("s1", "r1", "o1"), ("s1", "r2", "s1")],
        "subj string, pred string, obj string")
    got = {(r.subj, r.pred, r.obj): r.score
           for r in distmult_scores(t).collect()}
    for s, r, o in [("s1", "r1", "o1"), ("s1", "r2", "s1")]:
        want = sum(a * b * c for a, b, c in
                   zip(_py_vec(s), _py_vec(r), _py_vec(o)))
        assert got[(s, r, o)] == want


def test_distmult_duplicate_triples_keep_multiplicity(spark):
    """The dictionary joins must not collapse duplicate triples —
    each input row scores once."""
    t = spark.createDataFrame(
        [("a", "r", "b")] * 3, "subj string, pred string, obj string")
    rows = distmult_scores(t).collect()
    assert len(rows) == 3 and len({r.score for r in rows}) == 1
