"""Batch-perceptron quality classifier (functions/classifier.py).

Pins: training dynamics match an independent pure-Python batch
perceptron, the unrolled-CTE DuckDB twin hash-matches, partitioning
invariance, and the learner actually separates a separable corpus.
"""

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from gaia_spark.functions import classifier as cls


def _py_features(text: str, lang: str):
    t = text.lower()
    padded = f" {t} "
    y = 1 if lang == "en" else 0

    def count(hay, sub):
        return (len(hay) - len(hay.replace(sub, ""))) // len(sub)

    words = [w for w in re.split("[^a-z]+", t) if w]
    return (
        y, 1, len(t), len(words),
        sum(count(padded, f" {s} ") for s in cls._STOP),
        sum(count(t, v) for v in cls._VOWELS),
    )


def _py_train(rows, rounds):
    w = [0] * 5
    for _ in range(rounds):
        d = [0] * 5
        for y, *x in rows:
            pred = 1 if sum(wj * xj for wj, xj in zip(w, x)) > 0 else 0
            for j in range(5):
                d[j] += (y - pred) * x[j]
        w = [wj + dj for wj, dj in zip(w, d)]
    return w


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat and the dog is of the house to see", "en"),
        (1, "xxqj zzkw qqrr ppff ttgg", "xx"),
        (2, "this is the best of all the things and more", "en"),
        (3, "bzzt krrk vvvv wwww zzzz qqqq", "xx"),
        (4, "to be and not to be is the question of it", "en"),
        (5, "grmbl fnord xyzzy plugh", "xx"),
        (6, "a e i o u the and is of to", "en"),
        (7, "qwrtypsdfghjklzxcvbnm", "xx"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_matches_pure_python_reference(spark, docs):
    raw = [(r.text, r.lang) for r in docs.orderBy("doc_id").collect()]
    feats = [_py_features(t, lg) for t, lg in raw]
    w = _py_train(feats, rounds=3)

    got = {r.doc_id: (r.margin, r.pred, r.label)
           for r in cls.perceptron_scores(docs, rounds=3).collect()}
    for i, (y, *x) in enumerate(feats):
        m = sum(wj * xj for wj, xj in zip(w, x))
        assert got[i] == (m, 1 if m > 0 else 0, y)


def test_matches_duckdb_twin(spark, docs):
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    oracle = sorted(
        con.execute(cls.sql_perceptron_scores("documents", 3)).fetchall())
    got = sorted(tuple(r)
                 for r in cls.perceptron_scores(docs, rounds=3).collect())
    assert got == [tuple(r) for r in oracle]


def test_partitioning_invariance(spark, docs):
    a = sorted(tuple(r) for r in cls.perceptron_scores(
        docs.coalesce(1), rounds=4).collect())
    b = sorted(tuple(r) for r in cls.perceptron_scores(
        docs.repartition(7), rounds=4).collect())
    assert a == b


def test_learns_separable_corpus(spark):
    """On a linearly separable corpus (stopword-rich en vs consonant
    noise) the trained gate should classify most docs correctly."""
    rows = []
    for i in range(30):
        rows.append((i, "the cat is of the mat and the dog to go", "en"))
        rows.append((100 + i, "zzkw qqrr ppff ttgg bzzt krrk", "xx"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string")
    out = cls.perceptron_scores(docs, rounds=5).collect()
    acc = sum(1 for r in out if r.pred == r.label) / len(out)
    assert acc >= 0.9
