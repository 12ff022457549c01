"""Negative sampling (functions/negsample.py): DuckDB twin, pure
Python reference, collision fixup, partitioning invariance."""

import hashlib

import duckdb
import pandas as pd

from gaia_spark.functions.negsample import (negative_samples,
                                            sql_negative_samples)

TRIPLES = [("o1", "by", "c1"), ("o1", "has", "p1"), ("o2", "by", "c2"),
           ("o2", "has", "p1"), ("o3", "by", "c1"), ("o3", "has", "p3"),
           ("o4", "by", "c2"), ("o4", "has", "p1")]


def _df(spark):
    return spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string")


def _py_ref(triples, n_neg):
    ents = sorted({s for s, _, _ in triples} | {o for _, _, o in triples},
                  key=lambda e: (hashlib.md5(e.encode()).hexdigest(), e))
    n = len(ents)
    out = []
    for s, p, o in triples:
        for i in range(n_neg):
            idx = int(hashlib.md5(f"{s}#{p}#{o}#{i}".encode())
                      .hexdigest()[:8], 16) % n
            neg = ents[idx] if ents[idx] != o else ents[(idx + 1) % n]
            out.append((s, p, o, i, neg))
    return sorted(out)


def test_negsample_matches_duckdb_twin(spark):
    a = negative_samples(_df(spark), 2).toPandas()
    a = a.sort_values(list(a.columns)).reset_index(drop=True)
    con = duckdb.connect()
    con.register("trips", pd.DataFrame(TRIPLES,
                                       columns=["subj", "pred", "obj"]))
    b = con.execute(sql_negative_samples("SELECT * FROM trips", 2)).df()
    b = b.sort_values(list(b.columns)).reset_index(drop=True)
    assert a.astype(str).equals(b.astype(str))


def test_negsample_matches_python_reference(spark):
    got = sorted(tuple(r) for r in
                 negative_samples(_df(spark), 3).collect())
    assert got == _py_ref(TRIPLES, 3)


def test_negsample_never_self_corrupts(spark):
    """The step-on-collision fixup guarantees neg_obj != obj even in
    a tiny vocabulary where most draws collide."""
    tiny = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "a")],
        "subj string, pred string, obj string")
    rows = negative_samples(tiny, 4).collect()
    assert len(rows) == 8
    assert all(r.neg_obj != r.obj for r in rows)


def test_negsample_row_count_and_draw_ids(spark):
    rows = negative_samples(_df(spark), 2).collect()
    assert len(rows) == len(TRIPLES) * 2
    per_triple = {}
    for r in rows:
        per_triple.setdefault((r.subj, r.pred, r.obj), set()).add(r.neg_i)
    assert all(v == {0, 1} for v in per_triple.values())


def test_negsample_partitioning_invariance(spark):
    df = _df(spark)
    a = sorted(map(tuple, negative_samples(df.coalesce(1), 2).collect()))
    b = sorted(map(tuple,
                   negative_samples(df.repartition(5), 2).collect()))
    assert a == b
