"""dedup_triples (hash-split sparse dedup) — exactness vs the naive agg.

The optimization shuffles 8-byte xxhash64 keys instead of full triple
rows (canonicalize.py dedup_triples).  These tests pin the properties
the shortcut must NOT lose:

- duplicates split ACROSS partitions (recrawled urls) still collapse;
- conflicting ``lang`` among copies resolves to min(lang), independent
  of partitioning;
- the result equals the naive groupBy/dropDuplicates on adversarial
  inputs, with and without the lang column;
- the non-sparse fallback (forced via a tiny threshold monkeypatch is
  not needed: we instead feed >0 duplicated hashes through both code
  paths) returns the same rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gaia_spark.operators.canonicalize import (
    TRIPLE_COLS,
    dedup_triples,
)

COLS = TRIPLE_COLS + ["lang"]


def _rows():
    base = ("http://a/1", 0, "Q1", "rel:born_in", "Q2", "PER", "GPE", 0.9)
    other = ("http://b/9", 3, "Q7", "rel:works_for", "Q8", "PER", "ORG", 0.8)
    return [
        base + ("en",),
        base + ("ru",),          # recrawl copy, conflicting lang
        base + ("en",),          # identical copy
        other + ("de",),
        ("http://c/2", 1, "Q3", "evt:attack", "Q4", "GPE", "GPE", 0.7,
         "es"),
    ]


def _df(spark, nparts):
    # repartition WITHOUT a key: copies of the same triple land in
    # different partitions (round-robin), the adversarial layout for a
    # partition-local shortcut — dedup_triples must not rely on
    # doc-locality.
    return spark.createDataFrame(_rows(), COLS).repartition(nparts)


@pytest.mark.parametrize("nparts", [1, 5])
def test_matches_naive_with_lang(spark, nparts):
    df = _df(spark, nparts)
    got = dedup_triples(df, with_lang=True)
    want = df.groupBy(TRIPLE_COLS).agg(F.min("lang").alias("lang"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    # the conflicting-lang copy resolved to min('en','ru')
    langs = {r["url"]: r["lang"] for r in got.collect()}
    assert langs["http://a/1"] == "en"


@pytest.mark.parametrize("nparts", [1, 5])
def test_matches_naive_without_lang(spark, nparts):
    df = _df(spark, nparts).drop("lang")
    got = dedup_triples(df, with_lang=False)
    want = df.dropDuplicates(TRIPLE_COLS)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    assert got.count() == 3


def test_all_unique_passthrough(spark):
    rows = [(f"http://u/{i}", i, f"Q{i}", "rel:r", f"P{i}", "PER",
             "ORG", 0.5, "en") for i in range(50)]
    df = spark.createDataFrame(rows, COLS).repartition(4)
    got = dedup_triples(df, with_lang=True)
    assert got.count() == 50


def test_all_duplicated(spark):
    # every row duplicated: the "sparse" assumption is maximally wrong
    # but the answer must still be exact
    rows = []
    for i in range(40):
        # copy j of key k gets lang cycling en/ru/... -> every key sees
        # both langs, so min() must resolve every row to 'en'
        k, j = i % 8, i // 8
        rows.append((f"http://u/{k}", k, f"Q{k}", "rel:r",
                     f"P{k}", "PER", "ORG", 0.5, ["en", "ru"][j % 2]))
    df = spark.createDataFrame(rows, COLS).repartition(6)
    got = dedup_triples(df, with_lang=True)
    assert got.count() == 8
    assert {r["lang"] for r in got.collect()} == {"en"}


def test_graph_edges_matches_naive(spark):
    """graph_edges' sparse split must equal the naive full aggregate,
    including n_docs (HLL of a 1-element group is exact) and max(conf)
    on multi-provenance edges."""
    from gaia_spark.operators.canonicalize import graph_edges
    rows = [
        # edge A: 3 provenances, 2 distinct urls, confs 0.5/0.9/0.7
        ("u1", 0, "Q1", "r", "Q2", "PER", "GPE", 0.5, "en"),
        ("u2", 1, "Q1", "r", "Q2", "PER", "GPE", 0.9, "en"),
        ("u2", 2, "Q1", "r", "Q2", "PER", "GPE", 0.7, "en"),
        # edge B: single provenance
        ("u3", 0, "Q3", "r", "Q4", "PER", "ORG", 0.6, "de"),
    ]
    df = spark.createDataFrame(rows, COLS).repartition(3)
    got = {(r["subj"], r["pred"], r["obj"]):
           (r["conf"], r["n_provenances"], r["n_docs"])
           for r in graph_edges(df).collect()}
    want = {(r["subj"], r["pred"], r["obj"]):
            (r["conf"], r["n_provenances"], r["n_docs"])
            for r in df.groupBy("subj", "pred", "obj").agg(
                F.max("conf").alias("conf"),
                F.count(F.lit(1)).alias("n_provenances"),
                F.approx_count_distinct("url").alias("n_docs"),
            ).collect()}
    assert got == want
    assert got[("Q1", "r", "Q2")] == (0.9, 3, 2)
    assert got[("Q3", "r", "Q4")] == (0.6, 1, 1)


def test_passthrough_branch_has_no_row_exchange(spark):
    """Plan shape: unique rows must reach the output through broadcast
    joins only — the sole shuffle Exchange in the dedup plan is the
    colliding-slice aggregate (and it carries only duplicated rows)."""
    import io
    from contextlib import redirect_stdout
    rows = [(f"http://u/{i}", i, f"Q{i}", "rel:r", f"P{i}", "PER",
             "ORG", 0.5, "en") for i in range(30)]
    # parallelize directly to 3 partitions: a .repartition() would add
    # round-robin Exchanges of its own and mask what we're asserting
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 3), COLS)
    out = dedup_triples(df, with_lang=True)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain()  # simple mode: args inlined on the node line
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # hash-partitioned shuffle exchanges: exactly the one under the
    # dup-slice aggregate (the pass-through branch must have none)
    n_shuffles = sum(
        1 for line in plan.splitlines()
        if "Exchange hashpartitioning" in line)
    assert n_shuffles == 1, plan
