"""Hash random-walks (operators/walks.py) and count-min sketch
(functions/sketch.py): pure-Python references, DuckDB twins,
partitioning invariance, and the CMS ≥-true-count guarantee.
"""

import hashlib
import re
from collections import Counter

import duckdb
import pytest

from gaia_spark.functions import sketch
from gaia_spark.operators import walks


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ------------------------------------------------------------------
# walks
# ------------------------------------------------------------------

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "a"),
    ("d", "a"), ("d", "e"),  # e is a dead end
    ("e", None),
]
EDGES = [e for e in EDGES if e[1] is not None]


def _py_walks(edges, walk_len, walks_per_node):
    adj: dict[str, list[str]] = {}
    for s, d in set(edges):
        adj.setdefault(s, []).append(d)
    rows = []
    for start in sorted(adj):
        for i in range(walks_per_node):
            wid, cur = f"{start}#{i}", start
            rows.append((wid, 0, cur))
            for t in range(1, walk_len + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = min(nbrs, key=lambda v: (_md5(f"{wid}:{t}:{v}"), v))
                rows.append((wid, t, cur))
    return sorted(rows)


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def test_walks_match_pure_python(spark, edges_df):
    got = sorted(tuple(r) for r in
                 walks.hash_walks(edges_df, 4, 2).collect())
    assert got == _py_walks(EDGES, 4, 2)
    # dead-end walk from d can stop early at e
    by_walk = Counter(w for w, _, _ in got)
    assert max(by_walk.values()) == 5  # walk_len+1 rows max


def test_walks_match_duckdb_twin(spark, edges_df):
    con = duckdb.connect()
    con.register("edges", edges_df.toPandas())
    oracle = sorted(con.execute(
        walks.sql_hash_walks("SELECT src, dst FROM edges", 4, 2)
    ).fetchall())
    got = sorted(tuple(r) for r in
                 walks.hash_walks(edges_df, 4, 2).collect())
    assert got == [tuple(r) for r in oracle]


def test_walks_partitioning_invariance(spark, edges_df):
    a = sorted(tuple(r) for r in
               walks.hash_walks(edges_df.coalesce(1), 3, 1).collect())
    b = sorted(tuple(r) for r in
               walks.hash_walks(edges_df.repartition(5), 3, 1).collect())
    assert a == b


# ------------------------------------------------------------------
# count-min sketch
# ------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat and the dog and the bird"),
        (1, "the quick brown fox; the lazy dog!"),
        (2, "cat cat cat dog dog bird"),
        (3, "alpha beta gamma delta epsilon zeta eta theta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_cms(texts, top_n):
    toks = [w for t in texts for w in re.split("[^a-z]+", t.lower()) if w]
    truth = Counter(toks)
    cells: Counter = Counter()
    for w, c in truth.items():
        for r in range(sketch.CMS_DEPTH):
            cells[(r, _md5(f"{w}#{r}")[:2])] += c
    top = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
    return sorted(
        (w, c, min(cells[(r, _md5(f"{w}#{r}")[:2])]
                   for r in range(sketch.CMS_DEPTH)))
        for w, c in top)


def test_cms_matches_pure_python(spark, docs):
    texts = [r.text for r in docs.collect()]
    got = sorted(tuple(r) for r in
                 sketch.cms_estimates(docs, top_n=10).collect())
    assert got == _py_cms(texts, 10)


def test_cms_matches_duckdb_twin(spark, docs):
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    oracle = sorted(con.execute(
        sketch.sql_cms_estimates("documents", 10)).fetchall())
    got = sorted(tuple(r) for r in
                 sketch.cms_estimates(docs, top_n=10).collect())
    assert got == [tuple(r) for r in oracle]


def test_cms_never_underestimates(spark):
    """The count-min guarantee on a corpus wide enough to collide."""
    def tok(n: int) -> str:
        return "w" + chr(97 + n // 26) + chr(97 + n % 26)

    rows = [(i, " ".join(tok((i * 7 + j) % 400) for j in range(30)))
            for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = sketch.cms_estimates(docs, top_n=50).collect()
    assert len(out) == 50
    assert all(r.cms_cnt >= r.true_cnt for r in out)
