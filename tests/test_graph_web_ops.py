"""Graph health metrics (degrees, triangles) + web curation filters
(domain blocklist, boilerplate stripping) — round 3.

Hand-computed pins on graphs/pages small enough to count by eye
(agreeing-but-wrong twin pairs can't pass), then Spark-vs-DuckDB
equality on the real sf0.001 corpus via the driver's own oracle_sql
entries.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from gaia_spark.functions.web import (
    anchor_stats,
    blocklist_filter,
    host_suffixes,
    strip_boilerplate,
)
from gaia_spark.operators.graph import degree_histogram, triangle_count

SF_DIR = "/root/testdata/sf0.001"


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


class TestDegreeHistogram:
    def test_triangle_plus_pendant(self, spark):
        # a-b-c triangle, d pendant off a: degrees a=3, b=c=2, d=1
        got = {r["degree"]: r["n_nodes"] for r in degree_histogram(
            _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"),
                           ("a", "d")])).collect()}
        assert got == {3: 1, 2: 2, 1: 1}

    def test_direction_multiplicity_selfloop_ignored(self, spark):
        got = {r["degree"]: r["n_nodes"] for r in degree_histogram(
            _edges(spark, [("a", "b"), ("b", "a"), ("a", "b"),
                           ("a", "a")])).collect()}
        assert got == {1: 2}


K4 = [("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("c", "d")]


class TestTriangleCount:
    def test_k4(self, spark):
        row = triangle_count(_edges(spark, K4)).collect()[0]
        assert (row["n_nodes"], row["n_edges"], row["n_wedges"],
                row["n_triangles"]) == (4, 6, 12, 4)

    def test_chain_has_none(self, spark):
        row = triangle_count(
            _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        ).collect()[0]
        assert row["n_triangles"] == 0 and row["n_wedges"] == 2

    def test_noise_edges_dont_change_count(self, spark):
        # reversed duplicates + self-loop on top of K4
        row = triangle_count(_edges(
            spark, K4 + [("b", "a"), ("d", "c"), ("a", "a")]
        )).collect()[0]
        assert row["n_triangles"] == 4 and row["n_edges"] == 6


class TestBlocklist:
    def test_suffix_expansion(self, spark):
        got = spark.createDataFrame(
            [("a.b.example.com",)], "host string"
        ).select(host_suffixes(F.col("host")).alias("s")).collect()[0]["s"]
        assert got == ["a.b.example.com", "b.example.com",
                       "example.com", "com"]

    def test_subdomain_blocked_lookalike_kept(self, spark):
        d = spark.createDataFrame(
            [(1, "www.a.example.net"), (2, "notexample.net"),
             (3, "example.net"), (4, "safe.example.com")],
            "doc_id long, host string")
        blocked = spark.createDataFrame(
            [("example.net",)], "pattern string")
        kept = sorted(r["doc_id"] for r in
                      blocklist_filter(d, blocked).collect())
        assert kept == [2, 4]


class TestBoilerplate:
    def test_rule_pins(self, spark):
        page = "\n".join([
            "Home | About | Contact | Login",
            "this is a genuine content line of the document body",
            "tiny",
            "Privacy Policy | Terms of Use",
        ])
        row = spark.createDataFrame([(page,)], "page string").select(
            strip_boilerplate(F.col("page")).alias("s")
        ).collect()[0]["s"]
        assert row["content"] == (
            "this is a genuine content line of the document body")
        assert row["n_lines"] == 4 and row["n_kept"] == 1


class TestAnchorStats:
    def test_census_and_top_anchor(self, spark):
        pages = spark.createDataFrame(
            [('x <a href="https://t.com/a">Alpha</a> '
              '<a href="https://t.com/b">Beta</a>',),
             ('<a href="https://t.com/c">Beta</a>',),
             ('<a href="https://u.org/">Gamma</a> no-href text',),
             ("no links at all",)],
            "html string")
        got = {r["dst_host"]: (r["n_inlinks"], r["n_anchors"],
                               r["top_anchor"])
               for r in anchor_stats(pages).collect()}
        # t.com: Beta twice beats Alpha once; u.org: single anchor
        assert got == {"t.com": (3, 2, "Beta"),
                       "u.org": (1, 1, "Gamma")}

    def test_count_tie_breaks_lexicographically_max(self, spark):
        pages = spark.createDataFrame(
            [('<a href="https://t.com/1">aa</a>',),
             ('<a href="https://t.com/2">zz</a>',)],
            "html string")
        row = anchor_stats(pages).collect()[0]
        assert (row["n_inlinks"], row["top_anchor"]) == (2, "zz")


@pytest.mark.parametrize(
    "name", ["graph_degrees", "graph_triangles", "web_blocklist",
             "text_boilerplate", "web_anchor_text"])
def test_cross_engine_sf0001(spark, name):
    import __spark_entry__ as entry

    got = entry.queries()[name](spark, SF_DIR)
    con = duckdb.connect()
    for t in ("lineitem", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    want = con.sql(entry.oracle_sql()[name])
    g = sorted(tuple(map(str, r)) for r in got.collect())
    w = sorted(tuple(map(str, r)) for r in want.fetchall())
    assert g == w
    if name == "web_blocklist":  # the filter must actually bite
        n_all = con.sql("SELECT count(*) FROM documents").fetchone()[0]
        assert 0 < len(g) < n_all
    if name == "graph_triangles":
        assert int(dict(zip(
            [f.name for f in got.schema], g[0]))["n_triangles"]) > 0
    if name == "web_anchor_text":  # text-derived anchors, not constants
        anchors = {r[-1] for r in w}
        assert len(anchors) > 10


def test_robots_longest_match_and_tie(spark):
    from gaia_spark.functions.web import robots_rules, robots_verdicts
    urls = spark.createDataFrame(
        [("u1", "h1", "/p/3/item-7"),   # allow carve-out beats /p/3
         ("u2", "h1", "/p/3/other"),    # only Disallow /p/3 matches
         ("u3", "h1", "/q/9"),          # no rule -> default allow
         ("u4", "h1", "/tie"),          # equal-length Allow vs Disallow
         ("u5", "h2", "/p/3")],         # other host: no rules at all
        "url string, host string, path string")
    robots = spark.createDataFrame(
        [("h1", "User-agent: *\n"
                "Disallow: /p/3\n"
                "Allow: /p/3/item-\n"
                "Disallow: /tie\n"
                "Allow: /tie\n"
                "Disallow:\n"          # empty prefix line ignored
                "# comment\n")],
        "host string, robots_txt string")
    rules = {(r["allow"], r["prefix"])
             for r in robots_rules(robots).collect()}
    assert rules == {(0, "/p/3"), (1, "/p/3/item-"),
                     (0, "/tie"), (1, "/tie")}
    got = {r["url"]: (r["blocked"], r["rule"])
           for r in robots_verdicts(urls, robots).collect()}
    assert got["u1"] == (False, "/p/3/item-")   # longest match wins
    assert got["u2"] == (True, "/p/3")
    assert got["u3"] == (False, None)
    assert got["u4"] == (False, "/tie")         # tie -> allow
    assert got["u5"] == (False, None)


def test_robots_matches_duckdb(spark):
    import duckdb
    from gaia_spark.functions import web
    from pyspark.sql import functions as F
    d = web.with_url_parts(
        spark.createDataFrame(
            [(i, f"s{i % 5}") for i in range(80)],
            "doc_id long, source string")
        .withColumn("url", web.synth_url(F.col("doc_id"),
                                         F.col("source"))))
    robots = (d.select("host").distinct()
              .withColumn("robots_txt",
                          web.synth_robots(F.col("host"))))
    got = {r["url"]: (r["blocked"], r["rule"])
           for r in web.robots_verdicts(d, robots).collect()}
    con = duckdb.connect()
    urls_rel = (f"(SELECT url, {web.sql_url_parts_select()} FROM "
                f"(SELECT {web.sql_synth_url()} AS url, doc_id, source"
                f" FROM t))")
    robots_rel = (f"(SELECT host, {web.sql_synth_robots('host')} AS "
                  f"robots_txt FROM (SELECT DISTINCT lower("
                  f"regexp_extract({web.sql_synth_url()},"
                  f" '^[a-z]+://([^/?#]+)', 1)) AS host FROM t))")
    con.execute("CREATE TABLE t(doc_id BIGINT, source VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, f"s{i % 5}") for i in range(80)])
    want = {r[0]: (r[2], r[3])
            for r in con.sql(
                web.sql_robots_verdicts(urls_rel, robots_rel)
            ).fetchall()}
    assert got == want
    assert any(b for b, _ in got.values())       # some blocked
    assert any(not b for b, _ in got.values())   # some allowed


def test_crawl_budget_exact_sum_and_ties(spark):
    from pyspark.sql import functions as F
    from gaia_spark.functions.web import crawl_budget
    # budget 7 over weights 3,3,3,1 (W=10): ideal shares 2.1/2.1/
    # 2.1/0.7 -> bases 2,2,2,0, one leftover seat -> d.com's
    # remainder (0.7) beats the three-way 0.1 tie
    rows = ([("a.com",)] * 3 + [("b.com",)] * 3 + [("c.com",)] * 3
            + [("d.com",)])
    df = spark.createDataFrame(rows, "registered_domain string")
    got = {r["domain"]: r["quota"]
           for r in crawl_budget(df, budget=7).collect()}
    assert got == {"a.com": 2, "b.com": 2, "c.com": 2, "d.com": 1}
    assert sum(got.values()) == 7
    # remainder TIE exercised: budget 5 over 1,1,1,1 (W=4): bases
    # 1,1,1,1, one leftover, four-way remainder tie (0.25 each) ->
    # pages tie -> lexical min domain wins the seat
    df3 = spark.createDataFrame(
        [("a.com",), ("b.com",), ("c.com",), ("d.com",)],
        "registered_domain string")
    got3 = {r["domain"]: r["quota"]
            for r in crawl_budget(df3, budget=5).collect()}
    assert got3 == {"a.com": 2, "b.com": 1, "c.com": 1, "d.com": 1}
    # exact-sum invariant on a skewed distribution
    rows2 = [(f"z{i % 13}.org",) for i in range(997)]
    df2 = spark.createDataFrame(rows2, "registered_domain string")
    out = crawl_budget(df2, budget=101)
    assert out.agg(F.sum("quota")).collect()[0][0] == 101


def test_rendezvous_minimal_movement(spark):
    from pyspark.sql import functions as F
    from gaia_spark.functions.web import rendezvous_shard
    shards = [f"node-{i:02d}" for i in range(8)]
    df = spark.createDataFrame(
        [(f"key-{i}",) for i in range(400)], "url string")
    full = {r["url"]: r["s"] for r in df.select(
        "url", rendezvous_shard(F.col("url"), shards).alias("s")
    ).collect()}
    dropped = shards[3]
    reduced = {r["url"]: r["s"] for r in df.select(
        "url", rendezvous_shard(
            F.col("url"), [s for s in shards if s != dropped]
        ).alias("s")).collect()}
    moved = {k for k in full if full[k] != reduced[k]}
    # ONLY the dropped shard's keys move — the defining property
    assert moved == {k for k, s in full.items() if s == dropped}
    assert len(moved) > 0
    # and the load is roughly uniform (md5 tournament): no shard
    # holds more than 3x its fair share at n=400, k=8
    from collections import Counter
    assert max(Counter(full.values()).values()) < 3 * 400 / 8
