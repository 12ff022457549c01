"""Round-3 operators: outlink/link-graph extraction, per-domain caps,
DSIR importance scores.

Hand-computed pins first (agreeing-but-wrong twin pairs can't pass),
then a direct Spark-vs-DuckDB equality check per operator on the real
sf0.001 corpus.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from gaia_spark.functions.importance import (
    N_BUCKETS,
    dsir_scores,
    sql_dsir_scores,
)
from gaia_spark.functions.sampling import domain_cap, sql_domain_cap
from gaia_spark.functions.text_analysis import SCALE
from gaia_spark.functions.web import (
    extract_outlinks,
    host_link_graph,
    sql_host_link_graph,
    sql_synth_html,
    sql_synth_url,
    synth_html,
    synth_url,
    with_url_parts,
)

SF_DIR = "/root/testdata/sf0.001"


class TestLinkGraph:
    def test_edges_and_self_link_drop(self, spark):
        df = spark.createDataFrame(
            [
                ("a.com",
                 '<a href="https://b.org/x">1</a>'
                 '<a href="http://a.com/self">2</a>'
                 '<a href="https://C.net">3</a> no <b>link</b>'),
                ("b.org", 'plain text, relative <a href="/rel">r</a>'),
            ],
            "host string, html string")
        got = sorted(tuple(r) for r in extract_outlinks(df).collect())
        # self-link dropped, relative href not matched, host lowercased
        assert got == [("a.com", "b.org"), ("a.com", "c.net")]

    def test_weights(self, spark):
        df = spark.createDataFrame(
            [("a.com", "b.org"), ("a.com", "b.org"), ("a.com", "c.net")],
            "src_host string, dst_host string")
        got = {(r["src_host"], r["dst_host"]): r["weight"]
               for r in host_link_graph(df).collect()}
        assert got == {("a.com", "b.org"): 2, ("a.com", "c.net"): 1}


def _gate_expected(rows, quota, den=10_000):
    """Replicate the shared oversample-gate + md5-rank contract."""
    by_stratum = {}
    for stratum, key in rows:
        by_stratum.setdefault(stratum, []).append(key)
    out = {}
    for stratum, keys in by_stratum.items():
        rate = min(den, (4 * quota * den) // len(keys) + 1)
        hs = {k: hashlib.md5(f"{stratum}:{k}".encode()).hexdigest()
              for k in keys}
        surv = [k for k in keys if int(hs[k][:8], 16) % den < rate]
        out[stratum] = sorted(surv, key=lambda k: (hs[k], k))[:quota]
    return out


class TestDomainCap:
    def test_cap_binds_per_host(self, spark):
        rows = [(i, f"h{i % 3}.com") for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, host string")
        got = {}
        for r in domain_cap(df, cap=4).collect():
            got.setdefault(r["domain"], []).append((r["rk"], r["key"]))
        want = _gate_expected([(h, i) for i, h in rows], quota=4)
        assert set(got) == set(want)
        for dom, sample in got.items():
            assert [k for _, k in sorted(sample)] == want[dom]

    def test_small_domain_passes_whole(self, spark):
        df = spark.createDataFrame(
            [(1, "solo.com"), (2, "solo.com")], "doc_id long, host string")
        got = domain_cap(df, cap=10).collect()
        assert sorted(r["key"] for r in got) == [1, 2]


def _py_bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % N_BUCKETS


class TestDsir:
    def test_hand_scores(self, spark):
        rows = [(1, "good good stuff", "en"),
                (2, "mauvais truc", "fr"),
                (3, "good truc", "fr"),
                (4, "", "en")]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        got = {r["doc_id"]: r.asDict()
               for r in dsir_scores(df, F.col("lang") == "en").collect()}
        # replicate: bucket hists over occurrences, floored llr, sum
        h_t, h_r = {}, {}
        for _, text, lang in rows:
            for tok in text.split():
                b = _py_bucket(tok)
                h_r[b] = h_r.get(b, 0) + 1
                if lang == "en":
                    h_t[b] = h_t.get(b, 0) + 1
        n_t, n_r = sum(h_t.values()), sum(h_r.values())
        llr = {b: math.floor(SCALE * (
            math.log((h_t.get(b, 0) + 1.0) / (n_t + N_BUCKETS))
            - math.log((h_r[b] + 1.0) / (n_r + N_BUCKETS))))
            for b in h_r}
        for doc_id, text, _ in rows:
            toks = text.split()
            assert got[doc_id]["n_toks"] == len(toks)
            assert got[doc_id]["dsir_x10k"] == sum(
                llr[_py_bucket(t)] for t in toks)
        # target-only token ("stuff") must score higher than
        # raw-only ("mauvais")
        assert llr[_py_bucket("stuff")] > llr[_py_bucket("mauvais")]

    def test_empty_doc_scores_zero(self, spark):
        df = spark.createDataFrame(
            [(1, "a b", "en"), (2, "", "fr")],
            "doc_id long, text string, lang string")
        got = {r["doc_id"]: r["dsir_x10k"]
               for r in dsir_scores(df, F.col("lang") == "en").collect()}
        assert got[2] == 0


@pytest.mark.parametrize("name", ["linkgraph", "domcap", "dsir"])
def test_cross_engine_sf0001(spark, name):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')")
    if name == "linkgraph":
        d = docs.withColumn(
            "url", synth_url(F.col("doc_id"), F.col("source"))
        ).withColumn(
            "html", synth_html(F.col("doc_id"), F.col("source"),
                               F.col("text")))
        got = host_link_graph(extract_outlinks(with_url_parts(d)))
        want = con.sql(sql_host_link_graph(
            f"SELECT {sql_synth_url()} AS url, "
            f"{sql_synth_html()} AS html FROM documents"))
    elif name == "domcap":
        d = with_url_parts(docs.withColumn(
            "url", synth_url(F.col("doc_id"), F.col("source"))))
        got = domain_cap(d, cap=2)
        want = con.sql(sql_domain_cap(
            f"(SELECT doc_id, lower(regexp_extract("
            f"{sql_synth_url()}, '^[a-z]+://([^/?#]+)', 1)) AS host "
            f"FROM documents)", cap=2))
    else:
        got = dsir_scores(docs, F.col("lang") == "en")
        want = con.sql(sql_dsir_scores("documents", "lang = 'en'"))
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.fetchall())
    assert g == w
