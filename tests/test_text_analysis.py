"""Text-analysis suite: token counts, quality, lang-ID, fingerprints."""

import pytest
from pyspark.sql import functions as F

from gaia_spark.functions import text_analysis as ta

ROWS = [
    (0, "The quick brown fox, and the lazy dog!"),
    (1, "der hund und die katze das ist nicht ein test mit worten"),
    (2, "el gato es una historia que los perros las aman por para"),
    (3, "xyzzy qwfp zzz"),                       # no markers → und
    (4, "a" * 200),                               # one giant token
    (5, ""),                                      # empty text
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_token_counts(spark, docs):
    r = {x.doc_id: x for x in ta.with_text_stats(docs).collect()}
    # "The quick brown fox, and the lazy dog!" → 8 words + ',' + '!'
    assert r[0].n_tokens == 10
    assert r[0].n_ws_tokens == 8
    assert r[0].n_punct == 2
    assert r[4].n_ws_tokens == 1 and r[4].n_tokens == 1
    assert r[5].n_tokens == 0 and r[5].n_chars == 0


def test_quality_gate(spark, docs):
    r = {x.doc_id: x for x in ta.with_quality(docs).collect()}
    assert not r[0].quality_ok           # only 8 tokens (<10)
    assert r[1].quality_ok               # 11 tokens, low punct
    assert not r[5].quality_ok
    # floor-integerized ratios are ints and bounded
    assert 0 <= r[1].stop_ratio_x10k <= 10000


def test_lang_id(spark, docs):
    r = {x.doc_id: x.lang for x in docs.select(
        "doc_id", ta.lang_id_col(F.col("text")).alias("lang")).collect()}
    assert r[0] == "en"
    assert r[1] == "de"
    assert r[2] == "es"
    assert r[3] == "und"
    assert r[5] == "und"


def test_fingerprint_normalizes_ws_and_case(spark):
    df = spark.createDataFrame(
        [(0, "Hello  World"), (1, " hello world "), (2, "hello worlds")],
        "doc_id long, text string")
    r = {x.doc_id: x.fp for x in df.select(
        "doc_id", ta.fingerprint_col(F.col("text")).alias("fp")).collect()}
    assert r[0] == r[1]
    assert r[0] != r[2]


def test_spark_matches_duckdb_sql_generators(spark, docs):
    """The *_sql generators must mirror the Spark builders exactly —
    this is the same pairing the driver gate relies on."""
    import duckdb
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = con.execute(f"""
        WITH stats AS (
          SELECT doc_id, text, {ta.sql_stats_select('text')} FROM documents
        )
        SELECT doc_id, n_tokens, {ta.sql_lang_id('text')} AS lang_pred,
               {ta.sql_fingerprint('text')} AS fingerprint
        FROM stats ORDER BY doc_id
    """).fetchall()
    got = (ta.with_text_stats(docs)
           .select("doc_id", "n_tokens",
                   ta.lang_id_col(F.col("text")).alias("lang_pred"),
                   ta.fingerprint_col(F.col("text")).alias("fingerprint"))
           .orderBy("doc_id").collect())
    assert [tuple(r) for r in got] == [tuple(r) for r in oracle]
