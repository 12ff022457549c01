"""PII scrub + unigram-LM fluency kernels (functions/pii.py, lm.py)."""

from pyspark.sql import functions as F

from gaia_spark.functions.lm import OOV_CB, SURPRISAL_CB, lm_score
from gaia_spark.functions.pii import pii_stats, redact_col


def _one(df):
    return df.collect()[0]


class TestPII:
    def test_counts_and_redaction_bytes(self, spark):
        df = spark.createDataFrame(
            [(1, "mail a.b+c@ex-1.co.uk or call +1 (555) 123-4567 "
                 "from 10.0.0.1 ok")],
            "doc_id long, text string")
        r = _one(pii_stats(df))
        assert (r.n_email, r.n_phone, r.n_ipv4, r.n_pii) == (1, 1, 1, 3)
        red = _one(df.select(redact_col(F.col("text")).alias("t"))).t
        assert red == "mail <EMAIL> or call <PHONE> from <IP> ok"

    def test_email_before_phone_ordering(self, spark):
        # digits inside a mailbox must not be eaten by the phone rule
        df = spark.createDataFrame(
            [(1, "user+15551234567@example.com")],
            "doc_id long, text string")
        r = _one(pii_stats(df))
        assert r.n_email == 1 and r.n_phone == 0

    def test_clean_text_zero(self, spark):
        df = spark.createDataFrame(
            [(1, "no personal data here, version 1.2 at 3pm")],
            "doc_id long, text string")
        r = _one(pii_stats(df))
        assert r.n_pii == 0
        red = _one(df.select(redact_col(F.col("text")).alias("t"))).t
        assert red == "no personal data here, version 1.2 at 3pm"


class TestLM:
    def test_known_surprisal_sum(self, spark):
        df = spark.createDataFrame(
            [(1, "the of zzz")], "doc_id long, text string")
        r = _one(lm_score(df))
        want = SURPRISAL_CB["the"] + SURPRISAL_CB["of"] + OOV_CB
        assert r.n_tokens == 3
        assert r.surprisal_cb == want
        assert r.mean_surprisal_cb == want // 3

    def test_empty_doc_scores_oov_ceiling(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, "   ")], "doc_id long, text string")
        rows = {r.doc_id: r for r in lm_score(df).collect()}
        for r in rows.values():
            assert r.n_tokens == 0 and r.mean_surprisal_cb == OOV_CB

    def test_fluent_beats_gibberish(self, spark):
        df = spark.createDataFrame(
            [(1, "the cat sat on the mat and it was good"),
             (2, "qxv zzkrw pllmn vvtx qqq jjj www xxx yyy zzz")],
            "doc_id long, text string")
        rows = {r.doc_id: r.mean_surprisal_cb
                for r in lm_score(df).collect()}
        assert rows[1] < rows[2] == OOV_CB


def test_bigram_discount_semantics(spark):
    from gaia_spark.functions.lm import (
        BIGRAM_DISCOUNT_CB, OOV_CB, SURPRISAL_CB, lm_score_bigram)
    rows = [
        (1, "the of"),          # both in vocab: uni(the) + (uni(of)-150)
        (2, "zzz the"),         # OOV context: OOV + full uni(the)
        (3, "the zzz"),         # OOV token after vocab: uni(the) + OOV
        (4, "the"),             # single token: uni only (no desc-seq bug)
        (5, ""),                # empty: 0 total, OOV mean
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["surprisal_cb"],
                         r["mean_surprisal_cb"])
           for r in lm_score_bigram(df).collect()}
    uni = SURPRISAL_CB
    assert got[1] == (2, uni["the"] + max(uni["of"] - BIGRAM_DISCOUNT_CB, 0),
                      got[1][1] // 2)
    assert got[2] == (2, OOV_CB + uni["the"], (OOV_CB + uni["the"]) // 2)
    assert got[3] == (2, uni["the"] + OOV_CB, (uni["the"] + OOV_CB) // 2)
    assert got[4] == (1, uni["the"], uni["the"])
    assert got[5] == (0, 0, OOV_CB)


def test_bigram_scores_fluent_below_shuffled(spark):
    from gaia_spark.functions.lm import lm_score_bigram
    # in-vocab running text earns the context discount everywhere;
    # the same words interleaved with OOV junk loses it
    fluent = "the of and to a in is it you that"
    junk = "the qqq of qqq and qqq to qqq a qqq"
    df = spark.createDataFrame(
        [(1, fluent), (2, junk)], "doc_id int, text string")
    got = {r["doc_id"]: r["mean_surprisal_cb"]
           for r in lm_score_bigram(df).collect()}
    assert got[1] < got[2]
