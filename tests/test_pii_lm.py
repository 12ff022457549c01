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
