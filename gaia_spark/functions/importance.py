"""DSIR-style importance weighting over hashed n-gram features.

Data Selection via Importance Resampling (Xie et al. 2023) scores raw
documents by how target-like their hashed unigram distribution is:
score(doc) = Σ_tokens log( p_target(bucket(tok)) / p_raw(bucket(tok)) )
with Laplace-smoothed bucket histograms.  A training-data pipeline
uses this constantly — "upsample documents that look like my curated
set" — and at 100 TB it must stay a two-scan job.

Scale shape:
- pass 1 builds BOTH histograms in one map-side-combined aggregate
  keyed by bucket (≤ B partial rows per task; B is a constant, default
  1024), so the only exchange is B rows wide;
- the B (bucket → integerized log-ratio) pairs are collected to the
  driver (bounded, like the IVF centroid seeds) and re-enter the plan
  as a LITERAL array column, so pass 2 — the actual scoring scan — is
  exchange-free whole-stage codegen: tokens are bucketed and summed
  IN-ROW via higher-order functions; no explode, no join, nothing
  keyed by |vocab| or |doc|.

Cross-engine determinism: per-bucket log-ratios are floor-integerized
x10k BEFORE the per-doc sum (ln over IEEE doubles with identical
operand order on both engines — the BM25 contract), so the document
score is an exact BIGINT sum of identical integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gaia_spark.functions.retrieval import WORD_SPLIT_RE
from gaia_spark.functions.text_analysis import SCALE

#: number of hash buckets for the unigram feature space
N_BUCKETS = 1024


def _bucket(tok: Column) -> Column:
    """md5-derived feature bucket — the sampling gate's hash recipe."""
    return (F.conv(F.substring(F.md5(tok), 1, 8), 16, 10)
            .cast("bigint") % N_BUCKETS)


def dsir_scores(df: DataFrame, target_pred: Column,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document importance score against a target slice.

    ``target_pred`` marks the in-corpus target sample (e.g.
    ``F.col("lang") == "en"``); its bucket histogram is the numerator.

    → (doc_id, n_toks, dsir_x10k).  Empty docs score 0.  dsir_x10k is
    Σ_occurrences floor(10^4·(ln((h_t+1)/(N_t+B)) − ln((h_r+1)/(N_r+B))))
    — integers after the floor, so the sum is engine-exact.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), WORD_SPLIT_RE),
                    lambda t: t != "")
    hist = (
        df.select(F.explode(toks).alias("tok"),
                  target_pred.cast("bigint").alias("is_t"))
        .select(_bucket(F.col("tok")).alias("b"), "is_t")
        .groupBy("b")
        .agg(F.sum("is_t").alias("h_t"),
             F.count(F.lit(1)).alias("h_r"))
        .collect()
    )
    n_t = sum(r["h_t"] for r in hist)
    n_r = sum(r["h_r"] for r in hist)
    import math

    llr = [0] * N_BUCKETS
    for r in hist:
        llr[r["b"]] = math.floor(SCALE * (
            math.log((r["h_t"] + 1.0) / (n_t + N_BUCKETS))
            - math.log((r["h_r"] + 1.0) / (n_r + N_BUCKETS))))
    # buckets with zero corpus occurrences keep llr=0: they cannot be
    # hit by any in-corpus token, so the value never participates
    arr = F.array(*[F.lit(v).cast("bigint") for v in llr])
    return (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
        .select(
            "doc_id",
            F.size("toks").cast("bigint").alias("n_toks"),
            F.aggregate(
                F.transform(F.col("toks"),
                            lambda t: F.element_at(arr, (_bucket(t) + 1)
                                                   .cast("int"))),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("dsir_x10k"),
        )
    )


def sql_dsir_scores(rel: str, target_where: str,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> str:
    """DuckDB twin of dsir_scores (same buckets, same operand order)."""
    b = N_BUCKETS
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         CASE WHEN {target_where} THEN 1 ELSE 0 END AS is_t,
         unnest(list_filter(string_split_regex(lower({text_col}),
                                               '{WORD_SPLIT_RE}'),
                            t -> t <> '')) AS tok
  FROM {rel}
), hist AS (
  SELECT ('0x' || substr(md5(tok), 1, 8))::BIGINT % {b} AS bkt,
         sum(is_t)::BIGINT AS h_t, count(*)::BIGINT AS h_r
  FROM toks GROUP BY 1
), totals AS (
  SELECT sum(h_t)::BIGINT AS n_t, sum(h_r)::BIGINT AS n_r FROM hist
), llr AS (
  SELECT bkt,
         floor({SCALE} * (ln((h_t + 1.0) / (n_t + {b}))
                          - ln((h_r + 1.0) / (n_r + {b}))))::BIGINT
           AS llr
  FROM hist, totals
), scores AS (
  SELECT t.doc_id, count(*)::BIGINT AS n_toks,
         sum(l.llr)::BIGINT AS dsir_x10k
  FROM toks t
  JOIN llr l ON ('0x' || substr(md5(t.tok), 1, 8))::BIGINT % {b} = l.bkt
  GROUP BY t.doc_id
)
SELECT d.{id_col} AS doc_id,
       coalesce(s.n_toks, 0)::BIGINT AS n_toks,
       coalesce(s.dsir_x10k, 0)::BIGINT AS dsir_x10k
FROM {rel} d LEFT JOIN scores s ON d.{id_col} = s.doc_id
"""
