"""Benchmark decontamination: eval-set n-gram overlap flagging.

The C4/Dolma/GPT-3-style pretraining hygiene step: a training document
is *contaminated* if it shares at least one word n-gram with a held-out
evaluation set.  Tokenization is the shared whitespace recipe of
``text_analysis.repetition_stats`` (lower → split on ``\\s+`` → drop
empties); grams are compared as md5 fingerprints (identical in Spark
and DuckDB, 16 bytes instead of an unbounded string at scale).

Scale shape (100 TB corpus, benchmark-sized eval set):

- the eval gram table is DISTINCT md5 fingerprints of the eval docs'
  n-grams — for real benchmark suites this is at most ~10^7 rows,
  comfortably broadcast; the corpus side therefore never shuffles for
  the membership test;
- per-document grams are built IN-ROW (``transform`` over a token
  array, the winnowing pattern) and ``array_distinct``-ed before the
  explode, so the exploded row count is bounded by distinct grams per
  doc, and the only aggregation is a map-side-combined count keyed by
  doc_id over *hit* rows only (tiny: most docs have zero hits);
- the final flag attach is docs ⟕ hits on doc_id — AQE sees the hit
  table is small and broadcasts it back, so the whole operator adds
  ZERO corpus-wide exchanges;
- for eval sets too big to broadcast, put a Bloom filter of the eval
  fingerprints in front (``F.expr("might_contain(...)")`` /
  ``bloom_filter_agg``) and broadcast only the filter; the exact join
  then runs on the prefiltered (tiny) candidate slice.  Not needed at
  benchmark scale, so not wired here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: decontamination gram width in whitespace tokens (GPT-3 used 13 for
#: filtering, 8 for flagging; 8 keeps synthetic short docs testable)
DECON_N = 8

SCALE = 10000


def _toks(text_col: str) -> Column:
    return F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: t != "")


def ngram_md5_col(text_col: str, n: int = DECON_N) -> Column:
    """array<string> of md5 hex fingerprints of the doc's word n-grams.

    In-row: sequence → transform → md5; docs shorter than ``n`` tokens
    yield an empty array (guarding Spark's descending sequence(1, 0)).
    """
    toks = _toks(text_col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.md5(F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)])),
        ),
    ).otherwise(F.array().cast("array<string>"))


def eval_grams(eval_df: DataFrame, text_col: str = "text",
               n: int = DECON_N) -> DataFrame:
    """Distinct n-gram fingerprints of the eval set → (g: string)."""
    return (
        eval_df.select(F.explode(ngram_md5_col(text_col, n)).alias("g"))
        .distinct()
    )


def contamination_stats(
    docs: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DECON_N,
) -> DataFrame:
    """Per-doc eval overlap → (doc_id, n_grams, n_hits, hit_frac_x10k,
    contaminated).

    ``n_grams``/``n_hits`` count DISTINCT grams (per doc / per doc ∩
    eval set); ``contaminated`` = any hit.  Short docs (< n tokens)
    have 0 grams and are never contaminated.
    """
    ev = F.broadcast(eval_grams(eval_df, text_col, n))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(ngram_md5_col(text_col, n)).alias("grams"),
    )
    hits = (
        base.select("doc_id", F.explode("grams").alias("g"))
        .join(ev, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        base.select("doc_id", F.size("grams").alias("n_grams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint")
            .alias("n_hits"),
            F.floor(
                F.lit(SCALE)
                * F.coalesce("n_hits", F.lit(0)).cast("double")
                / F.greatest("n_grams", F.lit(1)).cast("double")
            ).alias("hit_frac_x10k"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def _sql_grams(rel: str, text_col: str, id_col: str, n: int) -> str:
    """DuckDB: (doc_id, g) DISTINCT md5 n-gram fingerprints of rel."""
    gram = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    return f"""
  SELECT DISTINCT doc_id, md5({gram}) AS g
  FROM (
    SELECT {id_col} AS doc_id,
           list_filter(string_split_regex(lower({text_col}), '\\s+'),
                       t -> t <> '') AS toks
    FROM {rel}
  ), unnest(range(1, greatest(len(toks) - {n}, -1) + 2)) AS u(i)
"""


def sql_contamination_stats(docs_rel: str, eval_rel: str,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            n: int = DECON_N) -> str:
    """DuckDB twin of contamination_stats (same tokens, same floors)."""
    return f"""
WITH doc_grams AS ({_sql_grams(docs_rel, text_col, id_col, n)}),
ev AS (SELECT DISTINCT g FROM ({_sql_grams(eval_rel, text_col,
                                           id_col, n)})),
ng AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM doc_grams
       GROUP BY doc_id),
hits AS (SELECT doc_id, count(*)::BIGINT AS n_hits
         FROM doc_grams JOIN ev USING (g) GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(ng.n_grams, 0)::BIGINT AS n_grams,
       coalesce(hits.n_hits, 0)::BIGINT AS n_hits,
       floor({SCALE} * coalesce(hits.n_hits, 0)::DOUBLE
             / greatest(coalesce(ng.n_grams, 0), 1))::BIGINT
         AS hit_frac_x10k,
       coalesce(hits.n_hits, 0) > 0 AS contaminated
FROM (SELECT DISTINCT {id_col} AS doc_id FROM {docs_rel}) d
LEFT JOIN ng USING (doc_id)
LEFT JOIN hits USING (doc_id)
"""
