"""Entity salience scoring over a mention table — which entities a
document is ABOUT, not merely which it mentions.

After mention extraction (T2) and linking (T4), a KG builder must
rank each document's entities: salient entities feed the document's
KG node attributes, anchor retrieval, and weight triple confidence;
incidental mentions don't.  The classic proxy features (Dunietz &
Gillick 2014-style, minus the learned weights): mention FREQUENCY
relative to document length, and FIRST-MENTION POSITION (earlier =
more salient — title/lede bias).  Exact integer fixed-point (x10k)
so the DuckDB twin is hash-identical.

Scale shape: two map-side-combined aggregates — (doc, entity) and
(doc) — joined on the doc key (shuffle join; AQE splits skewed mega-
docs).  Only ids and small integers travel; mention surface text
never enters the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: first-mention bonus schedule (x10k units): position 1 earns 3000,
#: each later position loses 100, floor 0 — integers end to end.
FIRST_POS_BONUS_X10K = 3000
FIRST_POS_DECAY_X10K = 100


def mention_salience(mentions: DataFrame,
                     doc_col: str = "doc_id",
                     ent_col: str = "entity",
                     pos_col: str = "pos") -> DataFrame:
    """→ (doc_id, entity, n_mentions, first_pos, doc_len,
    salience_x10k) for every (document, entity) pair.

    ``salience_x10k = (10000 · n_mentions) div doc_len
    + max(0, 3000 − 100·(first_pos − 1))`` — frequency share of the
    doc's mention stream plus an early-mention bonus.  ``doc_len`` is
    the doc's TOTAL mention count (the stream the entity competes
    in), so scores are comparable across documents of any size.
    """
    per_pair = mentions.groupBy(
        F.col(doc_col).alias("doc_id"), F.col(ent_col).alias("entity")
    ).agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.min(pos_col).cast("bigint").alias("first_pos"),
    )
    per_doc = mentions.groupBy(F.col(doc_col).alias("doc_id")).agg(
        F.count(F.lit(1)).alias("doc_len"))
    return per_pair.join(per_doc, "doc_id").select(
        "doc_id", "entity", "n_mentions", "first_pos", "doc_len",
        (F.expr("(10000 * n_mentions) div doc_len")
         + F.greatest(
             F.lit(0).cast("bigint"),
             F.lit(FIRST_POS_BONUS_X10K)
             - F.lit(FIRST_POS_DECAY_X10K) * (F.col("first_pos") - 1))
         ).cast("bigint").alias("salience_x10k"),
    )


def sql_mention_salience(mentions_sql: str,
                         doc_col: str = "doc_id",
                         ent_col: str = "entity",
                         pos_col: str = "pos") -> str:
    """DuckDB twin: same two aggregates, same integer schedule."""
    return f"""
WITH m AS ({mentions_sql}),
per_pair AS (
  SELECT {doc_col} AS doc_id, {ent_col} AS entity,
         count(*)::BIGINT AS n_mentions,
         min({pos_col})::BIGINT AS first_pos
  FROM m GROUP BY {doc_col}, {ent_col}
),
per_doc AS (
  SELECT {doc_col} AS doc_id, count(*)::BIGINT AS doc_len
  FROM m GROUP BY {doc_col}
)
SELECT p.doc_id, p.entity, p.n_mentions, p.first_pos, d.doc_len,
       ((10000 * p.n_mentions) // d.doc_len
        + greatest(0, {FIRST_POS_BONUS_X10K}
                      - {FIRST_POS_DECAY_X10K} * (p.first_pos - 1))
       )::BIGINT AS salience_x10k
FROM per_pair p JOIN per_doc d USING (doc_id)
"""


def salience_profile(sal: DataFrame, bucket: int = 250) -> DataFrame:
    """Compact corpus-level pin of a salience table: per
    ``salience_x10k div bucket`` bucket, the pair count and doc /
    first-pos checksums (any single mis-scored pair shifts a sum).
    One map-side-combined aggregate over vocabulary-scale buckets.
    """
    return (
        sal.groupBy(
            F.expr(f"salience_x10k div {bucket}").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_pairs"),
             F.sum("doc_id").alias("sum_docs"),
             F.sum("first_pos").alias("sum_first_pos"),
             F.sum("n_mentions").alias("sum_mentions"))
    )


def sql_salience_profile(sal_sql: str, bucket: int = 250) -> str:
    """DuckDB twin of :func:`salience_profile`."""
    return f"""
SELECT salience_x10k // {bucket} AS bucket,
       count(*)::BIGINT AS n_pairs,
       sum(doc_id)::BIGINT AS sum_docs,
       sum(first_pos)::BIGINT AS sum_first_pos,
       sum(n_mentions)::BIGINT AS sum_mentions
FROM ({sal_sql})
GROUP BY 1
"""
