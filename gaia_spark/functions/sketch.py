"""Count-min sketch — sublinear frequency estimation over corpus
token streams (Cormode & Muthukrishnan 2005), engine-exact.

At 100 TB the exact token-frequency table is itself corpus-scale; a
count-min sketch reduces it to a FIXED d×w grid of counters that is
(a) one map-side-combined aggregate to build, (b) mergeable across
partitions/shards/days by plain cell-wise addition, and (c) an upper
bound: est(token) = min over rows of cell[r][h_r(token)] ≥ true count,
with overestimate ≤ 2·N/w at probability 1−2^−d.  Pipelines use it to
gate "is this n-gram frequent enough to matter" without a corpus-scale
groupBy (heavy-hitter candidate generation, repetition screens).

Hash family (the cross-engine trick): row r buckets token x into the
FIRST TWO HEX CHARS of ``md5(x || '#' || r)`` — width is fixed at 256
and the bucket label is a string, so no hex→int conversion (which
differs across engines) is ever needed; md5 is identical in Spark and
DuckDB, making the sketch — and therefore the estimates — hash-exact.

Scale shape: build = explode tokens → explode d rows → ONE groupBy
over at most d×256 = 1024 keys (map-side combine collapses the
corpus before the exchange; the shuffle carries ≤ tasks×1024 rows).
Estimation joins the 1024-cell sketch BROADCAST onto the query
tokens.  No UDFs anywhere.

Reference parity: frequency gating in GAIA is table-driven
(SURVEY.md §2.2 T3/T9 gazetteer thresholds); the sketch is the
corpus-scale producer of such thresholds — beyond-reference scope,
paired with the exact Bloom-filter decontamination path
(decontaminate.py) as the repo's second classic mergeable sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: number of independent hash rows (depth d).
CMS_DEPTH = 4

#: fixed width: 16² buckets — the first two md5 hex chars.
CMS_WIDTH = 256

_WORD_SPLIT = "[^a-z]+"


def _tokens(docs: DataFrame, text_col: str) -> DataFrame:
    w = F.explode(
        F.split(F.lower(F.col(text_col)), _WORD_SPLIT)).alias("token")
    return docs.select(w).where(F.col("token") != "")


def cms_build(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (row, bucket, cnt): the d×256 sketch grid (present cells
    only — absent cells are zero)."""
    toks = _tokens(docs, text_col)
    rows = F.explode(
        F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("row")
    return (
        toks.select("token", rows)
        .select(
            "row",
            F.substring(
                F.md5(F.concat(F.col("token"), F.lit("#"),
                               F.col("row").cast("string"))),
                1, 2).alias("bucket"),
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimates(docs: DataFrame, top_n: int = 20,
                  text_col: str = "text") -> DataFrame:
    """Build the sketch over ``docs``, then estimate the ``top_n``
    true-most-frequent tokens (count DESC, token ASC — deterministic).

    → (token, true_cnt, cms_cnt): ``cms_cnt ≥ true_cnt`` always (the
    count-min guarantee, test-pinned).  The true counts here are the
    oracle side of the demo; a production caller keeps only the
    sketch.  The 1024-cell grid broadcasts onto the query tokens.
    """
    cells = cms_build(docs, text_col)
    truth = (
        _tokens(docs, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("token"))
        .limit(top_n)
    )
    probes = truth.select(
        "token", "true_cnt",
        F.explode(
            F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("row"),
    ).select(
        "token", "true_cnt", "row",
        F.substring(
            F.md5(F.concat(F.col("token"), F.lit("#"),
                           F.col("row").cast("string"))),
            1, 2).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["row", "bucket"])
        .groupBy("token", "true_cnt")
        .agg(F.min("cnt").alias("cms_cnt"))
    )


# --------------------------------------------------------------------
# DuckDB twins
# --------------------------------------------------------------------

def _sql_tokens(rel: str, text_col: str) -> str:
    return f"""(
  SELECT w AS token
  FROM (SELECT unnest(string_split_regex(lower({text_col}),
                                         '{_WORD_SPLIT}')) AS w
        FROM {rel})
  WHERE w <> '')"""


def sql_cms_estimates(rel: str, top_n: int = 20,
                      text_col: str = "text") -> str:
    """DuckDB twin of :func:`cms_estimates`."""
    toks = _sql_tokens(rel, text_col)
    return f"""
WITH toks AS (SELECT token FROM {toks}),
cells AS (
  SELECT r AS row, substr(md5(token || '#' || r::VARCHAR), 1, 2) AS bucket,
         count(*)::BIGINT AS cnt
  FROM toks, (SELECT unnest(range(0, {CMS_DEPTH})) AS r)
  GROUP BY 1, 2
),
truth AS (
  SELECT token, count(*)::BIGINT AS true_cnt
  FROM toks GROUP BY token
  ORDER BY true_cnt DESC, token ASC
  LIMIT {top_n}
),
probes AS (
  SELECT t.token, t.true_cnt, r AS row,
         substr(md5(t.token || '#' || r::VARCHAR), 1, 2) AS bucket
  FROM truth t, (SELECT unnest(range(0, {CMS_DEPTH})) AS r)
)
SELECT p.token, p.true_cnt, min(c.cnt)::BIGINT AS cms_cnt
FROM probes p JOIN cells c USING (row, bucket)
GROUP BY p.token, p.true_cnt"""
