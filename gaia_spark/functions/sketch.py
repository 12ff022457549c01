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


# --------------------------------------------------------------------
# HyperLogLog — sublinear DISTINCT-count estimation
# --------------------------------------------------------------------
#
# The second classic mergeable sketch (Flajolet et al. 2007): where
# count-min bounds FREQUENCIES, HLL estimates CARDINALITY.  At 100 TB
# "how many distinct shingles / urls / ngrams" is itself a
# corpus-scale groupBy; HLL reduces it to a FIXED 256-register vector
# that is (a) one ≤256-key map-side-combined aggregate to build and
# (b) mergeable across shards/days by register-wise MAX.
#
# Cross-engine recipe (everything md5-hex, so Spark ≡ DuckDB exactly):
#   reg  = first two hex chars of md5(item)        → 256 registers
#   tail = next eight hex chars                    → a 32-bit suffix
#   rank = leading-zero BITS of tail + 1, capped at 33 (tail == 0)
#     computed WITHOUT any hex→int conversion: z = zero-NIBBLE prefix
#     length (regexp), plus the zero bits inside the first non-zero
#     nibble by single-char comparison ('8'≤c → 0, '4'≤c → 1,
#     '2'≤c → 2, else 3) — identical lexicographic semantics in both
#     engines.
#   register value M_j = max(rank) over items landing in j.
#   raw estimate = α₂₅₆·m²/Σ 2^−M_j with m=256, evaluated EXACTLY in
#     int64: Σ 2^−M_j = S/2³³ where S = Σ shiftleft(1, 33−M_j) (absent
#     registers contribute 2³³), so raw = ((m²·2³³ DIV S)·α_num) DIV
#     α_den — two integer divisions, bit-identical across engines.
#   small-range (linear-counting) correction: raw ≤ 5m/2 and V>0 →
#     m·ln(m/V), served from a 256-entry PRECOMPUTED integer literal
#     table (the literal-array trick importance.py uses for llr).
# Large-range (2³²-saturation) correction is intentionally omitted:
# it only matters within 2% of 2³² distincts, far beyond what a
# 32-bit-tail demo should be used for (use a 64-bit tail there).

import math

#: registers (m) — first two md5 hex chars.
HLL_M = 256

#: rank cap: 32 tail bits all zero → rank 33.
HLL_RANK_CAP = 33

#: α₂₅₆ = 0.7213/(1 + 1.079/256) ≈ 0.718272, as an exact ratio.
HLL_ALPHA_NUM = 71827
HLL_ALPHA_DEN = 100000

#: linear-counting table: LIN[v] = round(m·ln(m/v)), v = 1..256.
HLL_LIN = [round(HLL_M * math.log(HLL_M / v)) for v in range(1, HLL_M + 1)]

_HLL_RAW = ("(({m2s}::BIGINT {div} s_tot) * {an}) {div} {ad}").format
_HLL_M2S = HLL_M * HLL_M * (1 << HLL_RANK_CAP)


def _hll_shingles(docs: DataFrame, k: int, text_col: str) -> DataFrame:
    """char k-gram shingles of whitespace-normalized lowercase text
    (same normalization as winnow_fingerprints) → one ``s`` column.
    The explode feeds a ≤256-key partial aggregate, so the shuffle
    after it carries ≤ tasks×256 rows regardless of corpus size."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    n_sh = F.greatest(F.length("t") - k + 1, F.lit(1))
    return docs.select(norm.alias("t")).select(
        F.explode(
            F.transform(F.sequence(F.lit(1), n_sh),
                        lambda i: F.substr(F.col("t"), i, F.lit(k)))
        ).alias("s"))


def _hll_rank() -> F.Column:
    """rank column over an ``h`` md5-hex column (see module recipe)."""
    tail = F.substring("h", 3, 8)
    z = F.length(F.regexp_extract(tail, "^(0*)", 1))
    c = F.substr(tail, z + F.lit(1), F.lit(1))
    nlz = (F.when(c >= "8", 0).when(c >= "4", 1)
            .when(c >= "2", 2).otherwise(3))
    return (F.when(z == 8, F.lit(HLL_RANK_CAP))
             .otherwise(z * 4 + nlz + 1)).alias("rank")


def hll_ranked(items: DataFrame, item_col: str,
               keys: list[str] | None = None) -> DataFrame:
    """(keys…, reg, m): raw register observations for each item —
    the mergeable HLL building block (pre-max; callers may carry
    duplicate (keys, reg) rows).  One row per input item."""
    keys = keys or []
    return items.select(
        *keys,
        F.substring(F.md5(item_col), 1, 2).alias("reg"),
        F.md5(item_col).alias("h"),
    ).select(*keys, "reg", _hll_rank().alias("m"))


def hll_estimate(regs: DataFrame,
                 keys: list[str] | None = None,
                 out_col: str = "hll_est") -> DataFrame:
    """(keys…, reg, m) observations → (keys…, out_col): the exact
    integer HLL estimate per key group (globally when ``keys`` is
    empty).  Collapses duplicate (keys, reg) rows by MAX first — the
    HLL merge — so inputs from any number of shards compose."""
    keys = keys or []
    folded = regs.groupBy(*keys, "reg").agg(F.max("m").alias("m"))
    stats = folded.groupBy(*keys).agg(
        F.sum(F.expr(f"shiftleft(1L, {HLL_RANK_CAP} - m)"))
         .alias("s_present"),
        F.count(F.lit(1)).alias("n_regs"),
    ).select(
        *keys,
        (F.col("s_present")
         + (F.lit(HLL_M) - F.col("n_regs"))
         * F.lit(1 << HLL_RANK_CAP)).alias("s_tot"),
        (F.lit(HLL_M) - F.col("n_regs")).cast("int").alias("v"),
    )
    lin = F.array(*[F.lit(x) for x in HLL_LIN])
    raw = F.expr(_HLL_RAW(m2s=_HLL_M2S, div="DIV",
                          an=HLL_ALPHA_NUM, ad=HLL_ALPHA_DEN))
    return stats.select(
        *keys,
        F.when((raw <= F.lit(5 * HLL_M // 2)) & (F.col("v") > 0),
               F.element_at(lin, F.col("v")).cast("long"))
         .otherwise(raw).cast("long").alias(out_col))


def hll_distinct(docs: DataFrame, k: int = 5,
                 text_col: str = "text") -> DataFrame:
    """Estimate the number of DISTINCT char k-gram shingles in the
    corpus with a 256-register HLL, next to the exact answer.

    → one row (true_distinct, hll_est, err_x10k) where err_x10k =
    |est − truth|·10⁴ DIV truth.  ``true_distinct`` is the oracle side
    of the demo (a corpus-scale COUNT DISTINCT); a production caller
    keeps only the 256-register sketch.  Everything integer, so the
    row is hash-exact vs the DuckDB twin.
    """
    sh = _hll_shingles(docs, k, text_col)
    est = hll_estimate(hll_ranked(sh, "s"))
    truth = sh.agg(F.countDistinct("s").cast("long")
                    .alias("true_distinct"))
    return truth.crossJoin(est).select(
        "true_distinct", "hll_est",
        F.expr("abs(hll_est - true_distinct) * 10000 DIV true_distinct")
         .alias("err_x10k"),
    )


def sql_hll_ranked(src: str, item_expr: str, keys: str = "") -> str:
    """DuckDB twin of :func:`hll_ranked`: a SELECT over relation
    ``src`` producing (keys…, reg, m).  ``keys`` is a trailing-comma
    column list ('' for none)."""
    return f"""
  SELECT {keys} substr(h, 1, 2) AS reg,
         CASE WHEN z = 8 THEN {HLL_RANK_CAP}
              ELSE z * 4 + CASE WHEN c >= '8' THEN 0
                                WHEN c >= '4' THEN 1
                                WHEN c >= '2' THEN 2
                                ELSE 3 END + 1 END AS m
  FROM (SELECT {keys} h, z, substr(substr(h, 3, 8), (z + 1)::INT, 1) AS c
        FROM (SELECT {keys} md5({item_expr}) AS h,
                     length(regexp_extract(substr(md5({item_expr}), 3, 8),
                                           '^(0*)', 1)) AS z
              FROM {src}))"""


def sql_hll_estimate(regs_rel: str, keys: str = "",
                     out_col: str = "hll_est") -> str:
    """DuckDB twin of :func:`hll_estimate`: a SELECT over a
    (keys…, reg, m) relation producing (keys…, out_col).  Folds
    duplicate (keys, reg) rows by MAX first, exactly as the Spark
    side does."""
    lin = ", ".join(str(x) for x in HLL_LIN)
    kb = f"GROUP BY {keys.rstrip(', ')}" if keys else ""
    raw = (f"((({_HLL_M2S}::BIGINT // s_tot) * {HLL_ALPHA_NUM})"
           f" // {HLL_ALPHA_DEN})")
    return f"""
  SELECT {keys} CASE WHEN {raw} <= {5 * HLL_M // 2} AND v > 0
              THEN ([{lin}])[v]::BIGINT
              ELSE {raw}::BIGINT END AS {out_col}
  FROM (
    SELECT {keys} (sum((1::BIGINT << ({HLL_RANK_CAP} - m)))
            + ({HLL_M} - count(*)) * {1 << HLL_RANK_CAP}::BIGINT)::BIGINT
             AS s_tot,
           ({HLL_M} - count(*))::INT AS v
    FROM (SELECT {keys} reg, max(m) AS m FROM {regs_rel}
          GROUP BY {keys}reg)
    {kb}
  )"""


def sql_hll_distinct(rel: str, k: int = 5, text_col: str = "text") -> str:
    """DuckDB twin of :func:`hll_distinct` (same constants, same
    integer arithmetic; DuckDB ``//`` ≡ Spark ``DIV`` on positives)."""
    norm = rf"trim(regexp_replace(lower({text_col}), '\s+', ' ', 'g'))"
    return f"""
WITH docs AS (SELECT {norm} AS t FROM {rel}),
sh AS (
  SELECT substr(t, i::INT, {k}) AS s
  FROM docs, unnest(range(1, greatest(length(t) - {k} + 1, 1) + 1)) AS u(i)
),
ranked AS ({sql_hll_ranked("sh", "s")}),
est AS ({sql_hll_estimate("ranked")}),
truth AS (SELECT count(DISTINCT s)::BIGINT AS true_distinct FROM sh)
SELECT true_distinct, hll_est,
       (abs(hll_est - true_distinct) * 10000 // true_distinct)::BIGINT
         AS err_x10k
FROM truth, est"""
