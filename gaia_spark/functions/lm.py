"""Unigram-LM fluency scoring — the KenLM-style "does this read like
language" gate of a pretraining pipeline, in exact integer arithmetic.

A real LM filter scores each document by mean token surprisal
(-log2 p(token)) under a background model and drops the tails (too
predictable = boilerplate, too surprising = gibberish/non-language).
The heavy external artifact (a KenLM binary model) doesn't exist in
this sandbox, so the background model here is an embedded unigram
table over the most frequent English words with PRE-INTEGERIZED
surprisals (centibits, x100): the classic trick that floating log2
cannot survive a cross-engine hash compare (JVM vs libm differ in the
last ulp and floor(1e4·x) flips at boundaries), integer centibits can.

Scale shape: surprisal lookup is a map-literal ``element_at`` inside a
single ``aggregate`` over the in-row token array — no explode, no
join, no Python; the whole scorer is one narrow JVM projection.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: word → relative frequency per 100k tokens (rounded Zipf over the
#: classic top-50 English stopword ranks; any fixed table works — the
#: contract is determinism, not linguistic perfection).
_TOP_FREQ_100K: dict[str, int] = {
    "the": 6000, "of": 3500, "and": 2800, "to": 2600, "a": 2300,
    "in": 2100, "is": 1100, "it": 1000, "you": 980, "that": 950,
    "he": 900, "was": 880, "for": 850, "on": 800, "are": 760,
    "with": 700, "as": 670, "his": 600, "they": 560, "be": 540,
    "at": 520, "one": 500, "have": 490, "this": 480, "from": 470,
    "or": 450, "had": 440, "by": 430, "not": 420, "word": 200,
    "but": 410, "what": 400, "some": 380, "we": 370, "can": 360,
    "out": 350, "other": 340, "were": 330, "all": 320, "there": 310,
    "when": 300, "up": 290, "use": 210, "your": 270, "how": 260,
    "said": 250, "an": 240, "each": 220, "she": 230, "which": 215,
}

#: surprisal in centibits: round(-100 · log2(freq / 100k))
SURPRISAL_CB: dict[str, int] = {
    w: round(-100 * math.log2(n / 100_000))
    for w, n in _TOP_FREQ_100K.items()
}

#: out-of-vocabulary surprisal (centibits) — a flat penalty standing in
#: for the LM's backoff mass; 17 bits ≈ p = 2^-17.
OOV_CB = 1700


def _tokens(text: Column) -> Column:
    return F.filter(
        F.split(F.lower(text), r"[^a-z0-9]+"),
        lambda t: t != "",
    )


def surprisal_map() -> Column:
    pairs: list[Column] = []
    for w in sorted(SURPRISAL_CB):
        pairs += [F.lit(w), F.lit(SURPRISAL_CB[w])]
    return F.create_map(*pairs)


def lm_score(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, n_tokens, surprisal_cb, mean_surprisal_cb).

    ``surprisal_cb`` = Σ per-token centibit surprisal (exact BIGINT);
    ``mean_surprisal_cb`` = integer div by token count (0-token docs
    score the OOV ceiling).  Identical bits in the DuckDB twin.
    """
    m = surprisal_map()
    toks = _tokens(F.col(text_col))
    total = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.coalesce(
            F.element_at(m, t).cast("bigint"), F.lit(OOV_CB)),
    )
    n = F.size(toks).cast("bigint")
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_tokens"),
        total.alias("surprisal_cb"),
    ).select(
        "doc_id", "n_tokens", "surprisal_cb",
        F.when(F.col("n_tokens") > 0,
               F.expr("surprisal_cb div n_tokens"))
        .otherwise(F.lit(OOV_CB).cast("bigint"))
        .alias("mean_surprisal_cb"),
    )


def sql_lm_score(rel: str, text_col: str = "text",
                 id_col: str = "doc_id") -> str:
    """DuckDB twin: same map, same integer centibit arithmetic."""
    keys = ", ".join(f"'{w}'" for w in sorted(SURPRISAL_CB))
    vals = ", ".join(str(SURPRISAL_CB[w]) for w in sorted(SURPRISAL_CB))
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         list_filter(string_split_regex(lower({text_col}),
                                        '[^a-z0-9]+'),
                     t -> t <> '') AS ts
  FROM {rel}
), scored AS (
  SELECT doc_id,
         len(ts)::BIGINT AS n_tokens,
         coalesce(list_sum(list_transform(ts,
             t -> coalesce(
                    map_extract(map([{keys}], [{vals}]), t)[1],
                    {OOV_CB}))), 0)::BIGINT AS surprisal_cb
  FROM toks
)
SELECT doc_id, n_tokens, surprisal_cb,
       CASE WHEN n_tokens > 0 THEN surprisal_cb // n_tokens
            ELSE {OOV_CB} END::BIGINT AS mean_surprisal_cb
FROM scored
"""


#: centibit discount a known context word buys its successor — stands
#: in for the bigram table a real KenLM ships (the sandbox can't);
#: the KERNEL shape (pairwise in-row scan, exact integer sum) is what
#: a real bigram map would swap into.
BIGRAM_DISCOUNT_CB = 150


def lm_score_bigram(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Bigram-context fluency score → same schema as ``lm_score``
    (doc_id, n_tokens, surprisal_cb, mean_surprisal_cb), lower =
    more fluent.

    Per-token surprisal with a one-word context model:

    - first token: unigram surprisal (or OOV);
    - token i (i ≥ 2): if BOTH (t[i-1], t[i]) are in-vocab, unigram
      surprisal of t[i] minus ``BIGRAM_DISCOUNT_CB`` floored at 0
      (a common word after a common word reads cheaper); in-vocab
      t[i] after OOV context pays full unigram; OOV t[i] pays OOV_CB.

    All integer centibits — associative-exact, hash-identical to the
    DuckDB twin.  In-row shape: ONE ``aggregate`` over the pair
    sequence, no explode, no join, no Python.
    """
    m = surprisal_map()
    toks = _tokens(F.col(text_col))

    def pair_cb(acc: Column, i: Column) -> Column:
        prev = F.element_at(m, F.element_at(toks, i - 1))
        cur = F.element_at(m, F.element_at(toks, i)).cast("bigint")
        # the discount branch requires BOTH ends in-vocab: greatest()
        # SKIPS nulls on both engines, so greatest(NULL - d, 0) would
        # silently score an OOV token as 0 ("free") after any known
        # context word
        return acc + F.coalesce(
            F.when(prev.isNotNull() & cur.isNotNull(),
                   F.greatest(cur - BIGRAM_DISCOUNT_CB,
                              F.lit(0).cast("bigint")))
            .otherwise(cur),
            F.lit(OOV_CB).cast("bigint"))

    first = F.coalesce(
        F.element_at(m, F.element_at(toks, 1)).cast("bigint"),
        F.lit(OOV_CB).cast("bigint"))
    # Spark's sequence(2, 1) DESCENDS — guard n <= 1 explicitly
    # (DuckDB's range(2, 2) is empty, no guard needed there)
    total = (
        F.when(F.size(toks) == 0, F.lit(0).cast("bigint"))
        .when(F.size(toks) == 1, first)
        .otherwise(first + F.aggregate(
            F.sequence(F.lit(2), F.size(toks)),
            F.lit(0).cast("bigint"), pair_cb)))
    n = F.size(toks).cast("bigint")
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_tokens"),
        total.alias("surprisal_cb"),
    ).select(
        "doc_id", "n_tokens", "surprisal_cb",
        F.when(F.col("n_tokens") > 0,
               F.expr("surprisal_cb div n_tokens"))
        .otherwise(F.lit(OOV_CB).cast("bigint"))
        .alias("mean_surprisal_cb"),
    )


def sql_lm_score_bigram(rel: str, text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    """DuckDB twin of lm_score_bigram (same map, same discount)."""
    keys = ", ".join(f"'{w}'" for w in sorted(SURPRISAL_CB))
    vals = ", ".join(str(SURPRISAL_CB[w]) for w in sorted(SURPRISAL_CB))
    m = f"map([{keys}], [{vals}])"
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         list_filter(string_split_regex(lower({text_col}),
                                        '[^a-z0-9]+'),
                     t -> t <> '') AS ts
  FROM {rel}
), scored AS (
  SELECT doc_id,
         len(ts)::BIGINT AS n_tokens,
         CASE WHEN len(ts) = 0 THEN 0 ELSE
           coalesce(map_extract({m}, ts[1])[1], {OOV_CB})::BIGINT
           + coalesce(list_sum(list_transform(
               range(2, len(ts) + 1),
               i -> coalesce(
                 CASE WHEN map_extract({m}, ts[i - 1])[1] IS NOT NULL
                       AND map_extract({m}, ts[i])[1] IS NOT NULL
                   THEN greatest(
                     map_extract({m}, ts[i])[1] - {BIGRAM_DISCOUNT_CB},
                     0)
                   ELSE map_extract({m}, ts[i])[1] END,
                 {OOV_CB}))), 0)::BIGINT
         END AS surprisal_cb
  FROM toks
)
SELECT doc_id, n_tokens, surprisal_cb,
       CASE WHEN n_tokens > 0 THEN surprisal_cb // n_tokens
            ELSE {OOV_CB} END::BIGINT AS mean_surprisal_cb
FROM scored
"""


#: Kneser-Ney absolute discount, x100 fixed-point (the classic 0.75)
KN_DISCOUNT_X100 = 75

#: probability fixed-point unit for the trained model
KN_PPM = 1_000_000


def kn_bigram_model(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    min_count: int = 2) -> DataFrame:
    """TRAIN an interpolated Kneser-Ney bigram model over the corpus
    → (w1, w2, c12, p_kn_ppm): the distributed counterpart of a
    KenLM ``lmplz`` run, in exact integer fixed-point.

    Interpolated KN (Chen & Goodman 1999) with absolute discount
    D = 0.75 (x100 integer):

        p_kn(w2|w1) = max(c(w1w2) − D, 0) / c(w1)
                    + (D · N1+(w1·) / c(w1)) · p_cont(w2)
        p_cont(w2)  = N1+(·w2) / N1+(··)

    computed as ppm BIGINTs with floor division at each step (the
    exact order the DuckDB twin replays, so hashes match).  Only
    bigrams with ``c12 >= min_count`` are emitted (the standard
    prune); the discounted mass they carry is unaffected.  BIGINT
    headroom: PPM·(100·c12) caps c12 at ~9e10 per bigram — beyond
    that, drop to per-shard models + a count-merge pass.

    Scale shape: bigrams stay IN-ROW until one (w1, w2) map-side-
    combined count shuffle; the w1- and w2-marginals are vocabulary-
    scale aggregates that re-attach by broadcastable joins; the
    distinct-bigram total rides a single-row cross join.  No Python,
    no window, no explode wider than the pair stream.
    """
    toks = _tokens(F.col(text_col))
    pairs = (
        df.select(toks.alias("ts"))
        .filter(F.size("ts") >= 2)
        .select(F.explode(F.expr(
            "transform(sequence(1, size(ts) - 1), "
            "i -> struct(ts[i-1] AS w1, ts[i] AS w2))")).alias("p"))
        .select("p.w1", "p.w2")
    )
    bi = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12"))
    left = bi.groupBy("w1").agg(
        F.sum("c12").alias("c1"),
        F.count(F.lit(1)).alias("n1p_fwd"))
    right = bi.groupBy("w2").agg(
        F.count(F.lit(1)).alias("n1p_bwd"))
    total = bi.agg(F.count(F.lit(1)).alias("n_bigram_types"))
    d = KN_DISCOUNT_X100
    return (
        bi.join(left, "w1").join(right, "w2").crossJoin(total)
        .select(
            "w1", "w2", "c12",
            (F.expr(f"({KN_PPM} * greatest(100 * c12 - {d}, 0))"
                    " div (100 * c1)")
             + F.expr(f"({d} * n1p_fwd * (({KN_PPM} * n1p_bwd)"
                      " div n_bigram_types)) div (100 * c1)"))
            .cast("bigint").alias("p_kn_ppm"),
        )
        .filter(F.col("c12") >= min_count)
    )


def sql_kn_bigram_model(rel: str, text_col: str = "text",
                        id_col: str = "doc_id",
                        min_count: int = 2) -> str:
    """DuckDB twin: same tokenization, same counts, same floor-
    division order."""
    d = KN_DISCOUNT_X100
    return f"""
WITH toks AS (
  SELECT list_filter(string_split_regex(lower({text_col}),
                                        '[^a-z0-9]+'),
                     t -> t <> '') AS ts
  FROM {rel}
), pairs AS (
  SELECT ts, unnest(range(1, len(ts))) AS i FROM toks
), bi AS (
  SELECT ts[i] AS w1, ts[i + 1] AS w2, count(*)::BIGINT AS c12
  FROM pairs GROUP BY 1, 2
), lft AS (
  SELECT w1, sum(c12)::BIGINT AS c1, count(*)::BIGINT AS n1p_fwd
  FROM bi GROUP BY w1
), rgt AS (
  SELECT w2, count(*)::BIGINT AS n1p_bwd FROM bi GROUP BY w2
), tot AS (SELECT count(*)::BIGINT AS n_bigram_types FROM bi)
SELECT bi.w1, bi.w2, bi.c12,
       (({KN_PPM} * greatest(100 * bi.c12 - {d}, 0)) // (100 * c1)
        + ({d} * n1p_fwd * (({KN_PPM} * n1p_bwd) // n_bigram_types))
          // (100 * c1))::BIGINT AS p_kn_ppm
FROM bi JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN tot
WHERE bi.c12 >= {min_count}
"""
