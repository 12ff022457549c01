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
- for eval sets too big to broadcast, ``contamination_stats_bloom``
  (below) puts a Bloom filter of the eval fingerprints in front and
  broadcasts only the m/8-byte bitmap; the exact join then runs on
  the prefiltered (tiny) candidate slice and removes the false
  positives, so both operators return identical rows.
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


# ---------------------------------------------------------------------------
# Bloom-prefiltered variant — eval sets too big to broadcast exactly
# ---------------------------------------------------------------------------

def _bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Standard sizing: m = -n·ln p / ln²2 bits (word-rounded),
    k = (m/n)·ln 2 probes."""
    import math
    n = max(n_items, 1)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m = (m + 63) // 64 * 64
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _h1h2(g: Column) -> tuple[Column, Column]:
    """Two independent 60-bit integers carved JVM-side from the md5
    hex fingerprint (15 hex chars each — conv() stays inside BIGINT),
    feeding the classic double-hashing scheme h1 + i·h2."""
    return (F.conv(F.substring(g, 1, 15), 16, 10).cast("bigint"),
            F.conv(F.substring(g, 16, 15), 16, 10).cast("bigint"))


def build_eval_bloom(spark, eval_df: DataFrame, text_col: str = "text",
                     n: int = DECON_N, fpp: float = 0.01):
    """Bloom filter over the eval set's gram fingerprints →
    (broadcast bitmap bytes, m, k).

    Build is distributed: each partition folds its (h1, h2) batch
    into a local numpy bitmap (mapInPandas, one m/8-byte row per
    partition), the driver ORs the partials and ships ONE broadcast
    of m/8 bytes — at 10^7 eval grams and 1% fpp that is ~12 MB,
    vs ~10× that for broadcasting the exact fingerprint table.
    Deterministic: the bitmap is a pure function of (grams, m, k).
    """
    import numpy as np
    import pandas as pd

    ev = eval_grams(eval_df, text_col, n)
    h1, h2 = _h1h2(F.col("g"))
    hashed = ev.select(h1.alias("h1"), h2.alias("h2"))
    m, k = _bloom_params(hashed.count(), fpp)

    def fold(batches):
        bits = np.zeros(m // 8, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            a = pdf["h1"].to_numpy(np.uint64) % m
            b = pdf["h2"].to_numpy(np.uint64) % m
            for i in range(k):
                idx = (a + np.uint64(i) * b) % np.uint64(m)
                np.bitwise_or.at(bits, idx >> np.uint64(3),
                                 np.left_shift(
                                     np.uint8(1),
                                     (idx & np.uint64(7)).astype(np.uint8)))
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    partials = hashed.mapInPandas(fold, schema="bits binary").collect()
    acc = np.zeros(m // 8, dtype=np.uint8)
    for row in partials:
        acc |= np.frombuffer(row["bits"], dtype=np.uint8)
    return spark.sparkContext.broadcast(acc.tobytes()), m, k


def contamination_stats_bloom(
    spark,
    docs: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DECON_N,
    fpp: float = 0.01,
) -> DataFrame:
    """``contamination_stats`` with a Bloom prefilter on the corpus
    side — the documented scale path for eval sets too big to
    broadcast exactly.  IDENTICAL output (false positives are removed
    by the exact join over the pruned candidate slice), so the same
    DuckDB twin oracles both operators.

    Scale shape: the corpus-side membership test is a broadcast of
    m/8 BYTES + a vectorized-numpy pandas UDF over JVM-precomputed
    (h1, h2) ints — no string parsing in Python, no corpus-wide
    exchange.  Rows surviving to the exact join ≈ true hits +
    fpp × corpus grams; that slice joins the eval fingerprint table
    however AQE prefers (no forced broadcast of the big eval side).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bcast, m, k = build_eval_bloom(spark, eval_df, text_col, n, fpp)

    @pandas_udf("boolean")
    def might_contain(h1, h2):
        # bare signature: postponed annotations (future import) break
        # pandas_udf's pd.Series signature check
        bits = np.frombuffer(bcast.value, dtype=np.uint8)
        a = h1.to_numpy(np.uint64) % m
        b = h2.to_numpy(np.uint64) % m
        ok = np.ones(len(a), dtype=bool)
        for i in range(k):
            idx = (a + np.uint64(i) * b) % np.uint64(m)
            ok &= (bits[idx >> np.uint64(3)]
                   & np.left_shift(np.uint8(1),
                                   (idx & np.uint64(7)).astype(np.uint8))
                   ) > 0
        return pd.Series(ok)

    ev = eval_grams(eval_df, text_col, n)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(ngram_md5_col(text_col, n)).alias("grams"),
    )
    h1, h2 = _h1h2(F.col("g"))
    candidates = (
        base.select("doc_id", F.explode("grams").alias("g"))
        .filter(might_contain(h1, h2))
    )
    hits = (
        candidates.join(ev, "g")        # exact: removes Bloom FPs
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
