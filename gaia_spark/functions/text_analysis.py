"""Text-analysis operators for large-scale training-data pipelines.

Language-ID, quality scoring, token counting, and document
fingerprinting — the per-document text stages a 100 TB corpus pipeline
runs before/alongside KG extraction (GAIA's per-language routing,
/root/reference/README.md:47-49, needs a lang decision per page; the
reference receives `lang` from upstream, we also derive it).

Every operator here is a PURE COLUMN EXPRESSION — no Python UDFs — so
it runs JVM-side inside whole-stage codegen and scales linearly with
executors.  Each Spark builder has a paired ``*_sql`` generator that
renders the exact same semantics as ANSI SQL for the DuckDB oracle;
both are driven by the same module-level constants so they cannot
drift.

Determinism-across-engines rules used throughout this repo:
- derived ratios are integerized with floor(10000*a/b) — floor of an
  identical double is identical under any rounding mode;
- regexes use only syntax common to Java regex and RE2 (no lookbehind);
- md5 is the cross-engine content hash (identical in Spark and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared constants (single source of truth for Spark AND oracle SQL)
# ---------------------------------------------------------------------------

#: BPE-ish tokenizer: letter runs, digit runs, or single punctuation.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: whitespace tokens (plain word count)
WS_TOKEN_RE = r"\S+"

PUNCT_RE = r"[.,;:!?]"

#: English stopwords used by the quality heuristic.
STOPWORDS_EN = (
    "the", "and", "of", "to", "in", "a", "is", "that", "for", "with",
    "as", "on", "at", "by", "it", "or", "be", "are", "was", "this",
)

#: marker words per language for the n-gram/marker language-ID
#: heuristic.  Scoring = number of marker-word occurrences; argmax wins,
#: ties broken by language code ascending (deterministic).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "and", "is", "of", "to", "that", "with", "for"),
    "es": ("el", "los", "las", "es", "una", "por", "que", "para"),
    "fr": ("le", "les", "est", "une", "dans", "pour", "qui", "pas"),
}

SCALE = 10000  # ratio integerization factor


def _marker_re(lang: str) -> str:
    return r"\b(?:" + "|".join(LANG_MARKERS[lang]) + r")\b"


def _stop_re() -> str:
    return r"\b(?:" + "|".join(STOPWORDS_EN) + r")\b"


# ---------------------------------------------------------------------------
# Spark builders
# ---------------------------------------------------------------------------

def token_count_col(text: Column) -> Column:
    """BPE-ish token count (letter runs / digit runs / punct singles)."""
    return F.regexp_count(text, F.lit(TOKEN_RE)).cast("bigint")


def ws_token_count_col(text: Column) -> Column:
    return F.regexp_count(text, F.lit(WS_TOKEN_RE)).cast("bigint")


def fingerprint_col(text: Column) -> Column:
    """Content fingerprint: md5 over whitespace-canonicalized lowercase
    text — the exact-dedup key (stable across engines)."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(norm)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add n_chars / n_tokens / n_ws_tokens / n_punct / n_stop columns."""
    t = F.col(text_col)
    low = F.lower(t)
    return (
        df.withColumn("n_chars", F.length(t).cast("bigint"))
        .withColumn("n_tokens", token_count_col(t))
        .withColumn("n_ws_tokens", ws_token_count_col(t))
        .withColumn("n_punct",
                    F.regexp_count(t, F.lit(PUNCT_RE)).cast("bigint"))
        .withColumn("n_stop",
                    F.regexp_count(low, F.lit(_stop_re())).cast("bigint"))
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics over the stats columns.

    - ``stop_ratio_x10k``  = floor(1e4 * stopwords / ws_tokens)
    - ``punct_ratio_x10k`` = floor(1e4 * punct / chars)
    - ``mean_tok_len_x10k``= floor(1e4 * chars / ws_tokens)
    - ``quality_ok``       = doc long enough, not punctuation-spam
    """
    out = with_text_stats(df, text_col)
    ws = F.greatest(F.col("n_ws_tokens"), F.lit(1)).cast("double")
    ch = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    return (
        out.withColumn(
            "stop_ratio_x10k",
            F.floor(F.lit(SCALE) * F.col("n_stop").cast("double") / ws))
        .withColumn(
            "punct_ratio_x10k",
            F.floor(F.lit(SCALE) * F.col("n_punct").cast("double") / ch))
        .withColumn(
            "mean_tok_len_x10k",
            F.floor(F.lit(SCALE) * ch / ws))
        .withColumn(
            "quality_ok",
            (F.col("n_ws_tokens") >= 10)
            & (F.col("n_chars") >= 50)
            & (F.col("punct_ratio_x10k") < 2000),
        )
    )


def lang_id_col(text: Column) -> Column:
    """Marker-word language ID; deterministic argmax (lang asc on tie).

    A doc matching no marker at all is ``und`` (undetermined).
    """
    low = F.lower(text)
    scores = {
        lang: F.regexp_count(low, F.lit(_marker_re(lang)))
        for lang in sorted(LANG_MARKERS)
    }
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build the when-chain in REVERSE sorted order so the first
    # (ascending) language wins ties after chaining
    for lang in sorted(LANG_MARKERS, reverse=True):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def winnow_fingerprints(df: DataFrame, k: int = 5, w: int = 4,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003 shape).

    char k-gram shingles → md5 per shingle → sliding-window (w) minimum
    → distinct mins are the doc's fingerprints.  The md5 HEX STRING is
    the hash value (lexicographic min), so DuckDB mirrors it exactly.

    The whole computation is per-document, so it stays INSIDE the row:
    shingle hashes, sliding minima, and distinct fingerprints are all
    higher-order array expressions (transform / slice / array_min /
    array_distinct); only the small distinct-fingerprint set is
    exploded.  No per-shingle row explosion, no window shuffle — at
    100 TB the shuffle-free plan is one narrow map stage, vs the old
    one-row-per-character posexplode + window (≈100-trillion-row
    shuffle keyed by doc_id).

    → (doc_id, fp) distinct fingerprint rows (still ``distinct()`` at
    the end: duplicate *texts* across rows of the same doc_id would
    otherwise duplicate fingerprints).
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    n_sh = F.greatest(F.length("t") - k + 1, F.lit(1))
    hashed = df.select(
        F.col(id_col).alias("doc_id"),
        norm.alias("t"),
    ).select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.md5(F.substr(F.col("t"), i, F.lit(k))),
        ).alias("hs"),
    )
    # sliding min: for window start i (1-based), min over hs[i .. i+w-1];
    # slice() near the array end returns the shorter tail, matching the
    # ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING frame semantics.
    mins = F.transform(
        F.sequence(F.lit(1), F.size("hs")),
        lambda i: F.array_min(F.slice(F.col("hs"), i, F.lit(w))),
    )
    return (
        hashed.select("doc_id", F.explode(F.array_distinct(mins)).alias("fp"))
        .distinct()
    )


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021 §A1.1).

    Per document:
    - ``top_bigram_frac_x10k``: fraction of characters covered by the
      single most frequent word 2-gram (count × len(bigram) / n_chars),
      floor-integerized; ties broken by the lexicographically LAST
      bigram (max(struct(count, bigram)) — order-free, so identical
      under any partitioning and in the SQL twin).
    - ``dup_5gram_frac_x10k``: fraction of word-5-gram OCCURRENCES
      belonging to a 5-gram that appears more than once in the doc.

    Shape at scale: tokens stay inside the row (split → transform);
    the only shuffle is the map-side-combined groupBy on
    (doc_id, gram) — keyed by doc, so it re-uses the corpus
    partitioning and never builds a corpus-wide gram table.  Docs too
    short for a bigram / 5-gram get 0 (coalesced left join).
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: t != "")

    def grams(n: int) -> Column:
        # guard: Spark's sequence(1, 0) is DESCENDING [1, 0], not
        # empty — docs shorter than n tokens must yield no grams
        return F.when(
            F.size("toks") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - n + 1),
                lambda i: F.concat_ws(
                    " ", *[F.element_at("toks", i + j)
                           for j in range(n)]),
            ),
        ).otherwise(F.array().cast("array<string>"))

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).cast("bigint").alias("n_chars"),
        toks.alias("toks"),
    )
    grams2 = base.select("doc_id", F.explode(grams(2)).alias("g"))
    grams5 = base.select("doc_id", F.explode(grams(5)).alias("g"))
    top2 = (
        grams2.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(F.max(F.struct("n", "g")).alias("top"))
        .select("doc_id", F.col("top.g").alias("top_bigram"),
                F.col("top.n").alias("top_bigram_n"))
    )
    dup5 = (
        grams5.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_5grams"),
            F.sum(F.when(F.col("n") > 1, F.col("n"))
                  .otherwise(F.lit(0))).alias("n_dup_5grams"),
        )
    )
    return (
        base.select("doc_id", "n_chars")
        .join(top2, "doc_id", "left")
        .join(dup5, "doc_id", "left")
        .select(
            "doc_id", "n_chars",
            F.coalesce("top_bigram", F.lit("")).alias("top_bigram"),
            F.coalesce("top_bigram_n", F.lit(0)).cast("bigint")
            .alias("top_bigram_n"),
            F.floor(
                F.lit(SCALE)
                * F.coalesce(F.col("top_bigram_n")
                             * F.length(F.coalesce("top_bigram",
                                                   F.lit(""))),
                             F.lit(0)).cast("double")
                / F.greatest("n_chars", F.lit(1)).cast("double")
            ).alias("top_bigram_frac_x10k"),
            F.coalesce("n_5grams", F.lit(0)).cast("bigint")
            .alias("n_5grams"),
            F.floor(
                F.lit(SCALE)
                * F.coalesce("n_dup_5grams", F.lit(0)).cast("double")
                / F.greatest(F.coalesce("n_5grams", F.lit(0)),
                             F.lit(1)).cast("double")
            ).alias("dup_5gram_frac_x10k"),
        )
    )


def sql_repetition_stats(rel: str, text_col: str = "text",
                         id_col: str = "doc_id",
                         where: str = "TRUE") -> str:
    """DuckDB twin of repetition_stats (same tie-breaks, same floors)."""
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id, length({text_col})::BIGINT AS n_chars,
         list_filter(string_split_regex(lower({text_col}), '\\s+'),
                     t -> t <> '') AS toks
  FROM {rel} WHERE {where}
), g2 AS (
  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g
  FROM base, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS u(i)
), g5 AS (
  SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         || ' ' || toks[i+3] || ' ' || toks[i+4] AS g
  FROM base, unnest(range(1, greatest(len(toks) - 4, 0) + 1)) AS u(i)
), top2 AS (
  SELECT doc_id, max(struct_pack(n := n, g := g)) AS top
  FROM (SELECT doc_id, g, count(*) AS n FROM g2 GROUP BY doc_id, g)
  GROUP BY doc_id
), dup5 AS (
  SELECT doc_id, sum(n)::BIGINT AS n_5grams,
         sum(CASE WHEN n > 1 THEN n ELSE 0 END)::BIGINT AS n_dup
  FROM (SELECT doc_id, g, count(*) AS n FROM g5 GROUP BY doc_id, g)
  GROUP BY doc_id
)
SELECT base.doc_id, base.n_chars,
       coalesce(top.g, '') AS top_bigram,
       coalesce(top.n, 0)::BIGINT AS top_bigram_n,
       floor({SCALE} * coalesce(top.n * length(top.g), 0)::DOUBLE
             / greatest(base.n_chars, 1))::BIGINT
         AS top_bigram_frac_x10k,
       coalesce(dup5.n_5grams, 0)::BIGINT AS n_5grams,
       floor({SCALE} * coalesce(dup5.n_dup, 0)::DOUBLE
             / greatest(coalesce(dup5.n_5grams, 0), 1))::BIGINT
         AS dup_5gram_frac_x10k
FROM base
LEFT JOIN (SELECT doc_id, top.n AS n, top.g AS g FROM top2) top
       USING (doc_id)
LEFT JOIN dup5 USING (doc_id)
"""


def sql_winnow_fingerprints(rel: str, k: int = 5, w: int = 4,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            where: str = "TRUE") -> str:
    """DuckDB twin of winnow_fingerprints."""
    norm = (rf"trim(regexp_replace(lower({text_col}), '\s+', ' ', 'g'))")
    return f"""
WITH docs AS (
  SELECT {id_col} AS doc_id, {norm} AS t FROM {rel} WHERE {where}
), shingles AS (
  SELECT doc_id, i AS pos, md5(substr(t, i::INT, {k})) AS h
  FROM docs, unnest(range(1, greatest(length(t) - {k} + 1, 1) + 1))
       AS u(i)
)
SELECT DISTINCT doc_id,
       min(h) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
         AS fp
FROM shingles
"""


# ---------------------------------------------------------------------------
# oracle SQL generators (same constants, DuckDB dialect)
# ---------------------------------------------------------------------------

def sql_token_count(col: str) -> str:
    return f"len(regexp_extract_all({col}, '{TOKEN_RE}'))::BIGINT"


def sql_ws_token_count(col: str) -> str:
    return rf"len(regexp_extract_all({col}, '\S+'))::BIGINT"


def sql_fingerprint(col: str) -> str:
    return rf"md5(trim(regexp_replace(lower({col}), '\s+', ' ', 'g')))"


def sql_stats_select(col: str = "text") -> str:
    """SELECT-list fragment matching with_text_stats."""
    stop = _stop_re()
    return (
        f"length({col})::BIGINT AS n_chars, "
        f"{sql_token_count(col)} AS n_tokens, "
        f"{sql_ws_token_count(col)} AS n_ws_tokens, "
        f"len(regexp_extract_all({col}, '{PUNCT_RE}'))::BIGINT AS n_punct, "
        f"len(regexp_extract_all(lower({col}), '{stop}'))::BIGINT AS n_stop"
    )


def sql_quality_select() -> str:
    """SELECT-list fragment over the stats columns (2nd CTE level)."""
    return (
        f"floor({SCALE} * n_stop::DOUBLE / greatest(n_ws_tokens,1))::BIGINT"
        " AS stop_ratio_x10k, "
        f"floor({SCALE} * n_punct::DOUBLE / greatest(n_chars,1))::BIGINT"
        " AS punct_ratio_x10k, "
        f"floor({SCALE} * greatest(n_chars,1)::DOUBLE /"
        " greatest(n_ws_tokens,1))::BIGINT AS mean_tok_len_x10k, "
        "(n_ws_tokens >= 10 AND n_chars >= 50 AND "
        f"floor({SCALE} * n_punct::DOUBLE / greatest(n_chars,1)) < 2000)"
        " AS quality_ok"
    )


def sql_lang_id(col: str = "text") -> str:
    """CASE expression mirroring lang_id_col (argmax, lang-asc ties)."""
    langs = sorted(LANG_MARKERS)
    score = {
        lang: f"len(regexp_extract_all(lower({col}), '{_marker_re(lang)}'))"
        for lang in langs
    }
    best = "greatest(" + ", ".join(score[lang] for lang in langs) + ")"
    whens = " ".join(
        f"WHEN {score[lang]} = {best} THEN '{lang}'" for lang in langs
    )
    return f"CASE WHEN {best} = 0 THEN 'und' {whens} ELSE 'und' END"


# ---------------------------------------------------------------------------
# vocabulary coverage (tokenizer/vocab construction diagnostics)
# ---------------------------------------------------------------------------

def vocab_coverage(df: DataFrame, top_v: int = 100,
                   text_col: str = "text") -> DataFrame:
    """Top-``top_v`` tokens by corpus frequency with cumulative
    coverage — the curve a tokenizer/vocab build reads off ("how much
    of the corpus do the first V types cover?").

    → (rank, token, n, cum_cov_x10k); rank by (n desc, token asc) —
    a total order, deterministic across engines.

    Scale shape: tokens explode once into a groupBy(token) with
    map-side combine — the Zipf head ("the") partial-aggregates inside
    each task, so the exchange carries ≤ |vocab| rows per task, not
    corpus token occurrences.  The global top-V is a
    TakeOrderedAndProject; the cumulative window then runs over V rows
    only (V ≪ anything), and the corpus-total token count broadcasts
    as a 1-row aggregate.  Nothing downstream of the single
    token-keyed exchange depends on corpus size.
    """
    from pyspark.sql import Window

    from gaia_spark.functions.retrieval import WORD_SPLIT_RE

    toks = F.filter(F.split(F.lower(F.col(text_col)),
                            WORD_SPLIT_RE),
                    lambda t: t != "")
    freq = (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    )
    total = freq.agg(F.sum("n").alias("n_total"))
    top = (freq.orderBy(F.col("n").desc(), "token").limit(top_v)
           .join(F.broadcast(total)))
    w = (Window.orderBy(F.col("n").desc(), "token")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return top.select(
        F.row_number().over(
            Window.orderBy(F.col("n").desc(), "token")).alias("rank"),
        "token", "n",
        F.floor(F.lit(SCALE) * F.sum("n").over(w).cast("double")
                / F.col("n_total").cast("double"))
        .alias("cum_cov_x10k"),
    )


def sql_vocab_coverage(rel: str, top_v: int = 100,
                       text_col: str = "text") -> str:
    """DuckDB twin of vocab_coverage."""
    from gaia_spark.functions.retrieval import WORD_SPLIT_RE

    return f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower({text_col}),
                                               '{WORD_SPLIT_RE}'),
                            t -> t <> '')) AS token
  FROM {rel}
), freq AS (
  SELECT token, count(*)::BIGINT AS n FROM toks GROUP BY token
), total AS (
  SELECT sum(n)::BIGINT AS n_total FROM freq
), top AS (
  SELECT token, n FROM freq ORDER BY n DESC, token LIMIT {top_v}
)
SELECT row_number() OVER (ORDER BY n DESC, token) AS rank,
       token, n,
       floor({SCALE} * (sum(n) OVER (ORDER BY n DESC, token
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW))::DOUBLE
             / n_total::DOUBLE)::BIGINT AS cum_cov_x10k
FROM top, total
"""


# ---------------------------------------------------------------------------
# Token co-occurrence lift (PMI-style association, integerized)
# ---------------------------------------------------------------------------


def cooccur_lift(df: DataFrame, top_v: int = 50, min_pairs: int = 2,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Document-level co-occurrence statistics for the ``top_v`` most
    document-frequent tokens — the KG-construction primer for "which
    entity surfaces associate?" (PMI edges seed relation candidates
    and disambiguation priors).

    → (tok1, tok2, n_pair, df1, df2, lift_x10k) with tok1 < tok2,
    where lift = P(t1,t2) / (P(t1)·P(t2)) over documents, reported as
    floor(1e4 · n_pair · n_docs / (df1 · df2)) — all-BIGINT arithmetic,
    so the DuckDB twin is hash-exact (PMI itself is just log(lift),
    monotone; the log stays out of the contract to keep it integral).

    Scale shape: tokens explode in-row into ONE distinct(doc, token)
    exchange with map-side combine; the vocabulary is a
    TakeOrderedAndProject over the token-df aggregate (V rows,
    deterministic (df desc, token) order) and BROADCASTS to both
    sides of the pair join, so the per-doc self-join fan-out is
    bounded by C(V,2) regardless of document length; the pair count
    is one more map-side-combined exchange keyed on the (tok1, tok2)
    pair; n_docs rides a 1-row broadcast.  Nothing after the
    distinct(doc, token) exchange scales with corpus bytes.
    """
    from gaia_spark.functions.retrieval import WORD_SPLIT_RE

    toks_arr = F.filter(F.split(F.lower(F.col(text_col)), WORD_SPLIT_RE),
                        lambda t: t != "")
    doc_tok = (
        df.select(F.col(id_col).alias("doc"),
                  F.explode(toks_arr).alias("token"))
        .distinct()
    )
    vocab = (
        doc_tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), "token").limit(top_v)
    )
    tv = doc_tok.join(F.broadcast(vocab), "token")
    n_docs = df.select(F.count_distinct(id_col).alias("n_docs"))
    left = tv.select("doc", F.col("token").alias("tok1"),
                     F.col("df").alias("df1"))
    right = tv.select("doc", F.col("token").alias("tok2"),
                      F.col("df").alias("df2"))
    return (
        left.join(right, "doc")
        .filter(F.col("tok1") < F.col("tok2"))
        .groupBy("tok1", "tok2", "df1", "df2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pairs)
        .join(F.broadcast(n_docs))
        .select(
            "tok1", "tok2", "n_pair", "df1", "df2",
            F.expr(f"({SCALE} * n_pair * n_docs) div (df1 * df2)")
            .cast("bigint").alias("lift_x10k"),
        )
    )


def sql_cooccur_lift(rel: str, top_v: int = 50, min_pairs: int = 2,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> str:
    """DuckDB twin of cooccur_lift (same integer contract)."""
    from gaia_spark.functions.retrieval import WORD_SPLIT_RE

    return f"""
WITH doc_tok AS (
  SELECT DISTINCT {id_col} AS doc,
         unnest(list_filter(string_split_regex(lower({text_col}),
                                               '{WORD_SPLIT_RE}'),
                            t -> t <> '')) AS token
  FROM {rel}
), vocab AS (
  SELECT token, count(*)::BIGINT AS df FROM doc_tok GROUP BY token
  ORDER BY df DESC, token LIMIT {top_v}
), tv AS (
  SELECT d.doc, d.token, v.df FROM doc_tok d JOIN vocab v USING (token)
), nd AS (
  SELECT count(DISTINCT {id_col})::BIGINT AS n_docs FROM {rel}
)
SELECT a.token AS tok1, b.token AS tok2,
       count(*)::BIGINT AS n_pair,
       a.df AS df1, b.df AS df2,
       (({SCALE} * count(*)::BIGINT * any_value(n_docs))
        // (a.df * b.df))::BIGINT AS lift_x10k
FROM tv a JOIN tv b ON a.doc = b.doc AND a.token < b.token, nd
GROUP BY a.token, b.token, a.df, b.df
HAVING count(*) >= {min_pairs}
"""


def readability_stats(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Flesch reading-ease per document, exact integer fixed-point:
    ``flesch_x1000 = 206835 − (1015·W) div S − (84600·Sy) div W``
    (the classic formula ×1000 with BOTH ratio terms floor-divided —
    pure BIGINT, hash-identical cross-engine where the float formula
    would diverge in the last ulp).

    The readability axis of quality filtering (with_quality covers
    length/punct/stopwords; Gopher repetition covers duplication):
    very low scores flag machine-generated/legalese sludge, implausibly
    high ones flag word-salad.  Syllables use the standard vowel-group
    heuristic ``max(1, count of [aeiouy]+ runs)`` per word — not
    linguistically perfect, deterministically identical in both
    engines, which is the contract (the lm.py centibit posture).

    Sentences = non-empty ``[.!?]+``-delimited segments (min 1 so a
    fragment without terminal punctuation is one sentence, and the
    division is total).

    Scale shape: everything is in-row whole-stage-codegen (split /
    transform / aggregate) — a narrow projection, zero exchanges,
    zero UDFs; the scan reads only (id, text).
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: t != "")
    sents = F.filter(
        F.split(F.col(text_col), r"[.!?]+"),
        lambda s: F.trim(s) != "")
    syll = F.aggregate(
        "toks",
        F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.greatest(
            F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"),
                                        F.lit(0))),
            F.lit(1)),
    )
    out = (
        df.select(F.col(id_col).alias("doc_id"),
                  toks.alias("toks"), sents.alias("sents"))
        .select(
            "doc_id",
            F.size("toks").cast("bigint").alias("n_words"),
            F.greatest(F.size("sents"), F.lit(1)).cast("bigint")
            .alias("n_sents"),
            syll.alias("n_syll"),
        )
        .filter(F.col("n_words") > 0)
    )
    return out.select(
        "doc_id", "n_words", "n_sents", "n_syll",
        (F.lit(206835).cast("bigint")
         - F.expr("(1015 * n_words) div n_sents")
         - F.expr("(84600 * n_syll) div n_words"))
        .alias("flesch_x1000"),
    )


def sql_readability_stats(rel: str, text_col: str = "text",
                          id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`readability_stats`."""
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         list_filter(string_split_regex(lower({text_col}), '\\s+'),
                     t -> t <> '') AS toks,
         list_filter(string_split_regex({text_col}, '[.!?]+'),
                     s -> trim(s) <> '') AS sents
  FROM {rel}
), counted AS (
  SELECT doc_id,
         len(toks)::BIGINT AS n_words,
         greatest(len(sents), 1)::BIGINT AS n_sents,
         coalesce(list_sum(list_transform(toks,
             w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')),
                           1))), 0)::BIGINT AS n_syll
  FROM base WHERE len(toks) > 0
)
SELECT doc_id, n_words, n_sents, n_syll,
       (206835 - (1015 * n_words) // n_sents
               - (84600 * n_syll) // n_words)::BIGINT AS flesch_x1000
FROM counted
"""


def collocations(df: DataFrame, min_count: int = 5,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """ADJACENT-bigram collocation mining → (w1, w2, c12, c1, c2,
    lift_x100): phrase candidates by pointwise lift over consecutive
    token pairs — the phrase-mining statistic next to
    :func:`cooccur_lift`'s DOCUMENT-level association (a collocation
    like "new york" is adjacency-bound; doc-level co-occurrence
    can't see it).

    ``lift = P(w1w2) / (P(w1)·P(w2)) = c12·Nu² / (Nb·c1·c2)``
    computed with the double-floor recipe pinned in the twin:
    ``t = (c12·Nu) div c1; lift_x100 = (100·t·Nu) div (Nb·c2)`` — no
    intermediate exceeds ~1e13 at oracle scale (headroom seam: at
    Nu ≳ 1e9 unigrams switch to per-shard counts + merged marginals,
    same as the KN trainer).  PMI = log(lift) is monotone, so the
    log stays out of the integral contract.

    Scale shape: bigrams stay in-row until ONE (w1, w2) map-side-
    combined count; unigram marginals are a vocabulary-scale
    aggregate re-attached by broadcastable joins; the two corpus
    totals ride a 1-row cross join.
    """
    from gaia_spark.functions.retrieval import WORD_SPLIT_RE

    toks = F.filter(F.split(F.lower(F.col(text_col)), WORD_SPLIT_RE),
                    lambda t: t != "")
    td = df.select(toks.alias("ts")).localCheckpoint()
    uni = (td.select(F.explode("ts").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    bi = (td.filter(F.size("ts") >= 2)
          .select(F.explode(F.expr(
              "transform(sequence(1, size(ts) - 1), "
              "i -> struct(ts[i-1] AS w1, ts[i] AS w2))")).alias("p"))
          .select("p.w1", "p.w2")
          .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")))
    nu = uni.agg(F.sum("c").alias("n_uni"))
    nb = bi.agg(F.sum("c12").alias("n_bi"))
    return (
        bi.filter(F.col("c12") >= min_count)
        .join(uni.select(F.col("w").alias("w1"),
                         F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"),
                         F.col("c").alias("c2")), "w2")
        .crossJoin(nu).crossJoin(nb)
        .select(
            "w1", "w2", "c12", "c1", "c2",
            F.expr("(100 * ((c12 * n_uni) div c1) * n_uni)"
                   " div (n_bi * c2)").alias("lift_x100"))
    )


def sql_collocations(rel: str, min_count: int = 5,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`collocations` (same tokenizer, same
    double-floor order)."""
    from gaia_spark.functions.retrieval import WORD_SPLIT_RE

    return f"""
WITH toks AS (
  SELECT list_filter(string_split_regex(lower({text_col}),
                                        '{WORD_SPLIT_RE}'),
                     t -> t <> '') AS ts
  FROM {rel}
), uni AS (
  SELECT w, count(*)::BIGINT AS c FROM (
    SELECT unnest(ts) AS w FROM toks
  ) GROUP BY w
), pairs AS (
  SELECT ts, unnest(range(1, len(ts))) AS i FROM toks
), bi AS (
  SELECT ts[i] AS w1, ts[i + 1] AS w2, count(*)::BIGINT AS c12
  FROM pairs GROUP BY 1, 2
), nu AS (SELECT sum(c)::BIGINT AS n_uni FROM uni),
nb AS (SELECT sum(c12)::BIGINT AS n_bi FROM bi)
SELECT bi.w1, bi.w2, bi.c12, u1.c AS c1, u2.c AS c2,
       ((100 * ((bi.c12 * n_uni) // u1.c) * n_uni)
        // (n_bi * u2.c))::BIGINT AS lift_x100
FROM bi
JOIN uni u1 ON u1.w = bi.w1
JOIN uni u2 ON u2.w = bi.w2
CROSS JOIN nu CROSS JOIN nb
WHERE bi.c12 >= {min_count}
"""
