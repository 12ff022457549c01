"""Keyword retrieval over the corpus: BM25 scoring.

A training-data pipeline uses lexical retrieval constantly — targeted
quality audits ("show me docs about X"), domain mixture probes,
hard-negative mining for embedding models — and at 100 TB it must be
a scan-shaped job, not an index build.  BM25 over a FIXED small query
term set is exactly that: per-document term frequencies are computed
IN-ROW (no token explode, no inverted index), the corpus statistics
(N, avgdl, per-term document frequencies) reduce to ONE row via a
map-side-combined aggregate, and that row broadcasts back onto the
scoring pass.  Two scans, zero corpus-wide exchanges keyed by
anything — the final top-k is a TakeOrderedAndProject (per-partition
heap + tiny driver merge), never a full sort.

Cross-engine determinism: tokenization shares one regex constant with
the DuckDB twin; tf/dl are integers; idf uses ln() on both engines
(IEEE doubles, same operand order), and the score is floor-integerized
x10k before it participates in ordering or hashing, so a sub-ulp
libm difference cannot reorder results off a floor boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gaia_spark.functions.text_analysis import SCALE

#: word tokenizer shared with the SQL twin: lowercase, split on
#: non-alphanumeric runs (syntax common to Java regex and DuckDB RE2).
WORD_SPLIT_RE = r"[^a-z0-9]+"

#: BM25 free parameters (Robertson/Sparck-Jones defaults).
BM25_K1 = 1.2
BM25_B = 0.75


def _tf(term: str):
    return F.size(F.filter("toks", lambda t: t == F.lit(term)))


def bm25_topk(df: DataFrame, terms: list[str], k: int = 20,
              text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` documents by BM25 against a fixed term list.

    → (doc_id, dl, score_x10k, rank); rank by (score desc, doc_id) —
    a total order, so the cut is deterministic.  Docs matching no
    query term are dropped before the top-k (the overwhelming
    majority at corpus scale — the filter keeps the ordered cut
    skinny).

    Scale shape: pass 1 aggregates (N, Σdl, df per term) into one row
    (map-side combine; partials are a handful of longs per task);
    pass 2 re-scans with that row broadcast (a 1-row cross join is a
    BroadcastNestedLoopJoin of constant cost) and feeds the global
    top-k, which Spark executes as TakeOrderedAndProject.  tf columns
    are computed inside the row via higher-order functions — the
    token array never leaves the row, so nothing about |vocab| or
    |doc| enters any shuffle key.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)),
                            WORD_SPLIT_RE),
                    lambda t: t != "")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
    ).select(
        "doc_id",
        F.size("toks").cast("bigint").alias("dl"),
        *[_tf(t).cast("bigint").alias(f"tf_{i}")
          for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("bigint"))
          .alias(f"df_{i}") for i in range(len(terms))],
    )
    scored = base.join(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    norm = F.lit(BM25_K1) * (F.lit(1.0) - F.lit(BM25_B)
                             + F.lit(BM25_B)
                             * F.col("dl").cast("double") / avgdl)
    score = F.lit(0.0)
    for i in range(len(terms)):  # fixed left-to-right term order
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5)))
        tf = F.col(f"tf_{i}").cast("double")
        score = score + idf * (tf * (BM25_K1 + 1.0)) / (tf + norm)
    out = (
        scored.withColumn("score_x10k",
                          F.floor(F.lit(SCALE) * score))
        .filter(F.col("score_x10k") > 0)
        .select("doc_id", "dl", "score_x10k")
        .orderBy(F.col("score_x10k").desc(), "doc_id")
        .limit(k)
    )
    # rank over the k surviving rows only (a k-row window, not a
    # corpus window)
    from pyspark.sql import Window
    w = Window.orderBy(F.col("score_x10k").desc(), "doc_id")
    return out.withColumn("rank", F.row_number().over(w))


def sql_bm25_topk(rel: str, terms: list[str], k: int = 20,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> str:
    """DuckDB twin of bm25_topk (same tokenizer, same operand order)."""
    esc = [t.replace("'", "''") for t in terms]
    tf_cols = ",\n         ".join(
        f"len(list_filter(toks, t -> t = '{t}'))::BIGINT AS tf_{i}"
        for i, t in enumerate(esc))
    df_cols = ",\n         ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)::BIGINT AS df_{i}"
        for i in range(len(terms)))
    score = " + ".join(
        f"(ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * (tf_{i}::DOUBLE * ({BM25_K1} + 1.0))"
        f" / (tf_{i}::DOUBLE + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}"
        f" * dl::DOUBLE / (sum_dl::DOUBLE / n_docs))))"
        for i in range(len(terms)))
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         len(toks)::BIGINT AS dl,
         {tf_cols}
  FROM (SELECT {id_col},
               list_filter(string_split_regex(lower({text_col}),
                                              '{WORD_SPLIT_RE}'),
                           t -> t <> '') AS toks
        FROM {rel})
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl,
         {df_cols}
  FROM base
), scored AS (
  SELECT doc_id, dl,
         floor({SCALE} * ({score}))::BIGINT AS score_x10k
  FROM base, stats
), topk AS (
  SELECT * FROM scored WHERE score_x10k > 0
  ORDER BY score_x10k DESC, doc_id
  LIMIT {k}
)
SELECT doc_id, dl, score_x10k,
       row_number() OVER (ORDER BY score_x10k DESC, doc_id) AS rank
FROM topk
"""


def positional_postings(df: DataFrame, terms: list[str],
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Positional posting list for a FIXED term set → (doc_id, tok,
    pos) with 1-based positions.

    The term filter runs inside the explode's source expression, so
    only the query terms' positions ever leave the row — a
    1000-token doc posts ≤ a handful of rows, never 1000.  This is
    the scan-shaped phrase-query index: at 100 TB you materialize
    postings for the query's terms, not a corpus-wide inverted
    index.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), WORD_SPLIT_RE),
        lambda t: t != "")
    term_arr = F.array(*[F.lit(t) for t in sorted(set(terms))])
    posting = F.filter(
        F.expr("transform(sequence(1, size(ts)), "
               "i -> struct(ts[i-1] AS tok, i AS pos))"),
        lambda s: F.array_contains(term_arr, s["tok"]))
    return (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("ts"))
        .filter(F.size("ts") >= 1)
        .select("doc_id", F.explode(posting).alias("p"))
        .select("doc_id", F.col("p.tok").alias("tok"),
                F.col("p.pos").cast("bigint").alias("pos"))
    )


def phrase_match(df: DataFrame, phrase: list[str],
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Exact phrase query → (doc_id, n_occurrences ≥ 1): documents
    where ``phrase``'s terms appear CONSECUTIVELY, with the exact
    occurrence count (overlaps counted — "a a a" has two "a a").

    Built on :func:`positional_postings`: the k-th term's postings
    equi-join the first's on (doc_id, pos + k) — each join leg
    carries only (doc_id, pos) pairs for ONE query term, so the
    plan's volume is the phrase's rarest-term posting size, not the
    corpus.  Catalyst collapses the chain into one shuffle per term
    keyed identically (doc_id, pos-offset); a repeated term reuses
    the same posting scan (self-join, not a rescan).
    """
    assert len(phrase) >= 2, "phrase_match needs >= 2 terms"
    post = positional_postings(df, phrase, text_col, id_col)
    cur = (post.filter(F.col("tok") == phrase[0])
           .select("doc_id", F.col("pos").alias("p0")))
    for k, term in enumerate(phrase[1:], start=1):
        nxt = (post.filter(F.col("tok") == F.lit(term))
               .select("doc_id", (F.col("pos") - k).alias("p0")))
        cur = cur.join(nxt, ["doc_id", "p0"], "left_semi")
    return (cur.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_occurrences")))


def sql_phrase_match(rel: str, phrase: list[str],
                     text_col: str = "text",
                     id_col: str = "doc_id") -> str:
    """DuckDB twin: in-row adjacent-position scan (same tokenizer,
    same overlap semantics) — the twin pins the ANSWER; the Spark
    side pins the postings-join SHAPE."""
    assert len(phrase) >= 2
    conds = " AND ".join(
        f"ts[i + {k}] = '{t}'" for k, t in enumerate(phrase))
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         list_filter(string_split_regex(lower({text_col}),
                                        '{WORD_SPLIT_RE}'),
                     t -> t <> '') AS ts
  FROM {rel}
)
SELECT doc_id, n_occurrences FROM (
  SELECT doc_id,
         list_sum(list_transform(
           range(1, len(ts) - {len(phrase) - 1} + 1),
           i -> CASE WHEN {conds} THEN 1 ELSE 0 END))::BIGINT
           AS n_occurrences
  FROM toks
  WHERE len(ts) >= {len(phrase)}
)
WHERE n_occurrences >= 1
"""


#: RRF smoothing constant (the standard k=60 of Cormack et al. 2009)
RRF_K = 60

#: RRF fixed-point unit
RRF_SCALE = 1_000_000


def rrf_fuse(rankings: list[DataFrame], k: int = 20,
             id_col: str = "doc_id") -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists → (doc_id,
    rrf_x1e6, rank): ``rrf = Σ_lists 10^6 div (60 + rank_i)`` over
    the lists that contain the doc, re-ranked by (score desc, id).

    The standard zero-training ranker combiner (Cormack et al.
    2009): BM25 lists for different query facets, or a lexical list
    plus an ANN list, fuse without score calibration because only
    RANKS enter.  Integer floor division makes the fused score
    engine-exact — float 1/(k+r) sums would tie-break differently
    across ulps.

    Scale shape: each input is already a top-k (skinny); the fusion
    is one union + one id-keyed map-side-combined sum + a global
    TakeOrderedAndProject cut — no corpus access at all.
    """
    assert rankings, "rrf_fuse needs at least one ranking"
    parts = [
        r.select(F.col(id_col).alias("doc_id"),
                 F.expr(f"{RRF_SCALE} div ({RRF_K} + rank)")
                 .alias("part"))
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = (u.groupBy("doc_id")
             .agg(F.sum("part").cast("bigint").alias("rrf_x1e6")))
    from pyspark.sql import Window
    w = Window.orderBy(F.col("rrf_x1e6").desc(), F.col("doc_id"))
    return (fused.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("doc_id", "rrf_x1e6",
                    F.col("rank").cast("int").alias("rank")))


def sql_rrf_fuse(ranking_sqls: list[str], k: int = 20,
                 id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`rrf_fuse` over ranking subqueries that
    each expose (doc_id, rank)."""
    parts = " UNION ALL ".join(
        f"SELECT {id_col} AS doc_id, "
        f"{RRF_SCALE} // ({RRF_K} + rank) AS part FROM ({r})"
        for r in ranking_sqls)
    return f"""
WITH parts AS ({parts}),
fused AS (
  SELECT doc_id, sum(part)::BIGINT AS rrf_x1e6
  FROM parts GROUP BY doc_id
)
SELECT doc_id, rrf_x1e6,
       row_number() OVER (ORDER BY rrf_x1e6 DESC, doc_id)::INT
         AS rank
FROM fused
QUALIFY rank <= {k}
"""
