"""Linear quality classifier — the fastText-style "does this look
like good training text" gate (GPT-3 / CCNet quality filtering), with
ENGINE-EXACT training dynamics.

Real pipelines train a linear classifier over cheap text features and
keep documents the model scores as "high quality".  Float SGD is
order-dependent and cannot survive a cross-engine hash compare, so
this kernel trains a FULL-BATCH PERCEPTRON in pure int64:

    round t:  margin_i = Σ_j w_j·x_ij          (BIGINT dot product)
              pred_i   = 1 if margin_i > 0 else 0
              w_j     += Σ_i (y_i − pred_i)·x_ij

Every update is a commutative integer sum → bit-identical under any
partitioning, task order, or engine; ties (margin == 0) classify as 0
everywhere.  The perceptron is the classical mistake-driven linear
trainer (Rosenblatt 1958; Freund & Schapire 1999 for the batch/voted
form) — the same model family as fastText's linear head.

Features are exact-integer text statistics computable identically in
Spark and DuckDB (length / replace-count tricks — the
text_analysis.py convention): chars, word count, stopword hits,
vowel count, and the constant bias.  Labels come from the caller
(default: lang = 'en', standing in for the "reference corpus vs web
noise" labeling of CCNet).

Scale shape (the 100 TB path): features are computed ONCE in a
narrow whole-stage-codegen projection and localCheckpoint-ed; each
training round is ONE map-side-combined aggregate that reduces the
corpus to d ≤ 8 BIGINTs (the weight delta), collected driver-side
(d rows — bounded like the k-means centroid fetch,
clustering.py:109) and re-broadcast as literals in the next round's
expression.  No UDFs, no Python on the data path, no per-round
corpus shuffle — gradient traffic is O(d), not O(rows).

DuckDB twin: ``sql_perceptron_scores`` unrolls rounds as single-row
weight CTEs (the unrolled-iteration oracle pattern of
clustering.py / operators/graph.py) and hash-matches bit-for-bit.

Reference parity: GAIA gates documents before extraction by fixed
heuristics (SURVEY.md §2.2 T1/T13); a corpus-scale engine must also
FIT the gate — beyond-reference scope like the BPE trainer (bpe.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: stopwords probed as whole-word-ish substring hits (padded text) —
#: a fixed, cross-engine-exact feature, not a linguistic claim.
_STOP = ("the", "and", "is", "of", "to")

_VOWELS = "aeiou"

#: feature column names, in weight-vector order (x0 = bias).
FEATURES = ("f_bias", "f_chars", "f_words", "f_stop", "f_vowel")


def _count_sub(col: Column, sub: str) -> Column:
    """# occurrences of ``sub`` — length-difference trick, exact."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(sub), F.lit(""))))
        / len(sub)
    ).cast("long")


def feature_frame(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  label: Column | None = None) -> DataFrame:
    """→ (doc_id, y, f_bias, f_chars, f_words, f_stop, f_vowel).

    All BIGINT.  ``label`` defaults to ``lang = 'en'``.
    """
    t = F.lower(F.col(text_col))
    padded = F.concat(F.lit(" "), t, F.lit(" "))
    y = label if label is not None else (F.col("lang") == "en")
    words = F.filter(F.split(t, "[^a-z]+"), lambda w: w != "")
    stop_hits = None
    for s in _STOP:
        c = _count_sub(padded, f" {s} ")
        stop_hits = c if stop_hits is None else stop_hits + c
    vowels = None
    for v in _VOWELS:
        c = _count_sub(t, v)
        vowels = c if vowels is None else vowels + c
    return docs.select(
        F.col(id_col).alias("doc_id"),
        y.cast("int").cast("long").alias("y"),
        F.lit(1).cast("long").alias("f_bias"),
        F.length(t).cast("long").alias("f_chars"),
        F.size(words).cast("long").alias("f_words"),
        stop_hits.alias("f_stop"),
        vowels.alias("f_vowel"),
    )


def _margin(w: list[int]) -> Column:
    m = F.lit(0).cast("long")
    for wj, fj in zip(w, FEATURES):
        m = m + F.lit(int(wj)) * F.col(fj)
    return m


def perceptron_train(feats: DataFrame, rounds: int = 3) -> list[int]:
    """→ final weight vector after ``rounds`` full-batch updates from
    w = 0.  One d-value aggregate per round; deterministic."""
    feats = feats.localCheckpoint()
    w = [0] * len(FEATURES)
    for _ in range(rounds):
        err = (F.col("y")
               - F.when(_margin(w) > 0, F.lit(1)).otherwise(F.lit(0))
               ).cast("long")
        row = feats.agg(*[
            F.sum(err * F.col(fj)).alias(fj) for fj in FEATURES
        ]).collect()[0]
        w = [wj + int(row[fj] or 0) for wj, fj in zip(w, FEATURES)]
    return w


def perceptron_scores(docs: DataFrame, rounds: int = 3,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Train on ``docs`` (label = lang = 'en'), score ``docs``.

    → (doc_id, margin, pred, label): exact int64 margins under the
    final weights; ``pred`` = margin > 0.
    """
    feats = feature_frame(docs, text_col, id_col).localCheckpoint()
    w = perceptron_train(feats, rounds)
    return feats.select(
        "doc_id",
        _margin(w).alias("margin"),
        F.when(_margin(w) > 0, F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("pred"),
        F.col("y").alias("label"),
    )


# --------------------------------------------------------------------
# DuckDB twin
# --------------------------------------------------------------------

def _sql_count_sub(expr: str, sub: str) -> str:
    s = sub.replace("'", "''")
    return (f"((length({expr}) - length(replace({expr}, '{s}', '')))"
            f" // {len(sub)})::BIGINT")


def _sql_feats(rel: str, text_col: str, id_col: str) -> str:
    t = f"lower({text_col})"
    padded = f"(' ' || {t} || ' ')"
    stop = " + ".join(_sql_count_sub(padded, f" {s} ") for s in _STOP)
    vowel = " + ".join(_sql_count_sub(t, v) for v in _VOWELS)
    return f"""feats AS (
  SELECT {id_col} AS doc_id,
         (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS y,
         1::BIGINT AS f_bias,
         length({t})::BIGINT AS f_chars,
         len(list_filter(string_split_regex({t}, '[^a-z]+'),
                         w -> w <> ''))::BIGINT AS f_words,
         ({stop}) AS f_stop,
         ({vowel}) AS f_vowel
  FROM {rel}
)"""


def _sql_margin(wcte: str) -> str:
    return " + ".join(f"{wcte}.{fj} * f.{fj}" for fj in FEATURES)


def sql_perceptron_scores(rel: str, rounds: int = 3,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`perceptron_scores` — rounds unrolled as
    single-row weight CTEs."""
    zero = ", ".join(f"0::BIGINT AS {fj}" for fj in FEATURES)
    parts = [_sql_feats(rel, text_col, id_col),
             f"w_0 AS (SELECT {zero})"]
    for k in range(1, rounds + 1):
        m = _sql_margin("w")
        upd = ", ".join(
            f"coalesce(sum((f.y - (CASE WHEN {m} > 0 THEN 1 ELSE 0 END))"
            f" * f.{fj}), 0)::BIGINT AS {fj}"
            for fj in FEATURES)
        parts.append(f"d_{k} AS (SELECT {upd} FROM feats f, w_{k - 1} w)")
        add = ", ".join(f"w.{fj} + d.{fj} AS {fj}" for fj in FEATURES)
        parts.append(f"w_{k} AS (SELECT {add} FROM w_{k - 1} w, d_{k} d)")
    m = _sql_margin("w")
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT f.doc_id,
       ({m})::BIGINT AS margin,
       (CASE WHEN {m} > 0 THEN 1 ELSE 0 END)::BIGINT AS pred,
       f.y AS label
FROM feats f, w_{rounds} w""")


def calibration_table(scored: DataFrame,
                      bucket: int = 500) -> DataFrame:
    """Score-calibration table over classifier output → per margin
    bucket (margin div ``bucket``): (bucket, n, n_pos,
    pos_rate_x10k, n_tp).

    The standard eval artifact for a quality gate: before picking a
    keep threshold over 10^12 documents you read precision per score
    band, not one global accuracy.  Exact integers (floor-div bucket
    + x10k rates) so the table is hash-identical cross-engine.

    Scale shape: ONE map-side-combined aggregate over vocabulary-
    scale buckets — the corpus is touched exactly once, after the
    scoring pass it shares a scan with.
    """
    return (
        scored.groupBy(
            F.expr(f"margin div {bucket}").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("label").cast("bigint").alias("n_pos"),
             F.sum(F.expr("CASE WHEN pred = 1 AND label = 1 THEN 1 "
                          "ELSE 0 END")).cast("bigint").alias("n_tp"))
        .select(
            "bucket", "n", "n_pos",
            F.expr("(10000 * n_pos) div n").alias("pos_rate_x10k"),
            "n_tp")
    )


def sql_calibration_table(scored_sql: str, bucket: int = 500) -> str:
    """DuckDB twin of :func:`calibration_table`."""
    return f"""
SELECT margin // {bucket} AS bucket,
       count(*)::BIGINT AS n,
       sum(label)::BIGINT AS n_pos,
       ((10000 * sum(label)) // count(*))::BIGINT AS pos_rate_x10k,
       sum(CASE WHEN pred = 1 AND label = 1 THEN 1 ELSE 0 END)
         ::BIGINT AS n_tp
FROM ({scored_sql})
GROUP BY 1
"""
