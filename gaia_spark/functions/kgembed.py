"""DistMult triple scoring with deterministic integer embeddings —
the KG-completion scorer paired with functions/negsample.py's
corrupted-tail generator.

A KG-embedding ranker (DistMult, Yang et al. 2015) scores a triple
as ``<e_s, w_r, e_o> = Σ_d e_s[d]·w_r[d]·e_o[d]``.  The trained
float vectors are an external artifact this sandbox can't host, so
vectors here are md5-DERIVED integers (each dimension an independent
hash of ``name:dim`` folded into [-500, 500]) — the same
deterministic-fake-model discipline the vision suite uses: the
Spark-side topology (vocabulary-scale embedding dictionary,
broadcast joins onto the triple stream, in-row vectorized dot
products) is exactly what real trained vectors would ride, and the
exact-integer contract lets the DuckDB twin pin every score.

Scale shape: embeddings are built ONCE per distinct entity/predicate
(vocabulary-scale, in-row md5 — no shuffle beyond the distinct) and
join onto triples by key — broadcast while the dictionary fits
(byte-gate upstream), shuffle-join otherwise.  The score itself is
one ``aggregate(zip_with(...))`` over BIGINT arrays: whole-stage
codegen, no Python, no explode.  |term| ≤ 500³ = 1.25e8, ×DIM = 1e9
— comfortably BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: embedding dimensionality — small so the SQL twin's unrolled
#: 3·DIM md5 calls per row stay cheap at oracle scale; the Spark
#: plan shape is DIM-independent (arrays, not columns).
DIM = 8

#: per-dimension value range: hex32 % 1001 - 500 ∈ [-500, 500]
_MOD = 1001
_OFF = 500


def _hex32(col: Column) -> Column:
    return F.conv(F.substring(col, 1, 8), 16, 10).cast("bigint")


def embedding_vector(name: Column) -> Column:
    """array<bigint> of DIM md5-derived dims for ``name``."""
    return F.array(*[
        (_hex32(F.md5(F.concat(name, F.lit(f":{d}")))) % _MOD - _OFF)
        .cast("bigint")
        for d in range(DIM)
    ])


def distmult_scores(triples: DataFrame) -> DataFrame:
    """→ (subj, pred, obj, score): DistMult score per input triple.

    Builds the entity dictionary from distinct subj ∪ obj and the
    relation dictionary from distinct pred, then joins both onto the
    triple stream (Catalyst broadcasts the vocabulary-scale sides
    under AQE) and folds the three-way product in-row.
    """
    ents = (
        triples.select(F.col("subj").alias("name"))
        .unionByName(triples.select(F.col("obj").alias("name")))
        .distinct()
        .select("name", embedding_vector(F.col("name")).alias("vec"))
    )
    rels = (
        triples.select(F.col("pred").alias("name")).distinct()
        .select("name", embedding_vector(F.col("name")).alias("vec"))
    )
    t = (
        triples
        .join(ents.select(F.col("name").alias("subj"),
                          F.col("vec").alias("s_vec")), "subj")
        .join(rels.select(F.col("name").alias("pred"),
                          F.col("vec").alias("r_vec")), "pred")
        .join(ents.select(F.col("name").alias("obj"),
                          F.col("vec").alias("o_vec")), "obj")
    )
    sr = F.zip_with("s_vec", "r_vec", lambda a, b: a * b)
    sro = F.zip_with(sr, F.col("o_vec"), lambda a, b: a * b)
    return t.select(
        "subj", "pred", "obj",
        F.aggregate(sro, F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x).alias("score"),
    )


def _sql_dim_term(name: str, d: int) -> str:
    return (f"(('0x' || substr(md5({name} || ':{d}'), 1, 8))::BIGINT"
            f" % {_MOD} - {_OFF})")


def sql_distmult_scores(triples_sql: str) -> str:
    """DuckDB twin: the same Σ_d s·r·o with inline per-dim hashes
    (the twin trades the dictionary join for per-row recompute —
    bit-identical result, oracle-scale only)."""
    terms = " + ".join(
        f"({_sql_dim_term('subj', d)} * {_sql_dim_term('pred', d)}"
        f" * {_sql_dim_term('obj', d)})"
        for d in range(DIM))
    return f"""
SELECT subj, pred, obj, ({terms})::BIGINT AS score
FROM ({triples_sql})
"""


def score_profile(scored: DataFrame) -> DataFrame:
    """Compact pin of a scored triple table: per predicate, the
    count, the exact score sum, and min/max (any one wrong score
    shifts the sum).  One map-side-combined aggregate."""
    return scored.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.sum("score").alias("sum_score"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )


def sql_score_profile(scored_sql: str) -> str:
    """DuckDB twin of :func:`score_profile`."""
    return f"""
SELECT pred, count(*)::BIGINT AS n_triples,
       sum(score)::BIGINT AS sum_score,
       min(score)::BIGINT AS min_score,
       max(score)::BIGINT AS max_score
FROM ({scored_sql})
GROUP BY pred
"""
