"""Sequence packing — fixed-length training-sequence assembly.

Pretraining dataloaders consume fixed ``seq_len``-token windows cut
from a concatenation of documents ("concatenate-and-chunk" packing).
The doc → (pack id, offset) mapping is pure integer arithmetic over a
running token count, BUT one corpus-wide running sum is a one-reducer
bottleneck at 10^12 docs.  Real pipelines shard first, so packing here
is per BUCKET: docs are hash-assigned to ``n_buckets`` independent
shards (same engine/partitioning-independent md5 idiom as
sampling.py), each shard packs its own token stream, and the running
sum is a window partitioned by shard — parallel across shards, one
shuffle total.  Token counts use the shared BPE-ish recipe
(text_analysis.token_count_col), so the DuckDB twin computes the
identical table; all outputs are integers.

Scale: shuffle volume is one (bucket, doc_id, n_tokens) row per doc —
the text never moves; ``n_buckets`` bounds per-window state (pick
~10·cores on a cluster so AQE can balance shards).  Zero-token docs
contribute nothing to the stream and are dropped (the quality gate
upstream removes them anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gaia_spark.functions import text_analysis as ta
from gaia_spark.functions.sampling import hash_bucket, sql_hash_bucket

#: default shard count for tests/benches (a cluster uses ~10·cores)
N_BUCKETS = 8


def pack_assignments(df: DataFrame, seq_len: int,
                     n_buckets: int = N_BUCKETS,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """→ one row per non-empty doc: (id_col, bucket, n_tokens,
    start_tok, first_pack, last_pack, n_packs).

    ``start_tok`` is the doc's offset in its shard's concatenated
    token stream (docs concatenated in ``id_col`` order);
    ``first_pack``/``last_pack`` are the shard-local indices of the
    seq_len-token windows the doc lands in (a doc longer than the
    remaining window spills into the next pack — n_packs counts the
    spans).
    """
    toks = df.select(
        F.col(id_col),
        hash_bucket(F.col(id_col).cast("string"), n_buckets)
        .alias("bucket"),
        ta.token_count_col(F.col(text_col)).alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (Window.partitionBy("bucket").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    pos = toks.withColumn(
        "start_tok", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    first = F.floor(F.col("start_tok") / seq_len)
    last = F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / seq_len)
    return pos.select(
        id_col, "bucket", "n_tokens", "start_tok",
        first.alias("first_pack"), last.alias("last_pack"),
        (last - first + 1).alias("n_packs"),
    )


def sql_pack_assignments(rel: str, seq_len: int,
                         n_buckets: int = N_BUCKETS,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         where: str = "TRUE") -> str:
    """DuckDB twin of pack_assignments."""
    return f"""
WITH toks AS (
  SELECT {id_col},
         {sql_hash_bucket(f"{id_col}::VARCHAR", n_buckets)} AS bucket,
         {ta.sql_token_count(text_col)}::BIGINT AS n_tokens
  FROM {rel} WHERE {where}
), pos AS (
  SELECT *,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY bucket ORDER BY {id_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0)::BIGINT AS start_tok
  FROM toks WHERE n_tokens > 0
)
SELECT {id_col}, bucket, n_tokens, start_tok,
       floor(start_tok / {seq_len})::BIGINT AS first_pack,
       floor((start_tok + n_tokens - 1) / {seq_len})::BIGINT AS last_pack,
       (floor((start_tok + n_tokens - 1) / {seq_len})
        - floor(start_tok / {seq_len}) + 1)::BIGINT AS n_packs
FROM pos
"""
