"""KG state maintenance: upsert a new crawl snapshot's triples into
the canonical triple table (SCD-style provenance).

A production KG is not rebuilt per crawl — each snapshot's extracted
triples MERGE into the running state: first_seen/last_seen/n_seen
provenance plus a status ('new' | 'confirmed' | 'stale') that drives
downstream decay/expiry policies.  SURVEY.md §2.2 T11 covers building
the canonical table; this is its incremental counterpart (reference
behavior: the pipeline re-emits full KBs per corpus — gaia README's
cross-document KB construction — so the merge semantics here are the
standard SCD2-lite rollup, pinned exactly by the DuckDB twin).

Scale shape: one map-side-combined aggregate over the incoming
snapshot (dups collapse before the join) + one full-outer join keyed
on the triple itself.  Both sides are skinny provenance rows — text
and mention payloads never enter this plan.  On a real cluster both
tables should be bucketed by xxhash64(subj, pred, obj) so the merge
is exchange-free (catalog.write_bucketed); AQE handles the Zipf skew
of hub subjects otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY = ["subj", "pred", "obj"]


def merge_triples(current: DataFrame, incoming: DataFrame) -> DataFrame:
    """Upsert ``incoming(subj, pred, obj, seen_ts)`` raw snapshot rows
    (duplicates allowed) into ``current(subj, pred, obj, first_seen,
    last_seen, n_seen)``.

    → (subj, pred, obj, first_seen, last_seen, n_seen, status):
    'new' = triple absent from current; 'confirmed' = present in
    both (provenance rolled forward); 'stale' = in current only
    (row carried unchanged — expiry is the caller's policy).
    """
    inc = incoming.groupBy(*KEY).agg(
        F.min("seen_ts").alias("i_first"),
        F.max("seen_ts").alias("i_last"),
        F.count(F.lit(1)).alias("i_n"),
    )
    j = current.join(inc, KEY, "full_outer")
    in_cur = F.col("n_seen").isNotNull()
    in_inc = F.col("i_n").isNotNull()
    return j.select(
        *KEY,
        F.when(~in_cur, F.col("i_first"))
        .when(~in_inc, F.col("first_seen"))
        .otherwise(F.least("first_seen", "i_first")).alias("first_seen"),
        F.when(~in_cur, F.col("i_last"))
        .when(~in_inc, F.col("last_seen"))
        .otherwise(F.greatest("last_seen", "i_last")).alias("last_seen"),
        (F.coalesce(F.col("n_seen"), F.lit(0))
         + F.coalesce(F.col("i_n"), F.lit(0))).alias("n_seen"),
        F.when(~in_cur, F.lit("new"))
        .when(~in_inc, F.lit("stale"))
        .otherwise(F.lit("confirmed")).alias("status"),
    )


def sql_merge_triples(current_sql: str, incoming_sql: str) -> str:
    """DuckDB twin: identical CASE/least/greatest semantics (the
    mixed-null branches are handled by CASE before least/greatest
    ever sees a NULL, so engine null-folding differences can't
    diverge)."""
    return f"""
WITH cur AS ({current_sql}),
inc AS (
  SELECT subj, pred, obj,
         min(seen_ts) AS i_first, max(seen_ts) AS i_last,
         count(*)::BIGINT AS i_n
  FROM ({incoming_sql}) GROUP BY subj, pred, obj
)
SELECT coalesce(cur.subj, inc.subj) AS subj,
       coalesce(cur.pred, inc.pred) AS pred,
       coalesce(cur.obj, inc.obj) AS obj,
       CASE WHEN cur.n_seen IS NULL THEN inc.i_first
            WHEN inc.i_n IS NULL THEN cur.first_seen
            ELSE least(cur.first_seen, inc.i_first) END AS first_seen,
       CASE WHEN cur.n_seen IS NULL THEN inc.i_last
            WHEN inc.i_n IS NULL THEN cur.last_seen
            ELSE greatest(cur.last_seen, inc.i_last) END AS last_seen,
       (coalesce(cur.n_seen, 0) + coalesce(inc.i_n, 0))::BIGINT
           AS n_seen,
       CASE WHEN cur.n_seen IS NULL THEN 'new'
            WHEN inc.i_n IS NULL THEN 'stale'
            ELSE 'confirmed' END AS status
FROM cur FULL OUTER JOIN inc
  ON cur.subj = inc.subj AND cur.pred = inc.pred AND cur.obj = inc.obj
"""


def snapshot_asof(versions: DataFrame, ts: str) -> DataFrame:
    """Point-in-time KG snapshot: over ``versions(subj, pred, obj,
    valid_from)`` (every assertion a functional predicate ever made,
    stamped with when it took effect), return the triple state AS OF
    ``ts`` — per (subj, pred), the version with the latest
    ``valid_from <= ts`` wins; keys whose earliest version postdates
    ``ts`` are absent.

    This is the temporal complement of :func:`merge_triples`: the
    merge maintains provenance going forward, the snapshot answers
    "what did the KG believe at crawl time T" (training-data freeze,
    leakage audits, crawl-refresh forensics).  Ties on ``valid_from``
    break by max(obj) so the answer is a pure function of the data.

    Scale shape: one pushed-down range filter (valid_from <= ts
    reaches the scan) + ONE (subj, pred)-keyed window — the same
    shuffle a dedup pass pays; obj strings ride only their own rows.
    On a real cluster the versions table is Iceberg-partitioned by
    months(valid_from), so the filter prunes whole partitions.
    """
    w = (Window.partitionBy("subj", "pred")
         .orderBy(F.col("valid_from").desc(), F.col("obj").desc()))
    return (
        versions.filter(F.col("valid_from") <= F.lit(ts).cast("timestamp"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("subj", "pred", "obj", "valid_from")
    )


def sql_snapshot_asof(versions_sql: str, ts: str) -> str:
    """DuckDB twin: same filter + QUALIFY latest-version pick."""
    return f"""
SELECT subj, pred, obj, valid_from
FROM ({versions_sql})
WHERE valid_from <= TIMESTAMP '{ts}'
QUALIFY row_number() OVER (
  PARTITION BY subj, pred
  ORDER BY valid_from DESC, obj DESC) = 1
"""
