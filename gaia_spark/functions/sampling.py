"""Deterministic corpus sampling — reproducible at any scale.

Training-data pipelines need samples that are (a) reproducible across
runs/engines/cluster sizes, (b) shuffle-free (a sample must not cost a
repartition of 10^12 rows), and (c) per-source weighted (mixture
weights: oversample books, downsample boilerplate web).  Spark's
``df.sample``/``sampleBy`` are seeded per-partition, so their output
changes with partitioning — unusable as a contract.  Hash-gate
sampling fixes all three: keep a row iff
``md5(stable_key) mod 10^4 < rate_x10k``, a pure column predicate that
pushes into the scan, never shuffles, and produces the identical
sample in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: rate denominator (rates are expressed in basis points, 0..10000)
RATE_DEN = 10_000


def hash_gate(key: Column, rate_x10k: Column | int) -> Column:
    """TRUE for the deterministic ``rate_x10k``/10000 fraction of keys.

    Gate value = first 8 md5 hex chars as an integer, mod 10^4 —
    uniform over keys, engine-independent, partitioning-independent.
    """
    gate = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
    rate = (F.lit(rate_x10k) if isinstance(rate_x10k, int)
            else rate_x10k)
    return (gate % RATE_DEN) < rate


def sql_hash_gate(key: str, rate_x10k: str) -> str:
    """DuckDB twin of hash_gate."""
    return (f"(('0x' || substr(md5({key}), 1, 8))::BIGINT % {RATE_DEN})"
            f" < ({rate_x10k})")


def hash_bucket(key: Column, n_buckets: int) -> Column:
    """Deterministic uniform shard id in [0, n_buckets): same md5
    idiom as hash_gate, shared by packing (shard assignment) and any
    op that needs an engine/partitioning-independent bucket."""
    return (F.conv(F.substring(F.md5(key), 1, 8), 16, 10)
            .cast("bigint") % n_buckets)


def sql_hash_bucket(key: str, n_buckets: int) -> str:
    """DuckDB twin of hash_bucket."""
    return f"(('0x' || substr(md5({key}), 1, 8))::BIGINT % {n_buckets})"


def mixture_gate(rates_x10k: dict[str, int], default_x10k: int,
                 source_col: str = "source",
                 key_col: str = "doc_id") -> Column:
    """Boolean gate column for per-source weighted sampling.

    ``rates_x10k`` maps source → basis-point keep rate; unlisted
    sources use ``default_x10k``.  The gate key is
    ``source || ':' || key`` so per-source samples are independent.

    NULLs are coalesced to '' BEFORE hashing on both engines:
    ``concat_ws`` silently skips NULL args while SQL ``||`` nulls the
    whole key (dropping the row via WHERE) — without the sentinel the
    two engines disagree on every NULL-source row.
    """
    rate = F.lit(default_x10k)
    for src in sorted(rates_x10k):
        rate = F.when(F.col(source_col) == src,
                      F.lit(rates_x10k[src])).otherwise(rate)
    key = F.concat_ws(
        ":",
        F.coalesce(F.col(source_col), F.lit("")),
        F.coalesce(F.col(key_col).cast("string"), F.lit("")))
    return hash_gate(key, rate)


def mixture_sample(df: DataFrame, rates_x10k: dict[str, int],
                   default_x10k: int,
                   source_col: str = "source",
                   key_col: str = "doc_id") -> DataFrame:
    """Per-source weighted deterministic sample (mixture weights).

    Pure filter — no shuffle, pushes below any downstream agg.
    """
    return df.filter(mixture_gate(rates_x10k, default_x10k,
                                  source_col, key_col))


def sql_mixture_sample_where(rates_x10k: dict[str, int],
                             default_x10k: int,
                             source_col: str = "source",
                             key_col: str = "doc_id") -> str:
    """DuckDB WHERE fragment matching mixture_sample.

    Source names are escaped (' → '') before interpolation; the key
    coalesces NULLs to '' to match the Spark gate exactly.
    """
    whens = " ".join(
        "WHEN {c} = '{s}' THEN {r}".format(
            c=source_col, s=src.replace("'", "''"), r=rates_x10k[src])
        for src in sorted(rates_x10k)
    )
    rate = f"CASE {whens} ELSE {default_x10k} END"
    key = (f"coalesce({source_col}, '') || ':' || "
           f"coalesce({key_col}::VARCHAR, '')")
    return sql_hash_gate(key, rate)


def stratified_sample(df: DataFrame, quota: int,
                      stratum_col: str = "lang",
                      key_col: str = "doc_id") -> DataFrame:
    """Exact-quota deterministic stratified sample: the ``quota``
    smallest md5-ranked keys per stratum.

    → (stratum, key, rk), rk = 1..quota; rank by (md5(stratum:key),
    key) — a total order, so the cut is reproducible across runs,
    engines, and partitionings.

    Scale shape: a naive row_number() over partitionBy(stratum) funnels
    10^12 rows into |strata| window partitions (strata are LOW
    cardinality — the exact skew trap).  Instead the md5 gate
    prefilters each stratum to ~4x its quota BEFORE the window: the
    per-stratum counts are one map-side-combined aggregate (|strata|
    rows, broadcast back), the gate threshold keeps rate ≈
    4·quota/count, and the exact window then runs over the tiny
    survivor set only.  The gate is part of the CONTRACT (both engines
    apply it), so a stratum where the 4x oversample undershoots the
    quota — astronomically unlikely at scale, detectable by rk <
    quota — returns the same short sample on both engines rather than
    diverging.  Strata smaller than the quota pass the gate entirely
    (rate caps at 10^4) and return all their rows.
    """
    counts = (df.groupBy(F.col(stratum_col).alias("stratum"))
              .agg(F.count(F.lit(1)).alias("n_rows")))
    # floor() on both engines — Spark's cast(bigint) truncates while
    # DuckDB's ::BIGINT rounds, so a raw cast would diverge on any
    # fractional rate
    rate = F.least(
        F.lit(RATE_DEN).cast("bigint"),
        F.floor(F.lit(4 * quota * RATE_DEN) / F.col("n_rows")) + 1)
    gate_key = F.concat_ws(
        ":",
        F.coalesce(F.col("stratum"), F.lit("")),
        F.coalesce(F.col("key").cast("string"), F.lit("")))
    from pyspark.sql import Window
    w = Window.partitionBy("stratum").orderBy("h", "key")
    survivors = (
        df.select(F.col(stratum_col).alias("stratum"),
                  F.col(key_col).alias("key"))
        .join(F.broadcast(counts), "stratum")
        .withColumn("h", F.md5(gate_key))
        .filter(
            (F.conv(F.substring(F.col("h"), 1, 8), 16, 10)
             .cast("bigint") % RATE_DEN) < rate)
    )
    return (
        survivors.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= quota)
        .select("stratum", "key", "rk")
    )


def sql_stratified_sample(rel: str, quota: int,
                          stratum_col: str = "lang",
                          key_col: str = "doc_id") -> str:
    """DuckDB twin of stratified_sample (gate included — the 4x
    oversample prefilter is part of the sampling contract)."""
    gate_key = (f"coalesce({stratum_col}, '') || ':' || "
                f"coalesce({key_col}::VARCHAR, '')")
    return f"""
WITH counts AS (
  SELECT {stratum_col} AS stratum, count(*)::BIGINT AS n_rows
  FROM {rel} GROUP BY {stratum_col}
), survivors AS (
  SELECT r.{stratum_col} AS stratum, r.{key_col} AS key,
         md5({gate_key.replace(stratum_col, 'r.' + stratum_col)
              .replace(key_col, 'r.' + key_col)}) AS h
  FROM {rel} r JOIN counts c ON r.{stratum_col} = c.stratum
  WHERE (('0x' || substr(md5({gate_key.replace(stratum_col,
                                               'r.' + stratum_col)
                              .replace(key_col, 'r.' + key_col)}),
          1, 8))::BIGINT % {RATE_DEN})
        < least({RATE_DEN}::BIGINT,
                floor({4 * quota * RATE_DEN} / c.n_rows)::BIGINT + 1)
)
SELECT stratum, key, rk FROM (
  SELECT stratum, key,
         row_number() OVER (PARTITION BY stratum
                            ORDER BY h, key) AS rk
  FROM survivors
) WHERE rk <= {quota}
"""


def domain_cap(df: DataFrame, cap: int,
               domain_col: str = "host",
               key_col: str = "doc_id") -> DataFrame:
    """Per-domain document cap (C4/Gopher-style site policy): keep the
    ``cap`` smallest md5-ranked keys per domain, drop the rest.

    Same gate contract as stratified_sample — the 4x-oversample md5
    gate prefilters each domain before the exact window — but built
    for HIGH-cardinality Zipf-skewed strata (10^8 registered domains
    at crawl scale), where the counts table cannot broadcast:

    - counts: one map-side-combined aggregate (|domains| rows);
    - counts re-attach: a shuffle join keyed by domain — AQE's skew
      handling splits the mega-domain on the probe side, and the join
      output immediately gates down to ~4·cap rows per domain, so the
      downstream window never sees a skewed partition;
    - window: over survivors only (≤ ~4·cap expected per domain).

    → (domain, key, rk), rk = 1..cap.  Domains smaller than the cap
    pass whole (gate rate saturates at 10^4).
    """
    counts = (df.groupBy(F.col(domain_col).alias("domain"))
              .agg(F.count(F.lit(1)).alias("n_rows")))
    rate = F.least(
        F.lit(RATE_DEN).cast("bigint"),
        F.floor(F.lit(4 * cap * RATE_DEN) / F.col("n_rows")) + 1)
    gate_key = F.concat_ws(
        ":",
        F.coalesce(F.col("domain"), F.lit("")),
        F.coalesce(F.col("key").cast("string"), F.lit("")))
    from pyspark.sql import Window
    w = Window.partitionBy("domain").orderBy("h", "key")
    survivors = (
        df.select(F.col(domain_col).alias("domain"),
                  F.col(key_col).alias("key"))
        .join(counts, "domain")
        .withColumn("h", F.md5(gate_key))
        .filter(
            (F.conv(F.substring(F.col("h"), 1, 8), 16, 10)
             .cast("bigint") % RATE_DEN) < rate)
    )
    return (
        survivors.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .select("domain", "key", "rk")
    )


def sql_domain_cap(rel: str, cap: int,
                   domain_col: str = "host",
                   key_col: str = "doc_id") -> str:
    """DuckDB twin of domain_cap (gate included — same contract)."""
    gate_key = (f"coalesce(r.{domain_col}, '') || ':' || "
                f"coalesce(r.{key_col}::VARCHAR, '')")
    return f"""
WITH counts AS (
  SELECT {domain_col} AS domain, count(*)::BIGINT AS n_rows
  FROM {rel} GROUP BY {domain_col}
), survivors AS (
  SELECT r.{domain_col} AS domain, r.{key_col} AS key,
         md5({gate_key}) AS h
  FROM {rel} r JOIN counts c ON r.{domain_col} = c.domain
  WHERE (('0x' || substr(md5({gate_key}), 1, 8))::BIGINT % {RATE_DEN})
        < least({RATE_DEN}::BIGINT,
                floor({4 * cap * RATE_DEN} / c.n_rows)::BIGINT + 1)
)
SELECT domain, key, rk FROM (
  SELECT domain, key,
         row_number() OVER (PARTITION BY domain
                            ORDER BY h, key) AS rk
  FROM survivors
) WHERE rk <= {cap}
"""


def grouped_split(df: DataFrame, splits_x10k: list[tuple[str, int]],
                  group_col: str = "registered_domain",
                  stratum_col: str = "lang") -> DataFrame:
    """Leak-free train/val/test assignment: the SPLIT is a pure
    function of the GROUP (registered domain), never the document.

    Near-duplicate pages overwhelmingly share a site; splitting at
    document granularity leaks templated near-dups of training pages
    into eval.  Assigning whole groups — md5-bucket the group key
    into [0, 10^4), carve by cumulative weight — guarantees every
    page of a domain lands on one side, reproducibly across runs,
    engines and partitionings (the leak-free contract is structural:
    split = f(group); test_normalize_split.py asserts exactly one
    split per group).

    ``splits_x10k``: ordered (name, weight) with weights summing to
    10^4, e.g. [("train", 9000), ("val", 500), ("test", 500)].

    Returns the audit rollup (split, stratum, n_docs, n_groups)
    rather than 10^12 assignment rows: the assignment itself is a
    zero-shuffle projection callers inline; only the audit aggregates.

    Scale shape: bucket + CASE are codegen'd column exprs on the scan
    (no join, no shuffle); the rollup is one map-side-combined
    groupBy over a 3x|strata| key space.  count_distinct(group)
    partial-aggregates per map task — domains are Zipf-skewed in row
    count but the distinct-agg keyspace is domain-sized, not row-sized.
    """
    assert sum(w for _, w in splits_x10k) == RATE_DEN
    b = hash_bucket(F.coalesce(F.col(group_col), F.lit("")), RATE_DEN)
    expr: Column | None = None
    acc = 0
    for name, w in splits_x10k[:-1]:
        acc += w
        cond = b < acc
        expr = (F.when(cond, name) if expr is None
                else expr.when(cond, name))
    split = (expr.otherwise(splits_x10k[-1][0]) if expr is not None
             else F.lit(splits_x10k[-1][0]))
    return (
        df.select(split.alias("split"),
                  F.col(stratum_col).alias("stratum"),
                  F.col(group_col).alias("grp"))
        .groupBy("split", "stratum")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.count_distinct("grp").alias("n_groups"))
    )


def sql_grouped_split(rel: str, splits_x10k: list[tuple[str, int]],
                      group_col: str = "registered_domain",
                      stratum_col: str = "lang") -> str:
    """DuckDB twin of grouped_split (same bucket, same carve)."""
    assert sum(w for _, w in splits_x10k) == RATE_DEN
    b = sql_hash_bucket(f"coalesce({group_col}, '')", RATE_DEN)
    whens, acc = [], 0
    for name, w in splits_x10k[:-1]:
        acc += w
        whens.append(f"WHEN {b} < {acc} THEN '{name}'")
    case = ("CASE " + " ".join(whens)
            + f" ELSE '{splits_x10k[-1][0]}' END")
    return f"""
SELECT {case} AS split, {stratum_col} AS stratum,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT {group_col})::BIGINT AS n_groups
FROM {rel}
GROUP BY 1, 2
"""


def isqrt_col(n: Column) -> Column:
    """Exact integer floor-sqrt of a non-negative BIGINT column.

    Float sqrt is correct to 1 ulp, so one downward and one upward
    correction pin the exact floor on every engine — the
    deterministic bridge that lets a FRACTIONAL-power sampling law
    ride integer arithmetic."""
    s = F.floor(F.sqrt(n.cast("double"))).cast("bigint")
    s = F.when(s * s > n, s - 1).otherwise(s)
    return F.when((s + 1) * (s + 1) <= n, s + 1).otherwise(s)


def sql_isqrt(n: str) -> str:
    """DuckDB twin of :func:`isqrt_col` (same ±1 correction)."""
    s0 = f"floor(sqrt(({n})::DOUBLE))::BIGINT"
    s1 = f"(CASE WHEN {s0} * {s0} > ({n}) THEN {s0} - 1 ELSE {s0} END)"
    return (f"(CASE WHEN ({s1} + 1) * ({s1} + 1) <= ({n}) "
            f"THEN {s1} + 1 ELSE {s1} END)")


def temperature_rates(df: DataFrame, budget: int,
                      source_col: str = "source") -> DataFrame:
    """Temperature-scaled (α = 1/2) mixture quotas → (source,
    n_docs, weight, quota, rate_x10k).

    The multilingual/domain rebalancing law of mT5/XLM-R-style
    recipes: sampling mass ∝ n^α flattens the head and boosts the
    tail.  α = 1/2 is the one fractional temperature computable in
    EXACT integer arithmetic (``isqrt_col``) — no float pow, so the
    quota table is bit-identical across engines and partitionings.
    ``quota_s = budget · √n_s div Σ√n`` and the acceptance rate is
    ``min(10^4, (10^4 · quota_s) div n_s)``.

    Scale shape: one map-side-combined per-source count (vocabulary-
    scale), the Σ√n total on a single-row cross join — no corpus
    re-scan, no window.
    """
    counts = (df.groupBy(F.col(source_col).alias("source"))
              .agg(F.count(F.lit(1)).alias("n_docs"))
              .withColumn("weight", isqrt_col(F.col("n_docs"))))
    tot = counts.agg(F.sum("weight").alias("w_total"))
    return (counts.crossJoin(tot)
            .select(
                "source", "n_docs", "weight",
                F.expr(f"({budget} * weight) div w_total")
                .alias("quota"))
            .withColumn(
                "rate_x10k",
                F.least(F.lit(10_000).cast("bigint"),
                        F.expr("(10000 * quota) div n_docs"))))


def sql_temperature_rates(rel: str, budget: int,
                          source_col: str = "source") -> str:
    """DuckDB twin of :func:`temperature_rates`."""
    isq = sql_isqrt("n_docs")
    return f"""
WITH counts AS (
  SELECT {source_col} AS source, count(*)::BIGINT AS n_docs
  FROM {rel} GROUP BY {source_col}
), weighted AS (
  SELECT source, n_docs, {isq}::BIGINT AS weight FROM counts
), tot AS (SELECT sum(weight)::BIGINT AS w_total FROM weighted)
SELECT source, n_docs, weight,
       (({budget} * weight) // w_total)::BIGINT AS quota,
       least(10000, (10000 * (({budget} * weight) // w_total))
                    // n_docs)::BIGINT AS rate_x10k
FROM weighted CROSS JOIN tot
"""


def temperature_sample(df: DataFrame, budget: int,
                       source_col: str = "source",
                       key_col: str = "doc_id") -> DataFrame:
    """Apply :func:`temperature_rates` as a deterministic hash-gate
    filter: ≈quota_s survivors per source, reproducible under any
    partitioning.  The rate table is vocabulary-scale and broadcasts
    onto the corpus scan; the gate itself is the shared md5
    hash-gate (no shuffle, pushes below downstream aggs)."""
    rates = temperature_rates(df, budget, source_col).select(
        F.col("source").alias(source_col), "rate_x10k")
    key = F.concat_ws(":", F.coalesce(F.col(source_col), F.lit("")),
                      F.col(key_col).cast("string"))
    return (df.join(F.broadcast(rates), source_col)
            .filter(hash_gate(key, F.col("rate_x10k"))))
