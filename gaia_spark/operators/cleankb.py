"""T13 — KB cleaning (`cleanKB` analog): provenance validation.

Reference: the JVM cleanKB tool run over the merged KB
(/root/reference/README.md:203-223): drop assertions whose provenance
falls outside the source corpus, with a `suppressValidation` toggle
(README.md:218).

Spark form (SURVEY.md §2.2 T13): a LEFT SEMI join of triples against
the pages table on url (orphan-provenance drop — semi join never
duplicates rows and streams the small side) plus cheap bounds filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def valid_triples(triples: DataFrame) -> DataFrame:
    """The cleanKB row-level validity predicate (no join)."""
    return triples.filter(
        (F.col("sent_id") >= 0)
        & (F.col("conf") > 0.0)
        & (F.col("conf") <= 1.0)
        & F.col("subj").isNotNull()
        & F.col("obj").isNotNull()
        & (F.col("pred") != "")
    )


def clean_kb(
    triples: DataFrame,
    pages: DataFrame,
    suppress_validation: bool = False,
) -> DataFrame:
    if suppress_validation:
        return triples
    return valid_triples(triples).join(
        pages.select("url"), on="url", how="left_semi"
    )


def functional_violations(triples: DataFrame,
                          functional_preds: list[str]) -> DataFrame:
    """KB consistency check the cleanKB pass feeds on: subjects that
    assert MORE THAN ONE distinct object for a functional predicate
    (born_in, ordered_by, capital_of … can each hold at most once per
    subject, so >1 object = a linker merge error or a crawl-refresh
    conflict that the SCD upsert must adjudicate).

    → (subj, pred, n_objs, objs) with ``objs`` the '|'-joined sorted
    distinct object list (total order → deterministic across engines
    and partitionings).

    Scale shape: a pushed-down pred IN (...) filter (functional
    predicates are a tiny fixed set, so the scan prunes first), then
    ONE map-side-combined hash agg keyed on (subj, pred); only the
    conflicting groups — by construction a thin slice of any sane KB
    — survive the HAVING.  No joins, no window, nothing driver-side.
    """
    return (
        triples.filter(F.col("pred").isin(list(functional_preds)))
        .groupBy("subj", "pred")
        .agg(
            F.count_distinct("obj").alias("n_objs"),
            F.array_join(F.sort_array(F.collect_set("obj")), "|")
            .alias("objs"),
        )
        .filter(F.col("n_objs") > 1)
    )


def sql_functional_violations(triples_sql: str,
                              functional_preds: list[str]) -> str:
    """DuckDB twin of functional_violations (escaped IN-list; sorted
    distinct list_aggr keeps the objs string engine-exact)."""
    in_list = ", ".join(
        "'" + p.replace("'", "''") + "'" for p in functional_preds)
    return f"""
SELECT subj, pred, count(DISTINCT obj)::BIGINT AS n_objs,
       array_to_string(list_sort(list(DISTINCT obj)), '|') AS objs
FROM ({triples_sql}) WHERE pred IN ({in_list})
GROUP BY subj, pred HAVING count(DISTINCT obj) > 1
"""


def predicate_profile(triples: DataFrame) -> DataFrame:
    """Schema profiling over the (subj, pred, obj) table — the KB
    audit that DISCOVERS which predicates behave functionally (feed
    the result into ``functional_violations``) and sizes every
    predicate for join planning (broadcast-able object vocabularies,
    skewed subjects).

    → one row per pred: n_triples, n_subjs, n_objs (distinct),
    max_objs_per_subj, n_multi_subjs (subjects asserting >1 distinct
    object), functional_frac_x10k (fraction of subjects with exactly
    one object, floor-x10k — 10000 means strictly functional).

    Scale shape: one map-side-combined (pred, subj) agg over the
    triple scan, re-aggregated to the handful of predicates, plus one
    (pred, obj)-distinct branch for the object vocabulary size; the
    two per-pred aggregates join on the tiny pred key (AQE broadcasts
    it).  Nothing driver-side; output is O(|predicates|).
    """
    per_subj = (
        triples.groupBy("pred", "subj")
        .agg(F.count(F.lit(1)).alias("n"),
             F.count_distinct("obj").alias("n_obj"))
    )
    by_pred = (
        per_subj.groupBy("pred")
        .agg(F.sum("n").alias("n_triples"),
             F.count(F.lit(1)).alias("n_subjs"),
             F.max("n_obj").alias("max_objs_per_subj"),
             F.sum((F.col("n_obj") > 1).cast("bigint"))
             .alias("n_multi_subjs"),
             F.sum((F.col("n_obj") == 1).cast("bigint"))
             .alias("n_func"))
    )
    n_objs = (triples.select("pred", "obj").distinct()
              .groupBy("pred").agg(F.count(F.lit(1)).alias("n_objs")))
    return (
        by_pred.join(n_objs, "pred")
        .select(
            "pred", "n_triples", "n_subjs", "n_objs",
            "max_objs_per_subj", "n_multi_subjs",
            F.expr("10000 * n_func div n_subjs").cast("bigint")
            .alias("functional_frac_x10k"),
        )
    )


def sql_predicate_profile(triples_sql: str) -> str:
    """DuckDB twin of predicate_profile (same integer contract)."""
    return f"""
WITH t AS ({triples_sql}),
per_subj AS (
  SELECT pred, subj, count(*)::BIGINT AS n,
         count(DISTINCT obj)::BIGINT AS n_obj
  FROM t GROUP BY pred, subj
), by_pred AS (
  SELECT pred, sum(n)::BIGINT AS n_triples,
         count(*)::BIGINT AS n_subjs,
         max(n_obj)::BIGINT AS max_objs_per_subj,
         sum(CASE WHEN n_obj > 1 THEN 1 ELSE 0 END)::BIGINT
             AS n_multi_subjs,
         sum(CASE WHEN n_obj = 1 THEN 1 ELSE 0 END)::BIGINT AS n_func
  FROM per_subj GROUP BY pred
), vocab AS (
  SELECT pred, count(DISTINCT obj)::BIGINT AS n_objs
  FROM t GROUP BY pred
)
SELECT b.pred, b.n_triples, b.n_subjs, v.n_objs,
       b.max_objs_per_subj, b.n_multi_subjs,
       (10000 * b.n_func // b.n_subjs)::BIGINT AS functional_frac_x10k
FROM by_pred b JOIN vocab v USING (pred)
"""


def rdfs_infer(triples: DataFrame, schema: DataFrame) -> DataFrame:
    """RDFS domain/range type inference (entailment rules rdfs2 and
    rdfs3): every triple whose predicate declares a domain type
    entails ``(subj, type)``; a declared range type entails
    ``(obj, type)``.  Output is the DEDUPLICATED entailed type table
    with an evidence count per (node, type) — the audit-grade form
    (a type supported by one noisy triple and one supported by 10^4
    are different facts for cleanKB thresholds).

    ``schema(pred, domain_type, range_type)`` — NULL means the
    predicate declares no constraint on that side (e.g. a literal-
    valued predicate has no range type).

    Scale shape: the schema is vocabulary-sized (one row per
    predicate), so both rule applications are broadcast joins; the
    only shuffle is the final (node, type)-keyed map-side-combined
    count.  Triples stream through; subjects/objects travel as keys.

    North-star context: the canonicalized triple table this engine
    materializes (plans/pipeline.py) feeds exactly this pass — type
    inference is how a constructed KG gets its entity-type column
    populated beyond what the tagger asserted directly.
    """
    dom = (
        triples.join(
            F.broadcast(
                schema.filter(F.col("domain_type").isNotNull())
                .select("pred", F.col("domain_type").alias("type"))),
            "pred")
        .select(F.col("subj").alias("node"), "type")
    )
    rng = (
        triples.join(
            F.broadcast(
                schema.filter(F.col("range_type").isNotNull())
                .select("pred", F.col("range_type").alias("type"))),
            "pred")
        .select(F.col("obj").alias("node"), "type")
    )
    return (
        dom.unionByName(rng)
        .groupBy("node", "type")
        .agg(F.count(F.lit(1)).alias("n_evidence"))
    )


def sql_rdfs_infer(triples_sql: str,
                   schema_rows: list[tuple]) -> str:
    """DuckDB twin of :func:`rdfs_infer`.  ``schema_rows`` =
    [(pred, domain_type_or_None, range_type_or_None), ...]."""
    def lit(v):
        return "NULL" if v is None else f"'{v}'"
    vals = ", ".join(
        f"({lit(p)}, {lit(d)}, {lit(r)})" for p, d, r in schema_rows)
    return f"""
WITH schema AS (
  SELECT * FROM (VALUES {vals})
  AS s(pred, domain_type, range_type)
), t AS ({triples_sql}),
ent AS (
  SELECT t.subj AS node, s.domain_type AS type
  FROM t JOIN schema s USING (pred) WHERE s.domain_type IS NOT NULL
  UNION ALL
  SELECT t.obj, s.range_type
  FROM t JOIN schema s USING (pred) WHERE s.range_type IS NOT NULL
)
SELECT node, type, count(*)::BIGINT AS n_evidence
FROM ent GROUP BY node, type
"""


def entity_profile(triples: DataFrame) -> DataFrame:
    """Per-entity card over a (subj, pred, obj) table → (entity,
    n_as_subj, n_as_obj, n_preds_out, n_preds_in, degree).

    The node-table materialization step of "canonicalize into a
    node/edge graph": every KG serving layer wants a per-entity
    summary row (how asserted, how referenced, predicate diversity)
    next to the raw triples — it drives linker QA (an entity that is
    object-only with one inbound predicate is a typo candidate),
    broadcast-gate sizing, and hub detection before graph kernels.

    Scale shape: two map-side-combined aggregates (subj-keyed and
    obj-keyed, each with a small exact count-distinct over the
    pred vocabulary) merged by ONE full-outer join on the entity
    key.  Strings beyond the entity id never travel.
    """
    as_subj = triples.groupBy(F.col("subj").alias("entity")).agg(
        F.count(F.lit(1)).alias("n_as_subj"),
        F.countDistinct("pred").alias("n_preds_out"))
    as_obj = triples.groupBy(F.col("obj").alias("entity")).agg(
        F.count(F.lit(1)).alias("n_as_obj"),
        F.countDistinct("pred").alias("n_preds_in"))
    j = as_subj.join(as_obj, "entity", "full_outer")
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("bigint")  # noqa: E731
    return j.select(
        "entity",
        z("n_as_subj").alias("n_as_subj"),
        z("n_as_obj").alias("n_as_obj"),
        z("n_preds_out").alias("n_preds_out"),
        z("n_preds_in").alias("n_preds_in"),
        (z("n_as_subj") + z("n_as_obj")).alias("degree"),
    )


def sql_entity_profile(triples_sql: str) -> str:
    """DuckDB twin of :func:`entity_profile`."""
    return f"""
WITH t AS ({triples_sql}),
s AS (
  SELECT subj AS entity, count(*)::BIGINT AS n_as_subj,
         count(DISTINCT pred)::BIGINT AS n_preds_out
  FROM t GROUP BY subj
), o AS (
  SELECT obj AS entity, count(*)::BIGINT AS n_as_obj,
         count(DISTINCT pred)::BIGINT AS n_preds_in
  FROM t GROUP BY obj
)
SELECT coalesce(s.entity, o.entity) AS entity,
       coalesce(s.n_as_subj, 0)::BIGINT AS n_as_subj,
       coalesce(o.n_as_obj, 0)::BIGINT AS n_as_obj,
       coalesce(s.n_preds_out, 0)::BIGINT AS n_preds_out,
       coalesce(o.n_preds_in, 0)::BIGINT AS n_preds_in,
       (coalesce(s.n_as_subj, 0) + coalesce(o.n_as_obj, 0))::BIGINT
         AS degree
FROM s FULL OUTER JOIN o ON s.entity = o.entity
"""


#: literal shape classifiers shared verbatim with the DuckDB twin
#: (Java-regex / RE2 common syntax)
INT_RE = r"^-?[0-9]+$"
DEC_RE = r"^-?[0-9]+\.[0-9]{1,2}$"
DATE_RE = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"


def parse_literals(triples: DataFrame) -> DataFrame:
    """Typed-literal parsing over (subj, pred, obj) → input columns
    + (lit_type ∈ int|decimal|date|string, num_x100, date_val).

    The datatype-canonicalization step of KG construction: extracted
    object strings carry numbers, dates, and free text mixed in one
    column; downstream range queries / conflict checks need TYPED
    values plus an explicit "didn't parse" signal (lit_type =
    'string'), never a silent cast-to-NULL.  Numerics land in exact
    x100 BIGINTs — the decimal is parsed by REGEX GROUPS (integer
    part × 100 + zero-padded fraction), not a float cast, so both
    engines produce identical bits; up-to-2-digit fractions cover
    the money/quantity literals a commerce KG carries (wider
    fractions classify as 'string' rather than rounding silently).

    Scale shape: pure in-row regexp + arithmetic (whole-stage
    codegen) — no shuffle, no UDF; composes under any downstream
    aggregate.
    """
    obj = F.col("obj")
    is_int = obj.rlike(INT_RE)
    is_dec = obj.rlike(DEC_RE)
    is_date = obj.rlike(DATE_RE)
    sign = F.when(obj.startswith("-"), F.lit(-1)).otherwise(F.lit(1))
    dec_int = F.regexp_extract(obj, r"^-?([0-9]+)\.", 1)
    dec_frac = F.rpad(
        F.regexp_extract(obj, r"\.([0-9]{1,2})$", 1), 2, "0")
    num = (
        F.when(is_int, obj.cast("bigint") * 100)
        .when(is_dec,
              sign * (dec_int.cast("bigint") * 100
                      + dec_frac.cast("bigint")))
        .cast("bigint")
    )
    return triples.select(
        "subj", "pred", "obj",
        F.when(is_int, F.lit("int"))
        .when(is_dec, F.lit("decimal"))
        .when(is_date, F.lit("date"))
        .otherwise(F.lit("string")).alias("lit_type"),
        num.alias("num_x100"),
        F.when(is_date, obj.cast("date")).alias("date_val"),
    )


def sql_parse_literals(triples_sql: str) -> str:
    """DuckDB twin: same regex classes, same group-based decimal
    integerization."""
    return f"""
SELECT subj, pred, obj,
       CASE WHEN regexp_full_match(obj, '-?[0-9]+') THEN 'int'
            WHEN regexp_full_match(obj, '-?[0-9]+\\.[0-9]{{1,2}}')
              THEN 'decimal'
            WHEN regexp_full_match(obj,
                   '[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}}') THEN 'date'
            ELSE 'string' END AS lit_type,
       CASE WHEN regexp_full_match(obj, '-?[0-9]+')
              THEN obj::BIGINT * 100
            WHEN regexp_full_match(obj, '-?[0-9]+\\.[0-9]{{1,2}}')
              THEN (CASE WHEN obj LIKE '-%' THEN -1 ELSE 1 END)
                   * (regexp_extract(obj, '^-?([0-9]+)\\.', 1)::BIGINT
                      * 100
                      + rpad(regexp_extract(obj,
                             '\\.([0-9]{{1,2}})$', 1), 2, '0')::BIGINT)
            END::BIGINT AS num_x100,
       CASE WHEN regexp_full_match(obj,
              '[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}}')
            THEN obj::DATE END AS date_val
FROM ({triples_sql})
"""


def literal_profile(parsed: DataFrame) -> DataFrame:
    """Compact pin of a parsed-literal table: per (pred, lit_type),
    counts + exact numeric sum + date range.  One map-side-combined
    aggregate over the (pred, type) vocabulary."""
    return (parsed.groupBy("pred", "lit_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("num_x100").alias("sum_num_x100"),
                 F.min("date_val").cast("string").alias("min_date"),
                 F.max("date_val").cast("string").alias("max_date")))


def sql_literal_profile(parsed_sql: str) -> str:
    """DuckDB twin of :func:`literal_profile`."""
    return f"""
SELECT pred, lit_type, count(*)::BIGINT AS n,
       sum(num_x100)::BIGINT AS sum_num_x100,
       min(date_val)::VARCHAR AS min_date,
       max(date_val)::VARCHAR AS max_date
FROM ({parsed_sql})
GROUP BY pred, lit_type
"""
