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
