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
