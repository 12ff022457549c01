"""T11/T12 — canonicalization: rewrite assertions to canonical ids, dedup.

Reference: the "full_link" output — one canonical entity per cluster,
deduplicated assertions (`*_full_link.cs`, /root/reference/README.md:
46-49); per-language union (README.md:47-49) is implicit because `lang`
is a plain column in our model (SURVEY.md §2.2 T12) — a single pass
covers en/ru/uk/es/de, and a per-language run is just a filter.

Mention references (coarse, link_norm) are rewritten to canonical ids
with two joins (subject side, object side — SURVEY.md §2.2 T11); the
canonical map is DISTINCT surfaces, tiny relative to the corpus, so AQE
turns both rewrites into broadcast joins at any realistic KB size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE_COLS = [
    "url", "sent_id", "subj", "pred", "obj",
    "subj_type", "obj_type", "conf",
]


def canonical_map(canon_mentions: DataFrame) -> DataFrame:
    """(coarse, link_norm) → canonical, one row per distinct surface."""
    return (
        canon_mentions.select("coarse", "link_norm", "canonical").distinct()
    )


def canonical_triples(
    assertions: DataFrame, cmap: DataFrame
) -> DataFrame:
    """relation/event rows → deduplicated canonical triple rows.

    If ``assertions`` carries a ``lang`` column (the tagger passes the
    page language through — see TAG_FLAT_SCHEMA), the dedup keeps
    ``min(lang)`` per triple and the output needs NO post-hoc lang
    re-attach join.  For recrawled urls whose copies disagree on lang
    this is the min over the copies that produced the triple (vs the
    min over all copies a corpus-wide re-attach would give) — both are
    deterministic; the carried form saves a full-corpus join + sort at
    10^12-doc scale.
    """
    subj_map = cmap.select(
        F.col("coarse").alias("subj_coarse"),
        F.col("link_norm").alias("subj_norm"),
        F.col("canonical").alias("subj"),
    )
    obj_map = cmap.select(
        F.col("coarse").alias("obj_coarse"),
        F.col("link_norm").alias("obj_norm"),
        F.col("canonical").alias("obj"),
    )
    with_lang = "lang" in assertions.columns
    joined = (
        assertions.join(subj_map, ["subj_coarse", "subj_norm"])
        .join(obj_map, ["obj_coarse", "obj_norm"])
        .select(
            "url", "sent_id", "subj", "pred", "obj",
            F.col("subj_fine").alias("subj_type"),
            F.col("obj_fine").alias("obj_type"),
            "conf",
            *(["lang"] if with_lang else []),
        )
    )
    # No explicit repartition before the dedup: the aggregate's own
    # ENSURE_REQUIREMENTS exchange runs AFTER the partial (map-side)
    # aggregate, and duplicates are doc-local by construction (every
    # duplicate of a triple shares `url`, and a page's assertion rows
    # come out of one tagger partition, joined only by broadcast), so
    # the partial agg collapses them before any bytes move — the
    # exchange carries ~distinct triples only.  A pre-agg
    # repartition(url) would ship the RAW joined rows instead,
    # defeating map-side combine.
    if with_lang:
        # groupBy+min, not dropDuplicates: duplicates from recrawled
        # urls may disagree on lang, and "keep first" would be
        # partitioning-dependent
        return joined.groupBy(TRIPLE_COLS).agg(F.min("lang").alias("lang"))
    return joined.dropDuplicates(TRIPLE_COLS)


def graph_nodes(canon_mentions: DataFrame) -> DataFrame:
    """Canonical node table: one row per canonical entity with stats."""
    return (
        canon_mentions.groupBy("canonical")
        .agg(
            F.min("coarse").alias("coarse"),
            F.min("fine").alias("fine"),
            F.count(F.lit(1)).alias("n_mentions"),
            F.approx_count_distinct("url").alias("n_docs"),
            F.min("link_norm").alias("canonical_surface"),
        )
    )


def graph_edges(triples: DataFrame) -> DataFrame:
    """Canonical edge table: dedup (subj, pred, obj) with provenance agg."""
    return (
        triples.groupBy("subj", "pred", "obj")
        .agg(
            F.max("conf").alias("conf"),
            F.count(F.lit(1)).alias("n_provenances"),
            F.approx_count_distinct("url").alias("n_docs"),
        )
    )
