"""T6 — relation extraction as a blocked self-join + broadcast pattern table.

Reference: "Textual Relation Extraction — Assembled CNN Extractor /
Dependency based Fine-Grained Relation Typing" (GAIA diagram; stage
script relation.sh, /root/reference/.gitignore:205).

Spark-first formulation (SURVEY.md §2.4 "self-join (blocked theta)"):
candidate pairs are ADJACENT mentions in a sentence — an equi-self-join
of the resolved-mentions table on (url, sent_id, pos+1==pos) — glued to
the tag-time connector phrase (gaps table) and matched against the
broadcast pattern dictionary.  No sentence text flows through the
shuffle; the join keys are (url, sent_id), so skew is bounded by
sentence mention counts (capped by MAX_CONNECTOR_TOKENS upstream).

The appositive rule ("X , head of Y , visited Z" ⇒ X visited Z) is one
extra self-join of the adjacency table with itself on consecutive
positions — the oracle's triple-scan re-expressed relationally
(gaia_ref/oracle.py extract_doc_assertions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gaia_ref.gazetteer import APPOSITIVE_PREDICATES, RELATION_PATTERNS

_REL_COLS = [
    "url", "sent_id", "subj_norm", "subj_coarse", "subj_fine",
    "pred", "obj_norm", "obj_coarse", "obj_fine", "conf",
]


def pattern_table(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        RELATION_PATTERNS,
        schema="subj_coarse string, phrase string, obj_coarse string, "
               "pred string, conf double",
    )


def adjacent_pairs(resolved: DataFrame, gaps: DataFrame) -> DataFrame:
    """Adjacent same-sentence mention pairs with their connector phrase.

    Adjacency is tag-time position; a pair survives only if BOTH
    endpoints survived coref (unresolved nominals drop out of
    ``resolved``), mirroring the oracle's post-coref adjacency — safe
    because a connector spanning a dropped nominal can never equal a
    pattern phrase exactly.
    """
    m1, m2, g = resolved.alias("m1"), resolved.alias("m2"), gaps.alias("g")
    return (
        m1.join(
            m2,
            on=[
                F.col("m1.url") == F.col("m2.url"),
                F.col("m1.sent_id") == F.col("m2.sent_id"),
                F.col("m1.pos") + 1 == F.col("m2.pos"),
            ],
        )
        .join(
            g,
            on=[
                F.col("m1.url") == F.col("g.url"),
                F.col("m1.sent_id") == F.col("g.sent_id"),
                F.col("m1.pos") == F.col("g.pos"),
            ],
        )
        .select(
            F.col("m1.url").alias("url"),
            F.col("m1.sent_id").alias("sent_id"),
            F.col("m1.pos").alias("pos"),
            F.col("m1.link_norm").alias("subj_norm"),
            F.col("m1.coarse").alias("subj_coarse"),
            F.col("m1.fine").alias("subj_fine"),
            F.col("m2.link_norm").alias("obj_norm"),
            F.col("m2.coarse").alias("obj_coarse"),
            F.col("m2.fine").alias("obj_fine"),
            F.col("g.phrase").alias("phrase"),
            F.col("g.begins_with_comma").alias("begins_with_comma"),
        )
    )


def extract_relations(
    spark: SparkSession, resolved: DataFrame, gaps: DataFrame
) -> DataFrame:
    """→ relation rows with subj/obj as (coarse, link_norm) references."""
    patterns = pattern_table(spark)
    adj = adjacent_pairs(resolved, gaps)

    base_matched = adj.join(
        F.broadcast(patterns), ["subj_coarse", "phrase", "obj_coarse"]
    )
    base = base_matched.select(*_REL_COLS)

    # appositive propagation: left pair (a, appos-pred, b) with a
    # comma-led connector, chained to the NEXT adjacent pair (b, c):
    # re-match the pattern table with subject types/ids taken from a.
    appos = base_matched.filter(
        F.col("begins_with_comma")
        & F.col("pred").isin(*APPOSITIVE_PREDICATES)
    ).select(
        "url", "sent_id", "pos",
        "subj_norm", "subj_coarse", "subj_fine",
    )
    nxt = adj.select(
        "url", "sent_id", F.col("pos").alias("npos"),
        F.col("obj_norm").alias("c_norm"),
        F.col("obj_coarse").alias("c_coarse"),
        F.col("obj_fine").alias("c_fine"),
        F.col("phrase").alias("nphrase"),
    )
    pat2 = patterns.select(
        F.col("subj_coarse").alias("p_subj_coarse"),
        F.col("phrase").alias("p_phrase"),
        F.col("obj_coarse").alias("p_obj_coarse"),
        "pred", "conf",
    )
    prop = (
        appos.join(
            nxt,
            on=[
                appos.url == nxt.url,
                appos.sent_id == nxt.sent_id,
                appos.pos + 1 == nxt.npos,
            ],
        )
        .select(
            appos.url.alias("url"),
            appos.sent_id.alias("sent_id"),
            "subj_norm", "subj_coarse", "subj_fine",
            "c_norm", "c_coarse", "c_fine", "nphrase",
        )
        .join(
            F.broadcast(pat2),
            on=[
                F.col("subj_coarse") == F.col("p_subj_coarse"),
                F.col("nphrase") == F.col("p_phrase"),
                F.col("c_coarse") == F.col("p_obj_coarse"),
            ],
        )
        .select(
            "url", "sent_id", "subj_norm", "subj_coarse", "subj_fine",
            "pred",
            F.col("c_norm").alias("obj_norm"),
            F.col("c_coarse").alias("obj_coarse"),
            F.col("c_fine").alias("obj_fine"),
            "conf",
        )
        .select(*_REL_COLS)
    )
    return base.unionByName(prop)
