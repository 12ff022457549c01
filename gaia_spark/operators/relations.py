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

    Physical shape: ONE equi-join (mention ⋈ its gap) plus ONE window
    (`lead` over (url, sent_id) ordered by pos, filtered to pos+1) —
    instead of the naive m1⋈m2 self-join, saving a full shuffle of the
    mention table.  Both shuffles key on (url, sent_id[, pos]):
    bounded skew (mentions per sentence are capped upstream).
    """
    from pyspark.sql import Window

    # the lead-window rewrite assumes ≤1 gap row per (url, sent_id,
    # pos): a duplicate gap row would duplicate a mention row in the
    # window and lead() would return the same pos (filtered out) —
    # silently DROPPING the pair.  The tagger emits unique gaps, but
    # dedup defensively (cheap: keys match the join, shuffle reused).
    gaps = gaps.dropDuplicates(["url", "sent_id", "pos"])
    m = resolved.join(gaps, ["url", "sent_id", "pos"], "left")
    w = Window.partitionBy("url", "sent_id").orderBy("pos")
    return (
        m.withColumn("npos", F.lead("pos").over(w))
        .withColumn("obj_norm", F.lead("link_norm").over(w))
        .withColumn("obj_coarse", F.lead("coarse").over(w))
        .withColumn("obj_fine", F.lead("fine").over(w))
        .filter(F.col("npos") == F.col("pos") + 1)
        .filter(F.col("phrase").isNotNull())
        .select(
            "url", "sent_id", "pos",
            F.col("link_norm").alias("subj_norm"),
            F.col("coarse").alias("subj_coarse"),
            F.col("fine").alias("subj_fine"),
            "obj_norm", "obj_coarse", "obj_fine",
            "phrase", "begins_with_comma",
        )
    )


def extract_relations(
    spark: SparkSession, resolved: DataFrame, gaps: DataFrame
) -> DataFrame:
    """→ relation rows with subj/obj as (coarse, link_norm) references.

    Physical plan: mentions ⋈ gaps (equi-join on (url, sent_id, pos)),
    ONE window computing lead-1 (the adjacent pair) AND lead-2 (the
    appositive chain target), then two broadcast joins against the
    pattern table.  Zero large-table self-joins; the appositive branch
    shares the window exchange with the base branch (ReuseExchange).
    """
    from pyspark.sql import Window

    patterns = pattern_table(spark)
    # see adjacent_pairs: lead-window correctness needs gap uniqueness
    gaps = gaps.dropDuplicates(["url", "sent_id", "pos"])
    m = resolved.join(gaps, ["url", "sent_id", "pos"], "left")
    w = Window.partitionBy("url", "sent_id").orderBy("pos")
    adj = (
        m.withColumn("npos", F.lead("pos").over(w))
        .withColumn("obj_norm", F.lead("link_norm").over(w))
        .withColumn("obj_coarse", F.lead("coarse").over(w))
        .withColumn("obj_fine", F.lead("fine").over(w))
        .withColumn("npos2", F.lead("pos", 2).over(w))
        .withColumn("obj2_norm", F.lead("link_norm", 2).over(w))
        .withColumn("obj2_coarse", F.lead("coarse", 2).over(w))
        .withColumn("obj2_fine", F.lead("fine", 2).over(w))
        .withColumn("nphrase", F.lead("phrase").over(w))
        .filter((F.col("npos") == F.col("pos") + 1)
                & F.col("phrase").isNotNull())
        .select(
            "url", "sent_id", "pos",
            F.col("link_norm").alias("subj_norm"),
            F.col("coarse").alias("subj_coarse"),
            F.col("fine").alias("subj_fine"),
            "obj_norm", "obj_coarse", "obj_fine",
            "phrase", "begins_with_comma",
            "npos2", "obj2_norm", "obj2_coarse", "obj2_fine", "nphrase",
        )
    )

    base = adj.join(
        F.broadcast(patterns), ["subj_coarse", "phrase", "obj_coarse"]
    ).select(*_REL_COLS)

    # appositive propagation: pair (a, appos-pred, b) with a comma-led
    # connector chains to the NEXT adjacent pair (b, c) — which is this
    # same row's lead-2 columns, so no second pass over the mentions
    appos_pat = patterns.filter(F.col("pred").isin(*APPOSITIVE_PREDICATES))
    pat2 = patterns.select(
        F.col("subj_coarse").alias("p_subj_coarse"),
        F.col("phrase").alias("p_phrase"),
        F.col("obj_coarse").alias("p_obj_coarse"),
        "pred", "conf",
    )
    prop = (
        adj.join(F.broadcast(appos_pat.select(
            "subj_coarse", "phrase", "obj_coarse")),
            ["subj_coarse", "phrase", "obj_coarse"])
        .filter(F.col("begins_with_comma")
                & (F.col("npos2") == F.col("pos") + 2)
                & F.col("nphrase").isNotNull())
        .join(
            F.broadcast(pat2),
            on=[
                F.col("subj_coarse") == F.col("p_subj_coarse"),
                F.col("nphrase") == F.col("p_phrase"),
                F.col("obj2_coarse") == F.col("p_obj_coarse"),
            ],
        )
        .select(
            "url", "sent_id", "subj_norm", "subj_coarse", "subj_fine",
            "pred",
            F.col("obj2_norm").alias("obj_norm"),
            F.col("obj2_coarse").alias("obj_coarse"),
            F.col("obj2_fine").alias("obj_fine"),
            "conf",
        )
        .select(*_REL_COLS)
    )
    return base.unionByName(prop)
