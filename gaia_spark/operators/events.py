"""T7–T9 — event argument attachment + fine typing, relationally.

Reference: "Coarse-Grained Event Extraction (Bi-LSTM CRFs Trigger
Extractor) / CNN Argument Extractor / Fine-Grained Event Typing"
(GAIA diagram; stage script event.sh, /root/reference/.gitignore:204).

Triggers were detected in the T2 tagging pass (one text scan for the
whole pipeline).  Argument attachment is an equi-join of triggers ×
resolved mentions on (url, sent_id) + proximity predicates
(SURVEY.md §2.2 T8), with the nearest-left / nearest-right argument
picked by ``row_number`` windows — deterministic because mention spans
within a sentence are disjoint (no ordering ties, SURVEY.md §4.3.5).
Fine typing (T9) happened at trigger time via the lexicon (the
rule-cascade analog), so `fine_event` is already final here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_EVT_COLS = [
    "url", "sent_id", "subj_norm", "subj_coarse", "subj_fine",
    "pred", "obj_norm", "obj_coarse", "obj_fine", "conf",
]


def extract_events(triggers: DataFrame, resolved: DataFrame) -> DataFrame:
    """→ event rows shaped exactly like relation rows (evt: predicates)."""
    t = triggers.select(
        "url", "sent_id",
        F.col("begin").alias("t_begin"),
        F.col("end").alias("t_end"),
        "fine_event", "left_types", "right_types", "conf",
    )
    m = resolved.select(
        "url", "sent_id",
        F.col("begin").alias("m_begin"),
        F.col("end").alias("m_end"),
        F.col("coarse").alias("m_coarse"),
        F.col("fine").alias("m_fine"),
        F.col("link_norm").alias("m_norm"),
    )
    joined = t.join(m, ["url", "sent_id"])

    trig_key = ["url", "sent_id", "t_begin"]
    w_left = Window.partitionBy(*trig_key).orderBy(F.col("m_end").desc())
    left = (
        joined.filter(
            (F.col("m_end") <= F.col("t_begin"))
            & F.array_contains(F.col("left_types"), F.col("m_coarse"))
        )
        .withColumn("rn", F.row_number().over(w_left))
        .filter(F.col("rn") == 1)
        .select(
            *trig_key, "fine_event", "conf",
            F.col("m_norm").alias("subj_norm"),
            F.col("m_coarse").alias("subj_coarse"),
            F.col("m_fine").alias("subj_fine"),
        )
    )
    w_right = Window.partitionBy(*trig_key).orderBy(F.col("m_begin").asc())
    right = (
        joined.filter(
            (F.col("m_begin") >= F.col("t_end"))
            & F.array_contains(F.col("right_types"), F.col("m_coarse"))
        )
        .withColumn("rn", F.row_number().over(w_right))
        .filter(F.col("rn") == 1)
        .select(
            *trig_key,
            F.col("m_norm").alias("obj_norm"),
            F.col("m_coarse").alias("obj_coarse"),
            F.col("m_fine").alias("obj_fine"),
        )
    )
    return (
        left.join(right, trig_key)
        .select(
            "url", "sent_id", "subj_norm", "subj_coarse", "subj_fine",
            F.concat(F.lit("evt:"), F.col("fine_event")).alias("pred"),
            "obj_norm", "obj_coarse", "obj_fine", "conf",
        )
        .select(*_EVT_COLS)
    )
