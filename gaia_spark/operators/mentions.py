"""T2/T3/T7 — mention + trigger tagging via ``mapInPandas``.

One Arrow-batched pass per document computes everything the downstream
*relational* stages need, so the heavy `text` column is scanned exactly
once (SURVEY.md §2.2 T2: "iterator-of-batches … deterministic,
vectorized gazetteer+rule tagger"):

- ``mentions``  — typed mention spans (the ELMo-LSTM-CRF analog, T2/T3)
- ``triggers``  — event trigger spans (the Bi-LSTM-CRF analog, T7)
- ``gaps``      — the connector phrase between each *adjacent* mention
                  pair in a sentence, pre-normalized

Emitting gaps here is the Spark-first trick: T6 relation extraction
becomes a pure equi-self-join of mentions on (url, sent_id, pos) plus a
broadcast join against the pattern table — no sentence text ever flows
through a shuffle (SURVEY.md §2.4 "self-join (blocked theta)").
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from gaia_ref.extract import split_sentences
from gaia_ref.tagging import connector_phrase, inter_tokens, tag_document

_MENTION = StructType([
    StructField("sent_id", IntegerType(), False),
    StructField("pos", IntegerType(), False),
    StructField("begin", IntegerType(), False),
    StructField("end", IntegerType(), False),
    StructField("surface", StringType(), False),
    StructField("coarse", StringType(), False),
    StructField("fine", StringType(), False),
    StructField("nominal", BooleanType(), False),
])
_TRIGGER = StructType([
    StructField("sent_id", IntegerType(), False),
    StructField("begin", IntegerType(), False),
    StructField("end", IntegerType(), False),
    StructField("fine_event", StringType(), False),
    StructField("left_types", ArrayType(StringType()), False),
    StructField("right_types", ArrayType(StringType()), False),
    StructField("conf", DoubleType(), False),
])
_GAP = StructType([
    StructField("sent_id", IntegerType(), False),
    StructField("pos", IntegerType(), False),
    StructField("phrase", StringType(), True),
    StructField("begins_with_comma", BooleanType(), False),
])

TAGGED_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("mentions", ArrayType(_MENTION), False),
    StructField("triggers", ArrayType(_TRIGGER), False),
    StructField("gaps", ArrayType(_GAP), False),
])


def _tag_one(url: str, text: str) -> dict:
    text = text or ""
    ms, trs = tag_document(text)
    sent_spans = {sid: (sb, se) for sid, sb, se in split_sentences(text)}
    by_sent: dict[int, list] = {}
    for m in ms:
        by_sent.setdefault(m.sent_id, []).append(m)
    mention_rows, gap_rows = [], []
    for sid in sorted(by_sent):
        sml = sorted(by_sent[sid], key=lambda m: m.begin)
        sb, se = sent_spans[sid]
        for pos, m in enumerate(sml):
            mention_rows.append(
                (m.sent_id, pos, m.begin, m.end, m.surface, m.coarse,
                 m.fine, m.nominal))
            if pos + 1 < len(sml):
                cp = connector_phrase(
                    inter_tokens(text, sb, se, m.end, sml[pos + 1].begin))
                if cp is not None:
                    gap_rows.append((sid, pos, cp[0], cp[1]))
    trig_rows = [
        (t.sent_id, t.begin, t.end, t.fine_event,
         sorted(t.left_types), sorted(t.right_types), t.conf)
        for t in trs
    ]
    return {"url": url, "mentions": mention_rows,
            "triggers": trig_rows, "gaps": gap_rows}


def _tag_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        yield pd.DataFrame(
            [_tag_one(u, t) for u, t in zip(pdf["url"], pdf["text"])],
            columns=["url", "mentions", "triggers", "gaps"],
        )


def tag_pages(pages_text: DataFrame) -> DataFrame:
    """(url, text, …) → one row per url with mention/trigger/gap arrays."""
    return pages_text.select("url", "text").mapInPandas(
        _tag_batches, schema=TAGGED_SCHEMA
    )


def mentions_df(tagged: DataFrame) -> DataFrame:
    """Explode to flat mention rows (url, sent_id, pos, begin, end, …)."""
    return tagged.select(
        "url", F.explode("mentions").alias("m")
    ).select("url", "m.*")


def triggers_df(tagged: DataFrame) -> DataFrame:
    return tagged.select(
        "url", F.explode("triggers").alias("t")
    ).select("url", "t.*")


def gaps_df(tagged: DataFrame) -> DataFrame:
    return tagged.select(
        "url", F.explode("gaps").alias("g")
    ).select("url", "g.*")
