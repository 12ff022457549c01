"""T5 — contextual nominal coreference as a grouped-map pandas UDF.

Reference: "Contextual Nominal Coreference" (GAIA diagram, textual
row).  Classic per-document grouped-map shape (SURVEY.md §2.2 T5):
``groupBy("url").applyInPandas`` — each group is one document's
mentions, resolution is nearest preceding named mention of the same
coarse type; unresolved nominals are dropped (same pinned rule as
gaia_ref.oracle.resolve_nominals).

The output adds ``link_norm`` — the alias-normal form of the resolved
surface — which is the join key for every downstream linking join, so
norm_surface (Python) runs exactly once per mention.

Scale: groups are documents (≤ a few hundred mentions each), so no
group can blow executor memory; skew is bounded by document length,
not domain popularity.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from gaia_ref.extract import norm_surface

RESOLVED_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("sent_id", IntegerType(), False),
    StructField("pos", IntegerType(), False),
    StructField("begin", IntegerType(), False),
    StructField("end", IntegerType(), False),
    StructField("surface", StringType(), False),
    StructField("coarse", StringType(), False),
    StructField("fine", StringType(), False),
    StructField("nominal", BooleanType(), False),
    StructField("link_norm", StringType(), False),
])


def _resolve_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["sent_id", "begin"], kind="mergesort")
    out_rows = []
    last_named: dict[str, tuple[str, str]] = {}  # coarse -> (surface, fine)
    for r in pdf.itertuples(index=False):
        if not r.nominal:
            last_named[r.coarse] = (r.surface, r.fine)
            out_rows.append(
                (r.url, r.sent_id, r.pos, r.begin, r.end, r.surface,
                 r.coarse, r.fine, False, norm_surface(r.surface)))
        else:
            ante = last_named.get(r.coarse)
            if ante is not None:
                out_rows.append(
                    (r.url, r.sent_id, r.pos, r.begin, r.end, r.surface,
                     r.coarse, ante[1], True, norm_surface(ante[0])))
    return pd.DataFrame(
        out_rows, columns=[f.name for f in RESOLVED_SCHEMA.fields])


def resolve_nominals(mentions: DataFrame) -> DataFrame:
    """mentions → resolved mentions (+link_norm), unresolved dropped."""
    return mentions.groupBy("url").applyInPandas(
        _resolve_group, schema=RESOLVED_SCHEMA)
