"""T4 — entity linking (broadcast alias join) + NIL clustering (LSH).

Reference: "Collective Entity Linking and NIL Clustering" (GAIA diagram;
stage script edl.sh, /root/reference/.gitignore:203), background KB at
/root/reference/README.md:128.  north_star shape: "cross-document entity
linking via MinHash/LSH candidate blocking plus a broadcast alias/KB
dictionary … AQE-aware broadcast-vs-sort-merge join on candidate keys".

Phase a (KB link): the (alias_norm, coarse) → best-entity dictionary is
pre-disambiguated with one small groupBy (max over (popularity,
entity_id) structs — the oracle's exact tie-break) and then hinted
``F.broadcast`` into the mention join; AQE would pick broadcast anyway
at this size, the hint makes the plan deterministic.

Phase b (NIL): unlinked mentions reduce to DISTINCT (coarse, link_norm)
keys first — the clustering problem is over surfaces, not mention
occurrences, so a 10^12-row corpus still clusters over only the distinct
surface vocabulary.  Blocking keys (MinHash/LSH bands + exact tokens,
shared kernel gaia_ref/minhashing.py) → posexploded self-join →
containment verification → connected components → stable NIL ids.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from gaia_ref.minhashing import CONTAINMENT_THRESHOLD, blocking_keys
from gaia_spark.operators.graph import connected_components

# Blocks larger than this are dropped from pair generation: at corpus
# scale a stop-token block ("bank", "group") would otherwise go
# quadratic.  Test corpora stay far below the cap, so oracle parity
# is exact there; at 10^12 scale this is the documented approximation.
MAX_BLOCK_SIZE = 256


def alias_dictionary(kb_entities: DataFrame, kb_aliases: DataFrame) -> DataFrame:
    """(alias_norm, coarse) → entity_id, pre-disambiguated.

    max(struct(popularity, entity_id)) reproduces the oracle's pinned
    tie-break (gaia_ref/oracle.py link_mention).
    """
    return (
        kb_aliases.join(kb_entities, "entity_id")
        .groupBy("alias_norm", F.col("entity_type").alias("alias_coarse"))
        .agg(
            F.max(F.struct("popularity", "entity_id"))["entity_id"]
            .alias("entity_id")
        )
    )


def link_mentions(
    resolved: DataFrame, kb_entities: DataFrame, kb_aliases: DataFrame
) -> DataFrame:
    """resolved mentions + nullable entity_id via the broadcast dict."""
    best = alias_dictionary(kb_entities, kb_aliases)
    return resolved.join(
        F.broadcast(best),
        on=[
            resolved.link_norm == best.alias_norm,
            resolved.coarse == best.alias_coarse,
        ],
        how="left",
    ).drop("alias_norm", "alias_coarse")


_BLOCK_SCHEMA = StructType([
    StructField("coarse", StringType(), False),
    StructField("link_norm", StringType(), False),
    StructField("block_key", LongType(), False),
])


def _blocking_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = []
        for coarse, norm in zip(pdf["coarse"], pdf["link_norm"]):
            for bk in blocking_keys(norm):
                rows.append((coarse, norm, bk))
        yield pd.DataFrame(rows, columns=["coarse", "link_norm", "block_key"])


def _shingle_col(col: F.Column) -> F.Column:
    """char_shingles (gaia_ref/minhashing.py) as a JVM column expression:
    distinct char 3-grams; a surface shorter than 3 chars shingles to
    itself (substr caps at the string end, matching the Python kernel)."""
    n = F.greatest(F.length(col) - 2, F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n),
                    lambda i: F.substr(col, i, F.lit(3)))
    )


def _containment_col(n1: F.Column, n2: F.Column) -> F.Column:
    """shingle_containment as pure built-ins — |A∩B| / min(|A|,|B|) via
    array_intersect/size, so pair verification stays inside whole-stage
    codegen (the last per-row Python in the linking path is gone).
    Empty surfaces score 0.0, matching the Python kernel."""
    s1, s2 = _shingle_col(n1), _shingle_col(n2)
    return (
        F.when((F.length(n1) == 0) | (F.length(n2) == 0), F.lit(0.0))
        .otherwise(
            F.size(F.array_intersect(s1, s2)).cast("double")
            / F.least(F.size(s1), F.size(s2)).cast("double")
        )
    )


def nil_clusters(linked: DataFrame) -> DataFrame:
    """unlinked mentions → (coarse, link_norm, nil_id) cluster map."""
    keys = (
        linked.filter(F.col("entity_id").isNull())
        .select("coarse", "link_norm")
        .distinct()
    )
    # cap pathological blocks before the quadratic self-join — a window
    # count over the block key (one shuffle; same key the self-join
    # needs anyway), then localCheckpoint so the Python blocking pass
    # runs ONCE, not once per self-join side
    from pyspark.sql.window import Window

    w = Window.partitionBy("coarse", "block_key")
    blocks = (
        keys.mapInPandas(_blocking_batches, schema=_BLOCK_SCHEMA)
        .withColumn("bs", F.count(F.lit(1)).over(w))
        .filter(F.col("bs") <= MAX_BLOCK_SIZE)
        .drop("bs")
        .localCheckpoint()
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    # no pre-verify distinct: a pair sharing several bands is verified
    # k times (cheap columnar filter); the CC kernel's symmetric-edge
    # distinct dedups — one less vocabulary-sized shuffle
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.coarse") == F.col("b.coarse"),
                F.col("a.block_key") == F.col("b.block_key"),
                F.col("a.link_norm") < F.col("b.link_norm"),
            ],
        )
        .select(
            F.col("a.coarse").alias("coarse"),
            F.col("a.link_norm").alias("n1"),
            F.col("b.link_norm").alias("n2"),
        )
    )
    verified = pairs.filter(
        _containment_col(F.col("n1"), F.col("n2"))
        >= CONTAINMENT_THRESHOLD
    )
    node = lambda c, n: F.concat_ws("\x1f", c, n)  # noqa: E731
    edges = verified.select(
        node(F.col("coarse"), F.col("n1")).alias("src"),
        node(F.col("coarse"), F.col("n2")).alias("dst"),
    )
    all_nodes = keys.select(
        node(F.col("coarse"), F.col("link_norm")).alias("node"))
    comps = connected_components(edges, nodes=all_nodes)
    members = keys.withColumn(
        "node", node(F.col("coarse"), F.col("link_norm"))
    ).join(comps, "node")
    reps = members.groupBy("component").agg(
        F.min("link_norm").alias("rep"))
    return (
        members.join(reps, "component")
        .select(
            "coarse",
            "link_norm",
            F.concat(
                F.lit("NIL:"),
                F.substring(F.sha1(F.encode(F.col("rep"), "utf-8")), 1, 12),
            ).alias("nil_id"),
        )
    )


def canonicalize_mentions(linked: DataFrame, nil_ids: DataFrame) -> DataFrame:
    """Attach the canonical id: KB entity_id, else NIL cluster id."""
    return (
        linked.join(nil_ids, ["coarse", "link_norm"], "left")
        .withColumn("canonical", F.coalesce("entity_id", "nil_id"))
        .drop("nil_id")
    )
