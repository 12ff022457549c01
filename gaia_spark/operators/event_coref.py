"""T10 — graph-based textual event coreference.

Reference: the "Textual Event Coreference / Graph based Coreference
Resolution" stage of the GAIA diagram (SURVEY.md §2.2 T10): coreferent
event instances are merged by clustering a similarity graph whose edges
connect events of the SAME canonical event type that SHARE at least one
canonical argument.  This strictly generalizes the arg-identity dedup
T11 performs: two `evt:attack` events with arg sets {a,b} and {b,c}
overlap-but-differ and must merge here, while T11's
dropDuplicates(subj, pred, obj) would keep them apart.

Pipeline shape (all relational, CC kernel shared with T4b NIL
clustering):

1. event instances = canonical triples with an ``evt:`` predicate; the
   instance id is a deterministic string of the full provenance row.
2. similarity edges = self-join of the (type, arg) posting table —
   blocking on (pred, arg), so the join is O(Σ block²) over argument
   blocks, never all-pairs over events.
3. blocks larger than MAX_ARG_BLOCK are dropped from *edge building*
   (a canonical arg shared by thousands of same-type events — think
   `evt:attack` + "usa" — is weak coreference evidence and would
   otherwise go quadratic; the same df-cap pattern as alias blocking
   in linking.py).  Dropped blocks only lose candidate edges; events
   stay, they just need a rarer shared arg to merge.
4. connected components (operators/graph.py) → ``event_id`` = min
   instance id of the cluster.

The merge does NOT rewrite or drop triples: the reference's triple
output keeps every provenance row (P/R is measured on triples), and the
cluster table is the additional T10 artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gaia_spark.operators.graph import connected_components

#: (pred, arg) blocks larger than this contribute no candidate edges —
#: high-df arguments are weak evidence and would square the join.
MAX_ARG_BLOCK = 1000


def event_instances(triples: DataFrame) -> DataFrame:
    """Canonical event rows + a deterministic instance id.

    ``evt_uid`` concatenates the full identifying row, so it is stable
    under any partitioning and usable as a CC node id (component label
    = lexicographic min uid).
    """
    return triples.filter(F.col("pred").startswith("evt:")).withColumn(
        "evt_uid",
        F.concat_ws(
            "#", "url", F.col("sent_id").cast("string"),
            "pred", "subj", "obj",
        ),
    )


def event_coref_edges(events: DataFrame) -> DataFrame:
    """Similarity edges: same canonical type + ≥1 shared canonical arg.

    → (src, dst) with src < dst, distinct.  Blocked self-join on
    (pred, arg); df-capped per MAX_ARG_BLOCK (module docstring).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("pred", "arg")
    blocked = (
        events.select(
            "evt_uid", "pred",
            F.explode(F.array("subj", "obj")).alias("arg"),
        )
        .distinct()
        # df-cap via a window count over the block key (one shuffle,
        # the same key the self-join uses), checkpointed so the
        # posting build runs once, not once per join side
        .withColumn("n", F.count(F.lit(1)).over(w))
        .filter(F.col("n") <= MAX_ARG_BLOCK)
        .drop("n")
        .localCheckpoint()
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    # no distinct here: a pair sharing both subj and obj yields the
    # edge twice; the CC kernel's symmetric-edge distinct dedups
    return (
        a.join(b, ["pred", "arg"])
        .filter(F.col("a.evt_uid") < F.col("b.evt_uid"))
        .select(
            F.col("a.evt_uid").alias("src"),
            F.col("b.evt_uid").alias("dst"),
        )
    )


def coref_events(triples: DataFrame) -> DataFrame:
    """Event rows + their merged ``event_id`` (cluster label).

    Singleton events (no qualifying edge) keep their own uid as the
    event_id.
    """
    ev = event_instances(triples)
    edges = event_coref_edges(ev)
    comps = connected_components(
        edges, nodes=ev.select(F.col("evt_uid").alias("node")).distinct()
    )
    return (
        ev.join(
            comps.select(
                F.col("node").alias("evt_uid"),
                F.col("component").alias("event_id"),
            ),
            "evt_uid",
            "left",
        )
        .withColumn("event_id", F.coalesce("event_id", F.col("evt_uid")))
    )


def merged_events(triples: DataFrame) -> DataFrame:
    """One row per coreference cluster: the T10 output table.

    Deterministic aggregates only (sorted collect_set, min/max/count)
    so the table hashes identically under any partitioning.
    """
    ce = coref_events(triples)
    return ce.groupBy("event_id", "pred").agg(
        F.count(F.lit(1)).alias("n_instances"),
        F.countDistinct("url").alias("n_docs"),
        F.array_sort(F.collect_set("subj")).alias("subjs"),
        F.array_sort(F.collect_set("obj")).alias("objs"),
        F.max("conf").alias("conf"),
    )
