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

from gaia_spark.checkpoint import big_local_checkpoint

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
    assertions: DataFrame, cmap: DataFrame, stable_input: bool = False
) -> DataFrame:
    """relation/event rows → deduplicated canonical triple rows.

    NOTE: construction is eager (the sparse-dedup split below runs a
    key-count probe to decide broadcast vs full-aggregate), so calling
    this builds and executes the upstream plan once.

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
    return dedup_triples(joined, with_lang=with_lang,
                         stable_input=stable_input)


def dedup_triples(joined: DataFrame, with_lang: bool,
                  stable_input: bool = False) -> DataFrame:
    """Exact triple dedup that shuffles 8-byte KEYS, not rows.

    A naive ``groupBy(TRIPLE_COLS)`` exchanges the full triple rows —
    measured 26 s of a 79 s 16-core run (400k docs) to collapse ZERO
    duplicates: corpora are mostly-unique, and on a saturated memory
    bus (or a real cluster's network) shipping ~100-byte rows to prove
    they are already distinct is the single most expensive no-op in
    the pipeline.  At 10^12 docs the naive form is a full shuffle of
    the entire triple table.

    Sparse-duplicate algorithm (exact for ANY input, including
    recrawled urls whose copies land in different partitions):

    1. ``h = xxhash64(TRIPLE_COLS)`` per row;
    2. ``dup_hashes`` = h values seen more than once — the groupBy(h)
       exchange carries (8-byte key, partial count), ~15× less than
       the rows;
    3. rows whose h is NOT in ``dup_hashes`` (broadcast anti-join) are
       globally unique → pass through with NO exchange at all;
    4. only rows in the duplicated slice take the full-row
       groupBy/min(lang) — exact even for xxhash64 collisions between
       DIFFERENT triples (a collision merely routes both rows into
       this exact branch) and for recrawl copies that disagree on
       ``lang`` (min over copies, partitioning-independent).

    By default the hashed input is ``localCheckpoint``-ed ONCE and the
    probe + both branches read that single materialization.  This is a
    node-local cache write (MEMORY_AND_DISK blocks — no exchange, no
    network), and it is what makes the split EXACT for any upstream,
    including nondeterministic ones (sample, mono_id, a shuffle
    recomputed after task loss): re-executing ``joined`` per branch
    would let a row change hash between the probe and the anti-join
    and leak a duplicate into the pass-through slice.

    ``stable_input=True`` skips that materialization: the caller
    asserts ``joined`` re-executes bit-identically (every source
    already checkpointed/parquet + deterministic row-wise transforms —
    exactly the build_triples_df case, whose join inputs are both
    localCheckpoint blocks).  On a memory-bandwidth-bound box the skip
    saves writing + re-reading the full triple table (two narrow scans
    of already-materialized inputs beat one extra full-width cache
    pass).

    Fallback: if the duplicated slice is NOT sparse (> ~4M distinct
    duplicated hashes — a recrawl-heavy corpus), broadcasting it would
    hurt, so the classic full-row aggregate is used instead.  The
    probe costs one tiny action on the already-aggregated hash side.
    """
    hashed = joined.withColumn("__h", F.xxhash64(*TRIPLE_COLS))
    if not stable_input:
        # single materialization serving probe + both branches —
        # corpus-sized, so serialized blocks (checkpoint.py)
        hashed = big_local_checkpoint(hashed)
    dup_hashes = (
        hashed.select("__h")
        .groupBy("__h").agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .select("__h")
        .localCheckpoint()  # tiny; broadcast to two consumers below
    )
    if dup_hashes.count() > 4_000_000:
        if with_lang:
            return hashed.groupBy(TRIPLE_COLS).agg(
                F.min("lang").alias("lang"))
        return hashed.select(TRIPLE_COLS).dropDuplicates(TRIPLE_COLS)
    out_cols = TRIPLE_COLS + (["lang"] if with_lang else [])
    unique = hashed.join(F.broadcast(dup_hashes), "__h", "left_anti")
    dup_slice = hashed.join(F.broadcast(dup_hashes), "__h", "left_semi")
    if with_lang:
        deduped = dup_slice.groupBy(TRIPLE_COLS).agg(
            F.min("lang").alias("lang"))
    else:
        deduped = dup_slice.dropDuplicates(TRIPLE_COLS)
    return unique.select(out_cols).unionByName(deduped.select(out_cols))


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


def graph_edges(triples: DataFrame, stable_input: bool = False) -> DataFrame:
    """Canonical edge table: dedup (subj, pred, obj) with provenance agg.

    Same sparse-duplicate split as dedup_triples, for a worse reason:
    the provenance aggregate carries an ``approx_count_distinct`` whose
    PARTIAL buffer is a per-group HLL sketch (~KB) — a full-width
    groupBy ships one sketch per edge through the exchange, and most
    edges have exactly one provenance row.  Single-provenance edges are
    decided by an 8-byte-key count instead and pass through as a pure
    projection (count=1, n_docs=1, max(conf)=conf — identical to the
    aggregate's answer on a one-row group, HLL of one element is
    exact); only multi-provenance edges take the sketch aggregate.
    """
    hashed = triples.withColumn("__h", F.xxhash64("subj", "pred", "obj"))
    if not stable_input:
        # single materialization — see dedup_triples; serialized blocks
        hashed = big_local_checkpoint(hashed)
    dup_hashes = (
        hashed.select("__h")
        .groupBy("__h").agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .select("__h")
        .localCheckpoint()
    )
    if dup_hashes.count() > 4_000_000:
        agg_in = hashed
        unique = None
    else:
        agg_in = hashed.join(F.broadcast(dup_hashes), "__h", "left_semi")
        unique = (
            hashed.join(F.broadcast(dup_hashes), "__h", "left_anti")
            .select(
                "subj", "pred", "obj", "conf",
                F.lit(1).cast("bigint").alias("n_provenances"),
                F.lit(1).cast("bigint").alias("n_docs"),
            )
        )
    agged = (
        agg_in.groupBy("subj", "pred", "obj")
        .agg(
            F.max("conf").alias("conf"),
            F.count(F.lit(1)).alias("n_provenances"),
            F.approx_count_distinct("url").alias("n_docs"),
        )
    )
    return agged if unique is None else unique.unionByName(agged)


def sameas_rewrite(triples: DataFrame, sameas: DataFrame) -> DataFrame:
    """owl:sameAs canonicalization: rewrite every triple onto the
    canonical member of its subject's / object's equivalence class
    → DISTINCT (subj, pred, obj).

    The cross-document identity step of "canonicalize into a
    deduplicated node/edge graph": linking emits sameAs pairs
    (alias hits, NIL-cluster merges, visual coref), and every
    downstream consumer wants ONE node per real-world entity.  The
    canonical id is the lexicographic min of the equivalence class
    (connected components over the sameAs pairs — transitive by
    construction, so a#b, b#c rewrites c onto a), an order-free
    choice identical under any partitioning.

    Scale shape: CC runs over the SPARSE sameAs pair set only (never
    the triple table); the resulting map drops identity rows
    (node = component) so only entities that actually move ride the
    two entity-keyed rewrite joins — broadcast while the moved set
    is dictionary-sized (the common case: merges are rare relative
    to triples), shuffle-join otherwise.  The final distinct is the
    same (subj, pred, obj) map-side-combined dedup T11 uses.
    """
    from gaia_spark.operators.graph import connected_components

    labels = connected_components(
        sameas.select(F.col("subj").alias("src"),
                      F.col("obj").alias("dst")))
    moves = (labels.filter(F.col("node") != F.col("component"))
             .localCheckpoint())
    ms = moves.select(F.col("node").alias("subj"),
                      F.col("component").alias("s_canon"))
    mo = moves.select(F.col("node").alias("obj"),
                      F.col("component").alias("o_canon"))
    return (
        triples.join(ms, "subj", "left").join(mo, "obj", "left")
        .select(
            F.coalesce("s_canon", F.col("subj")).alias("subj"),
            "pred",
            F.coalesce("o_canon", F.col("obj")).alias("obj"))
        .distinct()
    )


def sql_sameas_rewrite(triples_sql: str, sameas_sql: str) -> str:
    """DuckDB twin: recursive min-label CC over the sameAs pairs,
    same left-join rewrite + distinct."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT subj AS src, obj AS dst FROM ({sameas_sql})
), sym AS (
  SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
), reach(node, comp) AS (
  SELECT src, src FROM sym
  UNION
  SELECT e.src, r.comp FROM sym e JOIN reach r ON e.dst = r.node
), lab AS (
  SELECT node, min(comp) AS component FROM reach GROUP BY node
), moves AS (
  SELECT node, component FROM lab WHERE node <> component
)
SELECT DISTINCT
       coalesce(ms.component, t.subj) AS subj,
       t.pred,
       coalesce(mo.component, t.obj) AS obj
FROM ({triples_sql}) t
LEFT JOIN moves ms ON ms.node = t.subj
LEFT JOIN moves mo ON mo.node = t.obj
"""
