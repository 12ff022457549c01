"""Storage posture for corpus-sized localCheckpoints.

Fan-in tables — the tagged flat table feeding surfaces + the dedup
split, and the pre-dedup triple table on the non-stable path — are
materialized once and re-scanned by several downstream passes.
``Dataset.localCheckpoint()`` stores those blocks as DESERIALIZED
InternalRow objects: one JVM object per row (GC scan pressure) and
maximum bytes over the DRAM bus on every downstream pass.  Storing
them SERIALIZED (PySpark ``MEMORY_AND_DISK``; lz4 on top via
``spark.rdd.compress``) shrinks the resident blocks several-fold and
trades decompression CPU for bus bytes.

Measured (BENCH/SCALING.md "checkpoint block format" experiment,
500k-doc corpus, pinned fresh-JVM alternating pairs, 2026-08-18):

* local[16]: serialized wins every pair — wall 145.3→100.0,
  128.8→115.4, 131.9→86.1 s; JVM core-seconds at the per-leg minima
  601→270 (GC + block-scan cycles, bandwidth-bound regime);
* local[4]: neutral (256.8 vs 259.1 s; JVM core-s 203→180) — with the
  bus uncontended the lz4+deser CPU roughly cancels the byte savings.

The win lands exactly where the memory bus is the binding resource —
which is also the 1000-executor posture (each executor's cores share
that executor's bus with their sibling tasks), so serialized is the
DEFAULT; ``SPARK_GRAFT_CKPT_SER=0`` reverts to deserialized blocks.

Small vocabulary-sized checkpoints (linked surfaces, NIL labels, the
canonical map, per-round CC/PageRank label frontiers) keep the plain
default: their blocks are orders of magnitude below the corpus and
the decode CPU would buy nothing.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def big_local_checkpoint(df: DataFrame) -> DataFrame:
    """Materialize + truncate lineage for a corpus-sized table."""
    if os.environ.get("SPARK_GRAFT_CKPT_SER", "1") == "1":
        # PySpark's MEMORY_AND_DISK is the serialized variant
        # (deserialized=False); pairs with spark.rdd.compress=true
        # set in session.py for lz4 on top.
        return df.localCheckpoint(
            eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    return df.localCheckpoint()
