"""Streaming adapter (deferred surface — SURVEY.md §2.4 last row).

The reference is strictly batch (shell-orchestrated Docker stages,
/root/reference/README.md:53-55,98-112): no watermarks, windows, or
stateful streaming exist to reproduce.  Every stage operator is a pure
DataFrame→DataFrame function precisely so this wrapper can lift the
whole pipeline onto Structured Streaming unchanged when a streaming
corpus source appears.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def foreach_batch_pipeline(
    stage_fn: Callable[[DataFrame], DataFrame],
    sink_fn: Callable[[DataFrame, int], None],
) -> Callable[[DataFrame, int], None]:
    """Adapt a batch stage to a ``writeStream.foreachBatch`` callback:

        (spark.readStream.format(...).load()
            .writeStream.foreachBatch(
                foreach_batch_pipeline(extract_pages, sink))
            .option("checkpointLocation", ...).start())

    Exactly-once composes from Structured Streaming's checkpointed
    batch ids + the catalog's idempotent replace-by-run_id writes
    (use f"batch_{batch_id}" as the run_id).
    """
    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        sink_fn(stage_fn(batch_df), batch_id)

    return _fn
