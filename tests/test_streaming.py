"""Streaming adapter: the batch stages lift onto Structured Streaming
unchanged via foreachBatch (gaia_spark/streaming docstring contract).

The reference is strictly batch, so this is the forward-compat surface:
a file-streaming source over the corpus, the T1 extractor as the stage,
exactly-once via the checkpointed batch ids.
"""

import os

import pytest

from gaia_spark.operators.extract import extract_pages
from gaia_spark.streaming import foreach_batch_pipeline


def test_foreach_batch_runs_batch_stage_on_stream(
        spark, corpus_dir, oracle_result, tmp_path):
    import shutil

    src_dir = str(tmp_path / "pages_in")
    os.makedirs(src_dir)
    shutil.copy(os.path.join(corpus_dir, "pages.parquet"),
                os.path.join(src_dir, "pages.parquet"))
    static = spark.read.parquet(src_dir)
    out_dir = str(tmp_path / "stream_out")

    def sink(df, batch_id):
        df.write.mode("append").parquet(out_dir)

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = (
        stream.writeStream
        .foreachBatch(foreach_batch_pipeline(extract_pages, sink))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir)
    assert got.count() == static.count()
    # byte-identical invariant holds through the streaming path too
    texts = {r.url: r.text for r in got.collect()}
    assert texts == oracle_result["texts"]
