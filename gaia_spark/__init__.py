"""gaia_spark — PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first re-expression of the GAIA cross-media
knowledge-extraction pipeline (/root/reference/README.md:1) per
SURVEY.md: the reference's Docker-per-stage file-handoff dataflow
becomes lazy DataFrame transforms over partitioned columnar tables,
with Catalyst/AQE doing join selection, pushdown and skew handling,
and Arrow-batched pandas UDFs carrying the per-document text logic.

Layout (SURVEY.md §2):
  session.py            tuned SparkSession factory
  catalog.py            checkpoint tables, replace-by-run_id, lineage
  operators/extract     T1  html→text (+ sentence index)
  operators/mentions    T2/T3/T7 tagging (mapInPandas)
  operators/coref       T5  nominal coref (applyInPandas)
  operators/linking     T4  broadcast alias join + MinHash/LSH NIL
  operators/graph       J5  connected components (hash-min loop)
  operators/relations   T6  adjacency self-join + pattern table
  operators/events      T8/T9 trigger-argument attachment
  operators/canonicalize T11/T12 canonical ids + triple dedup
  operators/cleankb     T13 provenance semi-join + bounds
  operators/dedup       corpus dedup family (exact/MinHash/SimHash/…)
  operators/similarity  embedding ANN (brute-force + LSH-bucketed)
  operators/textstats   lang-id, quality, tokens, fingerprints
  operators/multimodal  binary-column decode plumbing (stubbed codecs)
  plans/pipeline        stage orchestration, checkpoints, resume
  sources/              readers/sinks (pages, KB, ColdStart .cs, AIF ttl)
"""

__version__ = "0.1.0"
