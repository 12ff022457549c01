"""Bloom-prefiltered decontamination: exact-equality + real pruning.

The Bloom path must return bit-identical results to the exact
operator (FPs die at the verify join) while the prefilter actually
prunes — the property that makes it the scale path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gaia_spark.functions import decontaminate as dc


def _corpus(spark, n_docs=60):
    rows = [(i, " ".join(f"w{(i * 13 + j) % 97}" for j in range(20)))
            for i in range(n_docs)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_equals_exact(spark):
    d = _corpus(spark)
    ev = d.filter(F.col("doc_id") % 7 == 0)
    corpus = d.unionByName(
        ev.select((F.col("doc_id") + 1000).alias("doc_id"), "text"))
    exact = {r["doc_id"]: tuple(r)
             for r in dc.contamination_stats(corpus, ev).collect()}
    bloom = {r["doc_id"]: tuple(r)
             for r in dc.contamination_stats_bloom(
                 spark, corpus, ev).collect()}
    assert exact == bloom
    assert any(v[4] for v in exact.values())        # mirrors flagged
    assert not all(v[4] for v in exact.values())    # originals vary


def test_bloom_prefilter_prunes(spark):
    # disjoint vocabularies: zero true hits, so every row surviving
    # the prefilter is a false positive — at fpp=0.01 over ~800
    # corpus grams, expect a handful at most (hard bound: 10%)
    corpus = _corpus(spark, 60)
    ev = spark.createDataFrame(
        [(900 + i, " ".join(f"z{i}x{j}" for j in range(20)))
         for i in range(10)],
        "doc_id long, text string")
    bcast, m, k = dc.build_eval_bloom(spark, ev)
    bits = np.frombuffer(bcast.value, dtype=np.uint8)
    fill = np.unpackbits(bits).mean()
    assert 0 < fill < 0.6          # sized bitmap, not saturated
    res = dc.contamination_stats_bloom(spark, corpus, ev)
    assert res.filter(F.col("contaminated")).count() == 0


def test_bloom_params_sizing():
    m, k = dc._bloom_params(10_000, 0.01)
    assert m % 64 == 0
    assert 9 * 10_000 < m < 11 * 10_000   # ~9.59 bits/item at 1%
    assert 6 <= k <= 8                     # ~6.6 probes
    m1, k1 = dc._bloom_params(0, 0.01)     # degenerate input guarded
    assert m1 >= 64 and k1 >= 1
