"""Standing coverage for the >1M-edge distributed-CC scale branch.

Round-2's confirmed bug (one-hop hash-min, silent split components)
lived exactly in the branch no test ever crossed: the driver
union-find path handles everything below DRIVER_CC_MAX_EDGES = 1M
symmetric edges.  This suite synthesizes a corpus whose near-dup graph
is GENUINELY over the gate and runs the real consumers end-to-end:

* ``dedup_resolution``: 700 sliding-window chains × 200 docs (window
  40 tokens, step 1 → adjacent docs J=(40-k)/(40+k), edges to ±4,
  chain diameter ≈ 50 > the old 25-round cliff) → ~553k verified
  pairs → ~1.1M symmetric edges → the distributed pointer-doubling
  loop, with the driver branch monkeypatch-poisoned so a silent
  fallback can't fake the pass.
* ``nil_clusters``: same wiring through the distributed branch
  (gate forced to 0) on a fixture with known clusters — the NIL path's
  blocking + containment-verify feeds the same CC kernel.
"""

import pytest
from pyspark.sql import functions as F

import gaia_spark.operators.graph as G
from gaia_spark.functions.dedup import dedup_resolution


@pytest.mark.slow
def test_dedup_resolution_crosses_real_gate_distributed_cc(
        spark, monkeypatch):
    n_chains, chain_len, w = 700, 200, 40
    rows = []
    for c in range(n_chains):
        toks = [f"c{c}w{i}" for i in range(chain_len + w)]
        for d in range(chain_len):
            rows.append((f"{c:04d}_{d:04d}",
                         " ".join(toks[d:d + w])))
    df = spark.createDataFrame(rows, "doc_id string, text string") \
              .repartition(16)

    # poison the driver union-find: if the edge count were under the
    # gate the test would fail loudly instead of silently passing on
    # the small-graph path
    def _no_driver(*a, **k):
        raise AssertionError(
            "driver union-find taken — edge graph under the 1M gate")
    monkeypatch.setattr(G, "_driver_components", _no_driver)

    res = dedup_resolution(df, min_x10k=8000).localCheckpoint()
    assert res.count() == n_chains * chain_len
    # every chain collapses to ONE cluster labeled by its min doc id —
    # only O(log diameter) propagation gets there in <= 25 rounds
    clusters = (res.groupBy("cluster")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.col("keep").cast("int")).alias("keepers"))
                .collect())
    assert len(clusters) == n_chains
    assert all(r.n == chain_len and r.keepers == 1 for r in clusters)
    assert all(r.cluster.endswith("_0000") for r in clusters)


def test_nil_clusters_distributed_branch_matches_driver(
        spark, monkeypatch):
    """nil_clusters through the distributed CC loop (gate=0) must equal
    the driver union-find result on the same linked input."""
    from gaia_ref.gazetteer import alias_rows, kb_rows
    from gaia_spark.operators.linking import (
        alias_dictionary, link_mentions, nil_clusters)

    mentions = spark.createDataFrame(
        [("u1", "PER", "jon smithers"), ("u2", "PER", "jon smithers jr"),
         ("u3", "PER", "j smithers"), ("u4", "ORG", "acme rockets inc"),
         ("u5", "ORG", "acme rockets"), ("u6", "PER", "zelda quark")],
        "url string, coarse string, link_norm string")
    kb_e = spark.createDataFrame(
        kb_rows(), schema="entity_id string, canonical_name string, "
                          "entity_type string, fine_type string, "
                          "popularity double")
    kb_a = spark.createDataFrame(
        alias_rows(), schema="alias_norm string, entity_id string")
    linked = link_mentions(mentions, kb_e, kb_a)

    want = {(r.coarse, r.link_norm): r.nil_id
            for r in nil_clusters(linked).collect()}
    monkeypatch.setattr(G, "DRIVER_CC_MAX_EDGES", 0)
    got = {(r.coarse, r.link_norm): r.nil_id
           for r in nil_clusters(linked).collect()}
    assert got == want and len(got) > 0
