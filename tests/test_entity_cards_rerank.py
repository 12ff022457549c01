"""entity_profile (operators/cleankb.py), neighbor_jaccard
(operators/graph.py), edit_similarity (functions/dedup.py),
pq_rerank_topk (functions/pq.py).
"""

from pyspark.sql import functions as F

from gaia_spark.functions.dedup import edit_similarity
from gaia_spark.operators.cleankb import entity_profile
from gaia_spark.operators.graph import neighbor_jaccard


def test_entity_profile_counts_both_roles(spark):
    t = spark.createDataFrame(
        [("a", "p", "b"), ("a", "q", "b"), ("a", "p", "c"),
         ("b", "p", "a")],
        "subj string, pred string, obj string")
    got = {r.entity: r for r in entity_profile(t).collect()}
    assert got["a"].n_as_subj == 3 and got["a"].n_as_obj == 1
    assert got["a"].n_preds_out == 2 and got["a"].n_preds_in == 1
    assert got["a"].degree == 4
    # object-only entity: zero subj-side stats, not NULL / missing
    assert got["c"].n_as_subj == 0 and got["c"].n_preds_out == 0
    assert got["c"].n_as_obj == 1


def test_neighbor_jaccard_exact_score(spark):
    """a-{c1,c2,c3}, b-{c1,c2}: common 2, deg_a 3, deg_b 2 →
    J = 2/3 → 6666 x10k (floor)."""
    e = spark.createDataFrame(
        [("a", "c1"), ("a", "c2"), ("a", "c3"),
         ("b", "c1"), ("b", "c2")],
        "src string, dst string")
    got = {(r.a, r.b): r for r in
           neighbor_jaccard(e, max_degree=64, min_cn=2).collect()}
    r = got[("a", "b")]
    assert (r.common, r.deg_a, r.deg_b, r.j_x10k) == (2, 3, 2, 6666)


def test_neighbor_jaccard_hub_centers_mint_no_pairs(spark):
    """A center above max_degree contributes no wedges — the planted
    mega-hub creates zero candidate pairs."""
    hub = [("hub", f"x{i}") for i in range(100)]
    e = spark.createDataFrame(hub, "src string, dst string")
    assert neighbor_jaccard(
        e, max_degree=64, min_cn=2).count() == 0


def test_neighbor_jaccard_score_uses_full_degrees(spark):
    """deg in the score is the FULL degree even when the node also
    touches hub-capped regions — only CENTERS are capped."""
    e = [("a", f"c{i}") for i in range(3)]
    e += [("b", f"c{i}") for i in range(3)]
    e += [("a", "hub")] + [("hub", f"x{i}") for i in range(70)]
    df = spark.createDataFrame(e, "src string, dst string")
    got = {(r.a, r.b): r for r in
           neighbor_jaccard(df, max_degree=64, min_cn=2).collect()}
    r = got[("a", "b")]
    # a's degree includes the hub edge (4), b's is 3; common = 3
    assert (r.common, r.deg_a, r.deg_b) == (3, 4, 3)
    assert r.j_x10k == (10000 * 3) // (4 + 3 - 3)


def test_edit_similarity_hand_values(spark):
    pairs = spark.createDataFrame(
        [(1, "kitten", "sitting"), (2, "same", "same"),
         (3, "abc", "")],
        "pair_id long, text_a string, text_b string")
    got = {r.pair_id: r for r in edit_similarity(pairs).collect()}
    assert got[1].lev == 3
    assert got[1].sim_x10k == 10000 - (10000 * 3) // 7
    assert got[2].lev == 0 and got[2].sim_x10k == 10000
    # empty side: lev = len, sim 0; greatest(...,1) guards div-by-0
    assert got[3].lev == 3 and got[3].sim_x10k == 0


def test_pq_rerank_sims_are_exact_and_subset_of_shortlist(spark):
    """Every reranked sim equals the exact cosine recomputed in
    numpy, and every (query, neighbor) came from the ADC shortlist."""
    import math

    import numpy as np

    from gaia_spark.functions.pq import pq_rerank_topk, pq_topk

    rng = np.random.RandomState(7)
    vecs = rng.randn(60, 16).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 3)
    got = pq_rerank_topk(df, q, k=4, shortlist=12, n_sub=4,
                         n_codes=8, iters=1).collect()
    short = {(r.query_id, r.neighbor_id)
             for r in pq_topk(df, q, k=12, n_sub=4, n_codes=8,
                              iters=1).collect()}
    assert len(got) == 12  # 3 queries × k=4
    for r in got:
        assert (r.query_id, r.neighbor_id) in short
        a = np.array(vecs[r.query_id], dtype=np.float64)
        b = np.array(vecs[r.neighbor_id], dtype=np.float64)
        sim = float(a @ b) / (math.sqrt(float(a @ a))
                              * math.sqrt(float(b @ b)))
        assert r.sim_x10k == math.floor(10000 * sim)
