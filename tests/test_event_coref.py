"""T10 graph-based event coreference: overlap-but-differ arg sets merge."""

import pytest
from pyspark.sql import functions as F

from gaia_spark.operators import event_coref as ec


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        # chain: E1 {a,b} — E2 {b,c} — E3 {c,d}  → one cluster of 3
        ("u1", 0, "a", "evt:attack", "b", "PER", "PER", 80),
        ("u2", 1, "b", "evt:attack", "c", "PER", "PER", 80),
        ("u3", 0, "c", "evt:attack", "d", "PER", "PER", 80),
        # same type, disjoint args → separate
        ("u4", 0, "x", "evt:attack", "y", "PER", "PER", 80),
        # shares args with E1 but DIFFERENT type → separate
        ("u5", 0, "a", "evt:meet", "b", "PER", "PER", 80),
        # a relation row: must be ignored entirely
        ("u6", 0, "a", "rel:member_of", "b", "PER", "ORG", 80),
    ]
    return spark.createDataFrame(
        rows,
        "url string, sent_id int, subj string, pred string, obj string,"
        "subj_type string, obj_type string, conf int",
    )


def test_overlapping_arg_sets_merge_across_docs(spark, triples):
    ce = ec.coref_events(triples)
    by_uid = {r.evt_uid: r.event_id for r in ce.collect()}
    chain = [u for u in by_uid if "evt:attack" in u and "u4" not in u]
    assert len(chain) == 3
    assert len({by_uid[u] for u in chain}) == 1  # transitively merged
    # cluster label = lexicographic min member uid
    assert {by_uid[u] for u in chain} == {min(chain)}


def test_disjoint_args_and_other_types_stay_separate(spark, triples):
    ce = ec.coref_events(triples)
    rows = {r.evt_uid: r.event_id for r in ce.collect()}
    lone = [u for u in rows if u.startswith("u4")]
    meet = [u for u in rows if "evt:meet" in u]
    assert rows[lone[0]] == lone[0]          # singleton labels itself
    assert rows[meet[0]] == meet[0]          # type mismatch never merges
    assert not any("rel:" in u for u in rows)  # relations excluded


def test_merged_events_table_deterministic(spark, triples):
    m = {(r.event_id, r.pred): r for r in ec.merged_events(triples).collect()}
    assert len(m) == 3  # attack-chain, attack-lone, meet
    chain = next(r for (eid, p), r in m.items()
                 if p == "evt:attack" and r.n_instances == 3)
    assert chain.n_docs == 3
    assert chain.subjs == ["a", "b", "c"] and chain.objs == ["b", "c", "d"]
    # stable under repartition
    m2 = {(r.event_id, r.pred): (r.n_instances, tuple(r.subjs))
          for r in ec.merged_events(triples.repartition(7)).collect()}
    assert {(k, (r.n_instances, tuple(r.subjs))) for k, r in m.items()} \
        == set(m2.items())


def test_df_cap_drops_megablock_edges(spark):
    """An argument shared by > MAX_ARG_BLOCK same-type events must not
    build edges (quadratic guard); events still label themselves."""
    n = ec.MAX_ARG_BLOCK + 5
    rows = [(f"u{i}", 0, f"s{i:05d}", "evt:attack", "common",
             "PER", "PER", 80) for i in range(n)]
    t = spark.createDataFrame(
        rows,
        "url string, sent_id int, subj string, pred string, obj string,"
        "subj_type string, obj_type string, conf int",
    )
    edges = ec.event_coref_edges(ec.event_instances(t))
    assert edges.count() == 0
    ce = ec.coref_events(t)
    assert ce.count() == n
    assert ce.filter(F.col("event_id") == F.col("evt_uid")).count() == n
