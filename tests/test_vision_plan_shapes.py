"""Plan-shape assertions for the vision/fusion stages (V1-V7).

Locks the 100 TB properties vision.py's docstrings claim: the
prototype match is a broadcast join plus ONE skinny groupBy exchange
(never a window shuffle of |protos| rows per image), fusion is one
map-side-combined hash agg, and grounding stays equi-join (no
nested-loop on the corpus side).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from gaia_spark.operators import vision as V


def _final_plan(df) -> str:
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("== Initial Plan ==")[0]


def _n_shuffles(plan: str) -> int:
    return sum(1 for ln in plan.splitlines()
               if "Exchange hashpartitioning" in ln
               and "ReusedExchange" not in ln)


def _images(spark, n=48):
    rows = [(i, bytes.fromhex("89504E47") + f"pimg {i}".encode())
            for i in range(n)]
    return spark.createDataFrame(rows, "image_id long, blob binary")


def test_best_proto_single_skinny_exchange_no_window(spark):
    """The argmax is a struct-min groupBy: partial agg collapses the
    |protos| candidates map-side, so exactly ONE hash exchange exists
    and it carries one row per image; no Window node anywhere."""
    feats = V.embed_images_cols(_images(spark))
    protos = V.build_prototypes(spark, list(V.VIS_LABELS))
    df = V.best_proto(feats, protos)
    plan = _final_plan(df)
    assert _n_shuffles(plan) == 1, plan
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # partial aggregation below the exchange (map-side combine); min
    # over a struct is a SortAggregate, not a HashAggregate
    assert "partial_min" in plan, plan
    assert plan.index("Exchange hashpartitioning") < plan.index(
        "partial_min"), plan  # partial agg is BELOW (after, in text) the exchange


def test_fuse_detections_one_exchange(spark):
    """Fusion = one hash agg keyed by (image, label, cell); the only
    exchange carries fused partials, and pruning is a post-agg filter
    (no second shuffle)."""
    dets = V.detect_objects_cols(_images(spark))
    plan = _final_plan(V.fuse_detections(dets))
    assert _n_shuffles(plan) == 1, plan
    assert "CartesianProduct" not in plan


def test_grounding_no_cartesian(spark):
    """Grounding joins are equi-joins on (image_id) and
    (parent_uid, label) — never a nested-loop over the corpus."""
    imgs = _images(spark)
    dets = V.fuse_detections(V.detect_objects_cols(imgs))
    spine = imgs.select(
        "image_id",
        F.concat(F.lit("d"), F.col("image_id")).alias("parent_uid"))
    ments = spark.createDataFrame(
        [(f"d{i}", V.VIS_LABELS[i % 8]) for i in range(48)],
        "parent_uid string, label string")
    plan = _final_plan(V.ground_mentions(ments, dets, spine))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
