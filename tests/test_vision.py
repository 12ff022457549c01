"""Vision/fusion stages V1-V7 (gaia_spark/operators/vision.py).

The models are deterministic fakes (pure functions of md5(hex(blob)) —
see the module docstring); these tests pin (a) the three-way
equivalence pandas-UDF == column-expression == plain Python that the
DuckDB driver oracle relies on, (b) the stage semantics themselves
(fusion merge/prune, prototype argmax, coref transitivity, grounding
join scope, KB-merge canonicalization), and (c) the honest
NotImplementedError behind ``real=True``.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from gaia_spark.operators import vision as V


@pytest.fixture(scope="module")
def images(spark):
    rows = [
        (i, bytes.fromhex("89504E47") + f"img {i} {'x' * (i % 13)}".encode())
        for i in range(40)
    ]
    # three byte-identical archetype copies → guaranteed coref merges
    rows += [(100 + j, rows[0][1]) for j in range(3)]
    return spark.createDataFrame(rows, "image_id long, blob binary").cache()


def test_detector_twin_equivalence(images):
    a = V.detect_objects(images).orderBy(
        "image_id", "model", "det_id").collect()
    b = V.detect_objects_cols(images).orderBy(
        "image_id", "model", "det_id").collect()
    assert a == b and len(a) > 0


def test_detector_matches_plain_python(images):
    got = {tuple(r) for r in V.detect_objects(images).collect()}
    exp = set()
    for iid, buf in images.collect():
        sig = hashlib.md5(bytes(buf).hex().upper().encode()).hexdigest()
        for model, o in V.MODELS:
            k = 1 + int(sig[2 * o:2 * o + 2], 16) % 2
            for j in range(k):
                base = o + 1 + 3 * j
                b0, b1, b2 = (int(sig[2 * p:2 * p + 2], 16)
                              for p in (base, base + 1, base + 2))
                exp.add((iid, model, j, V.VIS_LABELS[b0 % 8],
                         b1 * 4, b2 * 4, 32 + (b0 % 4) * 32,
                         32 + (b1 % 4) * 32, 3000 + b2 * 27))
    assert got == exp


def test_embed_twin_equivalence(images):
    a = V.embed_images(images).orderBy("image_id").collect()
    b = V.embed_images_cols(images).orderBy("image_id").collect()
    assert a == b
    emb = a[0].emb
    assert len(emb) == V.EMB_DIMS
    assert all(-128 <= v <= 127 for v in emb)


def test_real_model_paths_are_honestly_stubbed(images):
    with pytest.raises(Exception) as e1:
        V.detect_objects(images, real=True).collect()
    with pytest.raises(Exception) as e2:
        V.embed_images(images, real=True).collect()
    assert "NotImplementedError" in str(e1.value.__class__.__name__) \
        or "NotImplementedError" in str(e1.value)
    assert "NotImplementedError" in str(e2.value.__class__.__name__) \
        or "NotImplementedError" in str(e2.value)


def test_fusion_merges_and_prunes(spark):
    dets = spark.createDataFrame(
        [
            # same image+label+cell from two models → merge, survives
            (1, "a", 0, "person", 10, 10, 32, 32, 4000),
            (1, "b", 0, "person", 40, 20, 64, 32, 5000),
            # single-model low-conf → pruned
            (1, "a", 1, "vehicle", 10, 10, 32, 32, 4000),
            # single-model high-conf → kept
            (2, "b", 0, "flag", 600, 600, 32, 32, 9000),
            # same label, DIFFERENT cell → two objects (one pruned)
            (3, "a", 0, "sign", 0, 0, 32, 32, 8500),
            (3, "a", 1, "sign", 900, 900, 32, 32, 100),
        ],
        V.DET_SCHEMA,
    )
    out = {(r.image_id, r.label, r.cx, r.cy):
           (r.n_dets, r.n_models, r.conf_x10k, r.x, r.y)
           for r in V.fuse_detections(dets).collect()}
    assert out == {
        (1, "person", 0, 0): (2, 2, 5000, 10, 10),
        (2, "flag", 2, 2): (1, 1, 9000, 600, 600),
        (3, "sign", 0, 0): (1, 1, 8500, 0, 0),
    }


def test_best_proto_argmax_with_tiebreak(spark):
    feats = spark.createDataFrame(
        [(1, [1, 0, 0, 0, 0, 0, 0, 0]), (2, [0, -2, 0, 0, 0, 0, 0, 0])],
        "image_id long, emb array<int>")
    protos = spark.createDataFrame(
        [("pa", [5, 0, 0, 0, 0, 0, 0, 0]),
         ("pb", [5, 0, 0, 0, 0, 0, 0, 0]),     # tie with pa → pa wins
         ("pc", [0, -9, 0, 0, 0, 0, 0, 0])],
        "proto_id string, pvec array<int>")
    got = {r.image_id: (r.proto_id, r.score)
           for r in V.best_proto(feats, protos).collect()}
    assert got == {1: ("pa", 5), 2: ("pc", 18)}


def test_visual_coref_identical_images_cluster(images):
    feats = V.embed_images_cols(images)
    cc = {r.image_id: r.cluster_id for r in V.visual_coref(feats).collect()}
    # every image is labeled, archetype copies of image 0 all merge
    assert set(cc) == {r.image_id for r in images.select("image_id").collect()}
    assert cc[100] == cc[101] == cc[102] == cc[0] == 0


def test_visual_coref_or_of_bands_transitivity(spark):
    # A~B via band 0 (first 4 dims equal), B~C via band 1 (last 4
    # dims equal) → one cluster {A,B,C} even though A,C share no band
    feats = spark.createDataFrame(
        [(1, [0, 0, 0, 0, 64, 64, 64, 64]),
         (2, [0, 0, 0, 0, -64, -64, -64, -64]),
         (3, [127, 127, 127, 127, -64, -64, -64, -64]),
         (4, [-128, -128, -128, -128, 0, 0, 0, 0])],
        "image_id long, emb array<int>")
    cc = {r.image_id: r.cluster_id for r in V.visual_coref(feats).collect()}
    assert cc[1] == cc[2] == cc[3] == 1
    assert cc[4] == 4


def test_landmark_knn_reuses_exact_topk(spark):
    protos = V.build_prototypes(spark, list(V.VIS_LABELS))
    # a query identical to one prototype → that prototype at rank 1,
    # sim == 1.0 (integerized 9999/10000 — left-to-right float64
    # summation can land a hair under 1.0)
    q = protos.filter(F.col("proto_id") == "person").select(
        F.lit(7).cast("long").alias("image_id"),
        F.col("pvec").alias("emb"))
    out = V.landmark_knn(q, protos, k=2).orderBy("rank").collect()
    assert out[0].neighbor_id == "person" and out[0].sim_x10k >= 9999
    assert len(out) == 2


def test_grounding_join_scope(spark):
    ments = spark.createDataFrame(
        [("p1", "person"), ("p1", "flag"), ("p2", "person")],
        "parent_uid string, label string")
    dets = spark.createDataFrame(
        [(10, "person", 0, 0, 2, 2, 9000, 0, 0),
         (20, "person", 0, 0, 1, 1, 8200, 0, 0)],
        "image_id long, label string, cx int, cy int, n_dets int, "
        "n_models int, conf_x10k int, x int, y int")
    spine = spark.createDataFrame(
        [(10, "p1"), (20, "p2")], "image_id long, parent_uid string")
    got = {(r.parent_uid, r.label, r.image_id, r.conf_x10k)
           for r in V.ground_mentions(ments, dets, spine).collect()}
    # p1/flag has no matching detection; p1/person only grounds to
    # image 10 (same parent), never to image 20
    assert got == {("p1", "person", 10, 9000), ("p2", "person", 20, 8200)}


def test_merge_kb_canonicalizes(spark):
    schema = ("subj string, pred string, obj string, conf_x10k int, "
              "modality string")
    te = spark.createDataFrame(
        [("e1", "shows", "flag", 5000, "text"),
         ("e1", "shows", "flag", 7000, "text"),
         ("e2", "near", "building", 6000, "text")], schema)
    ve = spark.createDataFrame(
        [("e1", "shows", "flag", 9000, "vision")], schema)
    got = {(r.subj, r.pred, r.obj): (r.conf_x10k, r.n_prov, r.n_modalities)
           for r in V.merge_kb(te, ve).collect()}
    assert got == {("e1", "shows", "flag"): (9000, 3, 2),
                   ("e2", "near", "building"): (6000, 1, 1)}
