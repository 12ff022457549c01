"""Vision & cross-media fusion stages (SURVEY §2.3, V1-V7).

GAIA's vision side runs GPU models inside external Docker images
(object detection /root/reference/README.md:81-116; face identification
README.md:119-170; flags README.md:161-163; landmarks README.md:165-166;
"Visual Entity Coreference" and "Cross-Media Fusion" on the
architecture diagram).  The models are not part of the reference repo
and cannot be installed here, so — exactly like
gaia_spark/functions/multimodal.py — every stage ships the REAL Spark
plumbing (Arrow-batched `mapInPandas` model stages, ensemble-fusion
aggregation, band-blocked coreference with the shared
connected-components kernel, the grounding / KB-merge joins) around
DETERMINISTIC FAKE models: pure functions of ``md5(hex(blob))``.  That
makes every stage reproducible by a column-expression twin AND by a
DuckDB SQL twin bit-for-bit, so even the vision stages sit behind the
driver's exact-hash oracle gate.  ``real=True`` raises
NotImplementedError where a GPU model would load; swapping
``_fake_*`` for a real model keeps every plan shape unchanged.

Stage map (reference → here):

  V1  detect_objects + fuse_detections    README.md:81-116
  V2  embed_images + best_proto (faces)   README.md:119-170
  V3  best_proto over flag prototypes     README.md:161-163
  V4  landmark_knn (reuses similarity.cosine_topk)  README.md:165-166
  V5  visual_coref (band blocking + CC)   diagram "Visual Entity Coreference"
  V6  ground_mentions                     README.md:58-62,198-201
  V7  merge_kb                            README.md:59,176,203-207

Determinism contract: the fake detector / embedder derive every output
from bytes of ``md5(upper(hex(blob)))`` (detector) and
``md5(upper(hex(blob)) || ':emb')`` (embedder).  Spark ``F.hex`` and
DuckDB ``hex()`` both emit uppercase hex, and ``md5`` of that ASCII
string is engine-independent, so the three implementations (pandas
UDF, column expressions, SQL) agree exactly — asserted in
tests/test_vision.py.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: fixed label vocabulary of the fake detector (8 = one md5-byte mod)
VIS_LABELS = ("person", "vehicle", "building", "flag",
              "weapon", "animal", "sign", "crowd")

#: ensemble members: (model name, md5-byte offset). Two independent
#: "models" read disjoint halves of the 16-byte digest, so their
#: detections genuinely differ and fusion has real work to do.
MODELS = (("a", 0), ("b", 8))

#: fusion grid cell (px) — detections of the same label whose top-left
#: corner falls in the same cell are treated as the same object.
FUSE_GRID = 256

#: pruning threshold: single-model detections below this confidence
#: are dropped; cross-model agreement always survives.
FUSE_MIN_CONF = 8000

EMB_DIMS = 8

DET_SCHEMA = StructType([
    StructField("image_id", LongType(), False),
    StructField("model", StringType(), False),
    StructField("det_id", IntegerType(), False),
    StructField("label", StringType(), False),
    StructField("x", IntegerType(), False),
    StructField("y", IntegerType(), False),
    StructField("w", IntegerType(), False),
    StructField("h", IntegerType(), False),
    StructField("conf_x10k", IntegerType(), False),
])


# ---------------------------------------------------------------- #
# shared digest helpers (Spark column / Python / SQL triplets)      #
# ---------------------------------------------------------------- #

def _sig_col(blob: Column, salt: str = "") -> Column:
    """32-hex-char deterministic signature of a binary payload."""
    h = F.hex(blob)
    if salt:
        h = F.concat(h, F.lit(salt))
    return F.md5(h)


def _sig_py(buf: bytes, salt: str = "") -> str:
    return hashlib.md5((buf.hex().upper() + salt).encode()).hexdigest()


def sql_sig(blob: str, salt: str = "") -> str:
    """DuckDB twin of _sig_col."""
    inner = f"upper(hex({blob}))"
    if salt:
        inner = f"{inner} || '{salt}'"
    return f"md5({inner})"


def _byte_col(sig: Column, i: int) -> Column:
    """Byte ``i`` (0-based) of a 32-hex-char signature, as int 0..255."""
    return F.conv(F.substring(sig, 2 * i + 1, 2), 16, 10).cast("int")


def _byte_py(sig: str, i: int) -> int:
    return int(sig[2 * i:2 * i + 2], 16)


def sql_byte(sig: str, i: int) -> str:
    """DuckDB twin of _byte_col (sig is a SQL expression string)."""
    return f"CAST(('0x' || substring({sig}, {2 * i + 1}, 2)) AS INTEGER)"


# ---------------------------------------------------------------- #
# V1 — object detection (ensemble) + fusion/pruning                 #
# ---------------------------------------------------------------- #

def _det_fields_py(b0: int, b1: int, b2: int) -> tuple:
    return (VIS_LABELS[b0 % 8], b1 * 4, b2 * 4,
            32 + (b0 % 4) * 32, 32 + (b1 % 4) * 32, 3000 + b2 * 27)


def detect_objects(images: DataFrame, id_col: str = "image_id",
                   blob_col: str = "blob",
                   real: bool = False) -> DataFrame:
    """Ensemble object detection over binary images (V1, the model
    stage of README.md:81-116) — Arrow-batched ``mapInPandas`` so a
    real detector would load once per partition and see whole batches.

    Fake model: ensemble member (name, offset o) emits
    ``k = 1 + byte[o] % 2`` detections; detection j reads bytes
    ``base = o + 1 + 3j`` .. ``base+2`` of the digest:
    label = VIS_LABELS[byte[base] % 8], x/y = byte*4,
    w/h = 32 + (byte % 4)*32, conf_x10k = 3000 + byte[base+2]*27.

    → (image_id, model, det_id, label, x, y, w, h, conf_x10k)
    """
    cols = [f.name for f in DET_SCHEMA.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real:
            raise NotImplementedError(
                "real detector (GPU model) not installed in this container")
        for pdf in it:
            rows = []
            for iid, buf in zip(pdf[id_col], pdf[blob_col]):
                sig = _sig_py(bytes(buf) if buf is not None else b"")
                for model, o in MODELS:
                    k = 1 + _byte_py(sig, o) % 2
                    for j in range(k):
                        base = o + 1 + 3 * j
                        lab, x, y, w, h, conf = _det_fields_py(
                            _byte_py(sig, base), _byte_py(sig, base + 1),
                            _byte_py(sig, base + 2))
                        rows.append((int(iid), model, j, lab,
                                     x, y, w, h, conf))
            yield pd.DataFrame(rows, columns=cols)

    return (images.select(F.col(id_col), F.col(blob_col))
            .mapInPandas(batches, schema=DET_SCHEMA))


def detect_objects_cols(images: DataFrame, id_col: str = "image_id",
                        blob_col: str = "blob") -> DataFrame:
    """Column-expression twin of detect_objects' fake path (no Python;
    used by the oracle cross-check and as the pure-JVM fast path)."""
    sig = _sig_col(F.col(blob_col))
    labels = F.array(*[F.lit(l) for l in VIS_LABELS])
    per_model = []
    for model, o in MODELS:
        k = (F.lit(1) + _byte_col(sig, o) % 2)
        dets = []
        for j in range(2):
            base = o + 1 + 3 * j
            b0, b1, b2 = (_byte_col(sig, base), _byte_col(sig, base + 1),
                          _byte_col(sig, base + 2))
            dets.append(F.struct(
                F.lit(j).alias("det_id"),
                F.element_at(labels, b0 % 8 + 1).alias("label"),
                (b1 * 4).alias("x"), (b2 * 4).alias("y"),
                (F.lit(32) + (b0 % 4) * 32).alias("w"),
                (F.lit(32) + (b1 % 4) * 32).alias("h"),
                (F.lit(3000) + b2 * 27).alias("conf_x10k"),
            ))
        per_model.append(
            images.select(
                F.col(id_col).cast("long").alias("image_id"),
                F.lit(model).alias("model"),
                F.explode(F.slice(F.array(*dets), 1, k)).alias("d"))
            .select("image_id", "model", "d.det_id", "d.label",
                    "d.x", "d.y", "d.w", "d.h", "d.conf_x10k"))
    out = per_model[0]
    for m in per_model[1:]:
        out = out.unionByName(m)
    return out


def fuse_detections(dets: DataFrame, grid: int = FUSE_GRID,
                    min_conf: int = FUSE_MIN_CONF) -> DataFrame:
    """Ensemble "Fusion and Pruning" (README.md:92-94 merged pickles;
    diagram V1 box): detections of the same label landing in the same
    ``grid``-px cell merge into one object — box = covering min/max,
    confidence = ensemble max — and single-model objects below
    ``min_conf`` are pruned (cross-model agreement always survives).

    One hash aggregation keyed by (image_id, label, cell); partial
    aggregation is map-side so at 100 TB the shuffle carries one row
    per fused object, not per detection.

    → (image_id, label, cx, cy, n_dets, n_models, conf_x10k, x, y)
    """
    cells = dets.select(
        "image_id", "label", "model", "x", "y", "conf_x10k",
        F.floor(F.col("x") / grid).cast("int").alias("cx"),
        F.floor(F.col("y") / grid).cast("int").alias("cy"),
    )
    fused = (
        cells.groupBy("image_id", "label", "cx", "cy")
        .agg(F.count(F.lit(1)).cast("int").alias("n_dets"),
             # NOT countDistinct: the distinct-agg rewrite would add a
             # second (keys, model)-keyed exchange; the model domain is
             # a tiny bounded set, so a one-pass collect_set size gives
             # the same answer with one exchange total
             F.size(F.collect_set("model")).cast("int")
              .alias("n_models"),
             F.max("conf_x10k").alias("conf_x10k"),
             F.min("x").alias("x"), F.min("y").alias("y"))
    )
    return fused.filter(
        (F.col("n_models") >= 2) | (F.col("conf_x10k") >= min_conf))


# ---------------------------------------------------------------- #
# V2/V3 — embeddings + prototype identification (faces, flags)      #
# ---------------------------------------------------------------- #

def embed_images(images: DataFrame, id_col: str = "image_id",
                 blob_col: str = "blob",
                 real: bool = False) -> DataFrame:
    """FaceNet-style embedding stage (V2/V3 model pass,
    README.md:119-170): binary → fixed-dim int vector, Arrow-batched.
    Fake model: dim d = byte[d] of md5(hex(blob) || ':emb') - 128.

    → (image_id, emb ARRAY<INT>)
    """
    schema = "image_id long, emb array<int>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real:
            raise NotImplementedError(
                "real embedder (GPU model) not installed in this container")
        for pdf in it:
            rows = []
            for iid, buf in zip(pdf[id_col], pdf[blob_col]):
                sig = _sig_py(bytes(buf) if buf is not None else b"",
                              ":emb")
                rows.append((int(iid),
                             [_byte_py(sig, d) - 128
                              for d in range(EMB_DIMS)]))
            yield pd.DataFrame(rows, columns=["image_id", "emb"])

    return (images.select(F.col(id_col), F.col(blob_col))
            .mapInPandas(batches, schema=schema))


def embed_images_cols(images: DataFrame, id_col: str = "image_id",
                      blob_col: str = "blob") -> DataFrame:
    """Column-expression twin of embed_images' fake path."""
    sig = _sig_col(F.col(blob_col), ":emb")
    return images.select(
        F.col(id_col).cast("long").alias("image_id"),
        F.array(*[(_byte_col(sig, d) - 128)
                  for d in range(EMB_DIMS)]).alias("emb"))


def build_prototypes(spark, names) -> DataFrame:
    """Identity/flag prototype vectors (the known-identity set of
    README.md:151-156): dim d = byte[d] of md5(name) - 128.  Tiny by
    construction → broadcast at match time."""
    rows = [(n, [_byte_py(hashlib.md5(n.encode()).hexdigest(), d) - 128
                 for d in range(EMB_DIMS)]) for n in names]
    return spark.createDataFrame(rows, "proto_id string, pvec array<int>")


def best_proto(feats: DataFrame, protos: DataFrame) -> DataFrame:
    """Identify each image against the prototype set (V2 faces / V3
    flags): integer dot-product score, argmax per image with a
    (score desc, proto_id asc) total-order tiebreak.

    Scale shape: the prototype side is broadcast (nested-loop over a
    tiny table), and the argmax is a struct-min groupBy — the partial
    aggregate collapses the |protos| candidates per image map-side, so
    the one exchange carries a single skinny row per image instead of
    |protos| wide rows through a window shuffle.

    → (image_id, proto_id, score)
    """
    scored = (
        feats.join(F.broadcast(protos))
        .select(
            "image_id", "proto_id",
            F.aggregate(
                F.zip_with("emb", "pvec",
                           lambda a, b: a.cast("long") * b.cast("long")),
                F.lit(0).cast("long"), lambda acc, v: acc + v,
            ).alias("score"))
    )
    best = scored.groupBy("image_id").agg(
        F.min(F.struct(
            (-F.col("score")).alias("neg_score"),
            F.col("proto_id").alias("proto_id"),
            F.col("score").alias("score"),
        )).alias("b"))
    return best.select("image_id", "b.proto_id", "b.score")


# ---------------------------------------------------------------- #
# V4 — landmark matching = embedding kNN (reuses similarity kernel) #
# ---------------------------------------------------------------- #

def landmark_knn(feats: DataFrame, landmarks: DataFrame,
                 k: int = 3) -> DataFrame:
    """Landmark/building matching (README.md:165-166) = exact cosine
    top-k of each image embedding against the landmark set — a thin
    wrapper over similarity.cosine_topk (the per-partition partial
    top-k kernel), landmark vectors as the corpus side.

    feats/landmarks: (image_id|vec_id, emb).  → cosine_topk contract.
    """
    from gaia_spark.functions.similarity import cosine_topk
    corpus = landmarks.select(F.col("proto_id").alias("vec_id"),
                              F.col("pvec").alias("embedding"))
    queries = feats.select(
        F.col("image_id").cast("string").alias("vec_id"),
        F.col("emb").alias("embedding"))
    return cosine_topk(corpus, queries, k)


# ---------------------------------------------------------------- #
# V5 — visual entity coreference (band blocking + shared CC kernel) #
# ---------------------------------------------------------------- #

def visual_coref(feats: DataFrame, shift: int = 64) -> DataFrame:
    """Visual entity coreference (diagram "Visual Entity Coreference"):
    cluster images whose embeddings agree on EITHER quantized half —
    the classic OR-of-bands LSH blocking, closed transitively with the
    shared connected-components kernel (operators/graph.py, the same
    kernel as NIL clustering T4b / event coref T10).

    Band b (b=0,1) key = the 4 dims [4b, 4b+4) quantized to
    floor((e+128)/shift); within a band every image links to the band
    minimum (star edges — edge count stays linear in rows, never
    quadratic in band size).  Component id = min image_id reachable.

    → (image_id, cluster_id)  (both zero-padded strings so the CC
    kernel's string-min == numeric min)
    """
    from gaia_spark.operators.graph import connected_components

    node = F.lpad(F.col("image_id").cast("string"), 12, "0")
    banded = []
    for b in range(2):
        key = F.concat(
            F.lit(f"b{b}:"),
            *[((F.element_at("emb", 4 * b + d + 1) + 128) / shift)
              .cast("int").cast("string")
              for d in range(4)])
        banded.append(feats.select(node.alias("node"),
                                   key.alias("band_key")))
    edges = None
    for bdf in banded:
        w = Window.partitionBy("band_key")
        e = bdf.select(
            F.col("node").alias("src"),
            F.min("node").over(w).alias("dst")).filter(
                F.col("src") != F.col("dst"))
        edges = e if edges is None else edges.unionByName(e)
    nodes = feats.select(node.alias("node")).distinct()
    cc = connected_components(edges, nodes=nodes)
    return cc.select(
        F.col("node").cast("long").alias("image_id"),
        F.col("component").cast("long").alias("cluster_id"))


# ---------------------------------------------------------------- #
# V6 — visual grounding (text mention × visual object join)         #
# ---------------------------------------------------------------- #

def ground_mentions(mentions: DataFrame, dets: DataFrame,
                    images: DataFrame) -> DataFrame:
    """Cross-media grounding (README.md:58-62,198-201): align text
    mentions with fused visual objects of the same parent document and
    the same label.  ``images`` carries the (image_id, parent_uid)
    spine (S3/S7 analog); detections attach to it first, then join the
    mention table on (parent_uid, label) — both equi-joins, so AQE
    picks broadcast vs SMJ by measured size.

    mentions: (parent_uid, label);  dets: fused V1 output;
    images: (image_id, parent_uid).
    → (parent_uid, label, image_id, conf_x10k)
    """
    vis = dets.join(images.select("image_id", "parent_uid"), "image_id")
    return (mentions.join(vis, ["parent_uid", "label"])
            .select("parent_uid", "label", "image_id", "conf_x10k"))


# ---------------------------------------------------------------- #
# V7 — multimedia KB merge                                          #
# ---------------------------------------------------------------- #

def merge_kb(text_edges: DataFrame, vis_edges: DataFrame) -> DataFrame:
    """Textual KB + Visual KB → Multimedia KB (README.md:59,176,
    203-207; diagram cylinders): union the two edge tables and
    canonicalize — one row per (subj, pred, obj) with ensemble-max
    confidence, provenance count, and modality count.  Same
    aggregation shape as T11 canonicalization: one hash agg keyed by
    the triple, partial map-side combine.

    Both inputs: (subj, pred, obj, conf_x10k, modality).
    → (subj, pred, obj, conf_x10k, n_prov, n_modalities)
    """
    alle = text_edges.unionByName(vis_edges)
    return (alle.groupBy("subj", "pred", "obj")
            .agg(F.max("conf_x10k").alias("conf_x10k"),
                 F.count(F.lit(1)).alias("n_prov"),
                 # one-pass distinct count over the 2-value modality
                 # domain (see fuse_detections for why not countDistinct)
                 F.size(F.collect_set("modality")).cast("int")
                  .alias("n_modalities")))


# ---------------------------------------------------------------- #
# DuckDB SQL twins (driver-oracle mirrors of the fake-model math)   #
# ---------------------------------------------------------------- #

def sql_det_selects(imgs: str) -> str:
    """UNION ALL of per-(model, det_id) detection SELECTs over
    ``imgs`` — a relation exposing (image_id, sig) where sig is
    sql_sig of the payload.  Mirrors detect_objects exactly."""
    labels = "[" + ", ".join(f"'{l}'" for l in VIS_LABELS) + "]"
    parts = []
    for model, o in MODELS:
        bo = sql_byte("sig", o)
        for j in range(2):
            base = o + 1 + 3 * j
            b0, b1, b2 = (sql_byte("sig", p)
                          for p in (base, base + 1, base + 2))
            parts.append(f"""
          SELECT image_id, '{model}' AS model, {j} AS det_id,
                 {labels}[({b0} % 8) + 1] AS label,
                 ({b1} * 4)::INT AS x, ({b2} * 4)::INT AS y,
                 (32 + ({b0} % 4) * 32)::INT AS w,
                 (32 + ({b1} % 4) * 32)::INT AS h,
                 (3000 + {b2} * 27)::INT AS conf_x10k
          FROM {imgs} WHERE {j} < 1 + ({bo} % 2)""")
    return " UNION ALL ".join(parts)


def sql_fuse(dets: str, grid: int = FUSE_GRID,
             min_conf: int = FUSE_MIN_CONF) -> str:
    """Mirror of fuse_detections over ``dets`` (a relation with the
    DET_SCHEMA columns)."""
    return f"""
        SELECT image_id, label, cx, cy,
               count(*)::INT AS n_dets,
               count(DISTINCT model)::INT AS n_models,
               max(conf_x10k) AS conf_x10k,
               min(x) AS x, min(y) AS y
        FROM (SELECT *, (x // {grid})::INT AS cx, (y // {grid})::INT AS cy
              FROM {dets})
        GROUP BY image_id, label, cx, cy
        HAVING count(DISTINCT model) >= 2 OR max(conf_x10k) >= {min_conf}
    """


def sql_emb_exprs(sig2: str = "sig2") -> list:
    """Per-dim embedding expressions over a salted signature column
    (mirror of embed_images)."""
    return [f"({sql_byte(sig2, d)} - 128)" for d in range(EMB_DIMS)]


def proto_vec(name: str) -> list:
    """The deterministic prototype vector for ``name`` (python-side;
    inlined as literals into the SQL twin)."""
    sig = hashlib.md5(name.encode()).hexdigest()
    return [_byte_py(sig, d) - 128 for d in range(EMB_DIMS)]
