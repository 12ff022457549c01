"""Per-phase wall-time profile of build_triples_df.

The scaling probe (tools/bench_scaling.py) measures the whole job; this
breaks the same job into its eager phases so the Amdahl serial term is
attributable:  phases whose wall time does NOT shrink with cores are the
scaling-efficiency ceiling.

    python tools/profile_pipeline.py [n_docs] [cpus]

Prints one JSON line with per-phase seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from bench import corpus_dir
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from gaia_spark.session import get_spark
    from gaia_spark.operators.canonicalize import (
        canonical_map, canonical_triples)
    from gaia_spark.operators.cleankb import valid_triples
    from gaia_spark.operators.linking import (
        canonicalize_mentions, link_mentions, nil_clusters)
    from gaia_spark.operators.mentions import (
        flat_assertions, flat_surfaces, tag_flat)

    cdir = corpus_dir(n_docs)
    spark = get_spark("profile", cpus=cpus, shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(f"{cdir}/pages.parquet")
    kb_e = spark.read.parquet(f"{cdir}/kb_entities.parquet")
    kb_a = spark.read.parquet(f"{cdir}/kb_aliases.parquet")

    # same warmup as the probe
    tag_flat(pages.limit(256).repartition(2 * cpus)).count()

    t: dict[str, float] = {}

    def phase(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        t[name] = round(time.perf_counter() - t0, 2)
        print(f"# {name}: {t[name]}s", flush=True)
        return out

    nparts = 2 * spark.sparkContext.defaultParallelism
    tagged = tag_flat(pages.repartition(nparts, "url"), kinds="sa").persist(
        StorageLevel.MEMORY_AND_DISK)
    phase("tag_fused", lambda: tagged.count())

    surfaces = phase(
        "surfaces_distinct",
        lambda: flat_surfaces(tagged).distinct().persist(
            StorageLevel.MEMORY_AND_DISK))
    phase("surfaces_count", lambda: surfaces.count())

    linked_s = phase(
        "link_kb",
        lambda: link_mentions(surfaces, kb_e, kb_a).persist(
            StorageLevel.MEMORY_AND_DISK))
    phase("link_count", lambda: linked_s.count())

    nil = phase("nil_clusters_eager", lambda: nil_clusters(linked_s))

    cmap = phase(
        "canonical_map",
        lambda: canonical_map(
            canonicalize_mentions(linked_s, nil)).persist(
            StorageLevel.MEMORY_AND_DISK))
    phase("cmap_count", lambda: cmap.count())

    def final():
        triples = canonical_triples(flat_assertions(tagged), cmap)
        triples = valid_triples(triples)
        lang_map = pages.groupBy("url").agg(F.min("lang").alias("lang"))
        return triples.join(lang_map, "url").count()

    phase("triples_final", final)

    t["total"] = round(sum(v for k, v in t.items() if k != "total"), 2)
    print(json.dumps({"n_docs": n_docs, "cpus": cpus, "phases": t}))
    spark.stop()


if __name__ == "__main__":
    main()
