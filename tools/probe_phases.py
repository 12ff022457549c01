"""Per-phase wall-time breakdown of build_triples_df at one core count.

Diagnosis tool for the scaling probe: run pinned at two sizes and diff
the per-phase times to find the non-scaling component.

    taskset -ac 0-15 python tools/probe_phases.py 1000000 16
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    os.environ.setdefault("SPARK_GRAFT_SENTS", "10-60")
    from bench import corpus_dir
    cdir = corpus_dir(n_docs)

    from gaia_spark.session import get_spark
    from gaia_spark.operators.mentions import (
        flat_assertions, flat_surfaces, tag_flat)
    from gaia_spark.operators.linking import (
        canonicalize_mentions, link_mentions, nil_clusters)
    from gaia_spark.operators.canonicalize import (
        canonical_map, canonical_triples)
    from gaia_spark.operators.cleankb import valid_triples
    from pyspark.sql import functions as F

    spark = get_spark("phases", cpus=cpus, shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(f"{cdir}/pages.parquet")
    kb_e = spark.read.parquet(f"{cdir}/kb_entities.parquet")
    kb_a = spark.read.parquet(f"{cdir}/kb_aliases.parquet")
    tag_flat(pages.limit(256).repartition(2 * cpus)).count()  # warmup

    t: dict[str, float] = {}

    def phase(name, fn):
        t0 = time.perf_counter()
        out = fn()
        t[name] = round(time.perf_counter() - t0, 1)
        print(f"# {name}: {t[name]}s", flush=True)
        return out

    # mirror build_triples_df: scan splits feed the tagger directly
    # when plentiful (maxPartitionBytes sized in session.py)
    nparts = 2 * spark.sparkContext.defaultParallelism
    src = pages
    if src.rdd.getNumPartitions() < nparts:
        src = src.repartition(nparts, "url")
    tagged = phase("tag", lambda: tag_flat(
        src, kinds="sa").localCheckpoint())
    linked_s = phase("link", lambda: link_mentions(
        flat_surfaces(tagged).distinct(), kb_e, kb_a).localCheckpoint())
    nil = phase("nil", lambda: nil_clusters(linked_s).localCheckpoint())
    cmap = phase("cmap", lambda: canonical_map(
        canonicalize_mentions(linked_s, nil)).localCheckpoint())

    def _triples():
        # mirror build_triples_df: lang carried through the tagger,
        # cmap broadcast-hinted (it is materialized and tiny here)
        tri = valid_triples(canonical_triples(
            flat_assertions(tagged, with_lang=True), F.broadcast(cmap)))
        return tri.count()

    n = phase("triples", _triples)
    t["total"] = round(sum(v for k, v in t.items() if k != "total"), 1)
    print("PHASES " + json.dumps(
        {"cpus": cpus, "n_docs": n_docs, "triples": n, "phases": t}))
    spark.stop()


if __name__ == "__main__":
    main()
