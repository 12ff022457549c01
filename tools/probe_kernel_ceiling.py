"""Pure-Python hardware-ceiling probe: the tag kernel, no Spark.

Runs the fused tagger kernel (the same ``_flat_rows`` the Spark tag
stage executes) over pages read straight from the bench corpus parquet
with ``multiprocessing`` — W worker processes, each pinned to its own
core.  docs/s/core at W=4 vs W=16 is the box's per-core scaling
ceiling for THIS workload: any frequency boost, LLC/bandwidth sharing,
or host overcommit shows up here, with zero JVM/Arrow/shuffle in the
loop.  Run it with nothing else on the machine.

    python tools/probe_kernel_ceiling.py 60000 4
    python tools/probe_kernel_ceiling.py 60000 16
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _work(args):
    core, urls, htmls = args
    os.sched_setaffinity(0, {core})
    from gaia_ref.extract import extract_text
    from gaia_spark.operators.mentions import _flat_rows
    n = 0
    t0 = time.perf_counter()
    for u, h in zip(urls, htmls):
        # same per-doc work as the Spark tag stage (from_text=False):
        # extract_text + fused tag, 'sa' row families
        _flat_rows(u, extract_text(h), kinds="sa")
        n += 1
    return n, time.perf_counter() - t0


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    workers = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    os.environ.setdefault("SPARK_GRAFT_SENTS", "10-60")
    from bench import corpus_dir
    import pyarrow.parquet as pq
    cdir = corpus_dir(1_000_000)
    tab = pq.read_table(f"{cdir}/pages.parquet", columns=["url", "html"])
    urls = tab["url"].to_pylist()[:n_docs]
    htmls = tab["html"].to_pylist()[:n_docs]

    per = n_docs // workers
    chunks = [(c, urls[c * per:(c + 1) * per],
               htmls[c * per:(c + 1) * per]) for c in range(workers)]
    with mp.get_context("spawn").Pool(workers) as pool:
        # warmup: lexicon import in every worker
        pool.map(_work, [(c, u[:50], t[:50]) for c, u, t in chunks])
        t0 = time.perf_counter()
        got = pool.map(_work, chunks)
        wall = time.perf_counter() - t0
    total = sum(n for n, _ in got)
    print("CEILING " + json.dumps({
        "workers": workers, "docs": total,
        "wall_secs": round(wall, 2),
        "docs_per_sec": round(total / wall, 1),
        "docs_per_sec_per_core": round(total / wall / workers, 1),
        "per_worker_secs": [round(s, 1) for _, s in got],
    }))


if __name__ == "__main__":
    main()
